package graft

import org.apache.spark.sql.functions._

import graft.store.{Bucketing, Tables}

class BucketingSpec extends SparkTestBase {

  test("bucketed join is shuffle-free; unbucketed twin shuffles") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))

    Bucketing.writeBucketed(orders, "b_orders", 8, Seq("o_orderkey"))
    Bucketing.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", 8, Seq("o_orderkey"))

    // AQE rewrites bucketed joins opportunistically; pin the comparison
    val saved = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val savedBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val bucketed = Bucketing.table(spark, "b_orders")
        .join(Bucketing.table(spark, "b_lineitem"), "o_orderkey")
        .groupBy("o_orderstatus").count()
      bucketed.collect()
      val joinOnly = Bucketing.table(spark, "b_orders")
        .join(Bucketing.table(spark, "b_lineitem"), "o_orderkey")
      joinOnly.collect()
      assert(Bucketing.isShuffleFree(joinOnly),
        s"bucketed join should not shuffle:\n${joinOnly.queryExecution.executedPlan}")

      val plain = orders.join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
      plain.collect()
      assert(!Bucketing.isShuffleFree(plain), "unbucketed twin must shuffle (sanity)")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", saved)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBroadcast)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("per-series window ops are shuffle-free over the metric store bucketed by metric") {
    val dir = "/root/testdata/sf0.001"
    // the 100-TB series layout: bucketed by metric, sorted by (metric, ts)
    // — a scan already satisfies the window's ClusteredDistribution, so
    // moving*/derivative/integral need only a local sort, no exchange
    Bucketing.writeBucketed(Tables.metricStore(spark, dir),
      "b_metric_store", 8, Seq("metric"))
    val saved = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val t = Bucketing.table(spark, "b_metric_store")
      val w = t.withColumn("value", graft.series.SeriesOps.movingAverage(5))
        .withColumn("d", graft.series.SeriesOps.derivative())
      w.collect()
      assert(Bucketing.isShuffleFree(w),
        s"window over bucketed store should not shuffle:\n${w.queryExecution.executedPlan}")
      // unbucketed twin must shuffle (sanity: the assertion has teeth)
      val plain = Tables.metricStore(spark, dir)
        .withColumn("value", graft.series.SeriesOps.movingAverage(5))
      plain.collect()
      assert(!Bucketing.isShuffleFree(plain))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", saved)
      spark.sql("DROP TABLE IF EXISTS b_metric_store")
    }
  }
}
