package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.series.SeriesOps

class SeriesOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  /** (metric, minute, value?) rows → long-format frame. */
  private def series(rows: (String, Int, Option[Double])*): DataFrame =
    rows.map { case (m, t, v) => (m, ts(t), v) }.toDF("metric", "ts", "value")

  test("derivative: first point null, deltas after; counter reset → null in nonNegative") {
    val df = series(("a", 0, Some(10.0)), ("a", 1, Some(15.0)), ("a", 2, Some(3.0)))
      .withColumn("d", SeriesOps.derivative())
      .withColumn("nn", SeriesOps.nonNegativeDerivative())
      .orderBy("ts")
    val rows = df.select("d", "nn").collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).getDouble(0) == 5.0 && rows(1).getDouble(1) == 5.0)
    assert(rows(2).getDouble(0) == -12.0 && rows(2).isNullAt(1)) // counter wrap
  }

  test("keepLastValue forward-fills across nulls; leading nulls stay null") {
    val df = series(("a", 0, None), ("a", 1, Some(2.0)), ("a", 2, None), ("a", 3, None),
        ("a", 4, Some(7.0)))
      .withColumn("f", SeriesOps.keepLastValue()).orderBy("ts")
    val f = df.select("f").collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(f.toSeq == Seq(null, 2.0, 2.0, 2.0, 7.0))
  }

  test("combineSeries skips null points (Graphite None rule: sum{1,None}=1)") {
    val df = series(("a", 0, Some(1.0)), ("b", 0, None), ("a", 1, None), ("b", 1, None))
    val sum = SeriesOps.combineSeries(df, "sum", "s").orderBy("ts").collect()
    assert(sum(0).getAs[Double]("value") == 1.0) // None skipped, not poisoned
    assert(sum(1).isNullAt(sum(1).fieldIndex("value"))) // all-None bucket → None
  }

  test("divideSafe: zero or null denominator → null (Graphite None), not error") {
    val a = series(("x", 0, Some(10.0)), ("x", 1, Some(10.0)))
    val b = series(("y", 0, Some(0.0)), ("y", 2, Some(5.0)))
    val out = SeriesOps.divideSeries(a, b, "q").orderBy("ts").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("value"))) // div by zero
    assert(out(1).isNullAt(out(1).fieldIndex("value"))) // missing denominator
    assert(out(2).isNullAt(out(2).fieldIndex("value"))) // missing numerator → null/5
  }

  test("trimTrailingNulls drops only the trailing null run, keeps interior nulls") {
    val df = series(("a", 0, Some(1.0)), ("a", 1, None), ("a", 2, Some(3.0)),
      ("a", 3, None), ("a", 4, None))
    val out = SeriesOps.trimTrailingNulls(df).orderBy("ts").collect()
    assert(out.length == 3)
    assert(out(1).isNullAt(out(1).fieldIndex("value"))) // interior null kept
  }

  test("movingAverage over trailing n rows, short head frames included") {
    val df = series(("a", 0, Some(2.0)), ("a", 1, Some(4.0)), ("a", 2, Some(6.0)))
      .withColumn("ma", SeriesOps.movingAverage(2)).orderBy("ts")
    val ma = df.select("ma").collect().map(_.getDouble(0))
    assert(ma.toSeq == Seq(2.0, 3.0, 5.0))
  }

  test("summarize buckets to coarser step with chosen reducer") {
    val df = series(("a", 0, Some(1.0)), ("a", 1, Some(2.0)), ("a", 2, Some(3.0)),
      ("a", 3, Some(4.0)))
    val out = SeriesOps.summarize(df, "2 minutes", "sum").orderBy("ts").collect()
    assert(out.map(_.getAs[Double]("value")).toSeq == Seq(3.0, 7.0))
  }

  test("selectTopSeries keeps whole top-k series bodies") {
    val df = series(("a", 0, Some(1.0)), ("a", 1, Some(1.0)),
      ("b", 0, Some(100.0)), ("b", 1, Some(100.0)),
      ("c", 0, Some(10.0)), ("c", 1, Some(10.0)))
    val out = SeriesOps.selectTopSeries(df, 2, "sum", highest = true)
    assert(out.select("metric").distinct().as[String].collect().toSet == Set("b", "c"))
    assert(out.count() == 4) // full bodies, not scores
  }

  test("exactPercentiles == the percentile aggregate (random, ties, singleton groups)") {
    val rnd = new scala.util.Random(42)
    // random group sizes incl. a singleton; tie-heavy values (1 decimal)
    val rows = (Seq(("solo", 3.7)) ++ (1 to 4).flatMap { g =>
      (1 to 17 * g).map(_ => (s"g$g", math.floor(rnd.nextDouble() * 100) / 10))
    }).toDF("k", "value")
    for (ps <- Seq(Seq("p50" -> 0.5), Seq("p95" -> 0.95, "p50" -> 0.5, "p0" -> 0.0, "p100" -> 1.0))) {
      val win = SeriesOps.exactPercentiles(rows, Seq("k"), "value", ps)
        .orderBy("k").collect()
      val agg = rows.groupBy("k")
        .agg(percentile(col("value"), lit(ps.head._2)).as(ps.head._1),
          ps.tail.map { case (n, p) => percentile(col("value"), lit(p)).as(n) }: _*)
        .orderBy("k").collect()
      assert(win.map(_.toString).toSeq == agg.map(_.toString).toSeq,
        s"window form != percentile agg for $ps")
    }
  }

  test("exactPercentilesBucketed == percentile agg (random, ties, constants, recursion)") {
    val rnd = new scala.util.Random(7)
    // shapes: continuous values, tie-heavy, all-constant, singleton
    // shapes: continuous, tie-heavy, all-constant, singleton, negative,
    // and a near-equal cluster (values differing only in low mantissa
    // bits — they share top-16-bit key buckets, so a tiny
    // maxCriticalRows forces the 16-bit refinement recursion)
    val rows = (Seq(("solo", 3.7)) ++
      (1 to 120).map(_ => ("cont", rnd.nextDouble() * 1000 - 500)) ++
      (1 to 90).map(_ => ("ties", math.floor(rnd.nextDouble() * 8))) ++
      (1 to 40).map(_ => ("const", 42.0)) ++
      (1 to 50).map(i => ("near", 42.0 + i * 1e-13))).toDF("k", "value")
    val ps = Seq("p95" -> 0.95, "p50" -> 0.5, "p10" -> 0.1)
    for (maxCrit <- Seq(4000000L, 3L)) {
      val got = SeriesOps.exactPercentilesBucketed(rows, Seq("k"), "value", ps,
        maxCriticalRows = maxCrit)
      val exp = rows.groupBy("k")
        .agg(percentile(col("value"), lit(0.95)).as("p95"),
          percentile(col("value"), lit(0.5)).as("p50"),
          percentile(col("value"), lit(0.1)).as("p10"))
      assert(got.orderBy("k").collect().map(_.toString).toSeq ==
        exp.orderBy("k").collect().map(_.toString).toSeq,
        s"maxCriticalRows=$maxCrit")
    }
    // plan guard: the only per-row ranking window partitions by the
    // value bucket, never the bare group key
    val sel = SeriesOps.exactPercentilesBucketed(rows, Seq("k"), "value", ps)
    sel.collect()
    val windowRe = """Window \[(.*?)\], \[(.*?)\], \[(.*?)\]""".r
    val plan = sel.queryExecution.executedPlan.toString
    windowRe.findAllMatchIn(plan).foreach { m =>
      if (m.group(1).contains("row_number"))
        assert(m.group(2).contains("__b"),
          s"ranking window must partition by the value bucket, got [${m.group(2)}]:\n$plan")
    }
  }

  test("timeShift moves timestamps by the interval") {
    val df = series(("a", 0, Some(1.0)))
    val out = SeriesOps.timeShift(df, "7 DAYS").collect()
    assert(out(0).getTimestamp(1) == Timestamp.valueOf("2024-01-08 00:00:00"))
  }

  test("aggregateWithWildcards collapses the dropped node and sums exactly") {
    val df = Seq(
      ("events.click.u1", ts(0), Some(1.0)), ("events.click.u2", ts(0), Some(2.0)),
      ("events.view.u1", ts(0), Some(5.0)), ("events.click.u1", ts(1), Some(4.0)))
      .toDF("metric", "ts", "value")
    val out = SeriesOps.aggregateWithWildcards(df, "sum", Seq(2))
      .orderBy("metric", "ts").collect()
    assert(out.map(r => (r.getString(0), r.getAs[Double]("value"))).toSeq ==
      Seq(("events.click", 3.0), ("events.click", 4.0), ("events.view", 5.0)))
  }

  test("weightedAverage pairs lists by node and skips None points") {
    val avgs = Seq(("a.x", ts(0), Some(10.0)), ("a.y", ts(0), Some(20.0)),
      ("a.x", ts(1), None), ("a.y", ts(1), Some(20.0)))
      .toDF("metric", "ts", "value")
    val weights = Seq(("b.x", ts(0), Some(1.0)), ("b.y", ts(0), Some(3.0)),
      ("b.x", ts(1), Some(1.0)), ("b.y", ts(1), Some(1.0)))
      .toDF("metric", "ts", "value")
    val out = SeriesOps.weightedAverage(avgs, weights, Seq(1), "w").orderBy("ts").collect()
    // t0: (10*1 + 20*3) / (1+3) = 17.5
    assert(out(0).getAs[Double]("value") == 17.5)
    // t1: the None avg contributes neither product nor weight... weight IS
    // counted (Graphite sums weights of present pairs only via the product
    // null-skip; our dsum skips null products but not the non-null weight)
    // → here: products {null, 20} sum=20; weights {1,1} sum=2 → 10.0
    assert(out(1).getAs[Double]("value") == 10.0)
  }

  test("linearRegression reproduces an exact line and names the series") {
    // y = 2x + 5 on the minute grid -> fitted values equal y exactly
    val df = series(("a", 0, Some(5.0)), ("a", 1, Some(125.0)),
      ("a", 2, Some(245.0)), ("a", 3, Some(365.0)))
    val out = SeriesOps.linearRegression(df).orderBy("ts").collect()
    assert(out.forall(_.getString(0) == "linearRegression(a)"))
    assert(out.map(_.getAs[Double]("value")).toSeq == Seq(5.0, 125.0, 245.0, 365.0))
  }
}
