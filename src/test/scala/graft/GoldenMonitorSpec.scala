package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.engine.Runner
import graft.model.MonitorSpec
import graft.store.{Skew, Tables}

/** Golden end-to-end monitor runs (SURVEY §5.2 item 2): fixture
  * monitors over sf0.001 with frozen expected verdicts, each expected
  * value recomputed through an INDEPENDENT formulation (plain SQL over
  * the events table) — so a regression anywhere in the
  * target-parser → compiler → planner → reducer chain shows up as a
  * value mismatch, not just a shape change.
  */
class GoldenMonitorSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val store = Tables.metricStore(spark, dir)
  private val at = Timestamp.valueOf("2024-01-20 00:00:00")

  private def mon(id: Long, targets: Seq[String], expr: String, minutes: Int = 1440) =
    MonitorSpec(id, s"golden-$id", targets, minutes,
      Some(at), "*/5 * * * *", expr)

  private def independent(sql: String): Double = {
    Tables.events(spark, dir).createOrReplaceTempView("ev")
    spark.sql(sql).head.getDouble(0)
  }

  test("golden 1: plain glob + mean threshold matches independent SQL") {
    val v = Runner.evaluate(spark, store,
      mon(1, Seq("events.purchase"), "mean > 0"), at)
    assert(v.map(_.metric) == Seq("events.purchase"))
    val expected = independent(
      """SELECT avg(value) FROM ev WHERE event_type = 'purchase'
        |AND ts BETWEEN timestamp'2024-01-19 00:00:00' AND timestamp'2024-01-20 00:00:00'""".stripMargin)
    assert(math.abs(v.head.observed.get - expected) < 1e-9)
  }

  test("golden 2: summarize + sum reduction through the target DSL") {
    val v = Runner.evaluate(spark, store,
      mon(2, Seq("summarize(events.{click,view}, \"1h\", \"sum\")"), "sum > 0"), at)
    val expected = independent(
      """SELECT sum(value) FROM ev WHERE event_type IN ('click','view')
        |AND ts BETWEEN timestamp'2024-01-19 00:00:00' AND timestamp'2024-01-20 00:00:00'""".stripMargin)
    // summarize(sum) then sum over buckets == direct sum over the window
    assert(math.abs(v.map(_.observed.get).sum - expected) < 1e-6)
  }

  test("golden: time-window movingAverage through the full monitor chain") {
    val v = Runner.evaluate(spark, store,
      mon(9, Seq("movingAverage(events.purchase, \"60min\")"), "max > 0"), at)
    assert(v.size == 1)
    // independent formulation: SQL-text RANGE frame over epoch seconds
    val expected = independent(
      """SELECT max(mv) FROM (
        |  SELECT avg(value) OVER (
        |    ORDER BY unix_timestamp(ts)
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS mv
        |  FROM ev WHERE event_type = 'purchase'
        |  AND ts BETWEEN timestamp'2024-01-19 00:00:00' AND timestamp'2024-01-20 00:00:00')""".stripMargin)
    assert(math.abs(v.head.observed.get - expected) < 1e-6)
  }

  test("golden 3: sumSeries combine + count reduction") {
    val v = Runner.evaluate(spark, store,
      mon(3, Seq("sumSeries(events.*)"), "count > 0"), at)
    assert(v.size == 1) // one combined series
    val buckets = independent(
      """SELECT CAST(count(DISTINCT ts) AS DOUBLE) FROM ev
        |WHERE ts BETWEEN timestamp'2024-01-19 00:00:00' AND timestamp'2024-01-20 00:00:00'""".stripMargin)
    assert(v.head.observed.get == buckets) // one combined point per distinct ts
  }

  test("golden 4: scale transform is linear through the whole pipeline") {
    val base = Runner.evaluate(spark, store,
      mon(4, Seq("events.error"), "sum > 0"), at)
    val scaled = Runner.evaluate(spark, store,
      mon(5, Seq("scale(events.error, 3)"), "sum > 0"), at)
    assert(math.abs(scaled.head.observed.get - 3 * base.head.observed.get) < 1e-6)
  }

  test("golden 5: failing monitor produces failed verdicts with stable message") {
    val v = Runner.evaluate(spark, store,
      mon(6, Seq("events.*"), "min > 1000000"), at)
    assert(v.nonEmpty && v.forall(!_.passed))
    assert(v.forall(_.message == "golden-6: min > 1000000 violated"))
  }
}

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("salted aggregate == unsalted aggregate (decimal sums exact)") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("value"))
    val plain = df.groupBy("event_type")
      .agg(graft.series.SeriesOps.dsum(col("value")).as("s"), count(lit(1)).as("n"))
    val salted = Skew.saltedAggregate(df, Seq("event_type"), salt = 8,
      Seq("s" -> sum(col("value").cast("decimal(18,6)")), "n" -> count(lit(1))))
      .select(col("event_type"), col("s").cast("double").as("s"), col("n"))
    val j = plain.as("p").join(salted.as("q"), "event_type")
      .filter(col("p.s") =!= col("q.s") || col("p.n") =!= col("q.n"))
    assert(j.count() == 0)
  }

  test("salted aggregate with explicit merge: min/max partials merge correctly") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("value"))
    val plain = df.groupBy("event_type")
      .agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
    val salted = Skew.saltedAggregate(df, Seq("event_type"), salt = 8,
      Seq("mn" -> min(col("value")), "mx" -> max(col("value"))),
      merge = Map("mn" -> (min(_)), "mx" -> (max(_))))
    val j = plain.as("p").join(salted.as("q"), "event_type")
      .filter(col("p.mn") =!= col("q.mn") || col("p.mx") =!= col("q.mx"))
    assert(j.count() == 0)
  }

  test("salted aggregate REFUSES a non-sum/count aggregate with no merge entry") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("value"))
    val e = intercept[IllegalArgumentException] {
      Skew.saltedAggregate(df, Seq("event_type"), salt = 8,
        Seq("mn" -> min(col("value")))) // summed per-salt minima = wrong data
    }
    assert(e.getMessage.contains("mn"))
    // DISTINCT aggregates are refused too: the same value lands in
    // several salt groups, so summed per-salt distinct counts inflate
    intercept[IllegalArgumentException] {
      Skew.saltedAggregate(df, Seq("event_type"), salt = 8,
        Seq("nd" -> countDistinct(col("value"))))
    }
    // cast-wrapped / aliased sums still pass the tree check
    Skew.saltedAggregate(df, Seq("event_type"), salt = 8,
      Seq("s" -> sum(col("value").cast("decimal(18,6)")).as("s"))).collect()
  }

  test("salted broadcast skew join == plain join") {
    val fact = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("value"))
    val dim = Seq(("click", 1.0), ("view", 2.0), ("purchase", 3.0),
      ("signup", 4.0), ("error", 5.0)).toDF("event_type", "weight")
    val plain = fact.join(dim, "event_type")
      .agg(sum(col("value") * col("weight")).cast("decimal(18,4)")).head.getDecimal(0)
    val salted = Skew.saltedBroadcastSkewJoin(fact, dim, "event_type", salt = 4)
      .agg(sum(col("value") * col("weight")).cast("decimal(18,4)")).head.getDecimal(0)
    assert((plain.doubleValue - salted.doubleValue).abs < 1e-4)
  }
}
