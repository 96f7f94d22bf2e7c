package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.engine.{MonitorApi, Runner}
import graft.store.MetricSource

/** E2/E3 JSON edge: spec-from-JSON, verdicts-to-JSON, latest runs,
  * render. Round-trips through Spark's own JSON reader so the output is
  * verified machine-parseable, not just string-shaped. */
class MonitorApiSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val source = MetricSource.events(spark, dir)
  private val now = Timestamp.valueOf("2024-01-15 12:00:00")

  private def parseJson(json: String) =
    spark.read.json(Seq(json).toDS())

  test("parseSpec: full document, defaults, and rejection of junk") {
    val spec = MonitorApi.parseSpec(spark,
      """{"id": 3, "name": "api-mon", "targets": ["events.*"], "minutes": 720,
         "toDate": "2024-01-15 12:00:00", "cronExpr": "*/10 * * * *",
         "monitorExpr": "mean > 0", "alertKeys": ["mailto:a@b"]}""")
    assert(spec.id == 3 && spec.name == "api-mon" && spec.minutes == 720)
    assert(spec.toDate.contains(now) && spec.alertKeys == Seq("mailto:a@b"))
    val minimal = MonitorApi.parseSpec(spark,
      """{"id": 1, "targets": ["events.click"], "minutes": 60, "monitorExpr": "count >= 0"}""")
    assert(minimal.name == "job 1" && minimal.toDate.isEmpty && minimal.active)
    intercept[IllegalArgumentException] {
      MonitorApi.parseSpec(spark, """{"id": 1}""") // missing required fields
    }
  }

  test("evaluateJson: verdict payload is valid JSON with per-series rows") {
    val out = MonitorApi.evaluateJson(spark, source,
      """{"id": 5, "targets": ["events.*"], "minutes": 720,
         "toDate": "2024-01-15 12:00:00", "monitorExpr": "mean > 0 && count > 0"}""",
      now)
    val doc = parseJson(out).collect()(0)
    assert(doc.getAs[Long]("jobId") == 5L)
    assert(doc.getAs[String]("status") == "success")
    val verdicts = doc.getSeq[org.apache.spark.sql.Row](doc.fieldIndex("verdicts"))
    assert(verdicts.nonEmpty)
    assert(verdicts.forall(_.getAs[Boolean]("passed")))
    assert(verdicts.map(_.getAs[String]("metric")) ==
      verdicts.map(_.getAs[String]("metric")).sorted)
  }

  test("evaluateJson: a bad target surfaces as status=error, not an exception") {
    val out = MonitorApi.evaluateJson(spark, source,
      """{"id": 6, "targets": ["nosuchfn(events.*)"], "minutes": 60,
         "monitorExpr": "mean > 0"}""", now)
    val doc = parseJson(out).collect()(0)
    assert(doc.getAs[String]("status") == "error")
    assert(doc.getAs[String]("error").contains("nosuchfn"))
  }

  test("latestRunsJson: one row per job with the chart payload embedded") {
    val tmp = Files.createTempDirectory("graft-api").toString
    val spec = MonitorApi.parseSpec(spark,
      """{"id": 11, "targets": ["events.*"], "minutes": 720,
         "toDate": "2024-01-15 12:00:00", "monitorExpr": "mean > 0"}""")
    Runner.runOnce(spark, source, spec, now, s"$tmp/job_data", s"$tmp/job_errors")
    val out = MonitorApi.latestRunsJson(spark, s"$tmp/job_data")
    val rows = parseJson(out).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Number]("job_id").longValue == 11L)
    assert(rows(0).getAs[String]("status") == "success")
    assert(rows(0).getAs[String]("data").contains("\"metric\""))
  }

  test("backtestJson: sweep rows come back ordered with per-window verdicts") {
    val out = MonitorApi.backtestJson(spark, source,
      """{"id": 12, "targets": ["events.*"], "minutes": 720,
         "monitorExpr": "mean > 0 && count > 0"}""",
      Timestamp.valueOf("2024-01-10 06:00:00"),
      Timestamp.valueOf("2024-01-10 18:00:00"), stepMinutes = 240)
    val rows = parseJson(out).collect()
    assert(rows.length >= 8) // 4 grid ends × several metrics
    assert(rows.forall(_.getAs[Boolean]("passed")))
    val ends = rows.map(_.getAs[String]("window_end")).distinct.sorted
    assert(ends.head.startsWith("2024-01-10 06:00") && ends.last.startsWith("2024-01-10 18:00"))
  }

  test("renderJson: target compiles and series come back as (metric, points)") {
    val out = MonitorApi.renderJson(spark, source, "summarize(events.*, \"1h\", \"sum\")",
      Timestamp.valueOf("2024-01-15 00:00:00"), now)
    val rows = parseJson(out).collect()
    assert(rows.length >= 2) // several event metrics
    val points = parseJson(rows(0).getAs[String]("points")).collect()
    assert(points.length > 0)
  }
}
