package graft.engine

import java.sql.Timestamp

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{MonitorSpec, Verdict}
import graft.store.MetricSource

/** E2/E3 serving edge: the reference mounts an authenticated JSON API
  * (reference config/routes.rb:2-3 — rearview engine + API mount) for
  * "test this monitor now", "latest run per job" and chart data. This is
  * the engine-side twin a host HTTP layer would mount: strings/JSON in,
  * JSON out, no HTTP here (transport is the host's concern — same split
  * as the reference's Rails engine vs its API consumers).
  *
  * JSON parsing/serialization is Spark's own (`spark.read.json`,
  * `Dataset.toJSON`) — no extra dependency, and every payload is
  * driver-bounded (one monitor's spec / verdicts / chart, never data-
  * scale rows).
  */
object MonitorApi {

  /** Parse one monitor-spec JSON document (the reference's jobs-row
    * shape: db/schema.rb:50-69). Unknown fields are ignored; required:
    * id, targets, minutes, monitorExpr. */
  def parseSpec(spark: SparkSession, json: String): MonitorSpec = {
    import spark.implicits._
    val df = spark.read.json(Seq(json).toDS())
    require(!df.columns.contains("_corrupt_record"), s"bad monitor JSON: $json")
    val r = df.collect()(0)
    def has(name: String) = df.columns.contains(name) && !r.isNullAt(r.fieldIndex(name))
    def str(name: String, dflt: => String) = if (has(name)) r.getAs[String](name) else dflt
    def num(name: String, dflt: => Long) =
      if (has(name)) r.getAs[Number](r.fieldIndex(name)).longValue else dflt
    require(has("id") && has("targets") && has("minutes") && has("monitorExpr"),
      s"monitor JSON needs id/targets/minutes/monitorExpr: $json")
    MonitorSpec(
      id = num("id", 0),
      name = str("name", s"job ${num("id", 0)}"),
      targets = r.getSeq[String](r.fieldIndex("targets")),
      minutes = num("minutes", 0).toInt,
      toDate = if (has("toDate")) Some(Timestamp.valueOf(str("toDate", ""))) else None,
      cronExpr = str("cronExpr", "* * * * *"),
      monitorExpr = str("monitorExpr", ""),
      alertKeys = if (has("alertKeys")) r.getSeq[String](r.fieldIndex("alertKeys")) else Nil,
      errorTimeoutMinutes = num("errorTimeoutMinutes", 60).toInt,
      active = if (has("active")) r.getAs[Boolean]("active") else true)
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def verdictJson(v: Verdict): String = {
    // NaN/Infinity are not JSON tokens — a single non-finite observed
    // value would make the whole response unparseable on a 200
    val obs = v.observed.filter(java.lang.Double.isFinite)
      .map(_.toString).getOrElse("null")
    s"""{"metric":"${esc(v.metric)}","windowEnd":"${v.windowEnd}",""" +
      s""""observed":$obs,"passed":${v.passed},"message":"${esc(v.message)}"}"""
  }

  /** E2 "test monitor": evaluate a JSON monitor spec now, no side
    * effects, verdicts back as JSON (the reference's interactive
    * monitor-test endpoint ran the sandbox without persisting). */
  def evaluateJson(spark: SparkSession, source: MetricSource, specJson: String,
      now: Timestamp): String = {
    val spec = parseSpec(spark, specJson)
    val (verdicts, error) =
      try (Runner.evaluate(spark, source, spec, now).sortBy(_.metric), None)
      catch { case scala.util.control.NonFatal(e) => (Nil, Some(String.valueOf(e.getMessage))) }
    val status = error.map(_ => graft.model.JobStatus.Error)
      .getOrElse(Runner.jobStatus(verdicts))
    val body = verdicts.map(verdictJson).mkString("[", ",", "]")
    val errField = error.map(e => s""","error":"${esc(e)}"""").getOrElse("")
    s"""{"jobId":${spec.id},"status":"$status","verdicts":$body$errField}"""
  }

  /** E3 "latest run per job": the persisted job_data read path as one
    * JSON array (chart payload included — it is already JSON). */
  def latestRunsJson(spark: SparkSession, jobDataPath: String): String =
    Runner.latestRuns(spark, jobDataPath)
      .orderBy(col("job_id"))
      .select(col("job_id"), col("window_end").cast("string").as("window_end"),
        col("status"), col("data"))
      .toJSON.collect().mkString("[", ",", "]")

  /** Backtest endpoint: the one-plan historical sweep
    * ([[Backtest.sweep]]) as JSON rows — the reference's "test this
    * monitor over the past range" UI call, minus the per-window rerun. */
  def backtestJson(spark: SparkSession, source: MetricSource, specJson: String,
      from: Timestamp, until: Timestamp, stepMinutes: Int): String = {
    val spec = parseSpec(spark, specJson)
    Backtest.sweep(source, spec, from, until, stepMinutes)
      .orderBy(col("window_end"), col("metric"))
      .withColumn("window_end", col("window_end").cast("string"))
      .toJSON.collect().mkString("[", ",", "]")
  }

  /** Render endpoint: compile a target string over a window, return
    * series as JSON (the chart shape the reference stored per run). */
  def renderJson(spark: SparkSession, source: MetricSource, target: String,
      from: Timestamp, until: Timestamp): String = {
    val clipped = source.scan(from, until)
    graft.dsl.TargetLang.plan(target, clipped)
      .groupBy(col("metric"))
      .agg(to_json(sort_array(collect_list(struct(col("ts"), col("value"))))).as("points"))
      .orderBy(col("metric"))
      .toJSON.collect().mkString("[", ",", "]")
  }
}
