package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dsl.MonitorDsl
import graft.model.MonitorSpec
import graft.state.AlertThrottle
import graft.state.AlertThrottle.{Alert, RunEvent}

/** Continuous monitor evaluation (ST2/ST3/ST4/ST5 end-to-end): the
  * reference's cron-pull loop re-expressed as ONE Structured Streaming
  * query over the metric stream.
  *
  * Stage 1 (stateful, watermarked): sliding event-time windows of
  * `spec.minutes`, sliding every `slide` — the streaming twin of
  * "cron period < window length ⇒ overlapping windows" (ST3) — with
  * the monitor's reductions aggregated per (metric, window).
  * Append mode ⇒ a window only emits once its watermark closes,
  * which is exactly the reference's "don't evaluate incomplete
  * buckets" rule (ST4/P5).
  *
  * Stage 2 (foreachBatch): the closed windows become [[RunEvent]]s and
  * run through the SAME throttle fold as batch mode, with
  * `last_alerted_at` state carried in a small parquet state table —
  * the reference's own design (it kept throttle state in
  * `job_errors.last_alerted_at`, db/schema.rb:43) rather than a second
  * stateful operator in the same query plan. Alerts append to
  * `alertsPath`.
  */
object StreamingRunner {

  /** Stage 1: closed-window verdict stream for one monitor. */
  def verdictStream(stream: DataFrame, spec: MonitorSpec,
      slide: String, lateness: String = "2 minutes"): DataFrame = {
    val ast = MonitorDsl.parse(spec.monitorExpr).fold(
      err => throw new IllegalArgumentException(s"monitor ${spec.id}: $err"),
      identity)
    val reds = MonitorDsl.reductions(ast).toSeq.sorted
    val aggs = reds.map(r =>
      MonitorDsl.reductionAgg(r, col("value"), col("ts")).as(MonitorDsl.redCol(r)))
    stream
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), s"${spec.minutes} minutes", slide).as("w"), col("metric"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("passed", MonitorDsl.compile(ast))
      .withColumn("job_id", lit(spec.id))
      .select(Seq(col("job_id"), col("metric"), col("w.end").as("window_end"),
        col("passed")) ++ reds.map(r => col(MonitorDsl.redCol(r))): _*)
  }

  /** Stage 1 MULTIPLEXED: ONE stateful query evaluates N monitors that
    * share a window length (one cohort per distinct `minutes`; hundreds
    * of monitors cost as many queries as distinct window lengths, not
    * hundreds). The aggregation state is built ONCE over
    * (window, metric) with the UNION of all specs' reduction columns;
    * the per-job fan-out (`explode`) happens AFTER the aggregate, on
    * closed-window rows — so input rows shuffle once, the state store
    * holds one copy, and each job's `passed` is its own compiled
    * expression selected by job_id. Verdict rows are identical to the
    * single-spec [[verdictStream]] (StreamingRunnerSpec proves it). */
  def multiplexedVerdictStream(stream: DataFrame, specs: Seq[MonitorSpec],
      slide: String, lateness: String = "2 minutes"): DataFrame = {
    require(specs.nonEmpty, "multiplexedVerdictStream: no specs")
    require(specs.map(_.minutes).distinct.size == 1,
      s"one cohort = one window length; got minutes=${specs.map(_.minutes).distinct}")
    val asts = specs.map { sp =>
      sp.id -> MonitorDsl.parse(sp.monitorExpr).fold(
        err => throw new IllegalArgumentException(s"monitor ${sp.id}: $err"),
        identity)
    }.toMap
    val allReds = asts.values.flatMap(MonitorDsl.reductions).toSeq.distinct.sorted
    val aggs = allReds.map(r =>
      MonitorDsl.reductionAgg(r, col("value"), col("ts")).as(MonitorDsl.redCol(r)))
    val passedByJob = specs.foldLeft(lit(null).cast("boolean")) { (acc, sp) =>
      when(col("job_id") === sp.id, MonitorDsl.compile(asts(sp.id))).otherwise(acc)
    }
    stream
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), s"${specs.head.minutes} minutes", slide).as("w"), col("metric"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("job_id", explode(array(specs.map(sp => lit(sp.id)): _*)))
      .withColumn("passed", passedByJob)
      .select(Seq(col("job_id"), col("metric"), col("w.end").as("window_end"),
        col("passed")) ++ allReds.map(r => col(MonitorDsl.redCol(r))): _*)
  }

  // throttle-state table lives in AlertThrottle.load/saveStateTable —
  // shared with the Scheduler so both paths honor one throttle clock

  /** Stage 2 wiring: start the full pipeline, appending fired alerts to
    * `alertsPath` parquet.
    *
    * LAYOUT (since r10): one `batch_id=<n>` partition directory per
    * micro-batch (replay-safe overwrite; read with
    * `spark.read.parquet(alertsPath)` — partition discovery adds the
    * `batch_id` column). MIGRATION from the pre-r10 flat layout: Spark
    * refuses to mix flat files and partition dirs under one root
    * (conflicting directory structures), so either move the legacy
    * parquet files into `alertsPath/batch_id=-1/` (they rejoin the
    * table with batch_id -1) or point new runs at a fresh alertsPath.
    *
    * When `sinks` is non-empty, fired alerts are
    * ALSO delivered through [[graft.state.AlertDispatcher]] (S7: channel
    * sinks with bounded retries) and the per-channel delivery records
    * appended to `deliveryPath` — streaming and scheduled monitors share
    * one delivery path. Returns the running query (AvailableNow for
    * tests, ProcessingTime in deployment). */
  def start(spark: SparkSession, stream: DataFrame, spec: MonitorSpec,
      slide: String, alertsPath: String, statePath: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      sinks: Seq[graft.state.AlertSink] = Nil,
      deliveryPath: Option[String] = None): StreamingQuery =
    startStream(spark, verdictStream(stream, spec, slide),
      id => if (id == spec.id) Some(spec) else None,
      alertsPath, statePath, checkpoint, trigger, sinks, deliveryPath)

  /** Multiplexed stage-2 wiring: ONE streaming query (one checkpoint,
    * one state store) monitors every spec in the cohort; the shared
    * foreachBatch folds all jobs' events through the common throttle
    * table and routes each alert to its own spec's alert keys. */
  def startMultiplexed(spark: SparkSession, stream: DataFrame,
      specs: Seq[MonitorSpec], slide: String,
      alertsPath: String, statePath: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      sinks: Seq[graft.state.AlertSink] = Nil,
      deliveryPath: Option[String] = None): StreamingQuery = {
    val byId = specs.map(sp => sp.id -> sp).toMap
    startStream(spark, multiplexedVerdictStream(stream, specs, slide), byId.get,
      alertsPath, statePath, checkpoint, trigger, sinks, deliveryPath)
  }

  private def startStream(spark: SparkSession, verdicts: DataFrame,
      specOf: Long => Option[MonitorSpec],
      alertsPath: String, statePath: String, checkpoint: String,
      trigger: Trigger, sinks: Seq[graft.state.AlertSink],
      deliveryPath: Option[String]): StreamingQuery = {
    import spark.implicits._
    verdicts.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // any failing metric fails the job for that window (Runner.jobStatus)
        val events = batch.groupBy(col("job_id"), col("window_end"))
          .agg(min(when(col("passed"), 1).otherwise(0)).as("all_passed"))
          .select(col("job_id"), col("window_end"),
            (col("all_passed") === 0).as("failed"))
          .collect()
          .map(r => RunEvent(r.getLong(0), r.getTimestamp(1), r.getBoolean(2),
            specOf(r.getLong(0)).map(_.errorTimeoutMinutes).getOrElse(60)))
          .toSeq
        if (events.nonEmpty) {
          // the whole load→replay→save cycle under the JVM-global lock:
          // the scheduler shares this state table, and interleaved
          // cycles lost whichever update saved first
          AlertThrottle.stateTableLock.synchronized {
            val init = AlertThrottle.loadStateTable(spark, statePath)
            val (alerts, newState) = AlertThrottle.replay(events, init)
            if (alerts.nonEmpty) {
              // per-batch OVERWRITE keyed by micro-batch id: a crash
              // after this write but before the checkpoint commits
              // re-delivers the batch, and the retry REPLACES its rows
              // instead of appending duplicates (read the table with
              // spark.read.parquet(alertsPath) — partition discovery
              // adds the batch_id column). Sink DELIVERY below remains
              // at-least-once: a retried batch can re-page — the
              // standard alerting trade; dedup on (jobId, at) at the
              // receiver if exact-once pages matter.
              alerts.toDF().write.mode("overwrite")
                .parquet(s"$alertsPath/batch_id=$batchId")
              if (sinks.nonEmpty) {
                val deliveries = graft.state.AlertDispatcher.dispatch(
                  alerts, specOf, sinks)
                deliveryPath.foreach(p =>
                  graft.state.AlertDispatcher.persist(spark, deliveries, p))
              }
            }
            AlertThrottle.saveStateTable(spark, statePath, newState)
          }
        }
      }
      .start()
  }
}
