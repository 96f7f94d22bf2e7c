package graft.state

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.JobStatus

/** Alert throttling + status transitions (ST5): the reference tracks
  * `job_errors.last_alerted_at` (db/schema.rb:43) and suppresses
  * re-alerts within `error_timeout` minutes (db/schema.rb:61, default
  * 60), with job status driven by a state machine (Gemfile.lock:167).
  *
  * Two implementations of the same rule:
  *  - [[throttleBatch]]: per-job ordered fold (groupByKey →
  *    flatMapGroups) for batch/replay — deterministic, no checkpoint.
  *  - [[throttleStream]]: flatMapGroupsWithState for Structured
  *    Streaming, state = (status, lastAlertedAt), checkpointable.
  *
  * Rule (matching the reference's semantics): alert fires on a failing
  * run iff no alert has fired for this job in the previous
  * `errorTimeoutMinutes`; a passing run resets status (recovery) but
  * not the throttle clock.
  */
object AlertThrottle {

  /** One evaluated run for throttling purposes. */
  final case class RunEvent(jobId: Long, at: Timestamp, failed: Boolean,
      errorTimeoutMinutes: Int)

  /** An alert that should actually fire. */
  final case class Alert(jobId: Long, at: Timestamp, transition: String)

  /** Per-job persisted throttle state (public: Spark codegen needs the
    * accessors when encoding it into the state store). */
  final case class ThrottleState(status: String, lastAlertedAtMillis: Long)

  /** A failure episode whose enter-failure alert was SUPPRESSED by the
    * throttle (recovery + re-failure inside the window): distinct from
    * [[JobStatus.Failed]] (= alerted) so the first DELIVERED alert of a
    * new episode is labeled "enter-failure", not "still-failing" — a
    * recipient who never saw this episode's start must not get a
    * continuation message. Legacy persisted "failed" restores as
    * alerted (the old semantics). */
  val FailedUnalerted = "failed-unalerted"

  private def foldEvents(events: Iterator[RunEvent],
      init: Option[ThrottleState]): (Seq[Alert], ThrottleState) = {
    var st = init.getOrElse(ThrottleState(JobStatus.Success, Long.MinValue))
    val out = Seq.newBuilder[Alert]
    events.toSeq.sortBy(_.at.getTime).foreach { e =>
      if (e.failed) {
        val throttleMs = e.errorTimeoutMinutes * 60000L
        // sentinel MinValue = "never alerted" (subtraction would overflow)
        val due = st.lastAlertedAtMillis == Long.MinValue ||
          e.at.getTime - st.lastAlertedAtMillis >= throttleMs
        // "still-failing" ONLY when this episode's enter-failure was
        // actually delivered (status Failed = alerted); a suppressed
        // episode start labels its first delivered alert enter-failure
        val transition =
          if (st.status == JobStatus.Failed) "still-failing" else "enter-failure"
        if (due) {
          out += Alert(e.jobId, e.at, transition)
          st = ThrottleState(JobStatus.Failed, e.at.getTime)
        } else st = st.copy(status =
          if (st.status == JobStatus.Failed) JobStatus.Failed else FailedUnalerted)
      } else st = st.copy(status = JobStatus.Success)
    }
    (out.result(), st)
  }

  /** Driver-side replay with carried state (the StreamingRunner
    * foreachBatch path — input is already collected, bounded by monitor
    * count × windows per batch). State carries BOTH the throttle clock
    * and the job status — restoring only the clock would mislabel the
    * first post-recovery alert as 'still-failing'. Returns fired alerts
    * + updated per-job state. */
  def replay(events: Seq[RunEvent],
      init: Map[Long, ThrottleState]): (Seq[Alert], Map[Long, ThrottleState]) = {
    val byJob = events.groupBy(_.jobId)
    val outAlerts = Seq.newBuilder[Alert]
    val outState = Map.newBuilder[Long, ThrottleState]
    byJob.foreach { case (jobId, evs) =>
      val (alerts, st) = foldEvents(evs.iterator, init.get(jobId))
      outAlerts ++= alerts
      outState += jobId -> st
    }
    init.foreach { case (j, st) => if (!byJob.contains(j)) outState += j -> st }
    (outAlerts.result().sortBy(_.at.getTime), outState.result())
  }

  /** Batch mode: replay each job's runs in time order, emit the alerts
    * that pass the throttle. Parallel across jobs (one group per job —
    * state is driver-free). */
  def throttleBatch(events: Dataset[RunEvent]): Dataset[Alert] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.jobId).flatMapGroups { (_, it) =>
      foldEvents(it, None)._1.iterator
    }
  }

  /** Streaming mode: identical fold, state carried by Spark's state
    * store across micro-batches. */
  def throttleStream(events: Dataset[RunEvent]): Dataset[Alert] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.jobId)
      .flatMapGroupsWithState[ThrottleState, Alert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[RunEvent], state: GroupState[ThrottleState]) =>
          val (alerts, st) = foldEvents(it, state.getOption)
          state.update(st)
          alerts.iterator
      }
  }

  /** Parquet-backed throttle-state table (job_id → status + last-alerted
    * ms — both, so a post-recovery alert is labeled 'enter-failure'
    * across restarts). Bounded by monitor count — metadata scale. Shared
    * by the streaming runner and the scheduler so a job alerted by one
    * path stays throttled on the other. */
  /** JVM-global lock for the load→replay→save cycle over the shared
    * state table: the streaming runner and the scheduler both advertise
    * the same path, and interleaved cycles would lose throttle updates
    * (or overwrite mid-read). Callers hold this around the WHOLE cycle.
    * Scope honesty: a JVM lock serializes the single-driver deployment
    * this library targets; two separate driver JVMs sharing one path
    * would need a storage-level lease. */
  val stateTableLock = new Object

  def loadStateTable(spark: SparkSession,
      path: String): Map[Long, ThrottleState] = {
    // only a MISSING table reads as empty; an IO/corruption error must
    // propagate — swallowing it reset every job's throttle clock to
    // "never alerted" and the next save persisted the wiped state
    // (alert storm on a transient storage hiccup)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Map.empty
    else spark.read.parquet(path).collect()
      .map(r => r.getLong(0) -> ThrottleState(r.getString(1), r.getLong(2)))
      .toMap
  }

  def saveStateTable(spark: SparkSession, path: String,
      st: Map[Long, ThrottleState]): Unit = {
    import spark.implicits._
    st.toSeq.map { case (j, s) => (j, s.status, s.lastAlertedAtMillis) }
      .toDF("job_id", "status", "last_alerted_ms")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Route an alert to its channels — parse `alert_keys`
    * (reference db/schema.rb:59) prefixes. Side-effecting sink, kept
    * out of the plan; the default "log:" channel just returns the
    * formatted line. */
  def route(alertKeys: Seq[String], alert: Alert): Seq[(String, String)] = {
    val msg = s"[job ${alert.jobId}] ${alert.transition} at ${alert.at}"
    val keys = if (alertKeys.isEmpty) Seq("log:") else alertKeys
    keys.map { k =>
      val channel = k.takeWhile(_ != ':')
      channel match {
        case "mailto" | "pagerduty" | "campfire" | "log" => (channel, msg)
        case other => ("log", s"(unknown channel '$other') $msg")
      }
    }
  }
}
