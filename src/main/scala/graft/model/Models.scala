package graft.model

import java.sql.Timestamp

/** Core value types of the engine.
  *
  * The reference (livingsocial/rearview) models a monitor as a row of the
  * `jobs` table (reference db/schema.rb:50-69): N Graphite targets
  * (`metrics`), a lookback window (`minutes`), an optional backtest window
  * end (`to_date`), a cron schedule (`cron_expr`), a sandboxed predicate
  * (`monitor_expr`) and alert routing (`alert_keys`). We keep that shape
  * but make every piece a typed case class; series data is long-format
  * columnar `(metric, ts, value)` rather than Graphite JSON blobs.
  */

/** One datapoint of a series. `value` is nullable — Graphite emits None
  * for empty buckets and null-propagation rules are part of the operator
  * semantics (SURVEY §2.4). */
final case class Point(ts: Timestamp, value: Option[Double])

/** A named series (API-edge shape; the engine core stays long-format). */
final case class Series(metric: String, points: Seq[Point])

/** A monitor definition — the rearview `jobs` row, minus the Rails bits.
  * Reference: db/schema.rb:50-69. */
final case class MonitorSpec(
    id: Long,
    name: String,
    /** Graphite-style target expressions, one per line in the reference
      * (`jobs.metrics`, db/schema.rb:65). */
    targets: Seq[String],
    /** Lookback window in minutes (`jobs.minutes`, db/schema.rb:67). */
    minutes: Int,
    /** Window end for backtesting; None = "now" (`jobs.to_date`,
      * db/schema.rb:68). */
    toDate: Option[Timestamp],
    /** Crontab schedule (`jobs.cron_expr`, db/schema.rb:56). */
    cronExpr: String,
    /** Tier-1 safe monitor DSL replacing the reference's sandboxed Ruby
      * `monitor_expr` (db/schema.rb:66); see graft.dsl.MonitorDsl. */
    monitorExpr: String,
    /** Alert routes (`jobs.alert_keys`, db/schema.rb:59), e.g.
      * "mailto:a@b", "pagerduty:KEY", "log:". */
    alertKeys: Seq[String] = Nil,
    /** Re-alert suppression minutes (`jobs.error_timeout`,
      * db/schema.rb:61, default 60). */
    errorTimeoutMinutes: Int = 60,
    active: Boolean = true)

/** Job lifecycle status — mirrors the reference's state_machine states on
  * jobs.status (Gemfile.lock:167, db/schema.rb:57). */
object JobStatus {
  val Success = "success"
  val Failed = "failed"
  val Error = "error" // monitor itself crashed (bad DSL etc.)
  val Disabled = "disabled"
}

/** Result of one monitor evaluation over one window. */
final case class Verdict(
    jobId: Long,
    metric: String,
    windowEnd: Timestamp,
    observed: Option[Double],
    passed: Boolean,
    message: String)

/** One run's persisted record — plays the role of a `job_data` row
  * (reference db/schema.rb:29-36): JSON chart payload + status. */
final case class RunRecord(
    jobId: Long,
    windowEnd: Timestamp,
    status: String,
    dataJson: String)

/** One failure record — `job_errors` (reference db/schema.rb:38-48). */
final case class JobError(
    jobId: Long,
    at: Timestamp,
    message: String,
    status: String)

/** Alert-throttle state per job (ST5): reference keeps
  * `job_errors.last_alerted_at` (db/schema.rb:43) and suppresses re-fires
  * within `error_timeout` minutes. */
final case class AlertState(
    jobId: Long,
    status: String,
    lastAlertedAtMillis: Option[Long])
