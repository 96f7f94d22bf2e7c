package graft.engine

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{JobStatus, MonitorSpec, Verdict}
import graft.store.MetricSource

/** Monitor run orchestration — E1 (scheduled run) and E2 (interactive
  * test) from SURVEY §3, minus the Rails host.
  *
  * Pure-plan vs side-effect separation mirrors the reference's
  * `--no-alerts` split (reference Rakefile:4-7): [[evaluate]] is a pure
  * function of (source, spec, now) usable for backtests and UI tests;
  * [[persistRun]] appends the `job_data` / `job_errors` twins.
  * Verdict collect() is bounded by series count — never data volume.
  *
  * E1 runs ONE scan of the store per run: [[runOnce]] derives the
  * verdicts AND the chart payload from a single aggregation
  * ([[Planner.planWithPoints]]); the payload/error writes read only
  * driver-local rows. The hot path takes a [[MetricSource]] so the
  * window bounds reach the storage scan (PushedFilters), not a
  * post-conversion filter.
  */
object Runner {

  /** One chart point; `value` boxed because target functions
    * (transformNull inverses, align joins) can emit nulls. */
  final case class ChartPoint(ts: Timestamp, value: java.lang.Double)
  final case class ChartSeries(metric: String, points: Seq[ChartPoint])

  /** E2 / pure evaluation: verdict rows only, no side effects. */
  def evaluate(spark: SparkSession, source: MetricSource, spec: MonitorSpec,
      now: Timestamp): Seq[Verdict] = {
    val df = Planner.plan(spark, source, spec, now)
    toVerdicts(spec, df.columns, df.collect().toSeq)
  }

  def evaluate(spark: SparkSession, store: DataFrame, spec: MonitorSpec,
      now: Timestamp): Seq[Verdict] =
    evaluate(spark, MetricSource.ofFrame(store), spec, now)

  private def toVerdicts(spec: MonitorSpec, columns: Seq[String],
      rows: Seq[Row]): Seq[Verdict] = {
    val redCols = columns.filter(_.startsWith("red_")).sorted
    val firstRed = redCols.headOption.getOrElse("red_mean")
    rows.map { r =>
      val passed = !r.isNullAt(r.fieldIndex("passed")) && r.getBoolean(r.fieldIndex("passed"))
      Verdict(
        jobId = spec.id,
        metric = r.getString(r.fieldIndex("metric")),
        windowEnd = r.getTimestamp(r.fieldIndex("window_end")),
        observed = Option(r.get(r.fieldIndex(firstRed))).map(_.toString.toDouble),
        passed = passed,
        message = if (passed) "" else s"${spec.name}: ${spec.monitorExpr} violated")
    }
  }

  /** Overall job status from per-series verdicts: any failing series
    * fails the job (a raise in the reference's sandbox fails the run);
    * an empty series set is an error (bad target / no data). */
  def jobStatus(verdicts: Seq[Verdict]): String =
    if (verdicts.isEmpty) JobStatus.Error
    else if (verdicts.forall(_.passed)) JobStatus.Success
    else JobStatus.Failed

  /** E1 persistence: append one `job_data` row (JSON chart payload —
    * reference db/schema.rb:29-36) and, on failure, `job_errors` rows
    * (db/schema.rb:38-48). Both land in the standard partitioned layout
    * (`…/job_id=N/…`), but each run writes DIRECTLY into its own job's
    * partition directory rather than `partitionBy` at the table root:
    * the Hadoop committer stages under `<root>/_temporary/0/`, so two
    * jobs appending to the same root concurrently delete each other's
    * staging — writing per-job roots makes concurrent monitor runs
    * (different jobs; same-job overlap is scheduler-suppressed)
    * commit-safe with no driver lock. The chart rows are driver-local
    * (already collected by the run's single scan), so neither write
    * touches the store. */
  def persistRun(spark: SparkSession, spec: MonitorSpec, verdicts: Seq[Verdict],
      chart: Seq[ChartSeries], jobDataPath: String, jobErrorsPath: String): Unit = {
    import spark.implicits._
    val status = jobStatus(verdicts)
    val payload =
      (if (chart.isEmpty) spark.emptyDataset[ChartSeries] else chart.toDS()).toDF()
        .agg(to_json(collect_list(struct(col("metric"), col("points")))).as("chart"))
    // explicit timestamp type: on the empty-verdicts (error) path the
    // literal is null and an untyped lit(null) would be unwritable VOID
    val windowEnd = lit(verdicts.headOption.map(_.windowEnd).orNull)
      .cast(org.apache.spark.sql.types.TimestampType)
    val run = payload.select(
      windowEnd.as("window_end"),
      lit(status).as("status"),
      col("chart").as("data"))
    run.write.mode(SaveMode.Append).parquet(s"$jobDataPath/job_id=${spec.id}")

    if (status != JobStatus.Success) {
      verdicts.filterNot(_.passed).toDF()
        .select(col("windowEnd").as("at"), col("message"), lit(status).as("status"))
        .write.mode(SaveMode.Append).parquet(s"$jobErrorsPath/job_id=${spec.id}")
    }
  }

  /** E1: evaluate + persist + (throttled) alert rows. Returns verdicts.
    * Alert dispatch is a side-effecting sink fed by the returned rows —
    * deliberately OUT of the query plan (SURVEY §2.1 S7). */
  def runOnce(spark: SparkSession, source: MetricSource, spec: MonitorSpec,
      now: Timestamp, jobDataPath: String, jobErrorsPath: String): Seq[Verdict] = {
    val df = Planner.planWithPoints(spark, source, spec, now)
    val rows = df.collect().toSeq
    val verdicts = toVerdicts(spec, df.columns, rows)
    // Merge chart points per metric across targets (a metric matched by
    // two targets charts once), sorted by ts for a deterministic payload.
    val chart = rows
      .map { r =>
        val pts = r.getSeq[Row](r.fieldIndex("points")).map { p =>
          ChartPoint(p.getTimestamp(0), p.get(1).asInstanceOf[java.lang.Double])
        }
        (r.getString(r.fieldIndex("metric")), pts)
      }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (m, grps) =>
        ChartSeries(m, grps.flatMap(_._2).sortBy(_.ts.getTime)) }
    persistRun(spark, spec, verdicts, chart, jobDataPath, jobErrorsPath)
    verdicts
  }

  def runOnce(spark: SparkSession, store: DataFrame, spec: MonitorSpec,
      now: Timestamp, jobDataPath: String, jobErrorsPath: String): Seq[Verdict] =
    runOnce(spark, MetricSource.ofFrame(store), spec, now, jobDataPath, jobErrorsPath)

  /** E1 batched (the thousands-of-monitors cost model): K due jobs that
    * fire on the same tick share ONE scan of the store. The union of
    * their windows is scanned once and persisted; each job's plan then
    * clips its own (narrower) window from the cached slice — a filter
    * over in-memory columnar batches, not a second storage scan. Results
    * are identical to K independent [[runOnce]] calls (SchedulerSpec
    * proves verdict equality and the single source scan).
    *
    * The cached slice is window-bounded (the whole point of monitor
    * windows: KB-to-MB per job even at 100 TB of history), so pinning it
    * for the batch is safe. */
  def runBatch(spark: SparkSession, source: MetricSource, specs: Seq[MonitorSpec],
      now: Timestamp, jobDataPath: String, jobErrorsPath: String): Map[Long, Seq[Verdict]] = {
    if (specs.isEmpty) return Map.empty
    val bounds = specs.map { sp =>
      val until = sp.toDate.getOrElse(now)
      (until.getTime - sp.minutes * 60000L, until.getTime)
    }
    val clipped = source
      .scan(new Timestamp(bounds.map(_._1).min), new Timestamp(bounds.map(_._2).max))
      .persist()
    try
      specs.map { spec =>
        spec.id -> runOnce(spark, MetricSource.ofFrame(clipped), spec, now,
          jobDataPath, jobErrorsPath)
      }.toMap
    finally clipped.unpersist()
  }

  /** E3 read path: latest persisted run per job (O1). */
  def latestRuns(spark: SparkSession, jobDataPath: String): DataFrame = {
    val runs = spark.read.parquet(jobDataPath)
    runs.groupBy(col("job_id"))
      .agg(max_by(struct(col("window_end"), col("status"), col("data")),
        col("window_end")).as("r"))
      .select(col("job_id"), col("r.window_end").as("window_end"),
        col("r.status").as("status"), col("r.data").as("data"))
  }
}
