package graft.engine

import java.sql.Timestamp
import java.time.Instant
import java.util.concurrent.{ConcurrentHashMap, ExecutorService, Executors, TimeUnit}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{SaveMode, SparkSession}

import graft.dsl.Cron
import graft.model.{JobStatus, MonitorSpec}
import graft.store.MetricSource

/** ST1 stage 1 / E1: the scheduler daemon. The reference boots a
  * celluloid actor scheduler alongside the app (reference Rakefile:4-7
  * `--no-preload --no-alerts`; celluloid in Gemfile.lock:160) that scans
  * active jobs (`jobs.active`, db/schema.rb:54), fires every job whose
  * `next_run` (db/schema.rb:62) is due, and advances `next_run` from the
  * job's `cron_expr`.
  *
  * Spark-native shape: ONE driver-side loop, bounded worker pool. Each
  * due job's run is a single Catalyst plan ([[Runner.runOnce]]) submitted
  * from its worker thread under a named FAIR scheduler pool, so N
  * concurrent monitor runs share the cluster fairly instead of FIFO
  * head-of-line blocking (the host session should set
  * `spark.scheduler.mode=FAIR`; the pool name is a thread-local property,
  * which is the public Spark mechanism for per-job pools). Job *state* is
  * driver-memory (monitor count ≈ thousands, metadata-sized) with a
  * parquet save/load twin for cross-restart parity with the reference's
  * DB-persisted `next_run`.
  *
  * Overlap rule: a firing that comes due while the same job's previous
  * run is still executing is SKIPPED (counted, `next_run` still
  * advances) — same effect as the reference's one-actor-per-job model,
  * and the right call at scale: queueing monitor windows behind a slow
  * run only amplifies lag, and the next run re-reads the freshest window
  * anyway.
  */
final class Scheduler(
    runJob: (MonitorSpec, Timestamp) => String,
    parallelism: Int = 4,
    spark: Option[SparkSession] = None,
    fairPool: String = "monitors",
    /** When set, a tick's whole due set is evaluated as ONE batch (one
      * shared scan of the store — [[Runner.runBatch]]): the cost model
      * for thousands of same-schedule monitors. Per-job dispatch remains
      * the default and the fallback for single-job ticks. */
    runBatch: Option[(Seq[MonitorSpec], Timestamp) => Map[Long, String]] = None) {

  /** Mutable per-job slot. `running` guards overlap; `nextRun` is the
    * only schedule state (None = inactive or unschedulable cron). */
  private final class Slot(@volatile var spec: MonitorSpec) {
    @volatile var nextRun: Option[Instant] = None
    @volatile var running: Boolean = false
    @volatile var lastStatus: String = ""
    @volatile var lastRunAt: Option[Instant] = None
    var fired: Long = 0L
    var skipped: Long = 0L
  }

  private val slots = new ConcurrentHashMap[Long, Slot]()
  private val pool: ExecutorService = Executors.newFixedThreadPool(parallelism)
  private val inFlight = new java.util.concurrent.Phaser(1) // self-registered

  /** Register (or replace) a job; schedule its first firing strictly
    * after `now`. */
  def register(spec: MonitorSpec, now: Instant): Unit = {
    val s = new Slot(spec)
    if (spec.active) s.nextRun = Cron.parse(spec.cronExpr).nextAfter(now)
    slots.put(spec.id, s)
  }

  def deactivate(jobId: Long): Unit = {
    val s = slots.get(jobId)
    if (s != null) { s.spec = s.spec.copy(active = false); s.nextRun = None }
  }

  /** One scheduler beat at (virtual or wall) time `now`: fire every due
    * job, skip due-but-still-running ones, advance `next_run` either
    * way. Returns (fired, skipped) job ids, fired in deterministic id
    * order (the pool bounds actual concurrency). */
  def tick(now: Instant): (Seq[Long], Seq[Long]) = {
    val fired = Seq.newBuilder[Long]
    val skipped = Seq.newBuilder[Long]
    val toRun = Seq.newBuilder[Slot]
    slots.asScala.toSeq.sortBy(_._1).foreach { case (id, s) =>
      val due = s.spec.active && s.nextRun.exists(!_.isAfter(now))
      if (due) {
        // advance past `now` regardless of outcome: a slow or skipped
        // run must not freeze the schedule
        s.nextRun = Cron.parse(s.spec.cronExpr).nextAfter(now)
        if (s.running) { s.skipped += 1; skipped += id }
        else {
          s.running = true
          s.fired += 1
          fired += id
          toRun += s
        }
      }
    }
    val due = toRun.result()
    val fireAt = Timestamp.from(now)
    runBatch match {
      case Some(batch) if due.size > 1 =>
        // same-tick jobs share one scan: a single pool task evaluates
        // the whole set (intra-batch parallelism lives inside Spark)
        inFlight.register()
        pool.execute { () =>
          try {
            spark.foreach(_.sparkContext.setLocalProperty("spark.scheduler.pool", fairPool))
            val statuses =
              try batch(due.map(_.spec), fireAt)
              catch { case scala.util.control.NonFatal(_) =>
                due.map(_.spec.id -> JobStatus.Error).toMap }
            due.foreach { s =>
              s.lastStatus = statuses.getOrElse(s.spec.id, JobStatus.Error)
              s.lastRunAt = Some(now)
            }
          } finally {
            due.foreach(_.running = false)
            inFlight.arriveAndDeregister()
          }
        }
      case _ =>
        due.foreach { s =>
          inFlight.register()
          pool.execute { () =>
            try {
              // name the FAIR pool for every Spark job this run submits
              spark.foreach(_.sparkContext.setLocalProperty("spark.scheduler.pool", fairPool))
              val status =
                try runJob(s.spec, fireAt)
                catch { case scala.util.control.NonFatal(_) => JobStatus.Error }
              s.lastStatus = status
              s.lastRunAt = Some(now)
            } finally {
              s.running = false
              inFlight.arriveAndDeregister()
            }
          }
        }
    }
    (fired.result(), skipped.result())
  }

  /** Block until every dispatched run has finished (test/shutdown aid). */
  def awaitIdle(): Unit = inFlight.arriveAndAwaitAdvance()

  /** Wall-clock daemon loop: tick, then sleep until the earliest
    * `next_run` (capped so newly-registered jobs are noticed). Runs
    * until `until` passes or the thread is interrupted. */
  def runLoop(until: Instant, maxSleepMillis: Long = 10000L): Unit = {
    try {
      var now = Instant.now()
      while (now.isBefore(until) && !Thread.currentThread().isInterrupted) {
        tick(now)
        val wake = slots.asScala.values.flatMap(_.nextRun).minOption.getOrElse(until)
        val ms = math.min(maxSleepMillis,
          math.max(50L, java.time.Duration.between(Instant.now(), wake).toMillis))
        Thread.sleep(ms)
        now = Instant.now()
      }
    } catch { case _: InterruptedException => () }
  }

  def shutdown(): Unit = { pool.shutdown(); pool.awaitTermination(30, TimeUnit.SECONDS) }

  final case class JobSnapshot(jobId: Long, nextRun: Option[Instant], running: Boolean,
      lastStatus: String, fired: Long, skipped: Long)

  def snapshot: Seq[JobSnapshot] =
    slots.asScala.toSeq.sortBy(_._1).map { case (id, s) =>
      JobSnapshot(id, s.nextRun, s.running, s.lastStatus, s.fired, s.skipped)
    }

  /** Persist `next_run` per job (the reference keeps it in the jobs
    * table, db/schema.rb:62) so a restarted scheduler resumes the same
    * schedule instead of re-deriving "next after boot". */
  def saveState(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    slots.asScala.toSeq
      .map { case (id, s) => (id, s.nextRun.map(_.toEpochMilli): Option[Long]) }
      .toDF("job_id", "next_run_millis")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  def loadState(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    spark.read.parquet(path).as[(Long, Option[Long])].collect().foreach {
      case (id, next) =>
        val s = slots.get(id)
        // apply only a CONCRETE persisted fire time to active jobs: a
        // persisted None means the job was inactive at save time, and
        // clobbering a freshly-registered active job's computed nextRun
        // with it would freeze the job forever (tick only advances
        // slots that have a nextRun)
        if (s != null && s.spec.active && next.isDefined)
          s.nextRun = next.map(Instant.ofEpochMilli)
    }
  }
}

object Scheduler {

  /** Production wiring: due jobs run [[Runner.runOnce]] against the
    * windowed metric source (bounds → PushedFilters) and persist the
    * job_data / job_errors twins. */
  def forSource(spark: SparkSession, source: MetricSource,
      jobDataPath: String, jobErrorsPath: String,
      parallelism: Int = 4): Scheduler =
    new Scheduler(
      runJob = (spec, fireAt) =>
        Runner.jobStatus(Runner.runOnce(spark, source, spec, fireAt, jobDataPath, jobErrorsPath)),
      parallelism = parallelism,
      spark = Some(spark),
      runBatch = Some((specs, fireAt) =>
        Runner.runBatch(spark, source, specs, fireAt, jobDataPath, jobErrorsPath)
          .map { case (id, vs) => id -> Runner.jobStatus(vs) }))

  /** Full E1 loop (reference stages 1-5): run → persist → throttle →
    * deliver. The throttle clock lives in the same parquet state table
    * the streaming runner uses ([[graft.state.AlertThrottle
    * .loadStateTable]]), so a job alerted by either path stays throttled
    * on both. State I/O is serialized driver-side (monitor-count rows —
    * the lock guards a metadata table, never data-scale work). */
  def forSourceWithAlerts(spark: SparkSession, source: MetricSource,
      jobDataPath: String, jobErrorsPath: String,
      alertStatePath: String, deliveryPath: String,
      sinks: Seq[graft.state.AlertSink],
      parallelism: Int = 4): Scheduler = {
    import graft.state.{AlertDispatcher, AlertThrottle}
    // ONE load→replay→save cycle for a whole cohort of events, under
    // the JVM-GLOBAL state-table lock (AlertThrottle.stateTableLock —
    // the streaming runner shares the same table, and a per-instance
    // lock could not stop the two paths interleaving and losing
    // whichever update saved first). Batching also matters on its own:
    // the per-spec form did a full parquet read+overwrite of the state
    // table once PER SPEC per tick — a 500-monitor cohort paid 1000
    // serialized state-I/O jobs where one replay over all K events has
    // identical semantics (AlertThrottle.replay already folds per job).
    def throttleAndDeliverAll(specsWithStatus: Seq[(MonitorSpec, String)],
        fireAt: Timestamp): Unit = {
      val events = specsWithStatus.map { case (spec, status) =>
        AlertThrottle.RunEvent(spec.id, fireAt,
          failed = status != JobStatus.Success, spec.errorTimeoutMinutes)
      }
      if (events.nonEmpty) {
        val byId = specsWithStatus.map { case (sp, _) => sp.id -> sp }.toMap
        AlertThrottle.stateTableLock.synchronized {
          val init = AlertThrottle.loadStateTable(spark, alertStatePath)
          val (alerts, newState) = AlertThrottle.replay(events, init)
          if (alerts.nonEmpty) {
            val deliveries = AlertDispatcher.dispatch(alerts, byId.get, sinks)
            AlertDispatcher.persist(spark, deliveries, deliveryPath)
          }
          AlertThrottle.saveStateTable(spark, alertStatePath, newState)
        }
      }
    }
    new Scheduler(
      runJob = (spec, fireAt) => {
        val verdicts = Runner.runOnce(spark, source, spec, fireAt, jobDataPath, jobErrorsPath)
        val status = Runner.jobStatus(verdicts)
        throttleAndDeliverAll(Seq(spec -> status), fireAt)
        status
      },
      parallelism = parallelism,
      spark = Some(spark),
      runBatch = Some((specs, fireAt) => {
        val results = Runner.runBatch(spark, source, specs, fireAt, jobDataPath, jobErrorsPath)
        val statuses = specs.map(spec =>
          spec -> Runner.jobStatus(results.getOrElse(spec.id, Nil)))
        throttleAndDeliverAll(statuses, fireAt)
        statuses.map { case (sp, st) => sp.id -> st }.toMap
      }))
  }
}
