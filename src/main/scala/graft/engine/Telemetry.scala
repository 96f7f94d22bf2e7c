package graft.engine

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Engine self-telemetry (S8): the reference emitted statsd
  * counters/timers about itself (statsd-ruby, reference
  * Gemfile.lock:168). Spark-native equivalent: a
  * [[QueryExecutionListener]] capturing per-action wall time and
  * outcome; the sink is pluggable (in-memory here; statsd/JMX in a
  * deployment would consume [[drain]]).
  */
object Telemetry {

  /** `metrics`: the action's named `observe()` rows (e.g. the WARC
    * reader's excluded-record governance counters,
    * [[graft.ext.Warc.htmlResponses]]) flattened to metricName →
    * (column → value) — pipelines surface data-loss counts here
    * instead of losing them silently. */
  final case class Timing(funcName: String, durationNs: Long, failed: Boolean,
      metrics: Map[String, Map[String, Any]] = Map.empty)

  private val buf = new ConcurrentLinkedQueue[Timing]()

  private def observed(qe: QueryExecution): Map[String, Map[String, Any]] =
    try qe.observedMetrics.map { case (name, row) =>
      name -> row.schema.fieldNames.zipWithIndex
        .map { case (f, i) => f -> row.get(i) }.toMap
    }.toMap
    catch { case _: Throwable => Map.empty }

  private lazy val listener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      buf.add(Timing(funcName, durationNs, failed = false, observed(qe)))
    override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit =
      buf.add(Timing(funcName, 0L, failed = true, observed(qe)))
  }

  @volatile private var installed = false

  def install(spark: SparkSession): Unit = synchronized {
    if (!installed) { spark.listenerManager.register(listener); installed = true }
  }

  /** Snapshot + clear recorded timings. */
  def drain(): Seq[Timing] = {
    val out = Seq.newBuilder[Timing]
    var t = buf.poll()
    while (t != null) { out += t; t = buf.poll() }
    out.result()
  }
}
