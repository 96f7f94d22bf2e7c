package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model.MonitorSpec
import graft.streaming.StreamingRunner

class StreamingRunnerSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  private val spec = MonitorSpec(
    id = 42, name = "stream-mon", targets = Seq("m.a"), minutes = 10,
    toDate = None, cronExpr = "*/5 * * * *", monitorExpr = "mean > 100",
    errorTimeoutMinutes = 60)

  test("ST2-ST5 end-to-end: sliding windows close on watermark, alerts throttle across batches") {
    val tmp = Files.createTempDirectory("graft-sr").toString
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Timestamp, Double)]
    val stream = ms.toDF().toDF("metric", "ts", "value")

    def run(): Unit = {
      val q = StreamingRunner.start(spark, stream, spec, slide = "5 minutes",
        s"$tmp/alerts", s"$tmp/state", s"$tmp/ckpt")
      q.awaitTermination()
    }
    def alerts(): Seq[Timestamp] =
      try spark.read.parquet(s"$tmp/alerts").select("at").collect()
        .map(_.getTimestamp(0)).toSeq.sorted
      catch { case _: Exception => Nil }

    // batch 1: minutes 0..30, all failing (value 1 ⇒ mean ≤ 100)
    ms.addData((0 to 30).map(m => ("m.a", ts(m), 1.0)))
    run()
    assert(alerts().size == 1, s"first failing window alerts once, got ${alerts()}")

    // batch 2: minutes 31..60 still failing — inside error_timeout ⇒ throttled
    ms.addData((31 to 60).map(m => ("m.a", ts(m), 1.0)))
    run()
    assert(alerts().size == 1, "re-fire suppressed within error_timeout")

    // batch 3: minutes 61..90 still failing — timeout expired ⇒ exactly one more
    ms.addData((61 to 90).map(m => ("m.a", ts(m), 1.0)))
    run()
    val a = alerts()
    assert(a.size == 2, s"one re-alert after timeout, got $a")
    assert(a(1).getTime - a(0).getTime >= 60 * 60000L)
  }

  test("streaming alerts deliver through channel sinks into the delivery table") {
    val tmp = Files.createTempDirectory("graft-sr-d").toString
    implicit val sqlCtx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Timestamp, Double)]
    val stream = ms.toDF().toDF("metric", "ts", "value")
    val routed = spec.copy(id = 43,
      alertKeys = Seq("mailto:oncall@example.com", "pagerduty:KEY"))
    val sent = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val sinks = graft.state.AlertSinks.default(sent.add(_))

    ms.addData((0 to 30).map(m => ("m.a", ts(m), 1.0))) // failing windows
    val q = StreamingRunner.start(spark, stream, routed, slide = "5 minutes",
      s"$tmp/alerts", s"$tmp/state", s"$tmp/ckpt",
      sinks = sinks, deliveryPath = Some(s"$tmp/deliveries"))
    q.awaitTermination()

    val d = spark.read.parquet(s"$tmp/deliveries")
    val byChannel = d.groupBy("channel").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // one throttled alert × two alert_keys
    assert(byChannel == Map("mailto" -> 1L, "pagerduty" -> 1L), byChannel.toString)
    assert(d.filter("delivered").count() == 2)
    assert(sent.size == 2)
  }
}
