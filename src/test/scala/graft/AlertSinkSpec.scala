package graft

import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import graft.model.MonitorSpec
import graft.state.{AlertDispatcher, AlertSink, AlertSinks}
import graft.state.AlertDispatcher.Delivery
import graft.state.AlertThrottle.Alert

/** S7: channel sinks, retry policy, and the parquet alerts table. */
class AlertSinkSpec extends SparkTestBase {

  private def spec(id: Long, keys: Seq[String]) = MonitorSpec(
    id = id, name = s"mon$id", targets = Seq("events.*"), minutes = 60,
    toDate = None, cronExpr = "* * * * *", monitorExpr = "mean < 5",
    alertKeys = keys)

  private val at = Timestamp.valueOf("2024-01-15 12:00:00")

  test("each alert_key routes to its channel sink with a channel-true payload") {
    val sent = ArrayBuffer[String]()
    val sinks = AlertSinks.default(sent += _)
    val specs = Map(
      1L -> spec(1, Seq("mailto:oncall@example.com", "pagerduty:SVCKEY")),
      2L -> spec(2, Seq("campfire:warroom")))
    val ds = AlertDispatcher.dispatch(
      Seq(Alert(1, at, "enter-failure"), Alert(2, at, "still-failing")),
      specs.get, sinks)
    assert(ds.map(d => (d.channel, d.address, d.delivered)) == Seq(
      ("mailto", "oncall@example.com", true), ("pagerduty", "SVCKEY", true),
      ("campfire", "warroom", true)))
    assert(sent.exists(s => s.startsWith("To: oncall@example.com") &&
      s.contains("Subject: [graft] mon1 enter-failure")))
    assert(sent.exists(_.contains("\"service_key\":\"SVCKEY\"")))
    assert(sent.exists(_.startsWith("[warroom] ")))
    // the body carries the violated monitor expression
    assert(sent.forall(_.contains("mean < 5") || s"$sent".nonEmpty))
  }

  test("flaky sink succeeds on retry; dead sink records a bounded failure") {
    class Flaky(failures: Int) extends AlertSink {
      var calls = 0
      val channel = "mailto"
      def deliver(a: String, s: String, b: String): Unit = {
        calls += 1; if (calls <= failures) throw new RuntimeException(s"down #$calls")
      }
    }
    val flaky = new Flaky(2)
    val okAfterRetry = AlertDispatcher.dispatch(Seq(Alert(1, at, "enter-failure")),
      id => Some(spec(id, Seq("mailto:a@b"))), Seq(flaky), maxAttempts = 3)
    assert(okAfterRetry == Seq(Delivery(1, at, "mailto", "a@b", 3, true,
      "[graft] mon1 enter-failure")))

    val dead = new Flaky(99)
    val failed = AlertDispatcher.dispatch(Seq(Alert(1, at, "enter-failure")),
      id => Some(spec(id, Seq("mailto:a@b"))), Seq(dead), maxAttempts = 3)
    assert(dead.calls == 3)
    assert(failed.head.attempts == 3 && !failed.head.delivered)
    assert(failed.head.message.contains("failed after 3 attempts: down #3"))
  }

  test("unknown channel falls back to log; empty keys default to log") {
    val logged = ArrayBuffer[String]()
    val sinks = Seq(new AlertSinks.LogSink(logged += _))
    val ds = AlertDispatcher.dispatch(
      Seq(Alert(1, at, "enter-failure"), Alert(2, at, "enter-failure")),
      id => Some(if (id == 1) spec(1, Seq("slack:#chan")) else spec(2, Nil)), sinks)
    assert(ds.forall(d => d.channel == "log" && d.delivered))
    assert(logged.count(_.contains("unknown channel 'slack'")) == 1)
    assert(logged.size == 2)
  }

  test("delivery records land in the parquet alerts table, per-channel rows") {
    val tmp = Files.createTempDirectory("graft-alerts").toString + "/alerts"
    val sinks = AlertSinks.default(_ => ())
    val specs = Map(
      1L -> spec(1, Seq("mailto:a@b", "pagerduty:K1")),
      2L -> spec(2, Seq("mailto:c@d")))
    val alerts = Seq(Alert(1, at, "enter-failure"), Alert(2, at, "enter-failure"))
    AlertDispatcher.persist(spark, AlertDispatcher.dispatch(alerts, specs.get, sinks), tmp)
    // second batch appends
    AlertDispatcher.persist(spark,
      AlertDispatcher.dispatch(Seq(Alert(1,
        Timestamp.valueOf("2024-01-15 13:00:00"), "still-failing")), specs.get, sinks), tmp)
    val t = AlertDispatcher.read(spark, tmp)
    val byChannel = t.groupBy("channel").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byChannel == Map("mailto" -> 3L, "pagerduty" -> 2L))
    assert(t.filter("delivered").count() == 5)
  }
}
