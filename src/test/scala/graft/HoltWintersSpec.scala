package graft

import java.sql.Timestamp

import scala.util.Random

import graft.dsl.TargetLang
import graft.engine.Runner
import graft.model.MonitorSpec
import graft.series.HoltWinters
import graft.series.HoltWinters.{Pt, SeasonalParams}

/** A8: seasonal Holt-Winters — reconstruction property, aberration
  * spike detection, and reachability from a stored monitor string. */
class HoltWintersSpec extends SparkTestBase {
  import spark.implicits._

  private val period = 24
  private val base = Timestamp.valueOf("2024-01-15 00:00:00").getTime

  /** 10 seasons of a clean daily-shaped signal + seeded uniform noise. */
  private def signal(spikeAt: Option[Int] = None): Seq[(Int, Double, Double)] = {
    val rnd = new Random(7)
    (0 until period * 10).map { i =>
      val clean = 100.0 + 25.0 * math.sin(2 * math.Pi * i / period)
      val noise = (rnd.nextDouble() - 0.5) * 4.0
      val spike = if (spikeAt.contains(i)) 60.0 else 0.0
      (i, clean, clean + noise + spike)
    }
  }

  private val p = SeasonalParams(alpha = 0.1, beta = 0.0035, gamma = 0.3,
    period = period, z = 3.0)

  test("property: seeded seasonal signal is reconstructed within the band") {
    val sig = signal()
    val pts = sig.map { case (i, _, y) => (Pt(i * 60L, y), true) }
    val out = HoltWinters.smoothSeasonal(pts, p)
    // past warmup (5 seasons: seasonal slots seeded, dev EWMA converged)
    val settled = out.drop(period * 5)
    val cleanByT = sig.map { case (i, c, _) => i * 60L -> c }.toMap
    val mae = settled.map { case (pt, pred, _) =>
      math.abs(pred - cleanByT(pt.epochSec)) }.sum / settled.size
    assert(mae < 3.0, s"prediction drifted off the seasonal shape: mae=$mae")
    val within = settled.count { case (pt, pred, dev) =>
      math.abs(pt.value - pred) <= p.z * dev }
    assert(within.toDouble / settled.size >= 0.9,
      s"only $within/${settled.size} points inside the band")
  }

  test("aberration flags an injected spike and nothing else after warmup") {
    val spikeIdx = period * 7 + 5
    val df = signal(Some(spikeIdx)).map { case (i, _, y) =>
      ("m1", new Timestamp(base + i * 60000L), y)
    }.toDF("metric", "ts", "value")
    val ab = HoltWinters.aberration(df, p).collect()
      .map(r => (r.getTimestamp(1).getTime, r.getDouble(2))).toMap
    assert(ab(base + spikeIdx * 60000L) > 20.0) // spike of 60 vs band of ~±8
    val settledOthers = ab.filter { case (t, _) =>
      t >= base + period * 5 * 60000L && t != base + spikeIdx * 60000L }
    // non-spike excursions past the one-step-ahead band are small; a
    // monitor thresholds the aberration, so "false alarm" = a material
    // excursion, not an epsilon past the band edge
    val worstOther = settledOthers.values.map(math.abs).maxOption.getOrElse(0.0)
    assert(worstOther < 5.0,
      s"non-spike aberration $worstOther rivals the spike in ${settledOthers.size} points")
  }

  test("confidenceBands emits upper/lower series; null points learn nothing") {
    val rows = signal().map { case (i, _, y) =>
      ("m1", new Timestamp(base + i * 60000L),
        if (i % 17 == 3) null.asInstanceOf[java.lang.Double] else Double.box(y))
    }
    val df = rows.toDF("metric", "ts", "value")
    val bands = TargetLang.plan(s"holtWintersConfidenceBands(m1, 3, $period)", df)
    val got = bands.collect().map(r =>
      (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2)))
    assert(got.length == rows.length * 2)
    val upper = got.filter(_._1 == "holtWintersConfidenceUpper(m1)").map(x => x._2 -> x._3).toMap
    val lower = got.filter(_._1 == "holtWintersConfidenceLower(m1)").map(x => x._2 -> x._3).toMap
    assert(upper.keySet == lower.keySet)
    assert(upper.forall { case (t, u) => u >= lower(t) })
    // the band still tracks the seasonal swing (amplitude visible)
    val settled = upper.filter(_._1 >= base + period * 5 * 60000L).values
    assert(settled.max - settled.min > 30.0)
  }

  test("holtWintersForecast is exactly the confidence bands' midpoint") {
    val df = signal().map { case (i, _, y) =>
      ("m1", new Timestamp(base + i * 60000L), y) }.toDF("metric", "ts", "value")
    val fc = TargetLang.plan(s"holtWintersForecast(m1, 3, $period)", df)
      .collect().map(r => r.getTimestamp(1).getTime -> r.getDouble(2)).toMap
    val bands = TargetLang.plan(s"holtWintersConfidenceBands(m1, 3, $period)", df)
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2)))
    val upper = bands.filter(_._1 == "holtWintersConfidenceUpper(m1)").map(x => x._2 -> x._3).toMap
    val lower = bands.filter(_._1 == "holtWintersConfidenceLower(m1)").map(x => x._2 -> x._3).toMap
    assert(fc.keySet == upper.keySet)
    fc.foreach { case (t, p) =>
      assert(math.abs(p - (upper(t) + lower(t)) / 2) < 1e-9, s"at $t: $p") }
  }

  test("stored monitor string drives holtWintersAberration end-to-end") {
    val clean = signal().map { case (i, _, y) =>
      ("m1", new Timestamp(base + i * 60000L), y) }.toDF("metric", "ts", "value")
    val spec = MonitorSpec(
      id = 9, name = "anomaly", targets = Seq(s"holtWintersAberration(m1, 3, $period)"),
      minutes = period * 5 * 60, // reduce over the settled half only
      toDate = Some(new Timestamp(base + (period * 10 - 1) * 60000L)),
      cronExpr = "*/5 * * * *", monitorExpr = "max < 10 && min > -10")
    val verdicts = Runner.evaluate(spark, clean, spec,
      new Timestamp(base + (period * 10 - 1) * 60000L))
    assert(verdicts.nonEmpty && verdicts.forall(_.passed))
  }
}
