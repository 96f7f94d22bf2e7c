package graft.series

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Holt-Winters-style smoothing and confidence bands (A8, tier-2):
  * Graphite offers holtWintersConfidenceBands/holtWintersAberration for
  * anomaly monitors. The recurrence is order-sensitive, so it cannot be
  * a commutative aggregate — it is implemented as a typed
  * [[Aggregator]] (the U1 tier-2 escape-hatch pattern: custom Scala
  * aggregation registered into the plan) that buffers the window's
  * points, sorts once, and folds.
  *
  * At 100 TB this is safe because it runs per (job, metric) over a
  * clipped monitor window (≤ thousands of points), never over raw
  * history — the buffer is bounded by the window, not the data.
  */
object HoltWinters {

  final case class Pt(epochSec: Long, value: Double)
  final case class Band(metric: String, epochSec: Long, value: Double,
      smoothed: Double, upper: Double, lower: Double, aberration: Double)

  /** Double-exponential (Holt) smoothing with additive deviation bands:
    * level+trend recurrence, deviation EWMA scaled to ±`z`·dev. */
  final case class Params(alpha: Double = 0.1, beta: Double = 0.05, z: Double = 3.0)

  def smooth(points: Seq[Pt], p: Params): Seq[(Pt, Double, Double)] = {
    if (points.isEmpty) return Nil
    val sorted = points.sortBy(_.epochSec)
    var level = sorted.head.value
    var trend = 0.0
    var dev = 0.0
    sorted.map { pt =>
      val pred = level + trend
      val err = pt.value - pred
      dev = p.alpha * math.abs(err) + (1 - p.alpha) * dev
      val newLevel = p.alpha * pt.value + (1 - p.alpha) * (level + trend)
      trend = p.beta * (newLevel - level) + (1 - p.beta) * trend
      level = newLevel
      (pt, level, dev)
    }
  }

  /** Triple-exponential (the "Winters" part): additive seasonal term
    * with a per-season-slot deviation EWMA — the model behind Graphite's
    * holtWintersConfidenceBands/holtWintersAberration. `period` is in
    * POINTS per season (Graphite uses one day of the series' step). */
  final case class SeasonalParams(alpha: Double = 0.1, beta: Double = 0.0035,
      gamma: Double = 0.1, period: Int = 1440, z: Double = 3.0)

  /** Per input point: (pt, prediction, deviation). Null-valued points
    * advance the prediction (level+trend walk forward) but leave the
    * smoothing state untouched, so a gap widens nothing and corrupts
    * nothing — §2.4 null discipline. Seasonal state is bootstrapped from
    * the first full period (mean-centred residuals); until one period
    * has passed the fold is plain Holt (no seasonal term), so short
    * windows degrade gracefully instead of garbage-cycling. */
  def smoothSeasonal(points: Seq[(Pt, Boolean)], p: SeasonalParams): Seq[(Pt, Double, Double)] = {
    if (points.isEmpty) return Nil
    val sorted = points.sortBy(_._1.epochSec)
    val m = math.max(1, p.period)
    val firstVals = sorted.iterator.filter(_._2).take(m).map(_._1.value).toSeq
    if (firstVals.isEmpty) return sorted.map { case (pt, _) => (pt, 0.0, 0.0) }
    val firstMean = firstVals.sum / firstVals.size
    val season = Array.fill(m)(0.0)
    val seasonSeen = Array.fill(m)(false)
    // classic HW init: first period's mean-centred residuals seed the
    // seasonal slots, so the seasonal term is live from t=0 instead of
    // fading in over 1/gamma seasons
    sorted.take(m).zipWithIndex.foreach { case ((pt, defined), idx) =>
      if (defined) { season(idx % m) = pt.value - firstMean; seasonSeen(idx % m) = true }
    }
    val dev = Array.fill(m)(0.0)
    var level = firstMean
    var trend = 0.0
    var i = 0
    sorted.map { case (pt, defined) =>
      val slot = i % m
      val s = if (seasonSeen(slot)) season(slot) else 0.0
      val pred = level + trend + s
      // one-step-ahead interval: the band at t uses the deviation known
      // BEFORE observing y_t, else a spike inflates its own band and
      // hides itself from holtWintersAberration
      val devBefore = dev(slot)
      if (defined) {
        val err = pt.value - pred
        dev(slot) = p.gamma * math.abs(err) + (1 - p.gamma) * dev(slot)
        val newLevel = p.alpha * (pt.value - s) + (1 - p.alpha) * (level + trend)
        trend = p.beta * (newLevel - level) + (1 - p.beta) * trend
        season(slot) = p.gamma * (pt.value - newLevel) + (1 - p.gamma) * s
        seasonSeen(slot) = true
        level = newLevel
      } else {
        // gap: drift forward, learn nothing
        level += trend
      }
      i += 1
      (pt, pred, devBefore)
    }
  }

  /** Aggregator: per-group (metric) collect → sort → fold → bands.
    * Buffer is the clipped window only (see scaladoc above). */
  def bandsAggregator(p: Params): Aggregator[Pt, List[Pt], Seq[(Long, Double, Double, Double)]] =
    new Aggregator[Pt, List[Pt], Seq[(Long, Double, Double, Double)]] {
      def zero: List[Pt] = Nil
      def reduce(b: List[Pt], a: Pt): List[Pt] = a :: b
      def merge(a: List[Pt], b: List[Pt]): List[Pt] = a ::: b
      def finish(b: List[Pt]): Seq[(Long, Double, Double, Double)] =
        smooth(b, p).map { case (pt, lvl, dev) =>
          (pt.epochSec, lvl, lvl + p.z * dev, lvl - p.z * dev)
        }
      def bufferEncoder: Encoder[List[Pt]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Pt]]()
      def outputEncoder: Encoder[Seq[(Long, Double, Double, Double)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double, Double, Double)]]()
    }

  // -- long-format (metric, ts, value) surface ------------------------------

  import java.sql.Timestamp
  import org.apache.spark.sql.DataFrame

  private def folded(df: DataFrame, p: SeasonalParams)(
      emit: (String, Timestamp, Option[Double], Double, Double) => Iterator[(String, Timestamp, Option[Double])]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select("metric", "ts", "value").as[(String, Timestamp, Option[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (m, it) =>
        // buffer bounded by the clipped monitor window (see object scaladoc)
        val rows = it.toVector.sortBy(_._2.getTime)
        val pts = rows.map { case (_, ts, v) =>
          (Pt(ts.getTime / 1000L, v.getOrElse(0.0)), v.isDefined)
        }
        smoothSeasonal(pts, p).iterator.zip(rows.iterator).flatMap {
          case ((_, pred, dev), (_, ts, v)) => emit(m, ts, v, pred, dev)
        }
      }
      .toDF("metric", "ts", "value")
  }

  /** Graphite `holtWintersConfidenceBands(series)`: two derived series
    * per input metric, `holtWintersConfidenceUpper(m)` / `...Lower(m)`,
    * at prediction ± z·deviation. Runs as one shuffle on metric; the
    * per-group fold is window-bounded. */
  def confidenceBands(df: DataFrame, p: SeasonalParams): DataFrame =
    folded(df, p) { (m, ts, _, pred, dev) =>
      Iterator(
        (s"holtWintersConfidenceUpper($m)", ts, Some(pred + p.z * dev): Option[Double]),
        (s"holtWintersConfidenceLower($m)", ts, Some(pred - p.z * dev): Option[Double]))
    }

  /** Graphite `holtWintersForecast(series)`: the one-step-ahead
    * prediction series itself — the bands' midpoint, emitted at every
    * input point (gaps included: the level+trend walk still predicts). */
  def forecast(df: DataFrame, p: SeasonalParams): DataFrame =
    folded(df, p) { (m, ts, _, pred, _) =>
      Iterator((s"holtWintersForecast($m)", ts, Some(pred): Option[Double]))
    }

  /** Graphite `holtWintersAberration(series)`: signed distance outside
    * the confidence band, 0.0 inside (null points stay null). */
  def aberration(df: DataFrame, p: SeasonalParams): DataFrame =
    folded(df, p) { (m, ts, v, pred, dev) =>
      val out = v.map { x =>
        val upper = pred + p.z * dev
        val lower = pred - p.z * dev
        if (x > upper) x - upper else if (x < lower) x - lower else 0.0
      }
      Iterator((s"holtWintersAberration($m)", ts, out))
    }
}
