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
}
