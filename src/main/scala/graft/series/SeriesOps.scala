package graft.series

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The series-function library — the operator surface a rearview monitor
  * could use inside a `metrics` target (SURVEY §2.4-2.7: the Graphite
  * target-function language the reference delegates to, reference
  * README.md:6) re-expressed as declarative DataFrame transforms.
  *
  * Data shape: long-format `(metric: String, ts: Timestamp, value:
  * Double?)`. Per-series = `partitionBy(metric)`; cross-series combine =
  * `groupBy(ts)`. All ops are pure `DataFrame => DataFrame` (or Column)
  * transforms, so Catalyst handles pushdown/pruning/codegen and every op
  * distributes: nothing here collects to the driver.
  *
  * Null rule (SURVEY §2.4): Graphite skips None points in combines and
  * reductions — Spark aggregates already ignore nulls, so the built-ins
  * carry the exact semantics. Division by zero yields null (Graphite
  * yields None), encoded in [[divideSafe]].
  *
  * Scale note: per-series window functions shuffle once on `metric` and
  * sort within partitions; at 100 TB the metric store is stored
  * partitioned/sorted by `(metric, ts)` (SURVEY §4.4) so these become
  * sort-free. Cross-series combines shuffle on the (high-cardinality)
  * `ts` key and use partial aggregation map-side.
  */
object SeriesOps {

  /** Per-series, time-ordered frame — the heart of W1-W6. */
  def seriesWindow: WindowSpec = Window.partitionBy("metric").orderBy("ts")

  /** Exact, order-independent sum: doubles summed as decimals so results
    * are reproducible across engines/partitionings (used by the oracle
    * gate; also the right call at 100 TB where partition order is
    * nondeterministic). Scale 6 is lossless for the testdata's 2-decimal
    * values. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast("double")

  /** Exact mean = exact decimal sum / count — deterministic double. */
  def dmean(c: Column): Column = dsum(c) / count(c)

  // ---------------------------------------------------------------------
  // W1-W6: per-series ordered transforms (Graphite moving*/derivative/...)
  // ---------------------------------------------------------------------

  private def trailing(n: Int): WindowSpec =
    seriesWindow.rowsBetween(-(n - 1), 0)

  /** movingAverage(series, n) — trailing n-point mean. Implemented as
    * exact-sum/count so the result is partition-order independent. */
  def movingAverage(n: Int, c: Column = col("value")): Column =
    sum(c.cast(DecimalType(18, 6))).over(trailing(n)).cast("double") /
      count(c).over(trailing(n))

  def movingSum(n: Int, c: Column = col("value")): Column =
    sum(c.cast(DecimalType(18, 6))).over(trailing(n)).cast("double")

  def movingMax(n: Int, c: Column = col("value")): Column = max(c).over(trailing(n))
  def movingMin(n: Int, c: Column = col("value")): Column = min(c).over(trailing(n))

  def movingMedian(n: Int, c: Column = col("value")): Column =
    percentile_approx(c, lit(0.5), lit(10000)).over(trailing(n))

  /** stdev(series, n) — trailing n-point sample stddev (W6). */
  def movingStddev(n: Int, c: Column = col("value")): Column =
    stddev_samp(c).over(trailing(n))

  /** Time-window trailing frame: RANGE over epoch seconds, [t-sec, t]
    * inclusive — Graphite's movingAverage(series, "10min") form, which
    * windows by TIME rather than point count so gappy series don't
    * stretch the lookback. Mirrors SQL `RANGE BETWEEN INTERVAL
    * PRECEDING AND CURRENT ROW`. */
  private def trailingTime(seconds: Long): WindowSpec =
    Window.partitionBy("metric").orderBy(unix_timestamp(col("ts")))
      .rangeBetween(-seconds, 0)

  /** moving*(series, "10min") — the time-window twin of the n-point
    * family; same exact-decimal discipline. */
  def movingAggTime(how: String, seconds: Long, c: Column = col("value")): Column = {
    val w = trailingTime(seconds)
    how match {
      case "avg" => sum(c.cast(DecimalType(18, 6))).over(w).cast("double") / count(c).over(w)
      case "sum" => sum(c.cast(DecimalType(18, 6))).over(w).cast("double")
      case "max" => max(c).over(w)
      case "min" => min(c).over(w)
      case "median" => percentile_approx(c, lit(0.5), lit(10000)).over(w)
      case "stddev" => stddev_samp(c).over(w)
      case other => throw new IllegalArgumentException(s"movingAggTime: $other")
    }
  }

  /** exponentialMovingAverage(series, n) — EMA with α = 2/(n+1),
    * seeded at the FIRST VALUE (the standard streaming seed). Stated
    * deviation from Graphite: graphite-web seeds with the mean of a
    * prefetched first window (it fetches n extra points from BEFORE the
    * visible range); this engine evaluates over the clipped window with
    * no prefetch, so the first-value seed is used and the difference
    * against Graphite decays by (1−α)^k into the window. The recurrence
    * is order-sensitive so it cannot be a window aggregate; same
    * per-series fold shape as HoltWinters (one shuffle on metric,
    * buffer bounded by the clipped window). Null points emit null and
    * leave the EMA state untouched. */
  def exponentialMovingAverage(df: DataFrame, n: Double): DataFrame = {
    val alpha = 2.0 / (n + 1.0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select("metric", "ts", "value")
      .as[(String, java.sql.Timestamp, Option[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (m, it) =>
        val rows = it.toVector.sortBy(_._2.getTime)
        var ema = Option.empty[Double]
        rows.iterator.map { case (_, ts, v) =>
          val out = v.map { x =>
            val e = ema.fold(x)(prev => alpha * x + (1 - alpha) * prev)
            ema = Some(e)
            e
          }
          (m, ts, out)
        }
      }
      .toDF("metric", "ts", "value")
  }

  /** timeSlice(series, from, until) — keep points inside the range
    * (inclusive); Graphite's window-within-a-window. */
  def timeSlice(df: DataFrame, from: java.sql.Timestamp,
      until: java.sql.Timestamp): DataFrame =
    df.filter(col("ts") >= lit(from) && col("ts") <= lit(until))

  /** derivative(series) — point-to-point delta (W2). First point null. */
  def derivative(c: Column = col("value")): Column =
    c - lag(c, 1).over(seriesWindow)

  /** nonNegativeDerivative — counter-reset (negative delta) → null,
    * matching Graphite's counter-wrap semantics. */
  def nonNegativeDerivative(c: Column = col("value")): Column = {
    val d = derivative(c)
    when(d < 0, lit(null)).otherwise(d)
  }

  /** perSecond(series) — derivative divided by the step between points. */
  def perSecond(c: Column = col("value"), ts: Column = col("ts")): Column = {
    val dv = derivative(c)
    val dt = unix_timestamp(ts) - lag(unix_timestamp(ts), 1).over(seriesWindow)
    when(dt > 0, dv / dt).otherwise(lit(null))
  }

  /** nonNegativeDerivative(series, maxValue) — counter-wrap recovery:
    * a negative delta on a counter with known ceiling means the counter
    * wrapped, so the true delta is `delta + maxValue + 1` (Graphite's
    * rule). Without maxValue, wraps stay null ([[nonNegativeDerivative]]). */
  def nonNegativeDerivativeWrap(maxValue: Double, c: Column = col("value")): Column = {
    val d = derivative(c)
    when(d >= 0, d).otherwise(
      when(d.isNotNull, d + lit(maxValue) + lit(1.0)))
  }

  /** delay(series, steps) — shift values N points later in the series
    * (Graphite's delay); the first `steps` points become null. */
  def delay(steps: Int, c: Column = col("value")): Column =
    lag(c, steps).over(seriesWindow)

  /** integralByInterval(series, interval) — cumulative sum that resets
    * at each interval boundary (W3 variant): the running-sum window is
    * partitioned by the bucket as well as the metric. */
  def integralByInterval(df: DataFrame, step: String): DataFrame =
    df.withColumn("value",
      sum(col("value").cast(DecimalType(18, 6)))
        .over(Window.partitionBy(col("metric"), window(col("ts"), step))
          .orderBy("ts").rowsBetween(Window.unboundedPreceding, 0))
        .cast("double"))

  /** integral(series) — running cumulative sum (W3). */
  def integral(c: Column = col("value")): Column =
    sum(c.cast(DecimalType(18, 6)))
      .over(seriesWindow.rowsBetween(Window.unboundedPreceding, 0))
      .cast("double")

  /** keepLastValue(series) — forward-fill nulls from the last non-null
    * point (W4). */
  def keepLastValue(c: Column = col("value")): Column =
    last(c, ignoreNulls = true)
      .over(seriesWindow.rowsBetween(Window.unboundedPreceding, 0))

  /** transformNull(series, v) — replace nulls with a constant (W4). */
  def transformNull(v: Double, c: Column = col("value")): Column =
    coalesce(c, lit(v))

  /** timeShift(series, interval) — move the series forward in time so it
    * aligns with a later window (W5/J3; the canonical week-over-week
    * rearview monitor). */
  def timeShift(df: DataFrame, interval: String): DataFrame =
    df.withColumn("ts", col("ts") + expr(s"INTERVAL $interval"))

  // ---------------------------------------------------------------------
  // A1-A3, A5: combines and re-bucketing
  // ---------------------------------------------------------------------

  /** Shared how→aggregate menu for the combine/group/summarize family —
    * ONE definition so accepted names and semantics cannot drift across
    * call sites (they had: groupByNode accepted "average" where
    * combineSeries did not; smartSummarize lacked last/count). `last`
    * is the value at the max non-null ts (deterministic — the bare
    * `last()` aggregate is partition-order dependent); `stddev` is
    * population (Graphite's safeStdDev divides by N). */
  private def aggFor(fn: String, how: String): Column = how match {
    case "sum" => dsum(col("value"))
    case "avg" | "average" => dmean(col("value"))
    case "min" => min(col("value"))
    case "max" => max(col("value"))
    case "last" => max_by(col("value"), when(col("value").isNotNull, col("ts")))
    case "count" => count(col("value")).cast("double")
    case "stddev" => stddev_pop(col("value"))
    case other => throw new IllegalArgumentException(s"$fn: unsupported aggregator '$other'")
  }

  /** 1-based `element_at` index for a 0-based Graphite path node:
    * negative nodes count from the END (-1 = last segment), exactly as
    * `element_at`'s own negative indexing — the naive `+ 1` shift made
    * node -1 throw and node ≤ -2 select the wrong segment. */
  private def nodeIdx(i: Int): Int = if (i >= 0) i + 1 else i

  /** sumSeries / averageSeries / minSeries / maxSeries — combine all
    * series in `df` point-wise into one named series (A1). Steps are
    * assumed aligned (bucket first via [[summarize]] otherwise). */
  def combineSeries(df: DataFrame, how: String, name: String): DataFrame =
    df.groupBy(col("ts")).agg(aggFor("combineSeries", how).as("value"))
      .select(lit(name).as("metric"), col("ts"), col("value"))

  /** groupByNode(seriesList, n, func) — combine series that share the
    * value of path node `n` (0-based, Graphite convention): the node
    * value becomes the output metric. One aggregate, map-side partials. */
  def groupByNode(df: DataFrame, n: Int, how: String): DataFrame =
    df.withColumn("metric", element_at(split(col("metric"), "\\."), nodeIdx(n)))
      .groupBy(col("metric"), col("ts"))
      .agg(aggFor("groupByNode", how).as("value"))

  /** groupByNodes(seriesList, func, *nodes) — combine series that agree
    * on ALL the listed path nodes (the multi-node [[groupByNode]]); the
    * kept nodes joined by '.' become the output metric. */
  def groupByNodes(df: DataFrame, how: String, nodes: Seq[Int]): DataFrame =
    df.withColumn("metric", aliasByNode(nodes))
      .groupBy(col("metric"), col("ts"))
      .agg(aggFor("groupByNodes", how).as("value"))

  /** sumSeriesWithWildcards / averageSeriesWithWildcards — combine
    * series whose names are identical AFTER deleting the dot-segments at
    * `positions` (0-based): the Graphite form for "sum over one varying
    * path node". The reduced name becomes the output metric; one hash
    * aggregate with map-side partials (same shape as [[groupByNode]]). */
  def aggregateWithWildcards(df: DataFrame, how: String, positions: Seq[Int]): DataFrame = {
    require(positions.nonEmpty, "aggregateWithWildcards: no positions")
    val parts = split(col("metric"), "\\.")
    // null out the dropped segments; array_join skips nulls. Negative
    // positions count from the end (normalized against the path length
    // — the raw sequence index would never match them, silently keeping
    // the segment).
    val kept = zip_with(parts, sequence(lit(0), size(parts) - 1),
      (p, i) => when(positions.map(n =>
          if (n >= 0) i === lit(n) else i === size(parts) + lit(n))
          .reduce(_ || _), lit(null)).otherwise(p))
    df.withColumn("metric", array_join(kept, "."))
      .groupBy(col("metric"), col("ts"))
      .agg(aggFor("aggregateWithWildcards", how).as("value"))
  }

  /** weightedAverage(seriesListAvg, seriesListWeight, *nodes) — pair the
    * two lists by the path nodes, then ONE output series whose value at
    * each ts is Σ(avg·weight)/Σ(weight) over the matched pairs (None
    * points skipped, §2.4). The pair join is on (node key, ts) — both
    * sides are already reduced series, so this shuffles series points,
    * not raw data. */
  def weightedAverage(avgs: DataFrame, weights: DataFrame, nodes: Seq[Int],
      name: String): DataFrame = {
    val a = avgs.select(aliasByNode(nodes).as("_k"), col("ts"), col("value").as("_va"))
    val w = weights.select(aliasByNode(nodes).as("_k"), col("ts"), col("value").as("_vw"))
    a.join(w, Seq("_k", "ts"))
      .groupBy(col("ts"))
      .agg((dsum(col("_va") * col("_vw")) / dsum(col("_vw"))).as("value"))
      .select(lit(name).as("metric"), col("ts"), col("value"))
  }

  /** linearRegression(series) — per-series ordinary-least-squares line,
    * evaluated at each point's ts. Pure window-aggregate arithmetic (no
    * fold, no collect): x is seconds since the series' first point
    * (fit values are translation-invariant, and the small x keeps
    * x·y / x² inside exact decimal/long range), sums are decimal-exact,
    * so the fitted doubles are partition-order independent — the same
    * determinism discipline as [[dsum]]. */
  def linearRegression(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("metric")
    val withX = df.withColumn("_x",
      unix_timestamp(col("ts")) - min(unix_timestamp(col("ts"))).over(w))
    val n = count(col("value")).over(w)
    // Σx and Σx² as DECIMAL: x is seconds from the series start, so a
    // year of minutely points puts Σx² near 1.7e20 — past Long range,
    // where the old long sums wrapped silently into garbage fits (and
    // sx·sx wrapped even earlier). Decimal keeps the arithmetic exact.
    val sx = sum(when(col("value").isNotNull,
      col("_x").cast(DecimalType(38, 0)))).over(w)
    val sy = sum(col("value").cast(DecimalType(18, 6))).over(w).cast("double")
    val sxx = sum(when(col("value").isNotNull,
      (col("_x") * col("_x")).cast(DecimalType(38, 0)))).over(w)
    val sxy = sum((col("_x").cast("double") * col("value")).cast(DecimalType(18, 6)))
      .over(w).cast("double")
    val denom = (n * sxx - sx * sx).cast("double")
    val slope = (n.cast("double") * sxy - sx.cast("double") * sy) / denom
    val intercept = (sy - slope * sx.cast("double")) / n.cast("double")
    withX
      .withColumn("value", when(denom =!= 0, intercept + slope * col("_x").cast("double")))
      .withColumn("metric", concat(lit("linearRegression("), col("metric"), lit(")")))
      .drop("_x")
  }

  /** summarize(series, step, func) — re-bucket each series to a coarser
    * step (A2). `step` is any Spark window duration ("1 hour", "5
    * minutes"). Bucket label = window start, matching Graphite. */
  def summarize(df: DataFrame, step: String, how: String = "sum"): DataFrame =
    df.groupBy(col("metric"), window(col("ts"), step).as("w"))
      .agg(aggFor("summarize", how).as("value"))
      .select(col("metric"), col("w.start").as("ts"), col("value"))

  /** hitcount(series, step) — integral per bucket: sum(value) × step
    * seconds (A3), converting a rate back to a count. */
  def hitcount(df: DataFrame, step: String, stepSeconds: Long): DataFrame =
    df.groupBy(col("metric"), window(col("ts"), step).as("w"))
      .agg((dsum(col("value")) * stepSeconds).as("value"))
      .select(col("metric"), col("w.start").as("ts"), col("value"))

  /** nPercentile(series, p) — one exact percentile scalar per series
    * (A5). Exact (interpolating) to match DuckDB's quantile_cont. */
  def nPercentile(df: DataFrame, p: Double): DataFrame =
    // one stage; group state bounded by the monitor clip. For unbounded
    // groups use [[exactPercentilesBucketed]] (same values, O(1) state).
    df.groupBy(col("metric"))
      .agg(percentile(col("value"), lit(p)).as("value"))

  /** Exact interpolated percentiles per key group WITHOUT a buffering
    * aggregate: Spark's `percentile` agg collects every value of a
    * group into one reducer-side buffer (serialized through the
    * shuffle), which is both the local constant factor (~4× measured on
    * the a5 gate) and the 100-TB risk (group state grows with data
    * volume). This form keeps values columnar: one window over
    * (keys, ORDER BY value) assigns `row_number` and the group size in
    * a single WindowExec, only the ≤2 boundary rows per percentile
    * survive the filter, and a metadata-sized agg interpolates
    * `lower + (higher − lower) · frac` — bit-identical to the
    * `percentile` aggregate (same formula) and to DuckDB's
    * quantile_cont. Group state through every exchange is O(1).
    *
    * `ps` maps output column name → fraction in [0, 1]. */
  def exactPercentiles(dfIn: DataFrame, keys: Seq[String], valueCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val df = dfIn.filter(col(valueCol).isNotNull) // percentile-agg null rule
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(valueCol))
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = df.select(keys.map(col) ++ Seq(col(valueCol),
      row_number().over(w).as("__rn"), count(lit(1)).over(wAll).as("__n")): _*)
    def pos(p: Double) = (col("__n") - 1) * p
    def loRn(p: Double) = floor(pos(p)).cast("long") + 1
    def hiRn(p: Double) = ceil(pos(p)).cast("long") + 1
    val needed = ps.map { case (_, p) =>
      col("__rn") === loRn(p) || col("__rn") === hiRn(p) }.reduce(_ || _)
    def interp(p: Double) = {
      val lo = max(when(col("__rn") === loRn(p), col(valueCol)))
      val hi = max(when(col("__rn") === hiRn(p), col(valueCol)))
      val posv = max(pos(p))
      // Spark's Percentile formula exactly (bit-for-bit): weighted form,
      // with the integral-position special case (the weighted form would
      // evaluate to 0 there)
      when(ceil(posv) === floor(posv), lo)
        .otherwise((ceil(posv) - posv) * lo + (posv - floor(posv)) * hi)
    }
    val aggs = ps.map { case (n, p) => interp(p).as(n) }
    ranked.filter(needed).groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Exact interpolated percentiles for MEGA-GROUPS — groups too large
    * for any single-reducer treatment. [[exactPercentiles]] (and the
    * `percentile` aggregate it replaces) still puts one whole group on
    * one reducer: the window form sorts the group in one partition, the
    * agg form buffers it in one hand. Fine when groups are bounded
    * (metric × day); a scale-killer when a handful of groups span the
    * corpus (the a4 monitor-reduction shape: one group per metric over
    * all time). This form applies the repo's critical-bucket discipline
    * ([[graft.ext.Sampling.topPerStratum]]) to rank selection, bucketing
    * on the value's IEEE-754 total-order key
    * ([[graft.functions.VectorExpressions.doubleOrderBits]]):
    *
    *  1. ONE corpus pass: per-(group, top-16-key-bits) counts + value
    *     min/max, checkpointed — a metadata frame (≤ 65536 buckets per
    *     group) that also yields the group counts, so no min/max or
    *     count prepass exists;
    *  2. the bucket holding each target rank falls out of a running sum
    *     over that frame; the per-target critical frame is COLLECTED
    *     (bounded by groups × 2·|ps|, never data volume), so refinement
    *     is a plan-time decision: a single-value bucket IS the answer,
    *     a small bucket pays the only per-row ranking window
    *     (partitioned by (group, bucket), never bare group), an
    *     oversized bucket RECURSES on the next 16 key bits — after at
    *     most 3 refinements the bucket is the full key, i.e. a single
    *     value, so convergence is structural, not distributional;
    *  3. the second and final corpus pass ranks the critical slivers
    *     and interpolates through metadata-sized joins.
    *
    * Values at the lo/hi ranks interpolate exactly as
    * [[exactPercentiles]] — the two agree bit-for-bit (spec-pinned,
    * ties/constants/singletons included). Null VALUES are skipped (the
    * percentile-aggregate rule); a group whose values are ALL null is
    * absent from the result (the aggregate would emit a null row —
    * the one divergence, shared with [[exactPercentiles]]). */
  def exactPercentilesBucketed(dfIn: DataFrame, keys: Seq[String], valueCol: String,
      ps: Seq[(String, Double)], maxCriticalRows: Long = 4000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorExpressions.doubleOrderBits
    val spark = dfIn.sparkSession
    val kcols = keys.map(col)
    val df = dfIn.filter(col(valueCol).isNotNull)
    val rows = df.select(kcols ++ Seq(col(valueCol).cast("double").as("__v"),
      doubleOrderBits(col(valueCol).cast("double")).as("__k")): _*)
    val bucketed = rows.withColumn("__b", shiftright(col("__k"), 48))
    // the ONE metadata pass: per-(group, bucket) counts + value bounds.
    // Deliberately NOT checkpointed: stats/targets/below all compose
    // into the single crit.collect() job below, so the whole decision
    // costs one action; the final plan re-derives stats from the
    // (cached) source rather than paying a third job.
    val perB = bucketed.groupBy(kcols :+ col("__b"): _*).agg(
      count(lit(1)).as("__c"), min(col("__v")).as("__bmn"), max(col("__v")).as("__bmx"))
    val stats = perB.groupBy(kcols: _*).agg(sum(col("__c")).as("__n"))
    // distinct target ranks per group: the lo and hi row of each p
    val rankExprs = ps.flatMap { case (_, p) =>
      Seq(floor((col("__n") - 1) * p).cast("long") + 1,
        ceil((col("__n") - 1) * p).cast("long") + 1)
    }
    val targets = stats.select(kcols :+
      explode(array_distinct(array(rankExprs: _*))).as("__r"): _*)
    val wAsc = Window.partitionBy(kcols: _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val belowT = perB.withColumn("__below", coalesce(sum(col("__c")).over(wAsc), lit(0L)))
    // null-safe key equality (the same hazard the small-bucket join
    // below documents): a USING join would silently DROP null-keyed
    // groups, where the window-form twin keeps them
    val belowTR = belowT.select(
      keys.map(k => col(k).as(s"__bt_$k")) ++
        Seq(col("__b"), col("__c"), col("__bmn"), col("__bmx"), col("__below")): _*)
    val crit = targets.join(belowTR,
        keys.map(k => col(k) <=> col(s"__bt_$k")).reduce(_ && _))
      .filter(col("__below") < col("__r") && col("__r") <= col("__below") + col("__c"))
      .select(kcols ++ Seq(col("__r"), col("__b"), col("__below"), col("__c"),
        col("__bmn"), col("__bmx")): _*)
    val critLocal = crit.collect() // ≤ groups × 2·|ps| — metadata, never corpus
    val nk = keys.length
    // single-value buckets resolve locally; oversized buckets recurse
    // (per collected entry — each is one rank in one bucket of one group)
    val resolvedLocal = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val smallEntries = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    critLocal.foreach { r =>
      val (bmn, bmx) = (r.getDouble(nk + 4), r.getDouble(nk + 5))
      if (bmn == bmx)
        resolvedLocal += org.apache.spark.sql.Row.fromSeq(
          r.toSeq.take(nk) ++ Seq[Any](r.getLong(nk), bmn))
      else if (r.getLong(nk + 3) <= maxCriticalRows) smallEntries += r
      else {
        val keyFilter = keys.zipWithIndex.map { case (k, i) => col(k) <=> lit(r.get(i)) }
          .reduce(_ && _)
        val sub = rows.filter(keyFilter &&
          shiftright(col("__k"), 48) === r.getLong(nk + 1))
        val v = valueAtRank(sub, r.getLong(nk) - r.getLong(nk + 2),
          shift = 32, maxCriticalRows, depth = 1)
        resolvedLocal += org.apache.spark.sql.Row.fromSeq(
          r.toSeq.take(nk) ++ Seq[Any](r.getLong(nk), v))
      }
    }
    val valSchema = org.apache.spark.sql.types.StructType(
      crit.schema.fields.take(nk) ++ Seq(
        org.apache.spark.sql.types.StructField("__r", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("__value", org.apache.spark.sql.types.DoubleType)))
    val resolvedDf = spark.createDataFrame(
      java.util.Arrays.asList(resolvedLocal.toSeq: _*), valSchema)
    // small critical buckets: rank each bucket once (window partitions
    // by (group, bucket) — the only per-row window), then match ranks
    val smallVals = if (smallEntries.isEmpty) resolvedDf.limit(0) else {
      val sb = spark.createDataFrame(
        java.util.Arrays.asList(smallEntries.toSeq.map(r =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq.take(nk) ++
            Seq(r.getLong(nk + 1), r.getLong(nk + 2), r.getLong(nk)))): _*),
        org.apache.spark.sql.types.StructType(crit.schema.fields.take(nk) ++ Seq(
          org.apache.spark.sql.types.StructField("__b", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("__below", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("__r", org.apache.spark.sql.types.LongType))))
      // rank each distinct small bucket ONCE, then match target ranks
      // (two equal-bucket targets reuse the same ranked rows).
      // Null-safe key equality: a USING join would silently drop
      // null-keyed groups.
      val wB = Window.partitionBy(kcols :+ col("__b"): _*).orderBy(col("__v"))
      val sbB = sb.select(keys.map(k => col(k).as(s"__sb_$k")) ++
        Seq(col("__b").as("__sb_b"), col("__below")): _*).distinct()
      val ranked = bucketed
        .join(broadcast(sbB),
          keys.map(k => col(k) <=> col(s"__sb_$k")).reduce(_ && _) &&
            col("__b") === col("__sb_b"))
        .withColumn("__rk", row_number().over(wB) + col("__below"))
      val tr = sb.select(keys.map(k => col(k).as(s"__t_$k")) :+ col("__r"): _*)
      ranked.join(broadcast(tr),
          keys.map(k => col(k) <=> col(s"__t_$k")).reduce(_ && _) &&
            col("__rk") === col("__r"))
        .select(kcols ++ Seq(col("__r"), col("__v").as("__value")): _*)
    }
    val vals = resolvedDf.union(smallVals)
    // interpolate per percentile from the (group, rank) → value table
    // (metadata-sized joins; lo and hi of an integral position are the
    // same rank row, which array_distinct above computed only once)
    val interpBase = ps.zipWithIndex.foldLeft(stats) { case (acc, ((name, p), i)) =>
      val pos = (col("__n") - 1) * p
      val lo = vals.select(keys.map(k => col(k).as(s"__klo${i}_$k")) ++
        Seq(col("__r").as(s"__rlo_$i"), col("__value").as(s"__vlo_$i")): _*)
      val hi = vals.select(keys.map(k => col(k).as(s"__khi${i}_$k")) ++
        Seq(col("__r").as(s"__rhi_$i"), col("__value").as(s"__vhi_$i")): _*)
      acc.join(broadcast(lo), keys.map(k => col(k) <=> col(s"__klo${i}_$k")).reduce(_ && _) &&
          floor(pos).cast("long") + 1 === col(s"__rlo_$i"))
        .join(broadcast(hi), keys.map(k => col(k) <=> col(s"__khi${i}_$k")).reduce(_ && _) &&
          ceil(pos).cast("long") + 1 === col(s"__rhi_$i"))
        // Spark's Percentile formula exactly (see exactPercentiles)
        .withColumn(name, when(ceil(pos) === floor(pos), col(s"__vlo_$i"))
          .otherwise((ceil(pos) - pos) * col(s"__vlo_$i") +
            (pos - floor(pos)) * col(s"__vhi_$i")))
    }
    interpBase.select(kcols ++ ps.map { case (name, _) => col(name) }: _*)
  }

  /** [[exactPercentilesBucketed]]'s refinement engine for ONE oversized
    * critical bucket: find the value at `rank` (1-based, ascending)
    * among `rows` (already filtered to the parent bucket; carry
    * `__v`/`__k`), bucketing on the next 16 key bits per level. At
    * `shift` = 0 the bucket is the full order key, i.e. one exact
    * value — convergence is structural (≤ 3 levels below the top).
    * The recursion is plan-time; each level's critical frame is one
    * collected row. */
  private def valueAtRank(rows: DataFrame, rank: Long, shift: Int,
      maxCriticalRows: Long, depth: Int): Double = {
    import org.apache.spark.sql.expressions.Window
    require(shift >= 0 && depth <= 4,
      s"exactPercentilesBucketed: refinement ran past the key width (depth $depth)")
    val b = rows.withColumn("__b", shiftright(col("__k"), shift))
    val perB = b.groupBy(col("__b")).agg(count(lit(1)).as("__c"),
      min(col("__v")).as("__bmn"), max(col("__v")).as("__bmx"))
    // ≤ 65536 rows: the global window is over a metadata frame
    val wAsc = Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)
    val crit = perB.withColumn("__below", coalesce(sum(col("__c")).over(wAsc), lit(0L)))
      .filter(col("__below") < rank && lit(rank) <= col("__below") + col("__c"))
      .collect()
    require(crit.length == 1, s"rank $rank outside bucket population")
    val c = crit(0)
    val (bb, cnt, bmn, bmx, below) = (c.getLong(0), c.getLong(1),
      c.getDouble(2), c.getDouble(3), c.getLong(4))
    if (bmn == bmx) bmn
    else if (cnt <= maxCriticalRows) {
      val wB = Window.partitionBy(col("__b")).orderBy(col("__v"))
      b.filter(col("__b") === bb)
        .withColumn("__rk", row_number().over(wB))
        .filter(col("__rk") === rank - below)
        .select(col("__v")).collect()(0).getDouble(0)
    } else valueAtRank(b.filter(col("__b") === bb).select(col("__v"), col("__k")),
      rank - below, shift - 16, maxCriticalRows, depth + 1)
  }

  /** percentileOfSeries(seriesList, p) — the cross-series A5 variant:
    * ONE series whose value at each ts is the exact interpolated p-th
    * percentile of all member series' values at that ts (nulls skipped,
    * §2.4 null rule). One shuffle on the high-cardinality ts key, so it
    * parallelizes by time at 100 TB; the per-group state is bounded by
    * the series count at that ts, not by data volume. */
  def percentileOfSeries(df: DataFrame, p: Double,
      name: String = "percentileOfSeries"): DataFrame =
    df.groupBy(col("ts"))
      .agg(percentile(col("value"), lit(p)).as("value"))
      .select(lit(name).as("metric"), col("ts"), col("value"))

  // ---------------------------------------------------------------------
  // T1-T4: scalar transforms / renames
  // ---------------------------------------------------------------------

  def scale(k: Double, c: Column = col("value")): Column = c * lit(k)
  def offset(k: Double, c: Column = col("value")): Column = c + lit(k)
  /** scaleToSeconds(series, n) — normalize a per-step count to per-n-seconds. */
  def scaleToSeconds(n: Double, stepSeconds: Double, c: Column = col("value")): Column =
    c * lit(n / stepSeconds)
  def absolute(c: Column = col("value")): Column = abs(c)
  def logarithm(base: Double, c: Column = col("value")): Column =
    log(c) / math.log(base)
  def invert(c: Column = col("value")): Column =
    when(c =!= 0, lit(1.0) / c).otherwise(lit(null))

  /** Division with Graphite's divide-by-zero → None rule (T3). */
  def divideSafe(a: Column, b: Column): Column =
    when(b.isNull || b === 0, lit(null)).otherwise(a / b)

  /** alias(series, name) — rename every series (T4). */
  def aliasSeries(df: DataFrame, name: String): DataFrame =
    df.withColumn("metric", lit(name))

  /** aliasByNode(series, nodes*) — keep only the given dot-segments of
    * the metric path (T4). Graphite nodes are 0-based. */
  def aliasByNode(nodes: Seq[Int], c: Column = col("metric")): Column = {
    val parts = split(c, "\\.")
    concat_ws(".", nodes.map(i => element_at(parts, nodeIdx(i))): _*)
  }

  // ---------------------------------------------------------------------
  // P3/P5: name predicates, null hygiene
  // ---------------------------------------------------------------------

  /** grep(series, rx) — keep series whose name matches (P3). */
  def grep(df: DataFrame, rx: String): DataFrame = df.filter(col("metric").rlike(rx))

  /** exclude(series, rx) — drop series whose name matches (P3). */
  def exclude(df: DataFrame, rx: String): DataFrame = df.filter(!col("metric").rlike(rx))

  /** Drop each series' trailing null points (P5) — the newest Graphite
    * buckets are None until the store flushes; monitors trim them before
    * reducing. Implemented as a windowed max-non-null-ts, no self-join. */
  def trimTrailingNulls(df: DataFrame): DataFrame = {
    val lastGood = max(when(col("value").isNotNull, col("ts")))
      .over(Window.partitionBy("metric"))
    df.withColumn("_last_good", lastGood)
      .filter(col("ts") <= col("_last_good"))
      .drop("_last_good")
  }

  // ---------------------------------------------------------------------
  // J2-J4: cross-series alignment / selection
  // ---------------------------------------------------------------------

  /** Timestamp-align two SINGLE series and apply a binary op (J2/T3):
    * divideSeries, diffSeries, multiplySeries, asPercent. Full-outer on
    * ts so points present on one side only surface as nulls (Graphite
    * None).
    *
    * Both operands must be single series: the join is on ts alone, so a
    * multi-series operand would CROSS-PRODUCT per timestamp and then
    * collapse under one output name — silently mixed values. The first
    * duplicate-ts row on either side raises instead (combine a
    * multi-series operand first — sumSeries/averageSeries — exactly
    * what Graphite requires of divideSeries' divisor). */
  def alignBinary(a: DataFrame, b: DataFrame, name: String)(
      f: (Column, Column) => Column): DataFrame = {
    val wts = Window.partitionBy(col("ts"))
    def one(df: DataFrame, as: String, side: String) =
      df.select(col("ts"), col("value"), count(lit(1)).over(wts).as("_n"))
        .select(col("ts"),
          when(col("_n") === 1, col("value"))
            .otherwise(raise_error(concat(
              lit(s"$name: $side operand has multiple series at ts "),
              col("ts").cast("string"),
              lit(" — combine it first (sumSeries/averageSeries)")))).as(as))
    val l = one(a, "a", "left")
    val r = one(b, "b", "right")
    l.join(r, Seq("ts"), "full_outer")
      .select(lit(name).as("metric"), col("ts"), f(col("a"), col("b")).as("value"))
  }

  def divideSeries(a: DataFrame, b: DataFrame, name: String = "divideSeries"): DataFrame =
    alignBinary(a, b, name)(divideSafe)
  def diffSeries(a: DataFrame, b: DataFrame, name: String = "diffSeries"): DataFrame =
    alignBinary(a, b, name)((x, y) => x - y)
  def multiplySeries(a: DataFrame, b: DataFrame, name: String = "multiplySeries"): DataFrame =
    alignBinary(a, b, name)((x, y) => x * y)
  def asPercent(a: DataFrame, b: DataFrame, name: String = "asPercent"): DataFrame =
    alignBinary(a, b, name)((x, y) => divideSafe(x * 100, y))

  /** As-of join (J3): for every left row, the most recent right value
    * with `right.ts <= left.ts`, per join key — the "nearest ≤" variant
    * needed when two series have different steps (Spark 4 has no ASOF
    * join operator).
    *
    * Single-pass union + ordered window (no range self-join): tag the
    * sides, sort (key, ts, tag) with right rows first at equal ts, and
    * forward-fill the right value. One shuffle on the key, scale-safe —
    * the classic distributed as-of pattern.
    *
    * @param left  (keyCol, ts, ...leftCols)
    * @param right (keyCol, ts, valueCol)
    * @return left rows + `asof_value` (null when no prior right row)
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
      valueCol: String): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("_tag", lit(1)).withColumn("_rv", lit(null).cast("double"))
    val r = right.select(col(keyCol), col("ts"),
      lit(0).as("_tag"), col(valueCol).cast("double").as("_rv"))
    val unioned = l.columns.foldLeft(r) { (acc, c) =>
      if (acc.columns.contains(c)) acc else acc.withColumn(c, lit(null))
    }.select(l.columns.map(col): _*).unionByName(l.select(l.columns.map(col): _*))
    val w = Window.partitionBy(keyCol).orderBy(col("ts"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("asof_value", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(leftCols.map(col) :+ col("asof_value"): _*)
  }

  /** highest/lowest(seriesList, k, score) — keep the k whole series with
    * the top/bottom score (J4): rank per-series scores, then a left-semi
    * join back so series bodies never shuffle through the rank. */
  def selectTopSeries(df: DataFrame, k: Int, how: String, highest: Boolean): DataFrame = {
    val score = how match {
      case "avg" => dmean(col("value"))
      case "sum" => dsum(col("value"))
      case "max" => max(col("value"))
      case "min" => min(col("value"))
      case "stddev" => stddev_samp(col("value")) // mostDeviant
      case "last" => max_by(col("value"), when(col("value").isNotNull, col("ts"))) // highestCurrent
      case other => throw new IllegalArgumentException(s"selectTopSeries: $other")
    }
    val ranked = df.groupBy(col("metric")).agg(score.as("_score"))
      .orderBy(if (highest) col("_score").desc else col("_score").asc, col("metric"))
      .limit(k)
      .select("metric")
    df.join(broadcast(ranked), Seq("metric"), "left_semi")
  }

  /** averageAbove / maximumAbove / currentAbove family (T5/J4): keep
    * whole series whose per-series score clears a threshold. Same
    * semi-join shape as [[selectTopSeries]] — bodies never shuffle
    * through the score. */
  def filterSeriesByScore(df: DataFrame, how: String, above: Boolean,
      threshold: Double): DataFrame = {
    val score = how match {
      case "avg" => dmean(col("value"))
      case "sum" => dsum(col("value"))
      case "max" => max(col("value"))
      case "min" => min(col("value"))
      case "last" => max_by(col("value"), when(col("value").isNotNull, col("ts")))
      case other => throw new IllegalArgumentException(s"filterSeriesByScore: $other")
    }
    val keep = df.groupBy(col("metric")).agg(score.as("_score"))
      .filter(if (above) col("_score") > threshold else col("_score") < threshold)
      .select("metric")
    df.join(broadcast(keep), Seq("metric"), "left_semi")
  }

  /** averageOutsidePercentile(seriesList, p) — keep series whose average
    * lies OUTSIDE the [p, 100−p] percentile band of all series'
    * averages (Graphite's outlier selector; p ≤ 50). Scores are one agg;
    * the band is a second tiny agg over series count rows; bodies
    * semi-join back. */
  def averageOutsidePercentile(df: DataFrame, p: Double): DataFrame = {
    val pLow = math.min(p, 100.0 - p) / 100.0
    val scores = df.groupBy(col("metric")).agg(dmean(col("value")).as("_avg"))
    val band = scores.agg(
      percentile(col("_avg"), lit(pLow)).as("_lo"),
      percentile(col("_avg"), lit(1.0 - pLow)).as("_hi"))
    val keep = scores.crossJoin(broadcast(band))
      .filter(col("_avg") < col("_lo") || col("_avg") > col("_hi"))
      .select("metric")
    df.join(broadcast(keep), Seq("metric"), "left_semi")
  }

  /** limit(seriesList, n) — first n series in deterministic name order
    * (Graphite keeps the selector's order; glob expansion is
    * lexicographic, so name order is the faithful deterministic pick).
    * Same semi-join shape as [[selectTopSeries]]. */
  def limitSeries(df: DataFrame, n: Int): DataFrame = {
    val keep = df.select("metric").distinct().orderBy("metric").limit(n)
    df.join(broadcast(keep), Seq("metric"), "left_semi")
  }

  /** removeAbove/BelowPercentile(series, p) — null out points beyond the
    * series' own exact p-th percentile; shape preserved (Graphite
    * semantics). Per-series percentile is one agg broadcast back —
    * bodies don't reshuffle. */
  def removeByPercentile(df: DataFrame, p: Double, above: Boolean): DataFrame = {
    val cut = df.groupBy(col("metric"))
      .agg(percentile(col("value"), lit(p)).as("_cut"))
    val out = df.join(broadcast(cut), Seq("metric"), "left")
      .withColumn("value",
        if (above) when(col("value") > col("_cut"), lit(null)).otherwise(col("value"))
        else when(col("value") < col("_cut"), lit(null)).otherwise(col("value")))
    out.drop("_cut")
  }

  /** asPercent(seriesList) single-arg form — each point as a percent of
    * the cross-series total at its ts. Total is one agg joined back on
    * ts (aligned grids ⇒ the join key is the bucket). */
  def asPercentOfTotal(df: DataFrame): DataFrame = {
    val totals = df.groupBy(col("ts")).agg(dsum(col("value")).as("_total"))
    df.join(totals, Seq("ts"))
      .withColumn("value",
        when(col("_total") =!= 0.0, col("value") / col("_total") * 100.0))
      .drop("_total")
      .select("metric", "ts", "value")
  }

  /** offsetToZero(series) — shift each series so its minimum is 0
    * (Graphite's baseline-normalizer). Per-series min broadcast back. */
  def offsetToZero(df: DataFrame): DataFrame = {
    val mins = df.groupBy(col("metric")).agg(min(col("value")).as("_min"))
    df.join(broadcast(mins), Seq("metric"))
      .withColumn("value", col("value") - col("_min"))
      .drop("_min")
      .select("metric", "ts", "value")
  }

  /** sortByName/sortByMinima/sortByMaxima/sortByTotal (no-limit forms) —
    * reorder whole series by a per-series score. Row order in a
    * DataFrame is advisory until an action, but the render edge
    * (MonitorApi) preserves it, so the sort IS the Graphite contract.
    * Score is one agg broadcast back; bodies don't reshuffle. */
  def sortSeriesBy(df: DataFrame, how: String, ascending: Boolean): DataFrame = how match {
    case "name" =>
      df.orderBy(if (ascending) col("metric").asc else col("metric").desc, col("ts"))
    case _ =>
      val score = how match {
        case "avg" => dmean(col("value"))
        case "sum" => dsum(col("value"))
        case "max" => max(col("value"))
        case "min" => min(col("value"))
        case other => throw new IllegalArgumentException(s"sortSeriesBy: $other")
      }
      val scores = df.groupBy(col("metric")).agg(score.as("_score"))
      df.join(broadcast(scores), Seq("metric"))
        .orderBy(if (ascending) col("_score").asc else col("_score").desc,
          col("metric"), col("ts"))
        .drop("_score")
  }

  /** sortByMinima (Graphite 0.9 semantics): drop series that never go
    * above 0, then ascending by each series' minimum. */
  def sortByMinima(df: DataFrame): DataFrame =
    sortSeriesBy(filterSeriesByScore(df, "max", above = true, 0.0), "min", ascending = true)

  /** substr(series, start, stop) — keep dot-path nodes [start, stop)
    * (0-based, stop 0 = to the end), Graphite's name trimmer. */
  def substrMetric(df: DataFrame, start: Int, stop: Int): DataFrame = {
    val parts = split(col("metric"), "\\.")
    val len = if (stop == 0) size(parts) - lit(start) else lit(stop - start)
    df.withColumn("metric", array_join(slice(parts, lit(start + 1), len), "."))
  }

  /** removeEmptySeries — drop series whose every point is null. */
  def removeEmptySeries(df: DataFrame): DataFrame = {
    val keep = df.groupBy(col("metric")).agg(count(col("value")).as("_n"))
      .filter(col("_n") > 0).select("metric")
    df.join(broadcast(keep), Seq("metric"), "left_semi")
  }

  /** cactiStyle(series) — decorate each name with Current/Max/Min the
    * way Cacti legends do. One agg broadcast back; %.2f formatting. */
  def cactiStyle(df: DataFrame): DataFrame = {
    val stats = df.groupBy(col("metric")).agg(
      max_by(col("value"), when(col("value").isNotNull, col("ts"))).as("_cur"),
      max(col("value")).as("_max"),
      min(col("value")).as("_min"))
    df.join(broadcast(stats), Seq("metric"))
      .withColumn("metric", format_string("%s Current:%.2f Max:%.2f Min:%.2f",
        col("metric"), col("_cur"), col("_max"), col("_min")))
      .drop("_cur", "_max", "_min")
  }

  /** smartSummarize(series, step, func) — like [[summarize]] but buckets
    * align to the window's first point instead of the epoch grid. The
    * anchor is the frame's min ts (one scalar agg, broadcast). */
  def smartSummarize(df: DataFrame, stepSeconds: Long, how: String): DataFrame = {
    val agg = aggFor("smartSummarize", how)
    val anchor = df.agg(min(unix_timestamp(col("ts"))).as("_from"))
    df.crossJoin(broadcast(anchor))
      .withColumn("ts", timestamp_seconds(col("_from") +
        floor((unix_timestamp(col("ts")) - col("_from")) / stepSeconds) * stepSeconds))
      .groupBy(col("metric"), col("ts"))
      .agg(agg.as("value"))
  }

  // -- generator functions (constantLine/threshold/timeFunction/...) ----
  // Generators synthesize a series over the render window's time grid;
  // the grid is the store frame's distinct ts (one column, pruned scan).

  /** The time grid a generator draws on. */
  def timeGrid(store: DataFrame): DataFrame = store.select(col("ts")).distinct()

  /** constantLine(value) / threshold(value, label). */
  def constantLine(store: DataFrame, value: Double, name: String): DataFrame =
    timeGrid(store).select(lit(name).as("metric"), col("ts"), lit(value).as("value"))

  /** timeFunction(name) / identity(name) — value = epoch seconds. */
  def timeFunction(store: DataFrame, name: String): DataFrame =
    timeGrid(store).select(lit(name).as("metric"), col("ts"),
      unix_timestamp(col("ts")).cast("double").as("value"))

  /** sinFunction(name, amplitude) — amplitude · sin(epoch seconds). */
  def sinFunction(store: DataFrame, name: String, amplitude: Double): DataFrame =
    timeGrid(store).select(lit(name).as("metric"), col("ts"),
      (lit(amplitude) * sin(unix_timestamp(col("ts")))).as("value"))

  /** randomWalkFunction(name) — a walk whose steps are uniform in
    * [-0.5, 0.5). DELIBERATE deviation from Graphite: steps come from a
    * seeded hash of the timestamp (xxhash64), not an RNG, so the walk is
    * reproducible across runs/engines/partitionings — the same
    * determinism contract as every other operator here. */
  def randomWalk(store: DataFrame, name: String, seed: Long = 42L): DataFrame = {
    val step = pmod(xxhash64(col("ts"), lit(seed)), lit(1000000L)).cast("double") / 1000000.0 - 0.5
    timeGrid(store)
      .withColumn("value", sum(step).over(Window.orderBy("ts")))
      .select(lit(name).as("metric"), col("ts"), col("value"))
  }

  /** countSeries — number of series with a point at each ts. */
  def countSeries(df: DataFrame, name: String = "countSeries"): DataFrame =
    df.groupBy(col("ts")).agg(count(col("value")).cast("double").as("value"))
      .select(lit(name).as("metric"), col("ts"), col("value"))

  /** rangeOfSeries — per-ts max-min across series. */
  def rangeOfSeries(df: DataFrame, name: String = "rangeOfSeries"): DataFrame =
    df.groupBy(col("ts"))
      .agg((max(col("value")) - min(col("value"))).as("value"))
      .select(lit(name).as("metric"), col("ts"), col("value"))
}
