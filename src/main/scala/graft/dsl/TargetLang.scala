package graft.dsl

import scala.util.parsing.combinator.RegexParsers

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.series.SeriesOps

/** The L1 query surface: Graphite-style target expressions, the strings
  * a rearview monitor stores one-per-line in `jobs.metrics` (reference
  * db/schema.rb:65; the function language itself is Graphite's public
  * render API, reference README.md:6 — we provide it natively since
  * there is no Graphite to delegate to).
  *
  * `movingAverage(events.{click,view}, 10)` parses to an AST and
  * compiles to a declarative DataFrame pipeline over the long-format
  * metric store — so a *stored string* still ends up as a Catalyst plan
  * with full pushdown, not an interpreter loop.
  */
object TargetLang {

  sealed trait Expr
  final case class Path(glob: String) extends Expr
  final case class Call(fn: String, args: Seq[Arg]) extends Expr

  sealed trait Arg
  final case class ExprArg(e: Expr) extends Arg
  final case class NumArg(v: Double) extends Arg
  final case class StrArg(v: String) extends Arg

  // -- parser -------------------------------------------------------------

  private object P extends RegexParsers {
    override def skipWhitespace = true
    // one path segment: idents/wildcards/char-classes/brace alternations
    private val seg = """(?:[A-Za-z0-9_\-*?]|\{[A-Za-z0-9_\-,*?]*\}|\[[^\]]*\])+"""
    def path: Parser[Path] = s"$seg(?:\\.$seg)*".r ^^ Path.apply
    // negative lookahead: a number must not run into a letter or dot,
    // so a digit-leading PATH segment ("5xx.count", "500.errors") falls
    // through to the path alternative instead of committing num and
    // failing the whole target
    def num: Parser[NumArg] =
      """-?\d+(?:\.\d+)?(?![\w.])""".r ^^ (s => NumArg(s.toDouble))
    def str: Parser[StrArg] =
      ("\"" + """[^"]*""" + "\"").r ^^ (s => StrArg(s.substring(1, s.length - 1))) |
      ("'" + """[^']*""" + "'").r ^^ (s => StrArg(s.substring(1, s.length - 1)))
    def call: Parser[Call] =
      """[A-Za-z_][A-Za-z0-9_]*""".r ~ ("(" ~> repsep(arg, ",") <~ ")") ^^ {
        case fn ~ args => Call(fn, args)
      }
    def expr: Parser[Expr] = call ||| (path ^^ (p => p: Expr))
    def arg: Parser[Arg] = num | str | (expr ^^ ExprArg.apply)
    def parseTarget(s: String): Either[String, Expr] = parseAll(expr, s) match {
      case Success(e, _) => Right(e)
      case NoSuccess(msg, next) => Left(s"$msg at ${next.pos}")
      case _ => Left("parse failure")
    }
  }

  def parse(target: String): Either[String, Expr] = P.parseTarget(target)

  /** "7d" / "1h" / "30min" / "45s" → seconds. */
  def durationSeconds(s: String): Long = {
    val m = """(\d+)\s*(s|sec|seconds?|min|minutes?|h|hours?|d|days?|w|weeks?)""".r
    s.trim match {
      case m(n, u) =>
        val mult = u.head match {
          case 's' => 1L
          case 'm' => 60L
          case 'h' => 3600L
          case 'd' => 86400L
          case 'w' => 604800L
        }
        n.toLong * mult
      case other => throw new IllegalArgumentException(s"bad duration '$other'")
    }
  }

  private def sparkInterval(s: String): String = s"${durationSeconds(s)} seconds"

  // -- compiler -----------------------------------------------------------

  /** Compile a parsed target to a transform of the long-format metric
    * store. `store` must carry (metric, ts, value). Window clipping
    * happens *before* this (P1 — so pushdown reaches the scan); ops that
    * need pre-window history (movingAverage, timeShift) are documented
    * to read the store as given.
    */
  def compile(e: Expr, store: DataFrame): DataFrame = e match {
    case Path(glob) =>
      if (!glob.exists("*?{[".contains(_)))
        store.filter(col("metric") === glob) // literal path: plain equality
      else {
        val g = Glob.compile(glob)
        store.filter(col("metric").startsWith(g.literalPrefix) && col("metric").rlike(g.regex))
      }

    case Call(fn, args) => (fn, args) match {
      // combines
      case ("sumSeries", as) => SeriesOps.combineSeries(unionArgs(as, store), "sum", render(e))
      case ("averageSeries", as) => SeriesOps.combineSeries(unionArgs(as, store), "avg", render(e))
      case ("minSeries", as) => SeriesOps.combineSeries(unionArgs(as, store), "min", render(e))
      case ("maxSeries", as) => SeriesOps.combineSeries(unionArgs(as, store), "max", render(e))
      case ("group", as) => unionArgs(as, store)
      case ("groupByNode", Seq(ExprArg(a), NumArg(n), StrArg(how))) =>
        SeriesOps.groupByNode(compile(a, store), n.toInt, how)
      case ("sumSeriesWithWildcards", ExprArg(a) +: nodes) =>
        SeriesOps.aggregateWithWildcards(compile(a, store), "sum",
          nodes.collect { case NumArg(n) => n.toInt })
      case ("averageSeriesWithWildcards", ExprArg(a) +: nodes) =>
        SeriesOps.aggregateWithWildcards(compile(a, store), "avg",
          nodes.collect { case NumArg(n) => n.toInt })
      case ("weightedAverage", ExprArg(a) +: ExprArg(b) +: nodes) =>
        SeriesOps.weightedAverage(compile(a, store), compile(b, store),
          nodes.collect { case NumArg(n) => n.toInt }, render(e))
      case ("linearRegression", Seq(ExprArg(a))) =>
        SeriesOps.linearRegression(compile(a, store))

      // re-bucketing
      case ("summarize", Seq(ExprArg(a), StrArg(step))) =>
        SeriesOps.summarize(compile(a, store), sparkInterval(step))
      case ("summarize", Seq(ExprArg(a), StrArg(step), StrArg(how))) =>
        SeriesOps.summarize(compile(a, store), sparkInterval(step), how)
      case ("hitcount", Seq(ExprArg(a), StrArg(step))) =>
        SeriesOps.hitcount(compile(a, store), sparkInterval(step), durationSeconds(step))

      // per-series windows — n-point form (NumArg) and Graphite's
      // quoted-time form ("10min": window by TIME, gap-robust)
      case ("movingAverage", Seq(ExprArg(a), NumArg(n))) =>
        withValue(compile(a, store), SeriesOps.movingAverage(n.toInt))
      case ("movingAverage", Seq(ExprArg(a), StrArg(d))) =>
        withValue(compile(a, store), SeriesOps.movingAggTime("avg", durationSeconds(d)))
      case ("movingSum", Seq(ExprArg(a), NumArg(n))) =>
        withValue(compile(a, store), SeriesOps.movingSum(n.toInt))
      case ("movingSum", Seq(ExprArg(a), StrArg(d))) =>
        withValue(compile(a, store), SeriesOps.movingAggTime("sum", durationSeconds(d)))
      case ("movingMax", Seq(ExprArg(a), NumArg(n))) =>
        withValue(compile(a, store), SeriesOps.movingMax(n.toInt))
      case ("movingMax", Seq(ExprArg(a), StrArg(d))) =>
        withValue(compile(a, store), SeriesOps.movingAggTime("max", durationSeconds(d)))
      case ("movingMin", Seq(ExprArg(a), NumArg(n))) =>
        withValue(compile(a, store), SeriesOps.movingMin(n.toInt))
      case ("movingMin", Seq(ExprArg(a), StrArg(d))) =>
        withValue(compile(a, store), SeriesOps.movingAggTime("min", durationSeconds(d)))
      case ("movingMedian", Seq(ExprArg(a), NumArg(n))) =>
        withValue(compile(a, store), SeriesOps.movingMedian(n.toInt))
      case ("movingMedian", Seq(ExprArg(a), StrArg(d))) =>
        withValue(compile(a, store), SeriesOps.movingAggTime("median", durationSeconds(d)))
      case ("exponentialMovingAverage", Seq(ExprArg(a), NumArg(n))) =>
        SeriesOps.exponentialMovingAverage(compile(a, store), n)
      case ("timeSlice", Seq(ExprArg(a), StrArg(from), StrArg(until))) =>
        SeriesOps.timeSlice(compile(a, store),
          java.sql.Timestamp.valueOf(from), java.sql.Timestamp.valueOf(until))
      case ("stdev", Seq(ExprArg(a), NumArg(n))) =>
        withValue(compile(a, store), SeriesOps.movingStddev(n.toInt))
      case ("stdev", Seq(ExprArg(a), StrArg(d))) =>
        withValue(compile(a, store), SeriesOps.movingAggTime("stddev", durationSeconds(d)))
      case ("derivative", Seq(ExprArg(a))) =>
        withValue(compile(a, store), SeriesOps.derivative())
      case ("nonNegativeDerivative", Seq(ExprArg(a))) =>
        withValue(compile(a, store), SeriesOps.nonNegativeDerivative())
      case ("nonNegativeDerivative", Seq(ExprArg(a), NumArg(maxV))) =>
        withValue(compile(a, store), SeriesOps.nonNegativeDerivativeWrap(maxV))
      case ("delay", Seq(ExprArg(a), NumArg(steps))) =>
        withValue(compile(a, store), SeriesOps.delay(steps.toInt))
      case ("integralByInterval", Seq(ExprArg(a), StrArg(step))) =>
        SeriesOps.integralByInterval(compile(a, store), sparkInterval(step))
      case ("perSecond", Seq(ExprArg(a))) =>
        withValue(compile(a, store), SeriesOps.perSecond())
      case ("integral", Seq(ExprArg(a))) =>
        withValue(compile(a, store), SeriesOps.integral())
      case ("keepLastValue", Seq(ExprArg(a))) =>
        withValue(compile(a, store), SeriesOps.keepLastValue())
      case ("transformNull", Seq(ExprArg(a), NumArg(v))) =>
        withValue(compile(a, store), SeriesOps.transformNull(v))
      case ("timeShift", Seq(ExprArg(a), StrArg(d))) =>
        // Graphite sign convention: minus or NO sign pulls data from the
        // past (timestamps shift forward onto the current window); an
        // explicit plus pulls from the future (shift backward)
        val (sign, mag) = d.trim match {
          case t if t.startsWith("+") => (-1L, t.substring(1))
          case t if t.startsWith("-") => (1L, t.substring(1))
          case t => (1L, t)
        }
        SeriesOps.timeShift(compile(a, store),
          s"${sign * durationSeconds(mag)} seconds")

      // scalar transforms
      case ("scale", Seq(ExprArg(a), NumArg(k))) =>
        withValue(compile(a, store), SeriesOps.scale(k))
      case ("offset", Seq(ExprArg(a), NumArg(k))) =>
        withValue(compile(a, store), SeriesOps.offset(k))
      case ("absolute", Seq(ExprArg(a))) =>
        withValue(compile(a, store), SeriesOps.absolute())
      case ("logarithm", Seq(ExprArg(a))) =>
        withValue(compile(a, store), SeriesOps.logarithm(10))
      case ("logarithm", Seq(ExprArg(a), NumArg(b))) =>
        withValue(compile(a, store), SeriesOps.logarithm(b))
      case ("invert", Seq(ExprArg(a))) =>
        withValue(compile(a, store), SeriesOps.invert())
      case ("pow", Seq(ExprArg(a), NumArg(p))) =>
        withValue(compile(a, store), pow(col("value"), p))
      case ("squareRoot", Seq(ExprArg(a))) =>
        withValue(compile(a, store), sqrt(col("value")))
      // point predicates (Graphite emits 0/1 series)
      case ("changed", Seq(ExprArg(a))) =>
        val prev = lag(col("value"), 1).over(SeriesOps.seriesWindow)
        withValue(compile(a, store),
          when(col("value").isNull, lit(null))
            .otherwise(when(prev.isNull || col("value") =!= prev, 1.0).otherwise(0.0)))
      case ("isNonNull", Seq(ExprArg(a))) =>
        withValue(compile(a, store), when(col("value").isNotNull, 1.0).otherwise(0.0))

      // point clamps (Graphite removeAbove/Below family: out-of-range
      // points become None, series shape is preserved)
      case ("removeAboveValue", Seq(ExprArg(a), NumArg(t))) =>
        withValue(compile(a, store), when(col("value") > t, lit(null)).otherwise(col("value")))
      case ("removeBelowValue", Seq(ExprArg(a), NumArg(t))) =>
        withValue(compile(a, store), when(col("value") < t, lit(null)).otherwise(col("value")))
      case ("clip", Seq(ExprArg(a), NumArg(lo), NumArg(hi))) =>
        // least/greatest skip nulls, which would turn a None point into
        // the clamp bound — propagate None explicitly (§2.4 null rule)
        withValue(compile(a, store), when(col("value").isNull, lit(null))
          .otherwise(greatest(least(col("value"), lit(hi)), lit(lo))))

      // renames
      case ("alias", Seq(ExprArg(a), StrArg(name))) =>
        SeriesOps.aliasSeries(compile(a, store), name)
      case ("aliasByNode", ExprArg(a) +: nodes) =>
        val df = compile(a, store)
        df.withColumn("metric",
          SeriesOps.aliasByNode(nodes.collect { case NumArg(n) => n.toInt }))
      case ("aliasByMetric", Seq(ExprArg(a))) =>
        val df = compile(a, store)
        df.withColumn("metric", element_at(split(col("metric"), "\\."), -1))
      case ("aliasSub", Seq(ExprArg(a), StrArg(search), StrArg(replace))) =>
        compile(a, store).withColumn("metric",
          regexp_replace(col("metric"), search, replace))

      // name predicates
      case ("exclude", Seq(ExprArg(a), StrArg(rx))) => SeriesOps.exclude(compile(a, store), rx)
      case ("grep", Seq(ExprArg(a), StrArg(rx))) => SeriesOps.grep(compile(a, store), rx)

      // series selection
      case ("highestAverage", Seq(ExprArg(a), NumArg(k))) =>
        SeriesOps.selectTopSeries(compile(a, store), k.toInt, "avg", highest = true)
      case ("highestMax", Seq(ExprArg(a), NumArg(k))) =>
        SeriesOps.selectTopSeries(compile(a, store), k.toInt, "max", highest = true)
      case ("highestSum", Seq(ExprArg(a), NumArg(k))) =>
        SeriesOps.selectTopSeries(compile(a, store), k.toInt, "sum", highest = true)
      case ("lowestAverage", Seq(ExprArg(a), NumArg(k))) =>
        SeriesOps.selectTopSeries(compile(a, store), k.toInt, "avg", highest = false)
      case ("lowestMax", Seq(ExprArg(a), NumArg(k))) =>
        SeriesOps.selectTopSeries(compile(a, store), k.toInt, "max", highest = false)
      case ("highestCurrent", Seq(ExprArg(a), NumArg(k))) =>
        SeriesOps.selectTopSeries(compile(a, store), k.toInt, "last", highest = true)
      case ("lowestCurrent", Seq(ExprArg(a), NumArg(k))) =>
        SeriesOps.selectTopSeries(compile(a, store), k.toInt, "last", highest = false)
      case ("sortByTotal", Seq(ExprArg(a), NumArg(k))) =>
        SeriesOps.selectTopSeries(compile(a, store), k.toInt, "sum", highest = true)
      case ("sortByMaxima", Seq(ExprArg(a), NumArg(k))) =>
        SeriesOps.selectTopSeries(compile(a, store), k.toInt, "max", highest = true)
      // Graphite's one-arg sortBy* forms: reorder, never drop
      case ("sortByTotal", Seq(ExprArg(a))) =>
        SeriesOps.sortSeriesBy(compile(a, store), "sum", ascending = false)
      case ("sortByMaxima", Seq(ExprArg(a))) =>
        SeriesOps.sortSeriesBy(compile(a, store), "max", ascending = false)
      case ("sortByMinima", Seq(ExprArg(a))) =>
        SeriesOps.sortByMinima(compile(a, store))
      case ("sortByName", Seq(ExprArg(a))) =>
        SeriesOps.sortSeriesBy(compile(a, store), "name", ascending = true)
      case ("mostDeviant", Seq(ExprArg(a), NumArg(k))) =>
        SeriesOps.selectTopSeries(compile(a, store), k.toInt, "stddev", highest = true)
      case ("limit", Seq(ExprArg(a), NumArg(n))) =>
        SeriesOps.limitSeries(compile(a, store), n.toInt)

      // point clamps by the series' own distribution
      case ("removeAbovePercentile", Seq(ExprArg(a), NumArg(p))) =>
        SeriesOps.removeByPercentile(compile(a, store), p / 100.0, above = true)
      case ("removeBelowPercentile", Seq(ExprArg(a), NumArg(p))) =>
        SeriesOps.removeByPercentile(compile(a, store), p / 100.0, above = false)

      // threshold series filters
      case ("averageAbove", Seq(ExprArg(a), NumArg(t))) =>
        SeriesOps.filterSeriesByScore(compile(a, store), "avg", above = true, t)
      case ("averageBelow", Seq(ExprArg(a), NumArg(t))) =>
        SeriesOps.filterSeriesByScore(compile(a, store), "avg", above = false, t)
      case ("maximumAbove", Seq(ExprArg(a), NumArg(t))) =>
        SeriesOps.filterSeriesByScore(compile(a, store), "max", above = true, t)
      case ("maximumBelow", Seq(ExprArg(a), NumArg(t))) =>
        SeriesOps.filterSeriesByScore(compile(a, store), "max", above = false, t)
      case ("minimumAbove", Seq(ExprArg(a), NumArg(t))) =>
        SeriesOps.filterSeriesByScore(compile(a, store), "min", above = true, t)
      case ("minimumBelow", Seq(ExprArg(a), NumArg(t))) =>
        SeriesOps.filterSeriesByScore(compile(a, store), "min", above = false, t)
      case ("currentAbove", Seq(ExprArg(a), NumArg(t))) =>
        SeriesOps.filterSeriesByScore(compile(a, store), "last", above = true, t)
      case ("currentBelow", Seq(ExprArg(a), NumArg(t))) =>
        SeriesOps.filterSeriesByScore(compile(a, store), "last", above = false, t)
      case ("averageOutsidePercentile", Seq(ExprArg(a), NumArg(p))) =>
        SeriesOps.averageOutsidePercentile(compile(a, store), p)

      // cross-series shape functions
      case ("countSeries", as) => SeriesOps.countSeries(unionArgs(as, store), render(e))
      case ("rangeOfSeries", as) => SeriesOps.rangeOfSeries(unionArgs(as, store), render(e))
      case ("scaleToSeconds", Seq(ExprArg(a), NumArg(n))) =>
        // series step is the 1-minute rollup grid
        withValue(compile(a, store), SeriesOps.scaleToSeconds(n, 60.0))

      // cross-series binary ops
      case ("divideSeries", Seq(ExprArg(a), ExprArg(b))) =>
        SeriesOps.divideSeries(compile(a, store), compile(b, store), render(e))
      case ("diffSeries", Seq(ExprArg(a), ExprArg(b))) =>
        SeriesOps.diffSeries(compile(a, store), compile(b, store), render(e))
      case ("multiplySeries", Seq(ExprArg(a), ExprArg(b))) =>
        SeriesOps.multiplySeries(compile(a, store), compile(b, store), render(e))
      case ("asPercent", Seq(ExprArg(a), ExprArg(b))) =>
        SeriesOps.asPercent(compile(a, store), compile(b, store), render(e))
      case ("asPercent", Seq(ExprArg(a))) =>
        SeriesOps.asPercentOfTotal(compile(a, store))
      case ("offsetToZero", Seq(ExprArg(a))) =>
        SeriesOps.offsetToZero(compile(a, store))

      // anomaly bands (A8): seasonal Holt-Winters over the compiled
      // series. Optional args: z (band width, default 3), season period
      // in POINTS (default 1440 = one day of minutely data).
      case ("holtWintersConfidenceBands", ExprArg(a) +: rest) =>
        graft.series.HoltWinters.confidenceBands(compile(a, store), hwParams(rest))
      case ("holtWintersAberration", ExprArg(a) +: rest) =>
        graft.series.HoltWinters.aberration(compile(a, store), hwParams(rest))
      case ("holtWintersForecast", ExprArg(a) +: rest) =>
        graft.series.HoltWinters.forecast(compile(a, store), hwParams(rest))

      case ("percentileOfSeries", Seq(ExprArg(a), NumArg(p))) =>
        SeriesOps.percentileOfSeries(compile(a, store), p / 100.0, render(e))

      case ("nPercentile", Seq(ExprArg(a), NumArg(p))) =>
        SeriesOps.nPercentile(compile(a, store), p / 100.0)
          .select(col("metric"), lit(null).cast("timestamp").as("ts"), col("value"))

      // name surgery + hygiene
      case ("substr", Seq(ExprArg(a), NumArg(start))) =>
        SeriesOps.substrMetric(compile(a, store), start.toInt, 0)
      case ("substr", Seq(ExprArg(a), NumArg(start), NumArg(stop))) =>
        SeriesOps.substrMetric(compile(a, store), start.toInt, stop.toInt)
      case ("removeEmptySeries", Seq(ExprArg(a))) =>
        SeriesOps.removeEmptySeries(compile(a, store))
      case ("cactiStyle", Seq(ExprArg(a))) =>
        SeriesOps.cactiStyle(compile(a, store))

      // aggregation variants
      case ("stddevSeries", as) =>
        SeriesOps.combineSeries(unionArgs(as, store), "stddev", render(e))
      case ("groupByNodes", ExprArg(a) +: StrArg(how) +: nodes) =>
        SeriesOps.groupByNodes(compile(a, store), how,
          nodes.collect { case NumArg(n) => n.toInt })
      case ("smartSummarize", Seq(ExprArg(a), StrArg(step))) =>
        SeriesOps.smartSummarize(compile(a, store), durationSeconds(step), "sum")
      case ("smartSummarize", Seq(ExprArg(a), StrArg(step), StrArg(how))) =>
        SeriesOps.smartSummarize(compile(a, store), durationSeconds(step), how)

      // useSeriesAbove(series, value, search, replace): series whose max
      // clears `value` have search→replace applied to their NAME, and
      // the RENAMED metrics are fetched from the store (Graphite's
      // derived-metric switcheroo). The name set is tiny (series count)
      // and broadcast into a semi-join against the store scan.
      case ("useSeriesAbove", Seq(ExprArg(a), NumArg(v), StrArg(search), StrArg(replace))) => {
        val passing = SeriesOps.filterSeriesByScore(compile(a, store), "max",
            above = true, v)
          .select(col("metric")).distinct()
          .select(regexp_replace(col("metric"), search, replace).as("metric"))
        store.join(org.apache.spark.sql.functions.broadcast(passing),
          Seq("metric"), "left_semi")
      }

      // generators: synthesize series on the store's time grid
      case ("constantLine", Seq(NumArg(v))) =>
        SeriesOps.constantLine(store, v, render(e))
      case ("threshold", NumArg(v) +: rest) =>
        val label = rest.collectFirst { case StrArg(s0) => s0 }.getOrElse(render(e))
        SeriesOps.constantLine(store, v, label)
      case ("timeFunction", Seq(StrArg(name))) => SeriesOps.timeFunction(store, name)
      case ("time", Seq(StrArg(name))) => SeriesOps.timeFunction(store, name)
      case ("identity", Seq(StrArg(name))) => SeriesOps.timeFunction(store, name)
      case ("sinFunction", Seq(StrArg(name))) => SeriesOps.sinFunction(store, name, 1.0)
      case ("sinFunction", Seq(StrArg(name), NumArg(amp))) =>
        SeriesOps.sinFunction(store, name, amp)
      case ("randomWalkFunction", Seq(StrArg(name))) => SeriesOps.randomWalk(store, name)
      case ("randomWalk", Seq(StrArg(name))) => SeriesOps.randomWalk(store, name)

      // aliases of existing functions
      case ("log", Seq(ExprArg(a))) =>
        withValue(compile(a, store), SeriesOps.logarithm(10.0))
      case ("log", Seq(ExprArg(a), NumArg(b))) =>
        withValue(compile(a, store), SeriesOps.logarithm(b))
      case ("transformNull", Seq(ExprArg(a))) =>
        withValue(compile(a, store), SeriesOps.transformNull(0.0))
      case ("avg", as) => SeriesOps.combineSeries(unionArgs(as, store), "avg", render(e))

      // display-only directives: rendering hints with no data
      // transformation in a headless engine — pass the series through
      // (consolidateBy/cumulative affect render-time pixel consolidation,
      // which has no analog when the consumer gets every point).
      case ("secondYAxis" | "color" | "alpha" | "dashed" | "drawAsInfinite"
          | "lineWidth" | "stacked" | "legendValue" | "consolidateBy"
          | "cumulative", ExprArg(a) +: _) =>
        compile(a, store)

      case (other, _) =>
        throw new IllegalArgumentException(s"unknown target function '$other'")
    }
  }

  /** Parse + compile in one step. */
  def plan(target: String, store: DataFrame): DataFrame =
    parse(target).fold(
      err => throw new IllegalArgumentException(s"bad target '$target': $err"),
      e => compile(e, store))

  private def hwParams(rest: Seq[Arg]): graft.series.HoltWinters.SeasonalParams = {
    val nums = rest.collect { case NumArg(v) => v }
    val base = graft.series.HoltWinters.SeasonalParams()
    base.copy(
      z = nums.headOption.getOrElse(base.z),
      period = nums.lift(1).map(_.toInt).getOrElse(base.period))
  }

  private def withValue(df: DataFrame, c: org.apache.spark.sql.Column): DataFrame =
    df.withColumn("value", c)

  private def unionArgs(as: Seq[Arg], store: DataFrame): DataFrame =
    as.collect { case ExprArg(a) => compile(a, store) }.reduce(_ unionByName _)

  /** Canonical name for derived series (Graphite renders the call). */
  def render(e: Expr): String = e match {
    case Path(g) => g
    case Call(fn, args) => fn + "(" + args.map {
      case ExprArg(x) => render(x)
      case NumArg(v) => if (v == v.floor && !v.isInfinite) v.toLong.toString else v.toString
      case StrArg(s) => s"\"$s\""
    }.mkString(",") + ")"
  }
}
