package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY §4.4 / the prompt's "salting for
  * skew" requirement).
  *
  * AQE's skew-join splitting handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default with AQE);
  * these helpers cover the two places AQE can't re-plan:
  *
  *  - [[saltedAggregate]]: a heavy-hitter GROUP BY key concentrates a
  *    whole group on one reducer. Two-phase aggregation over a salted
  *    key keeps every reducer bounded at 1/S of the hottest key.
  *  - [[saltedBroadcastSkewJoin]]: joining a skewed fact side against a
  *    small dim — replicate the dim S× with explicit salt so the fact
  *    side's hot key spreads over S partitions even when the join is
  *    forced to shuffle.
  */
object Skew {

  /** Two-phase salted aggregate: phase 1 aggregates `(keys, salt)`
    * (splitting each hot key across `salt` reducers), phase 2 merges
    * the partials per key. Partials merge by SUM by default — correct
    * for sum/count (the decimal-sum discipline keeps results identical
    * to the unsalted plan); any other algebraic aggregate (min/max/...)
    * MUST supply its merge in `merge`, e.g. `"m" -> (min(_))` — summing
    * per-salt minima would be silently wrong data. ENFORCED: a name
    * absent from `merge` whose aggregate is not sum/count (checked on
    * the Catalyst tree, so aliases still pass; casts INSIDE the
    * aggregate — `sum(x.cast(...))` — are fine, but an OUTER cast
    * `sum(x).cast(...)` is rejected BY DESIGN: a narrowing/rounding
    * cast applied per salt partial does not commute with the merge —
    * supply it via `merge` = `c => sum(c).cast(...)` instead)
    * raises at plan time instead of defaulting to a wrong sum. */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salt: Int,
      sums: Seq[(String, Column)],
      merge: Map[String, Column => Column] = Map.empty): DataFrame = {
    sums.foreach { case (n, c) =>
      require(merge.contains(n) || sumMergeable(c),
        s"saltedAggregate: '$n' is not a sum/count aggregate - per-salt " +
          "partials cannot be merged by the default SUM (e.g. summed " +
          s"minima are silently wrong). Pass merge = Map(\"$n\" -> ...) " +
          "with its true merge function.")
    }
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
    val phase1 = salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sums.head._2.as(sums.head._1),
        sums.tail.map { case (n, c) => c.as(n) }: _*)
    def merged(n: String): Column =
      merge.getOrElse(n, (c: Column) => sum(c))(col(n)).as(n)
    phase1.groupBy(keys.map(col): _*)
      .agg(merged(sums.head._1), sums.tail.map { case (n, _) => merged(n) }: _*)
  }

  /** A phase-1 column whose per-salt partials merge correctly by SUM:
    * its top-level aggregate (below any aliases) is a sum or count
    * (both sum-of-partials algebraic; anything else — min, max, avg,
    * stddev, collect_* — is not). Checked on BOTH expression forms a
    * Column can carry: the pre-analysis `UnresolvedFunction` (what
    * `functions.sum(...)` builds) and the resolved
    * `AggregateExpression`. */
  private def sumMergeable(c: Column): Boolean = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
    def strip(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : org.apache.spark.sql.catalyst.expressions.Expression = e match {
      case a: Alias => strip(a.child)
      case other => other
    }
    strip(org.apache.spark.sql.graft.ColumnBridge.expr(c)) match {
      // DISTINCT aggregates are NOT sum-mergeable even when the base
      // function is: the same value lands in several salt groups of one
      // key and is counted once per salt, so summed partials inflate
      case a: AggregateExpression if a.isDistinct => false
      case a: AggregateExpression => a.aggregateFunction match {
        case _: Sum | _: Count => true
        case _ => false
      }
      case f: UnresolvedFunction if f.isDistinct => false
      case f: UnresolvedFunction =>
        Set("sum", "count").contains(f.nameParts.last.toLowerCase)
      case _ => false
    }
  }

  /** Skewed-fact ⋈ small-dim with explicit salting: the dim is
    * replicated `salt` times (it is small by precondition), the fact
    * side gets a random-but-deterministic salt from its row identity,
    * and the join key becomes (key, salt) — a hot fact key now lands on
    * `salt` reducers instead of one. */
  def saltedBroadcastSkewJoin(fact: DataFrame, dim: DataFrame, key: String,
      salt: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(col(key) +: fact.columns.take(2).map(col): _*), lit(salt)))
    val explodedDim = dim
      .withColumn("_salt", explode(sequence(lit(0L), lit(salt - 1L))))
    saltedFact.join(broadcast(explodedDim), Seq(key, "_salt")).drop("_salt")
  }
}
