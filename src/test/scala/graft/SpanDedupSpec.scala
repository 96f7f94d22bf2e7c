package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Exact substring-span dedup (Lee et al. ExactSubstr semantics):
  * sliding duplicated windows keep exactly one corpus-wide occurrence,
  * removal is offset-robust, untouched docs pass through byte-identical. */
class SpanDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], l: Int): Map[Long, (Long, Long, String)] =
    Dedup.removeDuplicateSpans(docs.toDF("id", "text"), "id", "text", windowTokens = l)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("a shared span keeps its first occurrence and vanishes from later docs, at any offset") {
    val span = (1 to 6).map(i => s"s$i").mkString(" ") // 6 shared tokens
    val docs = Seq(
      1L -> s"alpha beta $span gamma",
      2L -> s"x1 x2 x3 x4 x5 $span y1 y2", // different offset
      3L -> "untouched document with plainly unique words")
    val out = run(docs, 6)
    assert(out(1L) == ((9L, 0L, docs(0)._2))) // keeper: intact
    assert(out(2L) == ((13L, 6L, "x1 x2 x3 x4 x5 y1 y2")))
    assert(out(3L)._2 == 0L && out(3L)._3 == docs(2)._2)
  }

  test("an exact duplicate document empties entirely; the keeper survives") {
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    val out = run(Seq(1L -> text, 2L -> text), 4)
    assert(out(1L) == ((10L, 0L, text)))
    assert(out(2L) == ((10L, 10L, "")))
  }

  test("a self-repeat within one doc keeps the first copy only") {
    val rep = "r1 r2 r3 r4"
    val out = run(Seq(1L -> s"$rep mid1 mid2 $rep tail"), 4)
    assert(out(1L)._2 == 4L)
    assert(out(1L)._3 == s"$rep mid1 mid2 tail")
  }

  test("windows shorter than the threshold never trigger; empty docs pass") {
    val out = run(Seq(1L -> "a b c", 2L -> "a b c", 3L -> ""), 4)
    assert(out(1L) == ((3L, 0L, "a b c")))
    assert(out(2L) == ((3L, 0L, "a b c")))
    assert(out(3L) == ((0L, 0L, "")))
  }

  test("three occurrences: one keeper, two removed; counts exact") {
    val span = "p q r s"
    val out = run(Seq(
      1L -> s"lead $span",
      2L -> s"$span trail",
      3L -> s"m1 m2 $span m3"), 4)
    val removed = out.values.map(_._2).sum
    assert(out(1L)._2 == 0L) // (1, start 1) vs (2, start 0): doc order wins
    assert(removed == 8L)
    assert(!out(2L)._3.contains("q") && !out(3L)._3.contains("q"))
  }

  test("two-phase plan contract: no corpus-wide exchange carries window strings") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val docs = (1L to 40L).map(i =>
      (i, if (i % 2 == 0) "shared span one two three four five six"
          else s"unique u$i v$i w$i x$i y$i z$i q$i"))
    val out = Dedup.removeDuplicateSpans(docs.toDF("id", "text"), "id", "text", 6)
    out.collect() // materialize AQE's final plan
    def flat(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flat(a.executedPlan)
      case q: QueryStageExec => flat(q.plan)
      case other => other +: other.children.flatMap(flat)
    }
    def subtreeHasJoin(p: SparkPlan): Boolean =
      flat(p).exists(_.isInstanceOf[BaseJoinExec])
    val shuffles = flat(out.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.nonEmpty)
    // an exchange whose rows include the L-token window string must be
    // candidate-sized: its subtree contains the dup-hash (semi) join
    // that gates phase 2 — a string-bearing exchange fed straight from
    // the corpus scan is the r12 ~L×-bytes shuffle this test forbids
    shuffles.filter(_.output.exists(_.name == "__w")).foreach { s =>
      assert(subtreeHasJoin(s),
        s"corpus-wide exchange carries window strings:\n$s")
    }
  }
}
