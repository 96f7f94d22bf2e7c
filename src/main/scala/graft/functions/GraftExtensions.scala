package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the custom expressions, two ways:
  *
  *  1. [[GraftExtensions]] — a `SparkSessionExtensions` injector for
  *     `spark.sql.extensions=graft.functions.GraftExtensions` (the
  *     deployment path: every session in the cluster gets the
  *     functions at build time, usable from pure SQL).
  *  2. [[register]] — imperative registration into an existing
  *     session's FunctionRegistry (the notebook/test path).
  *
  * After either, `SELECT graft_dot(a.embedding, b.embedding)` works in
  * `spark.sql(...)` alongside the typed Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions.VectorExpressions", null, name, usage, "")

  val definitions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two float arrays (double)"),
      (es: Seq[Expression]) => VectorExpressions.DotProductFloat(es(0), es(1))),
    (FunctionIdentifier("graft_intersect_count"),
      info("graft_intersect_count",
        "graft_intersect_count(a, b) - |A inter B| of two sorted distinct long arrays"),
      (es: Seq[Expression]) => VectorExpressions.SortedIntersectCount(es(0), es(1))),
    (FunctionIdentifier("graft_uni_bigrams"),
      info("graft_uni_bigrams",
        "graft_uni_bigrams(tokens) - unigrams ++ space-joined bigrams of a token array"),
      (es: Seq[Expression]) => TextExpressions.UnigramBigramConcat(es(0))),
    (FunctionIdentifier("graft_word_ngrams"),
      info("graft_word_ngrams",
        "graft_word_ngrams(tokens, n) - space-joined adjacent n-grams (n a literal int)"),
      (es: Seq[Expression]) => TextExpressions.WordNgramConcat(es(0),
        es(1).eval().asInstanceOf[Int])),
    (FunctionIdentifier("graft_ngram_repetition"),
      info("graft_ngram_repetition",
        "graft_ngram_repetition(grams) - (top, topg, dup) Gopher repetition stats"),
      (es: Seq[Expression]) => TextExpressions.NgramRepetitionFold(es(0))),
    (FunctionIdentifier("graft_double_order_bits"),
      info("graft_double_order_bits",
        "graft_double_order_bits(v) - IEEE-754 total-order long key of a double"),
      (es: Seq[Expression]) => VectorExpressions.DoubleOrderBits(es(0))),
    (FunctionIdentifier("graft_space_saving_topk"),
      info("graft_space_saving_topk",
        "graft_space_saving_topk(key, capacity) - Space-Saving heavy-hitter summary " +
          "array<struct<term, count, err>> (capacity a literal int)"),
      (es: Seq[Expression]) => SketchAggregates.SpaceSavingTopK(es(0),
        es(1).eval().asInstanceOf[Int]).toAggregateExpression()),
    (FunctionIdentifier("graft_quantile_sketch"),
      info("graft_quantile_sketch",
        "graft_quantile_sketch(v, k) - compactor-stack quantile summary " +
          "struct<items array<struct<value, weight>>, exact> (k a literal int)"),
      (es: Seq[Expression]) => QuantileSketches.QuantileSketchAgg(es(0),
        es(1).eval().asInstanceOf[Int]).toAggregateExpression()),
    (FunctionIdentifier("graft_quantile_merge"),
      info("graft_quantile_merge",
        "graft_quantile_merge(summary, k) - merge persisted quantile summaries"),
      (es: Seq[Expression]) => QuantileSketches.QuantileSketchMergeAgg(es(0),
        es(1).eval().asInstanceOf[Int]).toAggregateExpression()),
    (FunctionIdentifier("graft_sketch_quantiles"),
      info("graft_sketch_quantiles",
        "graft_sketch_quantiles(summary, probs) - interpolated quantiles from a " +
          "summary (probs a literal double array)"),
      (es: Seq[Expression]) => QuantileSketches.SketchQuantiles(es(0),
        es(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toDoubleArray().toSeq)))

  /** Register into an already-built session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        ident.funcName, builder, "built-in")
    }
}
