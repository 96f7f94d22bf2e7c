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
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.definitions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => GraftOptimizations)
  }
}

/** Optimizer rule for the custom kernels — the simplifications
  * Catalyst cannot know about because the semantics live in this
  * library: IDEMPOTENT kernels collapse when nested. Real plans stack
  * them: [[graft.ext.Frontier.seedsFromSitemaps]] emits canonical
  * URLs, and a defensive caller (or [[graft.ext.Frontier
  * .recrawlCandidates]] over already-canonical store urls) normalizes
  * again — without this rule every such row pays a second full parse.
  * Injected at session build by [[GraftExtensions]]
  * (`spark.sql.extensions`) or appended to
  * `spark.experimental.extraOptimizations` by
  * [[GraftExtensions.register]] (the notebook/test path). */
object GraftOptimizations
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.transformAllExpressions {
      // normalizeUrl is idempotent by construction (output is the
      // canonical form; UrlOpsSpec pins it property-style)
      case UrlExpressions.NormalizeUrlExpr(
          inner: UrlExpressions.NormalizeUrlExpr) => inner
      // unicode normalization is idempotent per form (UAX #15)
      case TextExpressions.UnicodeNormalizeExpr(
          inner @ TextExpressions.UnicodeNormalizeExpr(_, f2), f1)
          if f1 == f2 => inner
      // mojibake repair is a fixed point after one application for the
      // single-mis-decode case it targets; double application is NOT
      // collapsed (deliberately: double-mojibake needs both passes)
    }
}

object GraftExtensions {

  private def info(className: String, name: String, usage: String) =
    new ExpressionInfo(className, null, name, usage, "")
  private val VEC = "graft.functions.VectorExpressions"
  private val TXT = "graft.functions.TextExpressions"
  private val SKA = "graft.functions.SketchAggregates"
  private val QSK = "graft.functions.QuantileSketches"

  private def analysisError(errorClass: String, params: (String, String)*): Nothing =
    throw new org.apache.spark.sql.AnalysisException(errorClass, params.toMap)

  /** Arity gate: a wrong argument count is an analysis error naming the
    * function (WRONG_NUM_ARGS), not an IndexOutOfBoundsException out of
    * a bare es(1). */
  private def arity(fn: String, n: Int, es: Seq[Expression]): Seq[Expression] = {
    if (es.length != n)
      analysisError("WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        "functionName" -> s"`$fn`", "expectedNum" -> n.toString,
        "actualNum" -> es.length.toString,
        "docroot" -> "https://spark.apache.org/docs/latest")
    es
  }

  /** Constructor `require`s (even k, positive capacity) surface as
    * IllegalArgumentException during analysis; rethrow them as analysis
    * errors that name the SQL function. */
  private def building[A](fn: String)(body: => A): A =
    try body catch {
      case e: IllegalArgumentException =>
        // no stock error class covers "literal violates the function's
        // value constraint" (even k, positive capacity) — raise a
        // plain-message AnalysisException that names the function
        // instead of letting the bare require() escape analysis
        throw new org.apache.spark.sql.AnalysisException(
          s"Invalid argument to `$fn`: ${String.valueOf(e.getMessage)}",
          None, None, None, None, Map.empty[String, String],
          Array.empty[org.apache.spark.QueryContext])
    }

  /** Plan-time literal int argument, validated: a non-foldable or
    * wrong-typed argument is an ANALYSIS error naming the function, not
    * a bare ClassCastException/NPE out of the eager `eval()` (these
    * parameters size aggregation buffers, so they must be literals —
    * the same contract as Spark's own `approx_percentile` accuracy). */
  private def litInt(fn: String, param: String, paramIndex: Int,
      e: Expression): Int = {
    if (!e.foldable)
      analysisError("NON_FOLDABLE_ARGUMENT",
        "funcName" -> s"`$fn`", "paramName" -> s"`$param`",
        "paramType" -> "\"INT\"")
    e.eval() match {
      case i: java.lang.Integer => i.intValue
      case b: java.lang.Byte => b.toInt
      case s: java.lang.Short => s.toInt
      case l: java.lang.Long if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
      case _ => analysisError("UNEXPECTED_INPUT_TYPE",
        "paramIndex" -> s"`$paramIndex`", "functionName" -> s"`$fn`",
        "requiredType" -> "\"INT\"", "inputSql" -> s""""${e.sql}"""",
        "inputType" -> s""""${e.dataType.sql}"""")
    }
  }

  /** String twin of [[litInt]] — for literal mode/form parameters. */
  private def litString(fn: String, param: String, paramIndex: Int,
      e: Expression): String = {
    if (!e.foldable)
      analysisError("NON_FOLDABLE_ARGUMENT",
        "funcName" -> s"`$fn`", "paramName" -> s"`$param`",
        "paramType" -> "\"STRING\"")
    e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case s: String => s
      case _ => analysisError("UNEXPECTED_INPUT_TYPE",
        "paramIndex" -> s"`$paramIndex`", "functionName" -> s"`$fn`",
        "requiredType" -> "\"STRING\"", "inputSql" -> s""""${e.sql}"""",
        "inputType" -> s""""${e.dataType.sql}"""")
    }
  }

  /** Plan-time literal numeric-array argument (quantile probabilities),
    * validated + widened to double: `array(0.5, 1)` parses as a decimal
    * array in SQL and must work; a string array or a null element is an
    * analysis error, not a ClassCastException. */
  private def litDoubleArray(fn: String, param: String, paramIndex: Int,
      e: Expression): Seq[Double] = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType, NumericType}
    if (!e.foldable)
      analysisError("NON_FOLDABLE_ARGUMENT",
        "funcName" -> s"`$fn`", "paramName" -> s"`$param`",
        "paramType" -> "\"ARRAY<DOUBLE>\"")
    def typeError(): Nothing = analysisError("UNEXPECTED_INPUT_TYPE",
      "paramIndex" -> s"`$paramIndex`", "functionName" -> s"`$fn`",
      "requiredType" -> "\"ARRAY<DOUBLE>\"", "inputSql" -> s""""${e.sql}"""",
      "inputType" -> s""""${e.dataType.sql}"""")
    e.dataType match {
      case ArrayType(_: NumericType, _) =>
        val arr = Cast(e, ArrayType(DoubleType, containsNull = true))
          .eval().asInstanceOf[ArrayData]
        if (arr == null || (0 until arr.numElements()).exists(arr.isNullAt))
          // a null array / null element is a VALUE problem, not a type
          // problem — UNEXPECTED_INPUT_TYPE would echo the (correct)
          // declared type back as the complaint
          throw new org.apache.spark.sql.AnalysisException(
            s"Invalid argument to `$fn`: `$param` must be a non-null " +
              s"array of non-null probabilities, got ${e.sql}",
            None, None, None, None, Map.empty[String, String],
            Array.empty[org.apache.spark.QueryContext])
        (0 until arr.numElements()).map(arr.getDouble)
      case _ => typeError()
    }
  }

  val definitions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info(VEC, "graft_dot", "graft_dot(a, b) - dot product of two float arrays (double)"),
      (es: Seq[Expression]) => { arity("graft_dot", 2, es)
        VectorExpressions.DotProductFloat(es(0), es(1)) }),
    (FunctionIdentifier("graft_intersect_count"),
      info(VEC, "graft_intersect_count",
        "graft_intersect_count(a, b) - |A inter B| of two sorted distinct long arrays"),
      (es: Seq[Expression]) => { arity("graft_intersect_count", 2, es)
        VectorExpressions.SortedIntersectCount(es(0), es(1)) }),
    (FunctionIdentifier("graft_uni_bigrams"),
      info(TXT, "graft_uni_bigrams",
        "graft_uni_bigrams(tokens) - unigrams ++ space-joined bigrams of a token array"),
      (es: Seq[Expression]) => { arity("graft_uni_bigrams", 1, es)
        TextExpressions.UnigramBigramConcat(es(0)) }),
    (FunctionIdentifier("graft_word_ngrams"),
      info(TXT, "graft_word_ngrams",
        "graft_word_ngrams(tokens, n) - space-joined adjacent n-grams (n a literal int)"),
      (es: Seq[Expression]) => { arity("graft_word_ngrams", 2, es)
        building("graft_word_ngrams")(TextExpressions.WordNgramConcat(es(0),
          litInt("graft_word_ngrams", "n", 1, es(1)))) }),
    (FunctionIdentifier("graft_ngram_repetition"),
      info(TXT, "graft_ngram_repetition",
        "graft_ngram_repetition(grams) - (top, topg, dup) Gopher repetition stats"),
      (es: Seq[Expression]) => { arity("graft_ngram_repetition", 1, es)
        TextExpressions.NgramRepetitionFold(es(0)) }),
    (FunctionIdentifier("graft_double_order_bits"),
      info(VEC, "graft_double_order_bits",
        "graft_double_order_bits(v) - IEEE-754 total-order long key of a double"),
      (es: Seq[Expression]) => { arity("graft_double_order_bits", 1, es)
        VectorExpressions.DoubleOrderBits(es(0)) }),
    (FunctionIdentifier("graft_space_saving_topk"),
      info(SKA, "graft_space_saving_topk",
        "graft_space_saving_topk(key, capacity) - Space-Saving heavy-hitter summary " +
          "array<struct<term, count, err>> (capacity a literal int)"),
      (es: Seq[Expression]) => { arity("graft_space_saving_topk", 2, es)
        building("graft_space_saving_topk")(SketchAggregates.SpaceSavingTopK(es(0),
          litInt("graft_space_saving_topk", "capacity", 1, es(1)))
          .toAggregateExpression()) }),
    (FunctionIdentifier("graft_quantile_sketch"),
      info(QSK, "graft_quantile_sketch",
        "graft_quantile_sketch(v, k) - compactor-stack quantile summary " +
          "struct<items array<struct<value, weight>>, exact> (k a literal int)"),
      (es: Seq[Expression]) => { arity("graft_quantile_sketch", 2, es)
        building("graft_quantile_sketch")(QuantileSketches.QuantileSketchAgg(es(0),
          litInt("graft_quantile_sketch", "k", 1, es(1))).toAggregateExpression()) }),
    (FunctionIdentifier("graft_quantile_merge"),
      info(QSK, "graft_quantile_merge",
        "graft_quantile_merge(summary, k) - merge persisted quantile summaries"),
      (es: Seq[Expression]) => { arity("graft_quantile_merge", 2, es)
        building("graft_quantile_merge")(QuantileSketches.QuantileSketchMergeAgg(es(0),
          litInt("graft_quantile_merge", "k", 1, es(1))).toAggregateExpression()) }),
    (FunctionIdentifier("graft_sketch_quantiles"),
      info(QSK, "graft_sketch_quantiles",
        "graft_sketch_quantiles(summary, probs) - interpolated quantiles from a " +
          "summary (probs a literal double array)"),
      (es: Seq[Expression]) => { arity("graft_sketch_quantiles", 2, es)
        building("graft_sketch_quantiles")(QuantileSketches.SketchQuantiles(es(0),
          litDoubleArray("graft_sketch_quantiles", "probs", 1, es(1)))) }),
    (FunctionIdentifier("graft_html_blocks"),
      info("graft.functions.HtmlExpressions", "graft_html_blocks",
        "graft_html_blocks(html) - visible-text blocks " +
          "array<struct<text, chars, link_chars, container>>"),
      (es: Seq[Expression]) => { arity("graft_html_blocks", 1, es)
        HtmlExpressions.HtmlBlocksExpr(es(0)) }),
    (FunctionIdentifier("graft_warc_records"),
      info("graft.ext.Warc", "graft_warc_records",
        "graft_warc_records(blob) - WARC records of a capture blob " +
          "array<struct<version, headers, payload>>"),
      (es: Seq[Expression]) => { arity("graft_warc_records", 1, es)
        graft.ext.Warc.WarcRecordsExpr(es(0)) }),
    (FunctionIdentifier("graft_url_parts"),
      info("graft.functions.UrlExpressions", "graft_url_parts",
        "graft_url_parts(url) - struct<scheme,host,port,path,query,fragment> " +
          "(null when not scheme://host)"),
      (es: Seq[Expression]) => { arity("graft_url_parts", 1, es)
        UrlExpressions.UrlPartsExpr(es(0)) }),
    (FunctionIdentifier("graft_url_resolve"),
      info("graft.functions.UrlExpressions", "graft_url_resolve",
        "graft_url_resolve(base, ref) - RFC 3986 reference resolution of an " +
          "href against its page URL (null when base is not scheme://host)"),
      (es: Seq[Expression]) => { arity("graft_url_resolve", 2, es)
        UrlExpressions.UrlResolveExpr(es(0), es(1)) }),
    (FunctionIdentifier("graft_html_links"),
      info("graft.functions.HtmlExpressions", "graft_html_links",
        "graft_html_links(html) - out-links of a page " +
          "array<struct<href, anchor>> (href entity-decoded, anchor collapsed)"),
      (es: Seq[Expression]) => { arity("graft_html_links", 1, es)
        HtmlExpressions.HtmlLinksExpr(es(0)) }),
    (FunctionIdentifier("graft_robots_rules"),
      info("graft.ext.Robots", "graft_robots_rules",
        "graft_robots_rules(txt, agent) - the robots.txt rules applying to agent, " +
          "array<struct<allow, pattern>> (RFC 9309 group selection)"),
      (es: Seq[Expression]) => { arity("graft_robots_rules", 2, es)
        graft.ext.Robots.RobotsRulesExpr(es(0), es(1)) }),
    (FunctionIdentifier("graft_robots_allowed"),
      info("graft.ext.Robots", "graft_robots_allowed",
        "graft_robots_allowed(target, rules) - RFC 9309 longest-match decision " +
          "(allow wins ties; no match allows)"),
      (es: Seq[Expression]) => { arity("graft_robots_allowed", 2, es)
        graft.ext.Robots.RobotsAllowedExpr(es(0), es(1)) }),
    (FunctionIdentifier("graft_bounded_topk"),
      info("graft.functions.TopKAggregate", "graft_bounded_topk",
        "graft_bounded_topk(score, term, k) - per-group top-k by (score desc, " +
          "term asc) as array<struct<term, score>> (k a literal int)"),
      (es: Seq[Expression]) => { arity("graft_bounded_topk", 3, es)
        building("graft_bounded_topk")(TopKAggregate.BoundedTopK(es(0), es(1),
          litInt("graft_bounded_topk", "k", 2, es(2))).toAggregateExpression()) }),
    (FunctionIdentifier("graft_normalize_url"),
      info("graft.functions.UrlExpressions", "graft_normalize_url",
        "graft_normalize_url(url) - canonical URL (lowercase scheme/host, " +
          "default ports dropped, sorted query minus tracking params, no " +
          "fragment; null when not scheme://host)"),
      (es: Seq[Expression]) => { arity("graft_normalize_url", 1, es)
        UrlExpressions.NormalizeUrlExpr(es(0)) }),
    (FunctionIdentifier("graft_sitemap_entries"),
      info("graft.ext.Sitemap", "graft_sitemap_entries",
        "graft_sitemap_entries(payload) - entries of a fetched sitemap " +
          "(urlset/sitemapindex/plain-text, gzip sniffed) as " +
          "array<struct<loc, lastmod, kind>>"),
      (es: Seq[Expression]) => { arity("graft_sitemap_entries", 1, es)
        graft.ext.Sitemap.SitemapEntriesExpr(es(0)) }),
    (FunctionIdentifier("graft_http_body_text"),
      info("graft.ext.Warc", "graft_http_body_text",
        "graft_http_body_text(payload) - HTTP response body as decoded text " +
          "(de-chunk, inflate, charset pick, decode — one kernel)"),
      (es: Seq[Expression]) => { arity("graft_http_body_text", 1, es)
        graft.ext.Warc.HttpBodyTextExpr(es(0)) }),
    (FunctionIdentifier("graft_unicode_normalize"),
      info("graft.functions.TextExpressions", "graft_unicode_normalize",
        "graft_unicode_normalize(text, form) - UAX #15 normalization " +
          "(form a literal: 'NFC'|'NFD'|'NFKC'|'NFKD')"),
      (es: Seq[Expression]) => { arity("graft_unicode_normalize", 2, es)
        building("graft_unicode_normalize")(TextExpressions.UnicodeNormalizeExpr(
          es(0), litString("graft_unicode_normalize", "form", 1, es(1)))) }),
    (FunctionIdentifier("graft_fix_mojibake"),
      info("graft.functions.TextExpressions", "graft_fix_mojibake",
        "graft_fix_mojibake(text) - repair UTF-8 mis-decoded as " +
          "Latin-1/Windows-1252; untouched when the round-trip fails"),
      (es: Seq[Expression]) => { arity("graft_fix_mojibake", 1, es)
        TextExpressions.FixMojibakeExpr(es(0)) }))
  // (graft_lsh_signature / graft_unigram_viterbi stay Column-API-only:
  // their models — the hyperplane matrix, the piece table — are driver
  // artifacts that have no SQL literal form.)

  /** Register into an already-built session (functions AND the
    * optimizer rule, via the experimental-methods hook — the only
    * post-build rule injection Spark exposes). */
  def register(spark: SparkSession): Unit = {
    definitions.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        ident.funcName, builder, "built-in")
    }
    if (!spark.experimental.extraOptimizations.contains(GraftOptimizations))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ GraftOptimizations
  }
}
