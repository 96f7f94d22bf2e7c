package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Count-based word n-gram language model for corpus quality filtering —
  * the CCNet recipe (Wenzek et al. 2020, arXiv:1911.00359): train a
  * small LM on a trusted reference slice, score every candidate
  * document's perplexity under it, and keep the low-perplexity band.
  * (CCNet uses a 5-gram KenLM; here `n` is a parameter — counts are a
  * groupBy and scoring is a join for ANY fixed n, with add-α smoothing,
  * which keeps the model a plain pair of DataFrames instead of an
  * opaque binary. Default n=2.)
  *
  * Scale story: training is two hash aggregations over the exploded
  * n-gram stream (map-side partial combine does the heavy lifting — the
  * shuffle carries one row per DISTINCT n-gram, not per token). Scoring
  * joins the candidate corpus's n-grams against the model on the
  * (context, word) key; Catalyst broadcasts the model when it is small
  * (a trusted slice of fixed size ⇒ model size is corpus-independent)
  * and falls back to a shuffle join when it is not. The context key is
  * the real token ARRAY, not a separator-joined string — no silent
  * collision when a token contains the separator. Nothing driver-side
  * scales with data: the only scalar is the vocabulary size (one count).
  *
  * Determinism discipline (same as the t12/x-suite convention): each
  * per-gram log-probability is rounded to 9 decimals and summed as an
  * exact DECIMAL — order-independent, so `local[32]` answers are
  * 1000-executor answers, and the DuckDB oracle running the identical
  * formulation hash-matches.
  */
object LangModel {

  /** Smoothed n-gram model as data: n-gram counts keyed by
    * (ctx: array of n−1 tokens, w), context counts, and the vocabulary
    * size. All plain values — the model can be persisted as two parquet
    * tables and two scalars. [[train]] caches both count frames (the
    * in-session stand-in for that persist); call [[unpersist]] when the
    * model is retired. */
  final case class NGramModel(n: Int, grams: DataFrame, ctxs: DataFrame,
      vocabSize: Long) {
    def unpersist(): Unit = { grams.unpersist(); ctxs.unpersist() }
  }

  private def toks(textCol: Column): Column = split(trim(textCol), "\\s+")

  /** (id, ctx, w) — one row per in-document word n-gram, with
    * ctx = the n−1 preceding tokens as an array. The index sequence is
    * guarded so documents shorter than n tokens contribute no rows
    * (`sequence(0, -1)` would throw, not return empty). */
  def grams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 2, s"n-gram order must be >= 2, got $n")
    val t = toks(col(textCol))
    df.select(col(idCol), t.as("t"))
      .select(col(idCol),
        explode(when(size(col("t")) >= n, sequence(lit(0), size(col("t")) - n))
          .otherwise(array().cast("array<int>"))).as("i"),
        col("t"))
      .select(col(idCol),
        slice(col("t"), col("i") + 1, lit(n - 1)).as("ctx"),
        element_at(col("t"), col("i") + lit(n)).as("w"))
  }

  /** n=2 view with the classic (id, w1, w2) shape. */
  def bigrams(df: DataFrame, idCol: String, textCol: String): DataFrame =
    grams(df, idCol, textCol, 2)
      .select(col(idCol), element_at(col("ctx"), 1).as("w1"), col("w").as("w2"))

  /** Train on a reference corpus: ONE aggregation over the exploded
    * gram stream plus one vocabulary count (|V| = distinct token types —
    * the add-α event space, so an unseen context backs off to the
    * uniform 1/V, not to certainty). Context counts are re-aggregated
    * from the gram counts (Σ c(ctx,w) ≡ c(ctx)), so the corpus is
    * scanned twice total (grams + vocab), not once per count frame —
    * and both count frames are cached, the in-session stand-in for the
    * parquet persist a 100-TB run would do, so [[score]]'s two model
    * joins read the materialized model instead of re-deriving it from
    * the reference corpus. `vocabSize` stays a driver scalar (model
    * metadata). Vocab counts tokens of ALL reference docs, including
    * those too short to emit a gram — same event space as before. */
  def train(reference: DataFrame, idCol: String, textCol: String,
      n: Int = 2): NGramModel = {
    val g = grams(reference, idCol, textCol, n)
    val gc = g.groupBy("ctx", "w").agg(count(lit(1)).cast("double").as("cN"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cc = gc.groupBy("ctx").agg(sum(col("cN")).as("cCtx"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = reference
      .select(explode(toks(col(textCol))).as("w")).distinct().count()
    NGramModel(n, gc, cc, vocab)
  }

  /** Score candidate docs under the model: per-doc n-gram count, average
    * negative log-likelihood, and perplexity (e^avg_nll). Unseen grams
    * and unseen contexts are handled by add-α smoothing:
    * P(w|ctx) = (c(ctx,w)+α) / (c(ctx)+α·V). Output columns:
    * (idCol, n_grams, avg_nll, ppl) — filter `avg_nll` / `ppl` against
    * a band to implement the CCNet head/middle/tail split. */
  def score(docs: DataFrame, model: NGramModel, idCol: String,
      textCol: String, alpha: Double = 0.1): DataFrame = {
    val g = grams(docs, idCol, textCol, model.n)
    val term = round(
      log((coalesce(col("cN"), lit(0.0)) + alpha) /
          (coalesce(col("cCtx"), lit(0.0)) + alpha * model.vocabSize)), 9)
      .cast(DecimalType(28, 10))
    g
      .join(model.grams, Seq("ctx", "w"), "left")
      .join(model.ctxs, Seq("ctx"), "left")
      .select(col(idCol), term.as("term"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        (-sum(col("term"))).as("nll_dec"))
      .withColumn("avg_nll",
        round(col("nll_dec").cast("double") / col("n_grams"), 6))
      .withColumn("ppl",
        round(exp(col("nll_dec").cast("double") / col("n_grams")), 6))
      .drop("nll_dec")
  }

  /** CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3): bucket
    * documents by perplexity quantile under the reference model — the
    * head (lowest-ppl) slice is the highest-quality training cut. The
    * two thresholds come from ONE percentile aggregation over the
    * 6-rounded ppl scores (a 1-row broadcast; at 100 TB swap the exact
    * percentile for approx_percentile — the label column is the same
    * CASE either way). Unscorable docs (< n tokens) label 'unscored'.
    * Output: (idCol, ppl, bucket). */
  def perplexitySplit(docs: DataFrame, model: NGramModel, idCol: String,
      textCol: String, headFrac: Double = 1.0 / 3, tailFrac: Double = 1.0 / 3,
      alpha: Double = 0.1): DataFrame =
    perplexitySplitScored(docs.select(col(idCol)),
      score(docs, model, idCol, textCol, alpha), idCol, headFrac, tailFrac)

  /** [[perplexitySplit]] over an already-materialized score table — the
    * production shape (CCNet scores once, then filters and splits read
    * the score table; without it the split's two consumers — threshold
    * agg and labeling — would each re-run the whole scoring plan). */
  def perplexitySplitScored(ids: DataFrame, scoredTable: DataFrame,
      idCol: String, headFrac: Double = 1.0 / 3,
      tailFrac: Double = 1.0 / 3): DataFrame = {
    val scored = ids.join(scoredTable.select(col(idCol), col("ppl")),
      Seq(idCol), "left")
    val cuts = broadcast(scored.filter(col("ppl").isNotNull)
      .agg(percentile(col("ppl"), lit(headFrac)).as("t_head"),
        percentile(col("ppl"), lit(1.0 - tailFrac)).as("t_tail")))
    scored.crossJoin(cuts)
      .select(col(idCol), col("ppl"),
        when(col("ppl").isNull, "unscored")
          .when(col("ppl") <= col("t_head"), "head")
          .when(col("ppl") > col("t_tail"), "tail")
          .otherwise("middle").as("bucket"))
  }

  /** Keep the low-perplexity band (quality gate): docs whose perplexity
    * under the reference model is ≤ `maxPpl`, plus optionally docs with
    * too few tokens to score (kept by default — no evidence against
    * them). Returns the original rows. */
  def perplexityFilter(docs: DataFrame, model: NGramModel, idCol: String,
      textCol: String, maxPpl: Double, alpha: Double = 0.1,
      keepUnscored: Boolean = true): DataFrame = {
    val scored = score(docs, model, idCol, textCol, alpha)
      .select(col(idCol), col("ppl"))
    val joined = docs.join(scored, Seq(idCol), "left")
    (if (keepUnscored) joined.filter(col("ppl").isNull || col("ppl") <= maxPpl)
     else joined.filter(col("ppl") <= maxPpl)).drop("ppl")
  }
}
