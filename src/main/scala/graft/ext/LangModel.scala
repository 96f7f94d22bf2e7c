package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Count-based word-bigram language model for corpus quality filtering —
  * the CCNet recipe (Wenzek et al. 2020, arXiv:1911.00359): train a
  * small LM on a trusted reference slice, score every candidate
  * document's perplexity under it, and keep the low-perplexity band.
  * (CCNet uses a 5-gram KenLM; the distributed formulation is identical
  * for any fixed n — counts are a groupBy, scoring is a join — so we
  * implement n=2 with add-α smoothing, which keeps the model a plain
  * DataFrame instead of an opaque binary.)
  *
  * Scale story: training is two hash aggregations over the exploded
  * bigram stream (map-side partial combine does the heavy lifting — the
  * shuffle carries one row per DISTINCT bigram, not per token). Scoring
  * joins the candidate corpus's bigrams against the model on the bigram
  * key; Catalyst broadcasts the model when it is small (a trusted slice
  * of fixed size ⇒ model size is corpus-independent) and falls back to a
  * shuffle join when it is not. Nothing driver-side scales with data:
  * the only scalar is the vocabulary size (one count).
  *
  * Determinism discipline (same as the t12/x-suite convention): each
  * per-bigram log-probability is rounded to 9 decimals and summed as an
  * exact DECIMAL — order-independent, so `local[32]` answers are
  * 1000-executor answers, and the DuckDB oracle running the identical
  * formulation hash-matches.
  */
object LangModel {

  /** Smoothed bigram model as data: bigram counts, unigram (context)
    * counts, and the vocabulary size. All three are plain values — the
    * model can be persisted as two parquet tables and a scalar. */
  final case class BigramModel(bi: DataFrame, uni: DataFrame, vocabSize: Long)

  private def toks(textCol: Column): Column = split(trim(textCol), "\\s+")

  /** (id, w1, w2) — one row per in-document word bigram. The index
    * sequence is guarded so 0/1-token documents contribute no rows
    * (`sequence(0, -1)` would throw, not return empty). */
  def bigrams(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(col(textCol))
    df.select(col(idCol), t.as("t"))
      .select(col(idCol),
        explode(when(size(col("t")) >= 2, sequence(lit(0), size(col("t")) - 2))
          .otherwise(array().cast("array<int>"))).as("i"),
        col("t"))
      .select(col(idCol),
        element_at(col("t"), col("i") + 1).as("w1"),
        element_at(col("t"), col("i") + 2).as("w2"))
  }

  /** Train on a reference corpus: two aggregations, one vocabulary
    * count (|V| = distinct token types — the add-α event space, so an
    * unseen context backs off to the uniform 1/V, not to certainty).
    * The returned count frames are what a 100-TB run would persist;
    * `vocabSize` is the one driver scalar (model metadata). */
  def train(reference: DataFrame, idCol: String, textCol: String): BigramModel = {
    val big = bigrams(reference, idCol, textCol)
    val bi = big.groupBy("w1", "w2").agg(count(lit(1)).cast("double").as("c12"))
    val uni = big.groupBy("w1").agg(count(lit(1)).cast("double").as("c1"))
    val vocab = reference
      .select(explode(toks(col(textCol))).as("w")).distinct().count()
    BigramModel(bi, uni, vocab)
  }

  /** Score candidate docs under the model: per-doc bigram count, average
    * negative log-likelihood, and perplexity (e^avg_nll). Unseen bigrams
    * and unseen contexts are handled by add-α smoothing:
    * P(w2|w1) = (c(w1,w2)+α) / (c(w1)+α·V). Output columns:
    * (idCol, n_bigrams, avg_nll, ppl) — filter `avg_nll` / `ppl` against
    * a band to implement the CCNet head/middle/tail split. */
  def score(docs: DataFrame, model: BigramModel, idCol: String,
      textCol: String, alpha: Double = 0.1): DataFrame = {
    val big = bigrams(docs, idCol, textCol)
    val term = round(
      log((coalesce(col("c12"), lit(0.0)) + alpha) /
          (coalesce(col("c1"), lit(0.0)) + alpha * model.vocabSize)), 9)
      .cast(DecimalType(28, 10))
    big
      .join(model.bi, Seq("w1", "w2"), "left")
      .join(model.uni, Seq("w1"), "left")
      .select(col(idCol), term.as("term"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        (-sum(col("term"))).as("nll_dec"))
      .withColumn("avg_nll",
        round(col("nll_dec").cast("double") / col("n_bigrams"), 6))
      .withColumn("ppl",
        round(exp(col("nll_dec").cast("double") / col("n_bigrams")), 6))
      .drop("nll_dec")
  }

  /** Keep the low-perplexity band (quality gate): docs whose perplexity
    * under the reference model is ≤ `maxPpl`, plus optionally docs with
    * too few bigrams to score (kept by default — no evidence against
    * them). Returns the original rows. */
  def perplexityFilter(docs: DataFrame, model: BigramModel, idCol: String,
      textCol: String, maxPpl: Double, alpha: Double = 0.1,
      keepUnscored: Boolean = true): DataFrame = {
    val scored = score(docs, model, idCol, textCol, alpha)
      .select(col(idCol), col("ppl"))
    val joined = docs.join(scored, Seq(idCol), "left")
    (if (keepUnscored) joined.filter(col("ppl").isNull || col("ppl") <= maxPpl)
     else joined.filter(col("ppl") <= maxPpl)).drop("ppl")
  }
}
