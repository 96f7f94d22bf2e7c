package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DSIR — Data Selection with Importance Resampling (Xie et al.,
  * arXiv 2302.03169): score every raw document by how much more likely
  * its hashed n-gram features are under a TARGET-domain language model
  * than under the RAW-corpus model, then select by that importance
  * weight. The standard pre-training move for "give me general-web data
  * that looks like Wikipedia/books" at corpus scale.
  *
  * Model shape (the whole point at 100 TB): both LMs are bag-of-
  * hashed-n-gram multinomials over a FIXED 65536-bucket space — each
  * model is one hash aggregation of the corpus and fits in a
  * ≤65536-row frame. Fitting is two passes (target, raw) that never
  * shuffle documents, only bucket counts; scoring is one explode + a
  * broadcast-sized join + one per-doc sum. Nothing grows with corpus
  * size except the two scans.
  *
  * Determinism discipline (oracle-portable): the bucket of a gram is
  * the leading 16 bits of `md5(gram)` kept AS THE HEX PREFIX STRING
  * (no engine-specific hash, no int conversion); per-bucket log-ratios
  * are rounded to 9 decimals and summed as exact DECIMAL, so per-doc
  * weights are bit-identical at any partitioning and across engines.
  * Buckets are add-one smoothed: lr(b) = ln(((ct+1)·(Nr+B)) /
  * ((cr+1)·(Nt+B))) with B = 65536, the per-bucket log importance
  * ratio of the two smoothed multinomials.
  */
object Dsir {

  /** Fixed hashed-feature space: 16-bit md5 prefix ⇒ 65536 buckets. */
  val Buckets = 65536

  private val B = lit(Buckets.toDouble)
  private val LrType = DecimalType(28, 10)

  private def toks(textCol: Column): Column = split(trim(lower(textCol)), "\\s+")

  /** Unigrams ++ bigrams of the lowercased whitespace tokens — the
    * feature stream both LMs and the scorer share. One codegen'd pass
    * ([[graft.functions.TextExpressions.UnigramBigramConcat]]): the
    * higher-order `transform(sequence(...))` formulation has no codegen
    * path and evaluated interpreted — a measured ~1.7 s of the x42 gate
    * at sf0.1. Output is bit-identical (FunctionsSpec pins it). */
  def grams(textCol: Column): Column =
    graft.functions.TextExpressions.uniBigrams(toks(textCol))

  /** A gram's hashed bucket: the md5 hex PREFIX itself (portable). */
  def bucketOf(gram: Column): Column = substring(md5(gram), 1, 4)

  /** (bkt, cnt) hashed-gram occurrence counts — ≤65536 rows. */
  def bucketCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(grams(col(textCol))).as("__g"))
      .groupBy(bucketOf(col("__g")).as("bkt"))
      .agg(count(lit(1)).as("cnt"))

  /** The fitted importance model: `ratios` = (bkt, lr) per-bucket
    * 9-decimal log importance ratios over the buckets OBSERVED in the
    * raw corpus (≤65536 rows); `stats` = 1 row (nt, nr) of total gram
    * counts, carried so unseen buckets score the exact smoothed
    * default ln((Nr+B)/(Nt+B)) instead of silently dropping. Both
    * frames are broadcast-sized — persist with [[writeModel]] and the
    * model costs nothing to ship to 1000 executors. */
  final case class DsirModel(ratios: DataFrame, stats: DataFrame)

  /** Fit the two hashed-ngram LMs in exactly TWO corpus passes: each
    * [[bucketCounts]] aggregation collapses its corpus to a ≤65536-row
    * model frame, collected driver-side (the model-bounded-collect
    * discipline — centroids/codebooks precedent) and recreated as local
    * frames. Consequences: (a) nt/nr are Σcnt over the already-
    * aggregated bucket frames — never a re-explode of the gram stream
    * (total gram count ≡ sum of its bucket counts); (b) `ratios` is
    * computed over local frames, so every downstream [[weights]] call
    * broadcasts a materialized model instead of replaying the corpus
    * aggregation lineage per scoring query. The log-ratio arithmetic is
    * the same Spark expression as before — results are bit-identical. */
  def fit(raw: DataFrame, target: DataFrame, textCol: String): DsirModel = {
    val spark = raw.sparkSession
    import spark.implicits._
    val tcRows = bucketCounts(target, textCol).collect()
    val rcRows = bucketCounts(raw, textCol).collect()
    val nt = tcRows.iterator.map(_.getLong(1)).sum.toDouble
    val nr = rcRows.iterator.map(_.getLong(1)).sum.toDouble
    val tc = tcRows.map(r => (r.getString(0), r.getLong(1))).toSeq
      .toDF("bkt", "__ct")
    val rc = rcRows.map(r => (r.getString(0), r.getLong(1))).toSeq
      .toDF("bkt", "__cr")
    val stats = Seq((nt, nr)).toDF("nt", "nr")
    // FULL outer: a bucket the target produced but the raw corpus never
    // did (possible whenever the target is not a subset of raw) must
    // carry ln((ct+1)(Nr+B)/((0+1)(Nt+B))) — a left join from rc would
    // drop it, and weights() would hand its grams the ct=0 default,
    // under-weighting exactly the most target-characteristic documents.
    val ratios = rc.join(tc, Seq("bkt"), "full_outer")
      .crossJoin(broadcast(stats))
      .select(col("bkt"),
        round(log(((coalesce(col("__ct"), lit(0L)) + lit(1.0)) * (col("nr") + B)) /
                  ((coalesce(col("__cr"), lit(0L)) + lit(1.0)) * (col("nt") + B))), 9)
          .cast(LrType).as("lr"))
    DsirModel(ratios, stats)
  }

  /** Per-document importance weights: (idCol, n_grams, weight_dec).
    * One explode over the scored docs, a broadcast-sized join against
    * the 65536-bucket model, one per-doc decimal sum — map-side except
    * the final by-doc aggregation. Grams hashing to buckets the raw
    * corpus never produced get the exact zero-count smoothed ratio via
    * the carried stats (no silent null-skip). */
  def weights(model: DsirModel, df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val g = df.select(col(idCol), explode(grams(col(textCol))).as("__g"))
      .select(col(idCol), bucketOf(col("__g")).as("bkt"))
    // The corpus-scale aggregation sums each 9-decimal ratio as its
    // exact UNSCALED long (lr·1e9 — integer-valued by construction):
    // the decimal→long conversion happens on the ≤65536-row model
    // frame, the per-doc sum is a primitive long aggregation (the
    // decimal hash-agg was a measured ~40% of scoring cost), and the
    // exact decimal reappears at group level — |Σ| stays far below
    // 2^63 for any document (≤ n_grams · ~30·1e9).
    val ratiosU = model.ratios.select(col("bkt"),
      (col("lr") * lit(1000000000L)).cast("long").as("lr_u"))
    val unseenU = (round(log((col("nr") + B) / (col("nt") + B)), 9)
      .cast(LrType) * lit(1000000000L)).cast("long")
    g.join(broadcast(ratiosU), Seq("bkt"), "left")
      .crossJoin(broadcast(model.stats))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("lr_u"), unseenU)).as("w_u"))
      .select(col(idCol), col("n_grams"),
        (col("w_u").cast(DecimalType(38, 10)) / lit(1000000000L))
          .cast(DecimalType(38, 10)).as("weight_dec"))
  }

  /** Length-normalized importance score — weight per gram, rounded to
    * 9 decimals as a double: the form to SELECT on (the raw sum scales
    * with document length, so selecting on it prefers long documents
    * regardless of domain fit). Compose with
    * [[Sampling.tokenBudgetSelect]] for "the B best-fitting tokens". */
  def scored(model: DsirModel, df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    weights(model, df, idCol, textCol)
      .withColumn("dsir_score",
        round(col("weight_dec").cast("double") / col("n_grams"), 9))

  /** Persist / reload the fitted model (both frames are tiny). */
  def writeModel(model: DsirModel, path: String): Unit = {
    model.ratios.write.mode("overwrite").parquet(s"$path/ratios")
    model.stats.write.mode("overwrite").parquet(s"$path/stats")
  }

  def readModel(spark: org.apache.spark.sql.SparkSession, path: String): DsirModel =
    DsirModel(spark.read.parquet(s"$path/ratios"),
      spark.read.parquet(s"$path/stats"))
}
