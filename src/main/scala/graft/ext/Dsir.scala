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
    * feature stream both LMs and the scorer share. (Spark's `sequence`
    * DESCENDS when stop < start, so the bigram branch is guarded for
    * single-token docs; DuckDB's `range` is empty there.) */
  def grams(textCol: Column): Column = {
    val w = toks(textCol)
    val bi = when(size(w) >= 2,
        transform(sequence(lit(1), size(w) - 1),
          i => concat(element_at(w, i), lit(" "), element_at(w, i + 1))))
      .otherwise(array().cast("array<string>"))
    concat(w, bi)
  }

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

  /** Fit the two hashed-ngram LMs: one aggregation pass over `target`,
    * one over `raw`. */
  def fit(raw: DataFrame, target: DataFrame, textCol: String): DsirModel = {
    val tc = bucketCounts(target, textCol).withColumnRenamed("cnt", "__ct")
    val rc = bucketCounts(raw, textCol).withColumnRenamed("cnt", "__cr")
    val stats = target.select(explode(grams(col(textCol))).as("__g"))
      .agg(count(lit(1)).cast("double").as("nt"))
      .crossJoin(raw.select(explode(grams(col(textCol))).as("__g"))
        .agg(count(lit(1)).cast("double").as("nr")))
    val ratios = rc.join(tc, Seq("bkt"), "left")
      .crossJoin(broadcast(stats))
      .select(col("bkt"),
        round(log(((coalesce(col("__ct"), lit(0L)) + lit(1.0)) * (col("nr") + B)) /
                  ((col("__cr") + lit(1.0)) * (col("nt") + B))), 9)
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
    val unseen = round(log((col("nr") + B) / (col("nt") + B)), 9).cast(LrType)
    g.join(model.ratios, Seq("bkt"), "left")
      .crossJoin(broadcast(model.stats))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("lr"), unseen)).as("weight_dec"))
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
