package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Linear (fastText-style) document quality classifier: hashed
  * bag-of-words features, logistic regression trained by distributed
  * batch gradient descent, corpus-wide scoring through a broadcast
  * weights join. The GPT-3/LLaMA-recipe pipeline stage "train a small
  * classifier on a trusted corpus, keep documents it scores high".
  *
  * Spark-first design, no UDFs anywhere:
  *  - features: explode tokens → `pmod(xxhash64(token), dim)` (codegen;
  *    the feature "vector" is the sparse (id, idx, cnt) frame — never a
  *    dense array per row);
  *  - training: each GD iteration is two hash aggregations — per-doc
  *    margin (join the ≤`dim`-row weights table, broadcast by Catalyst),
  *    then per-idx gradient. Gradient terms are rounded to 9 decimals
  *    and DECIMAL-summed, so the fitted model is bit-identical under any
  *    partitioning (`local[32]` model == 1000-executor model);
  *  - scoring: one broadcast join + one per-doc sum — linear scan,
  *    no driver loop, no MLlib dependency at inference.
  *
  * Scale contract: TRAIN on a bounded labeled sample (what every real
  * pipeline does — labels are the scarce resource; the gradient
  * aggregations themselves would also run at full scale), SCORE the full
  * corpus. The only driver-side state is the weight vector itself
  * (≤ `dim` doubles — model metadata, independent of corpus size).
  */
object QualityClassifier {

  final case class Model(dim: Int, intercept: Double, weights: Map[Int, Double]) {
    def weightsDf(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      weights.toSeq.toDF("idx", "w")
    }
  }

  private def toks(textCol: Column): Column = split(trim(lower(textCol)), "\\s+")

  /** Sparse hashed features: (idCol, idx, cnt) with cnt = token count of
    * the bucket, L1-normalized per document (so score magnitudes are
    * length-invariant — fastText's mean-of-embeddings analog). */
  def features(df: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame = {
    val w = df.select(col(idCol), explode(toks(col(textCol))).as("tok"))
    val n = w.groupBy(idCol).agg(count(lit(1)).cast("double").as("_n"))
    w.select(col(idCol), pmod(xxhash64(col("tok")), lit(dim)).cast("int").as("idx"))
      .groupBy(idCol, "idx").agg(count(lit(1)).cast("double").as("_c"))
      .join(n, idCol)
      .select(col(idCol), col("idx"), (col("_c") / col("_n")).as("cnt"))
  }

  /** Batch-GD logistic regression on (idCol, labelCol ∈ {0,1}) rows.
    * Deterministic: fixed iterations, fixed init (zeros), gradient terms
    * decimal-summed. `l2` is standard ridge shrinkage applied at the
    * update (weights only, not intercept).
    *
    * `lrIntercept` exists because the bias "feature" has scale 1 while
    * L1-normalized token features have scale ~1/doclen: a single lr
    * large enough to move the weights oscillates the intercept
    * (measured: lr=10 swung it −2.2 → +0.7 between iterations and the
    * model collapsed to all-positive). Default = lr/10. */
  def train(df: DataFrame, idCol: String, textCol: String, labelCol: String,
      dim: Int = 4096, iters: Int = 30, lr: Double = 1.0, l2: Double = 0.0,
      lrIntercept: Double = -1.0): Model = {
    val lrB = if (lrIntercept > 0) lrIntercept else lr / 10.0
    val spark = df.sparkSession
    import spark.implicits._
    val feats = features(df, idCol, textCol, dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val labels = df.select(col(idCol), col(labelCol).cast("double").as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = labels.count().toDouble // also materializes the label cache
    var weights = Map.empty[Int, Double]
    var intercept = 0.0
    val dec = DecimalType(28, 10)
    for (_ <- 1 to iters) {
      val wDf = broadcast(
        if (weights.isEmpty) Seq.empty[(Int, Double)].toDF("idx", "w")
        else weights.toSeq.toDF("idx", "w"))
      // per-doc margin → sigmoid → residual (σ(m) - y). Margin terms are
      // decimal-summed too: a double-sum's partition order would leak
      // into σ's last ULP and the fitted model would depend on layout.
      // residuals are anchored on LABELS, not the feature frame: a
      // zero-token document has no feature rows, but it is still a
      // labeled example whose margin is exactly the intercept — joining
      // from feats dropped such docs from the intercept gradient while
      // nDocs still counted them (a silent intercept bias whenever
      // empty-doc labels are imbalanced).
      val margins = feats.join(wDf, Seq("idx"), "left")
        .groupBy(idCol)
        .agg(sum(round(coalesce(col("w"), lit(0.0)) * col("cnt"), 9).cast(dec))
          .cast("double").as("_m"))
      val resid = labels.join(margins, Seq(idCol), "left")
        .select(col(idCol),
          (lit(1.0) / (lit(1.0) + exp(-(coalesce(col("_m"), lit(0.0)) + intercept)))
            - col("y")).as("r"))
        // two consumers below (per-idx gradient + intercept gradient):
        // cache so the margin join runs once per iteration, not twice
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // per-idx gradient Σ r·cnt AND the intercept gradient Σ r·1 in ONE
      // aggregation/action: the bias rides as sentinel idx = -1 (its
      // "feature" has cnt 1), halving job-launch overhead per iteration
      val gradAll = feats.join(resid, idCol)
        .select(col("idx"), round(col("r") * col("cnt"), 9).cast(dec).as("t"))
        .unionByName(resid.select(lit(-1).as("idx"), round(col("r"), 9).cast(dec).as("t")))
        .groupBy("idx")
        .agg(sum(col("t")).as("g"))
        .as[(Int, java.math.BigDecimal)]
        .collect() // ≤ dim+1 rows — model-sized, never corpus-sized
      val grad = gradAll.filter(_._1 >= 0)
      val gInt = gradAll.collectFirst { case (-1, g) => g }
        .getOrElse(java.math.BigDecimal.ZERO)
      resid.unpersist()
      // gradAll covers every feature idx in feats on every iteration
      // (feats is fixed and every doc now has a residual), so the update
      // map is complete — weight keys only ever come from gradients and
      // a separate shrink-only branch would be unreachable
      weights = grad.map { case (i, g) =>
        val prev = weights.getOrElse(i, 0.0)
        i -> ((1.0 - lr * l2) * prev - lr * g.doubleValue / nDocs)
      }.toMap
      intercept -= lrB * gInt.doubleValue / nDocs
    }
    feats.unpersist(); labels.unpersist()
    Model(dim, intercept, weights)
  }

  /** Score every document: (idCol, score) with score = σ(w·x + b) ∈
    * (0,1). One broadcast join, one aggregation — full-corpus scale. */
  def score(df: DataFrame, model: Model, idCol: String, textCol: String): DataFrame = {
    val wDf = broadcast(model.weightsDf(df.sparkSession))
    features(df, idCol, textCol, model.dim)
      .join(wDf, Seq("idx"), "left")
      .groupBy(idCol)
      .agg(sum(round(coalesce(col("w"), lit(0.0)) * col("cnt"), 9)
        .cast(DecimalType(28, 10))).cast("double").as("_m"))
      .select(col(idCol),
        (lit(1.0) / (lit(1.0) + exp(-(col("_m") + model.intercept)))).as("score"))
  }

  /** [[score]]'s oracle-anchoring twin (the x36c/x26b precedent: oracle
    * the deterministic stage of an engine-specific pipeline). The
    * xxhash64 featurizer has no SQL twin, so this path hashes tokens
    * into the portable 16-bit md5-prefix space ([[graft.ext.Dsir]]'s
    * buckets) and takes the weight of a bucket as a caller-supplied
    * CLOSED-FORM column of the hex prefix — every other stage is
    * byte-for-byte the [[score]] discipline: per-(doc, bucket) counts,
    * L1 normalization, 9-decimal rounded margin terms summed as exact
    * DECIMAL (partition-order independent), σ at the end. A DuckDB
    * oracle re-derives the whole thing, pinning the inference math the
    * production scorer runs with trained weights. */
  def scorePortable(df: DataFrame, idCol: String, textCol: String,
      weightOfBucket: Column => Column, intercept: Double): DataFrame = {
    val w = df.select(col(idCol), explode(toks(col(textCol))).as("tok"))
    val n = w.groupBy(idCol).agg(count(lit(1)).cast("double").as("_n"))
    w.select(col(idCol), substring(md5(col("tok")), 1, 4).as("bucket"))
      .groupBy(idCol, "bucket").agg(count(lit(1)).cast("double").as("_c"))
      .join(n, idCol)
      .select(col(idCol),
        round(weightOfBucket(col("bucket")) * col("_c") / col("_n"), 9)
          .cast(DecimalType(28, 10)).as("_t"))
      .groupBy(idCol)
      .agg(sum(col("_t")).cast("double").as("_m"))
      .select(col(idCol),
        (lit(1.0) / (lit(1.0) + exp(-(col("_m") + intercept)))).as("score"))
  }

  /** Keep documents the classifier scores ≥ `minScore` (original rows;
    * docs with no tokens are dropped — nothing to judge them by). */
  def filterByScore(df: DataFrame, model: Model, idCol: String, textCol: String,
      minScore: Double): DataFrame =
    df.join(score(df, model, idCol, textCol).filter(col("score") >= minScore)
      .select(idCol), idCol)

  /** Stateless scoring as a PURE COLUMN EXPRESSION: the weight vector
    * rides the plan as one MapType literal (≤ dim entries — model
    * metadata) and the margin is a fold over the token array, so the
    * score needs no join, no shuffle, and no state — usable in a
    * Structured Streaming `select` as-is (the streaming ingest path,
    * where the broadcast-join formulation of [[score]] would force a
    * stateful aggregation after the feature explode).
    *
    * Since features are L1-normalized counts, Σᵢ w[i]·cᵢ/n over buckets
    * equals (Σ_tokens w[h(t)])/n — one lookup per token. The fold sums
    * doubles in the array's (deterministic) order; equality with
    * [[score]]'s decimal-summed path is within float-tail tolerance,
    * spec-pinned. */
  def scoreCol(textCol: Column, model: Model): Column = {
    val w = typedLit(model.weights)
    val t = toks(textCol)
    val margin = aggregate(t, lit(0.0),
      (acc, tok) => acc + coalesce(
        element_at(w, pmod(xxhash64(tok), lit(model.dim)).cast("int")), lit(0.0)))
    val m = when(size(t) > 0, margin / size(t)).otherwise(lit(0.0))
    lit(1.0) / (lit(1.0) + exp(-(m + model.intercept)))
  }
}
