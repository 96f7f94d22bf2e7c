package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.{Vector => MlVector}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour — the second ANN
  * scale path next to [[Similarity.lshTopK]]: a coarse k-means
  * quantizer partitions the corpus into cells; a query probes only the
  * `nprobe` nearest cells and brute-forces inside them.
  *
  * Scale story: the corpus is written clustered by `cell` (at 100 TB:
  * partitioned by cell on storage), so a query's candidate scan is
  * `nprobe/k` of the corpus with partition pruning — the classic IVF
  * trade: recall vs fraction probed. The quantizer itself is MLlib
  * KMeans (public Spark API, seeded for determinism); centroids are
  * metadata-sized and live on the driver/broadcast.
  */
object Ivf {

  final case class Index(centroids: Array[(Int, Array[Float])], assigned: DataFrame)

  /** Fit the coarse quantizer and assign every corpus vector a cell id. */
  def build(corpus: DataFrame, k: Int, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): Index = {
    val withVec = corpus.select(col(idCol), col(vecCol),
      array_to_vector(col(vecCol)).as("_v"))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("_v").setPredictionCol("cell")
      .fit(withVec)
    val assigned = model.transform(withVec).drop("_v")
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat))
    }
    Index(centroids, assigned)
  }

  /** query → its `nprobe` nearest cells: (query_id, qv, qn, cell).
    * Centroid table is metadata-sized — everything here broadcasts.
    * (`private[ext]`: [[Pq.topKStoredIvfPq]] probes the same cells.)
    *
    * Metric note: cells are FORMED by L2 k-means over the raw vectors
    * but PROBED by cosine-to-centroid — consistent only when
    * embeddings are (approximately) L2-normalized, where L2 order ≡
    * cosine order (the standard IVF-for-cosine deployment: normalize
    * at encode time, then both stages agree exactly). For raw
    * unnormalized corpora a strongly length-skewed cell's centroid can
    * rank below `nprobe` by cosine even though it holds the query's
    * true cosine neighbors — recall loss beyond the nprobe trade.
    * Normalize upstream, or raise nprobe; recall monitoring
    * ([[Similarity.recallAtK]]) is the detector either way. */
  private[ext] def probeCells(queries: DataFrame, index: Index, nprobe: Int,
      idCol: String, vecCol: String): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = index.centroids.toSeq.toDF("cell", "centroid")
    broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        Similarity.norm(col(vecCol)).as("qn")))
      .crossJoin(broadcast(cents))
      .withColumn("cdist", Similarity.dot(col("qv"), col("centroid")) /
        (col("qn") * Similarity.norm(col("centroid"))))
      .withColumn("crk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cdist").desc, col("cell"))))
      .filter(col("crk") <= nprobe)
      .select("query_id", "qv", "qn", "cell")
  }

  /** Brute-force inside probed cells: rank candidates per query. */
  private def rankWithin(probes: DataFrame, corpus: DataFrame, k: Int,
      idCol: String, vecCol: String): DataFrame = {
    val cand = broadcast(probes).join(
        corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
          Similarity.norm(col(vecCol)).as("cn"), col("cell")),
        Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cand.withColumn("cos", Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk"))
  }

  /** Approximate top-k: each query probes its `nprobe` nearest cells.
    * (cell equi-join = partition pruning when the corpus is stored
    * clustered by cell — see [[write]]/[[topKStored]] for that path.) */
  def topK(queries: DataFrame, index: Index, k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    rankWithin(probeCells(queries, index, nprobe, idCol, vecCol),
      index.assigned, k, idCol, vecCol)

  /** Persist the index in the 100-TB layout: corpus PARTITIONED BY cell
    * (each cell = its own file subtree, so a probe reads nprobe/k of the
    * data via partition pruning), centroids as a metadata-sized side
    * table. */
  def write(index: Index, path: String): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.assigned
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/corpus")
    index.centroids.toSeq.toDF("cell", "centroid")
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  def read(spark: SparkSession, path: String): Index = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    Index(centroids, spark.read.parquet(s"$path/corpus"))
  }

  /** Assign vectors to an EXISTING quantizer without refitting —
    * nearest centroid by squared Euclidean distance over the stored
    * float centroids. Agrees with [[build]]'s cells up to float
    * rounding: [[write]] stores `toFloat`-truncated centroids and the
    * c·c − 2 v·c shortcut accumulates in a different order than MLlib's
    * double-precision `predict`, so a vector near-equidistant between
    * two centroids can land in the neighbouring cell — harmless for an
    * ANN index (either cell is a valid coarse bucket; recall is governed
    * by `nprobe`, not the tie). Ties break to the lowest cell id.
    *
    * Shuffle-free: the centroid table rides the plan as ONE array
    * literal (metadata-sized by the IVF contract) and the argmin is a
    * fold over that array — no join, no window, no Exchange. The
    * incremental-ingest path stays a pure map over the new vectors. */
  def assign(vecs: DataFrame, centroids: Array[(Int, Array[Float])],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // an empty centroid table would also never beat +Infinity — but
    // that is a misconfiguration (empty/corrupt index), not a bad row;
    // fail here with the real cause, keeping the per-row raise below
    // for genuine NaN vectors
    require(centroids.nonEmpty,
      "Ivf.assign: empty centroid table - the index is empty or corrupt")
    // c·c precomputed driver-side in index-order double accumulation —
    // bit-identical to Similarity.dot(centroid, centroid) at runtime
    val cents = typedLit(centroids.sortBy(_._1).map { case (cell, c) =>
      (cell, c, c.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble))
    }.toSeq)
    // ||v-c||² = v·v − 2 v·c + c·c; v·v is constant per vector so the
    // argmin needs only c·c − 2 v·c. Strict `<` over ascending cell
    // order keeps the lowest cell on ties.
    val z = struct(lit(Double.PositiveInfinity).as("d"),
      lit(Int.MaxValue).as("cell"))
    val best = aggregate(cents, z, (st, e) => {
      val d = e.getField("_3") -
        lit(2.0) * Similarity.dot(col(vecCol), e.getField("_2"))
      when(d < st.getField("d"),
        struct(d.as("d"), e.getField("_1").as("cell"))).otherwise(st)
    })
    // a vector whose distance fold never beat +Infinity (a NaN
    // component — NaN comparisons are all false) would otherwise keep
    // the sentinel cell and be appended into a partition no probe ever
    // reads: unreachable forever, silently. Fail on the row instead.
    val cell = best.getField("cell")
    val guarded = when(cell =!= lit(Int.MaxValue), cell)
      .otherwise(raise_error(concat(
        lit("Ivf.assign: no centroid beat +Infinity for id "),
        col(idCol).cast("string"),
        lit(" — the vector has a NaN component"))))
    vecs.select(col(idCol), col(vecCol), guarded.as("cell"))
  }

  /** Incrementally grow a STORED index: assign the new vectors to the
    * existing centroids and append them into their cells' partitions —
    * no refit, no rewrite of existing cells (dynamic append touches
    * only the cells that received vectors). The quantizer drifts from
    * optimal as the distribution shifts; refit with [[build]]+[[write]]
    * on whatever cadence recall monitoring dictates. */
  def appendStored(spark: SparkSession, path: String, newVecs: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    assign(newVecs, read(spark, path).centroids, idCol, vecCol)
      .write.mode("append").partitionBy("cell").parquet(s"$path/corpus")

  /** Top-k over a STORED index with static partition pruning: the
    * distinct probed cells (bounded by the cell count k, driver-side
    * metadata) become an `IN` filter on the partition column, so the
    * parquet scan lists only the probed cells' directories — the IVF
    * contract made physical. */
  def topKStored(queries: DataFrame, spark: SparkSession, path: String,
      k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val index = read(spark, path)
    val probes = probeCells(queries, index, nprobe, idCol, vecCol)
    // distinct probed cells ≤ number of cells — driver-safe by design
    val cells = probes.select("cell").distinct().collect().map(_.getInt(0)).sorted
    val pruned = index.assigned.filter(col("cell").isin(cells.map(Integer.valueOf): _*))
    rankWithin(probes, pruned, k, idCol, vecCol)
  }
}
