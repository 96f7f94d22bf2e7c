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

  /** Approximate top-k: each query probes its `nprobe` nearest cells. */
  def topK(queries: DataFrame, index: Index, k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    // query → nprobe nearest centroids (centroid table is tiny: broadcast)
    val cents = index.centroids.toSeq.toDF("cell", "centroid")
    val probes = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        Similarity.norm(col(vecCol)).as("qn")))
      .crossJoin(broadcast(cents))
      .withColumn("cdist", Similarity.dot(col("qv"), col("centroid")) /
        (col("qn") * Similarity.norm(col("centroid"))))
      .withColumn("crk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cdist").desc, col("cell"))))
      .filter(col("crk") <= nprobe)
      .select("query_id", "qv", "qn", "cell")
    // probe only the matching cells (cell equi-join = partition pruning
    // when the corpus is stored clustered by cell)
    val cand = broadcast(probes).join(
        index.assigned.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
          Similarity.norm(col(vecCol)).as("cn"), col("cell")),
        Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cand.withColumn("cos", Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk"))
  }
}
