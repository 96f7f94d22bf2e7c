package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze & Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search") — the ANN memory-scale
  * path next to [[Ivf]]'s partition-pruning path: vectors compress from
  * D floats to M small codes (here 64×4 B → 4×1 B, 64×), so a 100-TB
  * embedding corpus's searchable representation fits a ~1.6-TB code
  * table that scans at memory speed; the float vectors stay on cold
  * storage for optional re-ranking.
  *
  * Pieces, all public-API Spark:
  *  - codebooks: MLlib KMeans per subspace (M model fits over slices of
  *    the TRAINING SAMPLE — the sample is bounded, the fits don't scale
  *    with the corpus);
  *  - [[encode]]: argmin-over-codewords fold per subspace — a pure
  *    codegen expression against the codebook ARRAY LITERAL (metadata:
  *    M·ksub·D/M floats), shuffle-free, same shape as [[Ivf.assign]];
  *  - [[topK]] (ADC — asymmetric distance): approx cosine(q, v) =
  *    dot(q, v̂) / (‖q‖·‖v̂‖) with v̂ the code reconstruction;
  *    dot(q, v̂) = Σ_m dot(q_m, codebook[m][code_m]) folds over the M
  *    codes per row, and ‖v̂‖ is PRECOMPUTED per corpus row at encode
  *    time — scoring never touches a float vector.
  *
  * Determinism: seeded KMeans; argmin ties break to the lowest code;
  * ranking ties to the lowest id — the house total-order discipline.
  */
object Pq {

  /** Codebooks as plain data: codebooks(m)(c) = the c-th codeword of
    * subspace m (dsub floats each). */
  final case class Model(m: Int, dsub: Int, codebooks: Array[Array[Array[Float]]])

  /** Fit per-subspace codebooks on `train` (at scale: a bounded sample
    * of the corpus, NOT the corpus — pass `corpus.sample(...)`). */
  def fit(train: DataFrame, m: Int, ksub: Int, seed: Long = 42L,
      vecCol: String = "embedding"): Model = {
    val dim = train.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    val codebooks = (0 until m).map { s =>
      val sub = train.select(
        array_to_vector(slice(col(vecCol), s * dsub + 1, dsub)).as("_v"))
      new KMeans().setK(ksub).setSeed(seed + s).setMaxIter(10)
        .setFeaturesCol("_v").setPredictionCol("_c")
        .fit(sub)
        .clusterCenters.map(_.toArray.map(_.toFloat))
    }.toArray
    Model(m, dsub, codebooks)
  }

  /** The codebook of subspace `s` as a literal of (code, codeword, c·c)
    * structs in code order — the argmin fold's search table. */
  private def bookLit(model: Model, s: Int): Column =
    typedLit(model.codebooks(s).zipWithIndex.map { case (c, i) =>
      (i, c, c.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
    }.toSeq)

  /** Nearest codeword of one subvector: ‖v−c‖² argmin via the
    * c·c − 2 v·c shortcut (v·v constant per subvector), strict `<` over
    * ascending code order ⇒ lowest code wins ties. */
  private def argminCode(sub: Column, book: Column): Column = {
    val z = struct(lit(Double.PositiveInfinity).as("d"), lit(Int.MaxValue).as("code"))
    aggregate(book, z, (st, e) => {
      val d = e.getField("_3") - lit(2.0) * Similarity.dot(sub, e.getField("_2"))
      when(d < st.getField("d"),
        struct(d.as("d"), e.getField("_1").as("code"))).otherwise(st)
    }).getField("code")
  }

  /** Encode the corpus: original columns + `codes` (array<int>, length
    * M) + `recon_norm` (‖v̂‖ as double). Pure expressions — the 100-TB
    * encode is a map-only pass. */
  def encode(corpus: DataFrame, model: Model,
      vecCol: String = "embedding"): DataFrame = {
    val codes = array((0 until model.m).map { s =>
      argminCode(slice(col(vecCol), s * model.dsub + 1, model.dsub),
        bookLit(model, s))
    }: _*)
    val reconSq = (0 until model.m).map { s =>
      // ‖v̂‖² = Σ_m ‖codeword_m‖² — codewords are orthogonal blocks
      element_at(bookLit(model, s), element_at(col("codes"), s + 1) + 1)
        .getField("_3")
    }.reduce(_ + _)
    corpus.withColumn("codes", codes)
      .withColumn("recon_norm", sqrt(reconSq))
  }

  /** The ADC numerator: Σ_subspaces dot(query slice, looked-up
    * codeword) — ONE definition shared by [[topK]] and
    * [[topKIvfPqFromIndex]] so the 1-based slice/element_at offsets
    * cannot drift between the flat and IVF-composed paths. */
  private def adcNum(model: Model): org.apache.spark.sql.Column =
    (0 until model.m).map { s =>
      Similarity.dot(slice(col("qv"), s * model.dsub + 1, model.dsub),
        element_at(bookLit(model, s), element_at(col("codes"), s + 1) + 1)
          .getField("_2"))
    }.reduce(_ + _)

  /** ADC top-k: rank encoded-corpus rows per query by reconstruction
    * cosine. The scan reads (id, codes, recon_norm) only — never the
    * float vectors. Output: (query_id, neighbor_id, score, rk). */
  def topK(queries: DataFrame, encoded: DataFrame, model: Model, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), Similarity.norm(col(vecCol)).as("qn")))
    val cand = encoded
      .select(col(idCol).as("neighbor_id"), col("codes"), col("recon_norm"))
      .crossJoin(q)
      .filter(col("query_id") =!= col("neighbor_id"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    cand.withColumn("score", adcNum(model) / (col("qn") * col("recon_norm")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("score"), 6).as("score"), col("rk"))
  }

  /** The standard production PQ pipeline: ADC shortlist over the code
    * table (cheap, compressed scan) → EXACT cosine re-rank of only the
    * `shortlist` survivors against their float vectors (a semi-join
    * fetch of shortlist·|queries| rows — bounded, never the corpus).
    * Quantization error then only costs recall when a true neighbor
    * falls outside the shortlist, not rank precision inside it. */
  def topKReranked(queries: DataFrame, encoded: DataFrame, corpus: DataFrame,
      model: Model, k: Int, shortlist: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cand = topK(queries, encoded, model, shortlist, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), Similarity.norm(col(vecCol)).as("qn")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      Similarity.norm(col(vecCol)).as("cn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand.join(c, "neighbor_id").join(q, "query_id")
      .withColumn("cos", Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk"))
  }

  // -- IVF-PQ: the composed big-corpus index (FAISS's IVFPQ shape) ------

  /** Persist the composed index: the IVF-assigned corpus, PQ-encoded,
    * PARTITIONED BY CELL — so a probe reads nprobe/k of the data via
    * partition pruning AND each row it reads carries the compressed
    * codes next to the float vector (codes for the ADC shortlist,
    * vector only for the final rerank's column read). Centroids stay
    * the metadata side table ([[Ivf.write]] layout). */
  def writeIvfPq(index: Ivf.Index, model: Model, path: String): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    encode(index.assigned, model)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/corpus")
    index.centroids.toSeq.toDF("cell", "centroid")
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Two-stage ANN over the stored composed index: coarse probe picks
    * `nprobe` cells per query (static IN partition filter → pruned
    * scan), ADC ranks the probed cells' CODE columns into a per-query
    * shortlist, and the exact cosine rerank reads float vectors for the
    * shortlist rows only. At 100 TB the heavy scan is nprobe/k of the
    * corpus × (M code bytes + norm) per row — partition pruning and PQ
    * compression multiply. */
  def topKStoredIvfPq(queries: DataFrame, spark: org.apache.spark.sql.SparkSession,
      path: String, model: Model, k: Int, nprobe: Int, shortlist: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    topKIvfPqFromIndex(queries, Ivf.read(spark, path), model, k, nprobe,
      shortlist, idCol, vecCol)

  /** [[topKStoredIvfPq]] over an ALREADY-LOADED index — the serving
    * shape where the layout frame is opened once (and possibly cached)
    * per corpus snapshot and probed by many batteries, instead of
    * re-opened per call. */
  def topKIvfPqFromIndex(queries: DataFrame, index: Ivf.Index, model: Model,
      k: Int, nprobe: Int, shortlist: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val probes = Ivf.probeCells(queries, index, nprobe, idCol, vecCol)
    // distinct probed cells ≤ number of cells — driver-safe by design
    val cells = probes.select("cell").distinct().collect().map(_.getInt(0)).sorted
    val pruned = index.assigned
      .filter(col("cell").isin(cells.map(Integer.valueOf): _*))
    // per-query candidate set = union of ITS probed cells only (the
    // broadcast semi-join keeps a query out of cells it didn't probe)
    val cellCand = pruned.join(
      broadcast(probes.select("query_id", "cell")), Seq("cell"))
    val qv = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), Similarity.norm(col(vecCol)).as("qn")))
    val wAdc = Window.partitionBy("query_id")
      .orderBy(col("adc").desc, col("neighbor_id"))
    // ADC stage: the scan projects ONLY (id, codes, recon_norm) — the
    // float vectors stay unread (column pruning on the parquet scan)
    val short = cellCand
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("codes"),
        col("recon_norm"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .join(qv, "query_id")
      .withColumn("adc", adcNum(model) / (col("qn") * col("recon_norm")))
      .withColumn("srk", row_number().over(wAdc))
      .filter(col("srk") <= shortlist)
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("qn"))
    // rerank stage: a SECOND pruned scan fetches float vectors and the
    // join keeps shortlist rows only (at 100 TB this is the shortlist
    // key-fetch against the vector store)
    // norm computed once per VECTOR before the join (the
    // bruteForceTopK/topKReranked discipline), not re-folded per
    // (query, neighbor) pair
    val vecs = pruned.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      Similarity.norm(col(vecCol)).as("cn"))
    val wFin = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    short.join(vecs, "neighbor_id")
      .withColumn("cos", Similarity.dot(col("qv"), col("cv")) /
        (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(wFin))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk"))
  }
}
