package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (U4 north-star): exact
  * brute-force cosine top-k as the correctness baseline, and a
  * random-hyperplane LSH-bucketed ANN as the scale path.
  *
  * Vectors are `Array[Float]` columns; all arithmetic is done with
  * higher-order column functions (`zip_with`/`aggregate`) in double
  * precision — codegen'd, no UDF, no driver collect.
  *
  * INPUT CONTRACT: embeddings must be finite. Spark orders NaN above
  * every value, so one NaN-component vector would rank first for EVERY
  * query and pass every `cos >= threshold` gate — silently corrupt
  * output, not an error. Encoders can emit NaN/Inf on overflow: gate
  * ingest with [[finiteOnly]] (one codegen pass) before indexing.
  * ([[Ivf.assign]] fails loudly on such vectors; the pure-expression
  * paths here cannot, so the gate belongs upstream.)
  */
object Similarity {

  /** Σ aᵢ·bᵢ as a double column — the codegen'd
    * [[graft.functions.VectorExpressions.DotProductFloat]] kernel
    * (bit-identical to the aggregate/zip_with form: same index order,
    * double precision; no per-row intermediate array). */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExpressions.dotF(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Ingest gate for the finite-embeddings contract: keep rows whose
    * vector has no NaN/Inf component (one `forall` pass — codegen'd,
    * no explode). Run this before indexing; see the object scaladoc
    * for why a NaN vector silently poisons every ranking. */
  def finiteOnly(df: DataFrame, vecCol: String = "embedding"): DataFrame =
    df.filter(forall(col(vecCol),
      x => !isnan(x) && abs(x) =!= lit(Float.PositiveInfinity)))

  /** Exact top-k neighbors for each query vector: broadcast the (small)
    * query side against the corpus, one windowed top-k per query. The
    * corpus is scanned once; no shuffle of the corpus beyond the final
    * per-query rank (bounded by queries × corpus candidates).
    *
    * Norms are computed once per vector *before* the pair join (not per
    * pair — at N queries × M corpus that's the difference between
    * (N+M) and 2·N·M norm folds); `dot/(n1*n2)` keeps the result
    * bit-identical to the naive form. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk"))
  }

  /** Deterministic random hyperplanes: `planes` × dim standard-normal
    * components from a fixed seed (Box–Muller over a seeded PRNG) —
    * generated driver-side once, shipped as a literal array. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH signature: bit p = sign(v · plane_p), packed into a
    * long per band of `bitsPerBand` planes. Returns (… , bands array).
    *
    * One fused codegen kernel
    * ([[graft.functions.VectorExpressions.LshSignatureFloat]]): the
    * previous 64-dot expression tree generated ~14 KB of straight-line
    * code in a single method — past HotSpot's 8 KB JIT ceiling, so the
    * whole signature scan ran interpreted (the r10 x7/x5b regression).
    * The kernel is a tight nested loop (JIT-compiled), bit-identical to
    * the tree form: float-truncated planes, index-order double dots,
    * Spark's NaN-high `>= 0` bit rule, little-endian band packing.
    *
    * The planes' dimension must match the embedding column's — a dot
    * would otherwise silently fold over a PREFIX of every vector. The
    * first mismatched row raises at execution (kernel-prologue check —
    * one branch per row). */
  def lshSignature(vecCol: Column, planes: Array[Array[Double]],
      bitsPerBand: Int): Column = {
    require(planes.nonEmpty && planes.length % bitsPerBand == 0,
      s"nPlanes (${planes.length}) must be a positive multiple of " +
        s"bitsPerBand ($bitsPerBand) — trailing planes would be paid for " +
        "and silently discarded")
    graft.functions.VectorExpressions.lshSignatureF(vecCol, planes, bitsPerBand)
  }

  /** LSH-bucketed approximate top-k: candidates = corpus vectors sharing
    * ≥1 band bucket with the query, re-ranked by exact cosine. Recall
    * tunes with (planes, bitsPerBand); the candidate join is keyed on
    * (band, bucket) so the corpus never cross-joins. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nPlanes: Int = 64, bitsPerBand: Int = 4, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    // (id, band, bucket) only — vectors/norms never ride the candidate
    // join; they attach once to the deduped pairs below
    def withBuckets(df: DataFrame, id: String) =
      df.select(col(idCol).as(id),
          posexplode(lshSignature(col(vecCol), planes, bitsPerBand)).as(Seq("band", "bucket")))
    val qb = broadcast(withBuckets(queries, "query_id"))
    val cb = withBuckets(corpus, "neighbor_id")
    // dedup candidate PAIRS first (ids only — distinct over vector
    // arrays would hash the payloads), then attach vectors+norms once
    val cand = qb.join(cb, Seq("band", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    val qv = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn")))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cand.join(qv, "query_id").join(cv, "neighbor_id")
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk"))
  }

  /** Embedding near-duplicate pairs with NO given blocking key — the
    * realistic corpus-dedup case: candidates are pairs sharing at least
    * one random-hyperplane LSH band, verified by exact cosine ≥
    * threshold. Never an all-pairs join: the self-join key is
    * (band, bucket). */
  def embeddingNearDupsLsh(df: DataFrame, threshold: Double,
      nPlanes: Int = 64, bitsPerBand: Int = 8, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val sig = df.select(col(idCol).as("id"),
      posexplode(lshSignature(col(vecCol), planes, bitsPerBand)).as(Seq("band", "bucket")))
    val a = sig.select(col("band"), col("bucket"), col("id").as("id1"))
    val b = sig.select(col("band"), col("bucket"), col("id").as("id2"))
    val cand = a.join(b, Seq("band", "bucket")).filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
    val side = df.select(col(idCol).as("id"), col(vecCol).as("v"), norm(col(vecCol)).as("nrm"))
    cand
      .join(side.select(col("id").as("id1"), col("v").as("v1"), col("nrm").as("n1")), "id1")
      .join(side.select(col("id").as("id2"), col("v").as("v2"), col("nrm").as("n2")), "id2")
      .withColumn("cos", dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), col("cos"))
  }

  /** SemDeDup-style semantic deduplication: a coarse k-means quantizer
    * ([[Ivf.build]] — MLlib KMeans, seeded) learns the blocking, then
    * near-duplicate pairs are found ONLY within each learned cell
    * (pairwise cosine ≥ threshold, via [[embeddingNearDups]]), pairs are
    * resolved to duplicate clusters ([[Dedup.connectedComponents]]), and
    * one representative per cluster (the minimum id — deterministic) is
    * kept. This is the published SemDeDup recipe (Abbas et al. 2023,
    * arXiv:2303.09540): cluster with k-means, compare only inside each
    * cluster, drop all but one of each semantic-duplicate group.
    *
    * Scale story: the all-pairs join never happens — candidates meet on
    * the learned `cell` key, so pair cost is Σ|cell|², bounded by the
    * quantizer's balance (k grows with corpus size, cells stay
    * ~constant). Everything downstream (components, anti-join) is
    * edges-bounded. Returns the kept corpus rows (original schema). */
  def semanticDedup(df: DataFrame, k: Int, threshold: Double, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val pairs = semanticDupPairs(df, k, threshold, seed, idCol, vecCol)
    Dedup.dropDuplicateClusters(df, idCol, pairs)
  }

  /** The pair stage of [[semanticDedup]], exposed for auditing: semantic
    * near-duplicate pairs (id1, id2, cos) found within learned k-means
    * cells. Precision is exact (every emitted pair truly has cosine ≥
    * threshold); recall is bounded by the quantizer — pairs split across
    * cells are missed, the SemDeDup trade. */
  def semanticDupPairs(df: DataFrame, k: Int, threshold: Double, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    semanticDupPairsFromCells(Ivf.build(df, k, seed, idCol, vecCol).assigned,
      threshold, idCol, vecCol)

  /** [[semanticDupPairs]] over an already-fitted cell assignment (a
    * frame with a `cell` column, e.g. [[Ivf.Index.assigned]]) — the
    * production shape: the quantizer is fitted once and persisted, the
    * pair stage reruns per corpus snapshot. */
  def semanticDupPairsFromCells(assigned: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    embeddingNearDups(assigned, "cell", threshold, idCol, vecCol)
      .select(col("id1"), col("id2"), col("cos"))

  /** Semantic (embedding-level) decontamination: flag corpus vectors
    * whose cosine to ANY probe/eval vector ≥ `threshold` — the
    * embedding-space complement of [[Dedup.ngramContamination]] (exact
    * grams miss paraphrased leakage; embeddings catch it). Returns
    * (idCol, n_probes, max_cos) for flagged corpus rows.
    *
    * Scale: the probe side is an eval battery (thousands), broadcast
    * whole with norms precomputed; the corpus pays ONE map-only pass of
    * |probes| dot products per row — no shuffle until the per-id
    * aggregate, which carries only flagged pairs. For probe sets too
    * big to broadcast, block both sides with [[lshSignature]] bands
    * (the [[embeddingNearDupsLsh]] shape) and verify exactly. */
  def semanticContamination(corpus: DataFrame, probes: DataFrame,
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"))
    val p = broadcast(probes.select(col(idCol).as("probe_id"),
      col(vecCol).as("pv"), norm(col(vecCol)).as("pn")))
    c.crossJoin(p)
      .withColumn("cos", dot(col("cv"), col("pv")) / (col("cn") * col("pn")))
      .filter(col("cos") >= threshold)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_probes"), max(col("cos")).as("max_cos"))
  }

  /** [[semanticContamination]] for probe sets too big to broadcast:
    * corpus and probes meet on shared random-hyperplane LSH bands (the
    * [[embeddingNearDupsLsh]] candidate shape — a (band, bucket)
    * equi-join, never |corpus|×|probes|), then candidates verify by
    * exact cosine. Flags are a SUBSET of the exact path's (no false
    * positives — every flag carries a true cosine ≥ threshold); recall
    * is the standard LSH trade, tuned by `bitsPerBand` (fewer bits =
    * bigger buckets = higher recall). Decontamination leans
    * conservative: prefer the exact/broadcast form whenever the probe
    * battery fits, and fewer bits per band when it doesn't. */
  def semanticContaminationLsh(corpus: DataFrame, probes: DataFrame,
      threshold: Double, nPlanes: Int = 64, bitsPerBand: Int = 4,
      dim: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    def banded(df: DataFrame, id: String) =
      df.select(col(idCol).as(id), col(vecCol).as(s"${id}_v"),
        norm(col(vecCol)).as(s"${id}_n"),
        posexplode(lshSignature(col(vecCol), planes, bitsPerBand))
          .as(Seq("band", "bucket")))
    val cand = banded(corpus, "cid")
      .join(banded(probes, "pid").select(col("band"), col("bucket"), col("pid")),
        Seq("band", "bucket"))
      .select(col("cid"), col("pid")).distinct()
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"))
    val p = probes.select(col(idCol).as("pid"), col(vecCol).as("pv"),
      norm(col(vecCol)).as("pn"))
    cand.join(c, "cid").join(p, "pid")
      .withColumn("cos", dot(col("cv"), col("pv")) / (col("cn") * col("pn")))
      .filter(col("cos") >= threshold)
      .groupBy(col("cid").as(idCol))
      .agg(count(lit(1)).as("n_probes"), max(col("cos")).as("max_cos"))
  }

  /** Recall@k monitoring probe: per sampled query, the fraction of the
    * exact (brute-force) top-k an approximate index recovered — the
    * measurement that dictates a stored index's refit cadence
    * ([[Ivf.appendStored]]'s quantizer drifts as the ingested
    * distribution shifts; "refit when the probe's mean recall sags" is
    * the operating rule this function makes concrete). Run it over a
    * SAMPLED query set (hundreds of queries): the brute-force side is
    * |sample| × corpus — a deliberate, bounded audit cost, paid on a
    * monitoring cadence rather than per query.
    *
    * Inputs are any (query_id, neighbor_id, …, rk) frames — the common
    * shape of [[bruteForceTopK]], [[lshTopK]], [[Ivf.topKStored]], and
    * [[Pq.topKReranked]]. Returns (query_id, n_truth, n_hits, recall);
    * aggregate recall = avg(recall). */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    val a = approx.filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("__hit"))
    val e = exact.filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"))
    e.join(a, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_truth"),
        sum(coalesce(col("__hit"), lit(0))).as("n_hits"))
      .select(col("query_id"), col("n_truth"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_truth")).as("recall"))
  }

  /** Embedding near-duplicate pairs within a blocking column (e.g.
    * cluster label or LSH bucket): pairwise cosine ≥ threshold. Norms
    * are per-vector, computed before the quadratic pair join. */
  def embeddingNearDups(df: DataFrame, blockCol: String, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val withNorm = df.select(col(blockCol).as("blk"), col(idCol), col(vecCol),
      norm(col(vecCol)).as("nrm"))
    val a = withNorm.select(col("blk"), col(idCol).as("id1"), col(vecCol).as("v1"),
      col("nrm").as("n1"))
    val b = withNorm.select(col("blk"), col(idCol).as("id2"), col(vecCol).as("v2"),
      col("nrm").as("n2"))
    a.join(b, Seq("blk")).filter(col("id1") < col("id2"))
      .withColumn("cos", dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .filter(col("cos") >= threshold)
      .select(col("blk"), col("id1"), col("id2"), col("cos"))
  }
}
