package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Lexical (keyword) retrieval over the document corpus: an inverted
  * index as a DataFrame and Okapi BM25 scoring — the text-side
  * complement to the embedding ANN paths in [[Similarity]]/[[Ivf]].
  * Hybrid retrieval is first-class: [[rrfFuse]]/[[hybridTopK]] fuse
  * both candidate sets by reciprocal rank.
  *
  * Scale story: the postings "index" is one hash aggregation per
  * (doc, term) — at 100 TB it is built once and persisted partitioned
  * by term-hash range, so a query's candidate fetch touches only its
  * terms' partitions (same pruning contract as the IVF stored layout).
  * Query-time cost is |terms| postings-list scans + one per-doc sum; the
  * corpus-wide stats (N, avgdl) are a 1-row frame computed once and
  * broadcast, never a driver round-trip inside the plan.
  *
  * Determinism: per-term BM25 contributions are rounded to 9 decimals
  * and summed as exact DECIMAL (order-independent — the established
  * oracle discipline), so ranking ties break identically everywhere.
  */
object Retrieval {

  private def toks(textCol: Column): Column = split(trim(textCol), "\\s+")

  /** (doc_id-as-idCol, term) — one row per token occurrence. */
  def words(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(toks(col(textCol))).as("term"))

  /** The inverted index as data: (term, idCol, tf) postings. Persist
    * this (repartitioned by `term`) for query-time reuse. */
  def postings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    words(df, idCol, textCol)
      .groupBy(col("term"), col(idCol))
      .agg(count(lit(1)).cast("double").as("tf"))

  /** Per-document token length (dl). */
  def docLengths(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), size(toks(col(textCol))).cast("double").as("dl"))

  /** The persisted form of the lexical index: the postings table, the
    * per-doc lengths, the 1-row corpus stats, AND the per-term document
    * frequencies — built once per corpus snapshot ([[buildIndex]]),
    * written to storage (postings repartitioned by `term`, the layout
    * every query's candidate fetch prunes on), and reused by every
    * [[bm25FromIndex]]/[[bm25BatchFromIndex]] call. `dfreq` is a static
    * property of the snapshot: persisting it means a query battery
    * never pays a corpus-postings-wide aggregation for it (at 100 TB
    * that agg per eval battery was the dominant avoidable cost).
    *
    * Stored postings are DENORMALIZED with the owning document's length
    * (`dl`) — the classic impact-list layout: +8 bytes per posting on
    * disk buys every scorer its length factor IN the term-keyed scan,
    * so no query ever pays the doc-keyed join (= an id-hash exchange of
    * every touched posting) that a separate lengths table costs.
    * `docLengths` stays in the index for stats and [[mergeIndex]].
    *
    * The inline [[bm25]]/[[bm25Batch]] forms rebuild everything per
    * call — correct, but a production eval battery should not
    * re-explode 100 TB of corpus per query batch. */
  final case class LexIndex(postings: DataFrame, docLengths: DataFrame,
    stats: DataFrame, dfreq: DataFrame)

  def buildIndex(df: DataFrame, idCol: String, textCol: String): LexIndex = {
    val dl = docLengths(df, idCol, textCol)
    val post = postings(df, idCol, textCol)
      .join(dl, idCol)
      .select(col("term"), col(idCol), col("tf"), col("dl"))
    LexIndex(post, dl,
      dl.agg(count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl")),
      post.groupBy("term").agg(count(lit(1)).cast("double").as("df")))
  }

  /** Persist / reload the index (postings laid out by term — the
    * partitioning a term-keyed candidate fetch prunes on). Postings are
    * SORTED by term within each file, not just clustered into term
    * partitions: parquet row-group min/max stats on a sorted column are
    * tight disjoint ranges, so a term-keyed fetch skips every row group
    * outside its terms instead of relying on clustering luck — the
    * difference between "reads its terms' row groups" and "reads the
    * partition" at 100-TB index scale (RetrievalSpec asserts the
    * per-file sort survives a read back). Same treatment for dfreq. */
  def writeIndex(index: LexIndex, path: String): Unit = {
    index.postings.repartition(col("term")).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$path/postings")
    index.docLengths.write.mode("overwrite").parquet(s"$path/doc_lengths")
    index.stats.write.mode("overwrite").parquet(s"$path/stats")
    index.dfreq.repartition(col("term")).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$path/dfreq")
  }

  def readIndex(spark: org.apache.spark.sql.SparkSession, path: String): LexIndex = {
    val post0 = spark.read.parquet(s"$path/postings")
    val dl = spark.read.parquet(s"$path/doc_lengths")
    // migration on read: indexes persisted before postings carried the
    // denormalized `dl` column (the impact-list layout) reconstruct it
    // from the stored doc_lengths table — otherwise every scorer would
    // hit UNRESOLVED_COLUMN with no hint the snapshot predates the
    // layout. The doc-id column is whatever postings carries beyond
    // (term, tf); rewrite the snapshot with writeIndex to stop paying
    // this join per load.
    val post =
      if (post0.columns.contains("dl")) post0
      else {
        val idCol = post0.columns.filterNot(Set("term", "tf")).head
        post0.join(dl, idCol).select(col("term"), col(idCol), col("tf"), col("dl"))
      }
    LexIndex(post, dl,
      spark.read.parquet(s"$path/stats"),
      spark.read.parquet(s"$path/dfreq"))
  }

  /** Incremental index maintenance: fold a batch of NEW documents into
    * an existing index without touching the already-indexed corpus —
    * the consumer of [[Dedup.snapshotDiff]]'s `added` set. Only the new
    * batch is tokenized/exploded; the old postings and lengths pass
    * through untouched (at 100 TB the merge cost is proportional to the
    * delta, not the corpus). Stats are recomputed from the merged
    * per-doc lengths — `dl` is an integer-valued double, so the sum is
    * exact at any partitioning and the result is bit-identical to a
    * full [[buildIndex]] over old ∪ added (RetrievalSpec pins this).
    * `addedDocs` ids must be disjoint from the indexed ids (re-indexed
    * docs would double-count: diff first, merge the `added` set). */
  def mergeIndex(index: LexIndex, addedDocs: DataFrame, idCol: String,
      textCol: String): LexIndex = {
    val addedDl = docLengths(addedDocs, idCol, textCol)
    val addedPost = postings(addedDocs, idCol, textCol)
      .join(addedDl, idCol)
      .select(col("term"), col(idCol), col("tf"), col("dl"))
    val dl = index.docLengths.union(addedDl)
    // df merges by SUM over the disjoint doc sets: a term's df over
    // old ∪ added = df_old + df_added, and df values are integer-valued
    // doubles, so the sum is exact — bit-identical to a full rebuild's
    // count over the merged postings (RetrievalSpec pins this). Cost is
    // delta-postings + a join keyed on the dfreq table's own `term`.
    val dfMerged = index.dfreq.withColumnRenamed("df", "df_old")
      .join(addedPost.groupBy("term").agg(count(lit(1)).cast("double").as("df_add")),
        Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("df_old"), lit(0.0)) + coalesce(col("df_add"), lit(0.0))).as("df"))
    LexIndex(index.postings.union(addedPost), dl,
      dl.agg(count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl")),
      dfMerged)
  }

  private def bm25Contrib(k1: Double, b: Double,
      weight: Double = 1.0): Column = {
    val raw = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
      (col("tf") * (k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    // field weight multiplies in the DOUBLE domain before the round-9
    // decimal consensus cast (a decimal×decimal product would round at
    // engine-specific result scales); weight 1.0 keeps the expression
    // tree byte-identical to the unweighted form
    round(if (weight == 1.0) raw else lit(weight) * raw, 9)
      .cast(DecimalType(28, 10))
  }

  /** Per-(doc, term) BM25 contribution rows off a persisted index —
    * the shared core of [[bm25FromIndex]] and the fielded
    * [[bm25fFromIndex]] combination. */
  private def indexContribs(index: LexIndex, idCol: String,
      queryTerms: Seq[String], k1: Double, b: Double,
      weight: Double): DataFrame = {
    val tf = index.postings.filter(col("term").isin(queryTerms: _*))
    val dfreq = index.dfreq.filter(col("term").isin(queryTerms: _*))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(index.stats))
      .select(col(idCol), bm25Contrib(k1, b, weight).as("c"))
  }

  /** BM25 scores for a bag of query terms: (idCol, score). Only
    * documents containing ≥1 query term appear. `k1`/`b` are the
    * standard Robertson defaults; idf is the +1-floored Lucene form
    * ln((N-df+0.5)/(df+0.5) + 1) so scores stay non-negative.
    *
    * The inline form pushes the term filter INTO the token explode, so
    * the tf aggregation (the only corpus-×-token-scale stage) runs over
    * matching tokens only — a filtered-count df over those rows equals
    * the full index's df for the query's terms exactly. Doc lengths and
    * corpus stats still need one full-corpus pass each (they are
    * properties of the whole corpus); with a persisted index use
    * [[bm25FromIndex]] and pay neither. */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = words(df, idCol, textCol)
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("term"), col(idCol))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val dl = docLengths(df, idCol, textCol)
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    tf.join(broadcast(dfreq), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .select(col(idCol), bm25Contrib(k1, b).as("c"))
      .groupBy(idCol)
      .agg(sum(col("c")).as("score_dec"))
  }

  /** [[bm25]] over a prebuilt/persisted [[LexIndex]]. The df lookup is
    * a |queryTerms|-row filter on the persisted dfreq table — never an
    * aggregation over the postings; `dl` rides the postings themselves
    * (the denormalized layout), so no doc-keyed join happens at all. */
  def bm25FromIndex(index: LexIndex, idCol: String, queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    indexContribs(index, idCol, queryTerms, k1, b, weight = 1.0)
      .groupBy(idCol)
      .agg(sum(col("c")).as("score_dec"))

  // -- fielded retrieval: body + anchor (BM25F-lite) -----------------------

  /** An index over PRE-TOKENIZED (id, term) occurrence rows — one row
    * per token occurrence, same shape [[words]] emits. This is how the
    * ANCHOR field indexes at scale: anchor text arrives as link rows
    * (target, anchor term) — [[Graph.anchorTerms]]' input shape — and
    * building from them directly avoids materializing a concatenated
    * anchor-text blob per popular target (a hub's incoming anchors can
    * be arbitrarily many). Identical output to [[buildIndex]] over the
    * space-joined text (RetrievalSpec pins the equivalence): dl = the
    * doc's total occurrence count, stats over docs with ≥1 occurrence. */
  def buildIndexFromTerms(terms: DataFrame, idCol: String,
      termCol: String = "term"): LexIndex = {
    val occ = terms.select(col(idCol), col(termCol).as("term"))
      .filter(col("term").isNotNull && col("term") =!= "")
    val dl = occ.groupBy(col(idCol)).agg(count(lit(1)).cast("double").as("dl"))
    val post = occ.groupBy(col("term"), col(idCol))
      .agg(count(lit(1)).cast("double").as("tf"))
      .join(dl, idCol)
      .select(col("term"), col(idCol), col("tf"), col("dl"))
    LexIndex(post, dl,
      dl.agg(count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl")),
      post.groupBy("term").agg(count(lit(1)).cast("double").as("df")))
  }

  /** [[buildIndexFromTerms]] over PRE-COUNTED (id, term, count) rows —
    * the shape [[Graph.anchorTerms]] persists (top-k anchor profile
    * per link target): tf = the summed count per (id, term), dl = the
    * id's total count. Counts are integer-valued doubles, so the sums
    * are exact at any partitioning; equal to [[buildIndexFromTerms]]
    * over the explosion of each row count times (RetrievalSpec pins
    * it). A profile-derived anchor index trades the tail of a hub's
    * anchor vocabulary (the profile's k cap) for never re-scanning the
    * link set — the standard serving artifact. */
  def buildIndexFromTermCounts(counts: DataFrame, idCol: String,
      termCol: String = "term", countCol: String = "n"): LexIndex = {
    val occ = counts
      .select(col(idCol), col(termCol).as("term"),
        col(countCol).cast("double").as("__n"))
      .filter(col("term").isNotNull && col("term") =!= "" && col("__n") > 0)
    val post0 = occ.groupBy(col("term"), col(idCol)).agg(sum(col("__n")).as("tf"))
    val dl = post0.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    val post = post0.join(dl, idCol)
      .select(col("term"), col(idCol), col("tf"), col("dl"))
    LexIndex(post, dl,
      dl.agg(count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl")),
      post.groupBy("term").agg(count(lit(1)).cast("double").as("df")))
  }

  /** Field-weighted BM25F-lite over TWO persisted indexes — the
    * classic web-search signal (Robertson/Zaragoza/Taylor, CIKM 2004:
    * anchor text describes the target better than the target's own
    * words; this is the per-field linear combination, the "lite" form
    * that keeps each field's own length normalization): score(d) =
    * BM25_body(d) + anchorWeight · BM25_anchor(d), each field scored
    * against its OWN df/dl/avgdl/n_docs, combined as one exact-decimal
    * sum over the unioned contribution rows (the weight multiplies in
    * the double domain inside the round-9 consensus — see
    * [[bm25Contrib]]). A document matching in EITHER field is scored:
    * anchor-only matches — pages the crawl has seen links to but whose
    * body lacks the terms — surface exactly as intended. Cost shape:
    * two term-keyed index probes (each pruned to the query's terms on
    * the stored sort order) and one id-keyed aggregation; the anchor
    * index is usually orders of magnitude smaller than the body index. */
  def bm25fFromIndex(body: LexIndex, anchor: LexIndex, idCol: String,
      queryTerms: Seq[String], anchorWeight: Double = 1.0,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    indexContribs(body, idCol, queryTerms, k1, b, weight = 1.0)
      .union(indexContribs(anchor, idCol, queryTerms, k1, b, anchorWeight))
      .groupBy(idCol)
      .agg(sum(col("c")).as("score_dec"))

  /** [[bm25fFromIndex]] with the shared exact-decimal top-k tail. */
  def bm25fTopKFromIndex(body: LexIndex, anchor: LexIndex, idCol: String,
      queryTerms: Seq[String], k: Int, anchorWeight: Double = 1.0,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    topKTail(bm25fFromIndex(body, anchor, idCol, queryTerms, anchorWeight,
      k1, b), idCol, k)

  /** The shared single-query ranking tail: order by the exact-decimal
    * sum (engine-independent ties), take k (plans as
    * TakeOrderedAndProject — no global sort materialization), display
    * the 6-rounded double. One definition so the inline and FromIndex
    * twins that RetrievalSpec pins equal cannot drift. */
  private def topKTail(scored: DataFrame, idCol: String, k: Int): DataFrame =
    scored.orderBy(col("score_dec").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("score_dec").cast("double"), 6).as("score"))

  /** The shared candidate-ranking tail for hybrid fusion: top-perList
    * by the exact-decimal sum, then the 1-based rank window over the
    * surviving metadata-sized rows. */
  private def lexRankTail(scored: DataFrame, idCol: String, perList: Int): DataFrame =
    scored.orderBy(col("score_dec").desc, col(idCol))
      .limit(perList)
      .select(col(idCol), row_number().over(
        Window.orderBy(col("score_dec").desc, col(idCol))).as("rank"))

  /** Top-k BM25 retrieval: (idCol, score) ordered by score desc, id —
    * the exact-decimal score column makes the order engine-independent.
    * Plans as TakeOrderedAndProject (no global sort materialization). */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    topKTail(bm25(df, idCol, textCol, queryTerms, k1, b), idCol, k)

  /** [[bm25TopK]] over a prebuilt/persisted [[LexIndex]] — the
    * single-query serving form: a |terms|-row dfreq filter + a pruned
    * postings fetch, never a corpus re-explode. Same plan tail as
    * [[bm25TopK]] (TakeOrderedAndProject over the exact-decimal sum). */
  def bm25TopKFromIndex(index: LexIndex, idCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    topKTail(bm25FromIndex(index, idCol, queryTerms, k1, b), idCol, k)

  /** Batched BM25: score MANY queries in ONE plan — the eval-battery
    * shape (thousands of benchmark queries against the corpus) that the
    * `Seq[String]` form would drive as a driver loop. `queries` is a
    * (queryIdCol, termCol) frame; joining it against the postings index
    * on `term` replaces the per-query literal filter, and every
    * downstream stage carries the query id. Per query, scores are
    * IDENTICAL to [[bm25]] (duplicate terms collapse to a set; df/N/
    * avgdl are corpus-level stats shared by all queries — computed
    * once, not per query).
    *
    * Scale: postings ⋈ query-terms shuffles on `term` (the postings
    * index's native partitioning, so a persisted index prunes to the
    * touched term partitions); the per-(query, doc) sum is one hash
    * aggregation keyed (query, doc). Nothing is per-query work except
    * rows that query's terms actually hit. */
  def bm25Batch(df: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String = "query_id",
      termCol: String = "term",
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25BatchFromIndex(buildIndex(df, idCol, textCol), idCol, queries,
      queryIdCol, termCol, k1, b)

  /** [[bm25Batch]] over a prebuilt/persisted [[LexIndex]] — the
    * eval-battery production shape: index built once per corpus
    * snapshot, batteries scored against it without re-exploding the
    * corpus. */
  def bm25BatchFromIndex(index: LexIndex, idCol: String, queries: DataFrame,
      queryIdCol: String = "query_id", termCol: String = "term",
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // a query's terms are a SET (the Seq form's isin semantics)
    val qt = queries.select(col(queryIdCol), col(termCol).as("term")).distinct()
    val qterms = qt.select("term").distinct()
    // df comes off the persisted dfreq table restricted to the battery's
    // terms — |battery terms| rows, never a corpus-postings agg
    // (inside scoredPairsU).
    // A term's BM25 contribution is a function of (term, doc) ALONE —
    // df, tf, dl, corpus stats — not of the query. So score each
    // touched (term, doc) pair ONCE, then fan out to queries: with a
    // battery whose terms are common (the realistic eval shape), the
    // candidate expansion is |battery| × |postings(term)| rows, an
    // order of magnitude more than the distinct (term, doc) pairs —
    // putting the round(log(...))→decimal arithmetic on the pairs
    // instead of the expansion was a measured 3× on the x38 gate.
    // The 9-decimal contribution rides the expansion as its exact
    // UNSCALED long (c·1e9 — integer-valued by construction), so the
    // per-(query, doc) sum is a primitive long aggregation, converted
    // back to the exact DECIMAL sum only at group level.
    // dl rides the postings (denormalized layout): the whole scoring
    // pass stays in the term-keyed scan — no doc-keyed exchange of the
    // touched postings ever happens.
    val scoredTD = scoredPairsU(index, idCol, qterms, k1, b, weight = 1.0)
    batchSumTail(scoredTD, qt, idCol, queryIdCol)
  }

  /** (term, doc, unscaled-long contribution) pairs off one index —
    * the shared once-per-pair scoring core of the batch forms. */
  private def scoredPairsU(index: LexIndex, idCol: String,
      qterms: DataFrame, k1: Double, b: Double, weight: Double): DataFrame =
    index.postings.join(broadcast(qterms), "term")
      .join(broadcast(index.dfreq.join(qterms, "term")), "term")
      .crossJoin(broadcast(index.stats))
      .select(col("term"), col(idCol),
        (bm25Contrib(k1, b, weight) * lit(1000000000L)).cast("long").as("c_u"))

  /** Fan scored pairs out to the battery and sum per (query, doc) as
    * primitive longs, back to the exact decimal at group level. */
  private def batchSumTail(scoredTD: DataFrame, qt: DataFrame,
      idCol: String, queryIdCol: String): DataFrame =
    scoredTD.join(broadcast(qt), "term")
      .groupBy(col(queryIdCol), col(idCol))
      .agg(sum(col("c_u")).as("s_u"))
      .select(col(queryIdCol), col(idCol),
        (col("s_u").cast(DecimalType(38, 10)) / lit(1000000000L))
          .cast(DecimalType(28, 10)).as("score_dec"))

  /** BATCH [[bm25fFromIndex]] — the eval-battery shape of the fielded
    * scorer: body pairs and anchor pairs each score ONCE per touched
    * (term, doc) against their own field's stats (the anchor weight
    * folded into the contribution exactly as the single-query form),
    * union, one fan-out to the battery, one primitive-long sum per
    * (query, doc). Same cost discipline as [[bm25BatchFromIndex]];
    * the anchor side adds one (usually much smaller) term-keyed probe. */
  def bm25fBatchFromIndex(body: LexIndex, anchor: LexIndex, idCol: String,
      queries: DataFrame, queryIdCol: String = "query_id",
      termCol: String = "term", anchorWeight: Double = 1.0,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qt = queries.select(col(queryIdCol), col(termCol).as("term")).distinct()
    val qterms = qt.select("term").distinct()
    val pairs = scoredPairsU(body, idCol, qterms, k1, b, weight = 1.0)
      .union(scoredPairsU(anchor, idCol, qterms, k1, b, anchorWeight))
    batchSumTail(pairs, qt, idCol, queryIdCol)
  }

  /** Per-query top-k over [[bm25fBatchFromIndex]] — window partitioned
    * BY QUERY (each partition is one query's candidates, never a
    * global order). */
  def bm25fTopKBatchFromIndex(body: LexIndex, anchor: LexIndex,
      idCol: String, queries: DataFrame, k: Int,
      queryIdCol: String = "query_id", termCol: String = "term",
      anchorWeight: Double = 1.0,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("score_dec").desc, col(idCol))
    bm25fBatchFromIndex(body, anchor, idCol, queries, queryIdCol, termCol,
        anchorWeight, k1, b)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(queryIdCol), col(idCol),
        round(col("score_dec").cast("double"), 6).as("score"), col("rk"))
  }

  /** Per-query top-k over [[bm25Batch]]: (queryIdCol, idCol, score, rk).
    * The ranking window partitions BY QUERY — each partition holds one
    * query's candidates (docs sharing ≥1 term), so a 10k-query battery
    * ranks 10k-way parallel, never a global order. */
  def bm25TopKBatch(df: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int, queryIdCol: String = "query_id",
      termCol: String = "term",
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKBatchFromIndex(buildIndex(df, idCol, textCol), idCol, queries, k,
      queryIdCol, termCol, k1, b)

  /** [[bm25TopKBatch]] over a prebuilt/persisted [[LexIndex]] — the
    * production eval-battery shape: the measured cost is the battery,
    * not an index rebuild. */
  def bm25TopKBatchFromIndex(index: LexIndex, idCol: String,
      queries: DataFrame, k: Int, queryIdCol: String = "query_id",
      termCol: String = "term",
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("score_dec").desc, col(idCol))
    bm25BatchFromIndex(index, idCol, queries, queryIdCol, termCol, k1, b)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(queryIdCol), col(idCol),
        round(col("score_dec").cast("double"), 6).as("score"), col("rk"))
  }

  /** HARD-NEGATIVE MINING for retrieval/embedding training sets — the
    * standard recipe (in-batch negatives are too easy; BM25-mined ones
    * are what DPR-style training actually uses): for each query, the
    * corpus' top-ranked BM25 candidates that are NOT known positives
    * are the hard negatives — lexically confusable, labeled
    * non-relevant. `positives` is (query_id, pos_id) — a qrel, a click
    * log, or (the contamination-safe default for query-by-document
    * mining) the query doc's own dup CLUSTER, so a disguised copy of
    * the positive can never be mislabeled negative. Candidates fetch
    * `fetchDepth` (> k) deep so exclusions don't starve the take; the
    * query doc itself is never a negative even when `positives` omits
    * it. Returns (query_id, idCol, score, neg_rank) with neg_rank
    * re-numbered 1..k AFTER exclusion. Scale shape: one batched
    * index-side scoring pass ([[bm25TopKBatchFromIndex]] — postings
    * meet query terms term-partitioned), one anti-join sized by
    * |candidates|, windows only over fetchDepth-bounded lists. */
  def hardNegatives(index: LexIndex, idCol: String, queries: DataFrame,
      positives: DataFrame, k: Int, fetchDepth: Int,
      queryIdCol: String = "query_id", posIdCol: String = "pos_id",
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(fetchDepth >= k, s"fetchDepth $fetchDepth must be >= k $k")
    val cands = bm25TopKBatchFromIndex(index, idCol, queries, fetchDepth,
      queryIdCol, k1 = k1, b = b)
    val pos = positives.select(col(queryIdCol).as("__pq"),
      col(posIdCol).as("__pp"))
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("rk"))
    cands
      .filter(col(idCol) =!= col(queryIdCol))
      .join(pos, col(queryIdCol) === col("__pq") && col(idCol) === col("__pp"),
        "left_anti")
      .withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= k)
      .select(col(queryIdCol), col(idCol), col("score"), col("neg_rank"))
  }

  /** Candidate list → (idCol, rank): 1-based position by (score desc,
    * id asc) — the deterministic tie rule. Apply to CANDIDATE lists
    * only: they are top-k-sized by construction, so the unpartitioned
    * window ranks metadata, never the corpus. */
  def ranks(scored: DataFrame, idCol: String, scoreCol: String): DataFrame =
    scored.select(col(idCol), row_number().over(
      Window.orderBy(col(scoreCol).desc, col(idCol))).as("rank"))

  /** Reciprocal-rank fusion (Cormack & Clarke 2009): fuse candidate
    * lists — each (idCol, rank), 1-based — into one ranking by
    * Σ_lists 1/(k0 + rank), k0 = 60 the published default. Rank-based,
    * so BM25's unbounded scores and cosine's [−1,1] fuse without any
    * calibration — the standard hybrid-retrieval combiner.
    *
    * Determinism: per-list contributions are rounded to 9 decimals and
    * DECIMAL-summed (order-independent); the final order
    * (rrf desc, id asc) is total. Scale: every input is already a
    * top-k candidate list, so the union/aggregate is bounded by
    * Σ|lists| rows — metadata, not corpus. */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, k: Int,
      k0: Double = 60.0): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one candidate list")
    val contribs = lists.map(_.select(col(idCol),
      round(lit(1.0) / (lit(k0) + col("rank")), 9)
        .cast(DecimalType(28, 10)).as("c")))
    contribs.reduce(_ unionByName _)
      .groupBy(idCol)
      .agg(sum(col("c")).as("rrf_dec"))
      .orderBy(col("rrf_dec").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("rrf_dec").cast("double"), 6).as("rrf"))
  }

  /** Hybrid lexical + semantic retrieval: BM25 candidates for the query
    * terms ∪ cosine candidates for the query vector, RRF-fused. `ann`
    * is any (neighbor_id, rk) frame from a [[Similarity]]/[[Ivf]] top-k
    * — the caller picks the ANN path (brute force, LSH, or IVF), which
    * is exactly the scale dial: brute for small corpora, partitioned
    * IVF probes at 100 TB. The lexical side ranks on the exact-decimal
    * BM25 sum (not the 6-rounded display score), so candidate order is
    * engine-independent. */
  def hybridTopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], ann: DataFrame, k: Int,
      perList: Int = 50, k0: Double = 60.0): DataFrame = {
    val lex = lexRankTail(bm25(docs, idCol, textCol, queryTerms), idCol, perList)
    val sem = ann.select(col("neighbor_id").as(idCol), col("rk").as("rank"))
      .filter(col("rank") <= perList)
    rrfFuse(Seq(lex, sem), idCol, k, k0)
  }

  /** [[hybridTopK]] over a prebuilt/persisted [[LexIndex]]: the lexical
    * candidates come off the stored postings/dfreq (inline bm25's
    * filtered-count df equals the index df for the query's terms — the
    * documented identity — so values are unchanged), and the corpus
    * text is never re-exploded per query. */
  def hybridTopKFromIndex(index: LexIndex, idCol: String,
      queryTerms: Seq[String], ann: DataFrame, k: Int,
      perList: Int = 50, k0: Double = 60.0): DataFrame = {
    val lex = lexRankTail(bm25FromIndex(index, idCol, queryTerms), idCol, perList)
    val sem = ann.select(col("neighbor_id").as(idCol), col("rk").as("rank"))
      .filter(col("rank") <= perList)
    rrfFuse(Seq(lex, sem), idCol, k, k0)
  }

  /** Batched reciprocal-rank fusion: each list is (queryIdCol, idCol,
    * rank) — fuse PER QUERY in one plan. Same decimal discipline as
    * [[rrfFuse]]; the ranking window partitions by query, and inputs
    * are per-query top-k lists, so every partition is metadata-sized. */
  def rrfFuseBatch(lists: Seq[DataFrame], queryIdCol: String, idCol: String,
      k: Int, k0: Double = 60.0): DataFrame = {
    require(lists.nonEmpty, "rrfFuseBatch needs at least one candidate list")
    val contribs = lists.map(_.select(col(queryIdCol), col(idCol),
      round(lit(1.0) / (lit(k0) + col("rank")), 9)
        .cast(DecimalType(28, 10)).as("c")))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("rrf_dec").desc, col(idCol))
    contribs.reduce(_ unionByName _)
      .groupBy(col(queryIdCol), col(idCol))
      .agg(sum(col("c")).as("rrf_dec"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(queryIdCol), col(idCol),
        round(col("rrf_dec").cast("double"), 6).as("rrf"), col("rk"))
  }

  /** Batched hybrid retrieval: [[bm25Batch]] lexical candidates ∪ a
    * batched ANN frame (queryIdCol, neighbor_id, rk — e.g.
    * [[Similarity.bruteForceTopK]]/[[Ivf]] top-k, which already take
    * query DataFrames), RRF-fused per query. A full eval battery is ONE
    * plan — no driver loop. Per query, the result equals
    * [[hybridTopK]]. */
  def hybridTopKBatch(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, ann: DataFrame, k: Int,
      queryIdCol: String = "query_id", termCol: String = "term",
      perList: Int = 50, k0: Double = 60.0): DataFrame =
    hybridTopKBatchFromIndex(buildIndex(docs, idCol, textCol), idCol, queries,
      ann, k, queryIdCol, termCol, perList, k0)

  /** [[hybridTopKBatch]] over a prebuilt/persisted [[LexIndex]] — pair
    * with a stored ANN index ([[Ivf]]/[[Pq]] top-k, which already take
    * query DataFrames) and the whole serving path touches only
    * persisted index structures, never the corpus text. */
  def hybridTopKBatchFromIndex(index: LexIndex, idCol: String,
      queries: DataFrame, ann: DataFrame, k: Int,
      queryIdCol: String = "query_id", termCol: String = "term",
      perList: Int = 50, k0: Double = 60.0): DataFrame = {
    val wLex = Window.partitionBy(col(queryIdCol))
      .orderBy(col("score_dec").desc, col(idCol))
    val lex = bm25BatchFromIndex(index, idCol, queries, queryIdCol, termCol)
      .withColumn("rank", row_number().over(wLex))
      .filter(col("rank") <= perList)
      .select(col(queryIdCol), col(idCol), col("rank"))
    val sem = ann.select(col(queryIdCol), col("neighbor_id").as(idCol),
        col("rk").as("rank"))
      .filter(col("rank") <= perList)
    rrfFuseBatch(Seq(lex, sem), queryIdCol, idCol, k, k0)
  }

  /** Per-document top-k TF-IDF keywords: (idCol, term, tfidf, rk) — the
    * classic corpus summarization / keyword-extraction pass (and the
    * feature base for cluster labeling over dedup output).
    * tfidf = (tf/dl) · ln(N/df), rounded to 9 decimals; rank ties break
    * on term asc, so the ranking is total and engine-independent.
    *
    * Scale: tf and df come off the [[postings]] aggregation (shuffle
    * carries distinct (term, doc) pairs), the corpus size is a 1-row
    * broadcast, and the ranking window partitions BY DOCUMENT — top-k
    * per doc never sees a global order. */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    // df and dl are WINDOW aggregates over the one postings frame, not
    // separate groupBy branches: the branch formulation computes the
    // postings aggregation (and its corpus explode) once per statistic —
    // per-branch column pruning makes the exchanges non-identical, so
    // ReuseExchange never fires and the plan ran 3 explodes + 11
    // exchanges (measured); this shape runs 1 explode + 4. The doc
    // windows share one (id) exchange; df partitions by term —
    // both keys are the shuffle keys the join form used anyway.
    val post = postings(df, idCol, textCol)
    val nDocs = broadcast(df.agg(count(lit(1)).cast("double").as("n_docs")))
    val wTerm = Window.partitionBy(col("term"))
    val wDoc = Window.partitionBy(col(idCol))
    val scored = post.crossJoin(nDocs)
      .withColumn("df", count(lit(1)).over(wTerm).cast("double"))
      .withColumn("dl", sum(col("tf")).over(wDoc))
      .select(col(idCol), col("term"),
        round((col("tf") / col("dl")) * log(col("n_docs") / col("df")), 9)
          .as("tfidf"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** [[tfidfTopK]] over a prebuilt/persisted [[LexIndex]] — the
    * x38/x42 amortization: tf, df, dl and N are EXACTLY the stored
    * index's postings, dfreq, docLengths and stats, so the keyword pass
    * never re-explodes the corpus (the inline form's only
    * corpus-×-token-scale stage) and never re-aggregates df. Plan: one
    * term-keyed join (co-partitioned with the index's native term
    * layout; `dl` rides the postings, so no doc-keyed join) and the
    * per-doc ranking window's single id exchange. Values are identical
    * to the inline form — same doubles, same rounding (RetrievalSpec
    * pins equality; the x34 gate keeps its DuckDB oracle). */
  def tfidfTopKFromIndex(index: LexIndex, idCol: String, k: Int): DataFrame = {
    val scored = index.postings
      .join(index.dfreq, "term")
      .crossJoin(broadcast(index.stats))
      .select(col(idCol), col("term"),
        round((col("tf") / col("dl")) * log(col("n_docs") / col("df")), 9)
          .as("tfidf"))
    // per-doc top-k FUSED into the hash aggregation
    // ([[graft.functions.TopKAggregate.BoundedTopK]]): map-side
    // partials carry ≤ k entries per (doc × partition) across the
    // exchange — not the doc's whole term list, as the previous
    // collect_list + array_sort form did — and no per-doc sort remains
    // (the k-entry buffer stays ordered by insertion). The buffer's
    // comparator is the ranking's exact total order — tfidf desc, term
    // binary asc — and the 1-based position is the row_number
    // (RetrievalSpec pins ≡ the inline window form).
    scored.groupBy(col(idCol))
      .agg(graft.functions.TopKAggregate.boundedTopK(
        col("tfidf"), col("term"), k).as("top"))
      .select(col(idCol), posexplode(col("top")))
      .select(col(idCol), col("col.term").as("term"),
        col("col.score").as("tfidf"), (col("pos") + 1).cast("int").as("rk"))
  }
}
