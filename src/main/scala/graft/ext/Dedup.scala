package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (U4 north-star):
  * exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding-cosine.
  *
  * Scale design: every method is shuffle-bounded by a *blocking key*
  * (hash group, LSH band bucket, label) — never an all-pairs cross join.
  * At 100 TB the candidate generation is the only quadratic risk, and
  * each variant controls it: exact dedup is a single hash aggregate;
  * MinHash/SimHash pairs only meet inside a band bucket; Jaccard and
  * cosine pair within caller-chosen blocks.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per key (hash-groupBy, one
    * shuffle, map-side partial min). */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Word n-gram shingles over an ALREADY-TOKENIZED array column.
    *
    * The tokens must be a bound attribute (a real column), not the
    * `split(...)` expression itself: expressions referenced from inside
    * a `transform` lambda are re-evaluated per element, so inlining the
    * split turns shingling O(tokens) into O(tokens × shingles) string
    * splits — measured 13 s vs <1 s on 5 000 docs. */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    // one codegen'd pass (graft_word_ngrams — empty for docs shorter
    // than one shingle); the transform(sequence(...)) form it replaces
    // was a higher-order function with no codegen path, evaluated
    // interpreted with per-element boxing
    array_distinct(graft.functions.TextExpressions.wordNgramsOf(toks, n))

  /** doc → exploded distinct shingle rows: (id, shingle: long).
    * Shingles are xxhash64-hashed at the explode so everything
    * downstream (signatures, set joins) moves 8-byte longs instead of
    * shingle strings — an order of magnitude less shuffle at corpus
    * scale. (64-bit collisions are ~(distinct shingles)²/2⁶⁵ —
    * negligible against the LSH's own error.) */
  def shingleRows(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"),
        split(trim(lower(col(textCol))), "\\s+").as("toks"))
      .select(col("id"),
        explode(shinglesFromTokens(col("toks"), n)).as("shingle_str"))
      .select(col("id"), xxhash64(col("shingle_str")).as("shingle"))

  /** MinHash signatures: for each of `numHashes` seeded hash functions,
    * the min over the doc's shingles. One groupBy with H partial-min
    * aggregates — a single shuffle regardless of H.
    *
    * Measured cost split at sf0.1 (local[4]): shingle+persist 3.3 s,
    * signature 2.6 s, candidates 1.8 s, verify 1.4 s — no dominant
    * stage. The 96 seeded xxhash64 evals/row could drop to multiply-add
    * universal hashing, but Spark 4 runs ANSI mode (long overflow
    * throws), and xor/rotate families are not min-wise independent —
    * codegen'd xxhash64 is the right trade. */
  def minhashSignature(rows: DataFrame, numHashes: Int): DataFrame = {
    val aggs = (0 until numHashes).map(h =>
      min(xxhash64(lit(h), col("shingle"))).as(s"h$h")) // seeded re-hash of the shingle hash
    rows.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: split the signature into `bands` bands of
    * `numHashes/bands` rows, hash each band → (id, band, bucket). Docs
    * sharing any band bucket become candidates. */
  def lshBuckets(sig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      val hs = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(hs: _*).as("bucket"))
    }
    sig.select(col("id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Candidate pairs = docs sharing a band bucket (id1 < id2, distinct).
    * The self-join key is (band, bucket) so only same-bucket rows meet. */
  def candidatePairs(buckets: DataFrame): DataFrame = {
    val a = buckets.select(col("band"), col("bucket"), col("id").as("id1"))
    val b = buckets.select(col("band"), col("bucket"), col("id").as("id2"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  /** Exact Jaccard for given pairs, computed set-relationally: one join
    * of pair ids against shingle rows per side, then
    * |A∩B| / (|A|+|B|-|A∩B|). Shuffles scale with candidate count, not
    * corpus size. */
  def verifyJaccard(pairs: DataFrame, rows: DataFrame): DataFrame = {
    val sizes = rows.groupBy("id").agg(count(lit(1)).as("sz"))
    val r1 = rows.select(col("id").as("id1"), col("shingle"))
    val r2 = rows.select(col("id").as("id2"), col("shingle"))
    val interCount = pairs.join(r1, "id1").join(r2, Seq("id2", "shingle"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("n_inter"))
    pairs
      .join(interCount, Seq("id1", "id2"), "left")
      .na.fill(0, Seq("n_inter"))
      .join(sizes.withColumnRenamed("id", "id1").withColumnRenamed("sz", "sz1"), "id1")
      .join(sizes.withColumnRenamed("id", "id2").withColumnRenamed("sz", "sz2"), "id2")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("sz1") + col("sz2") - col("n_inter")))
  }

  /** [[verifyJaccard]] computed via per-doc sorted shingle-hash arrays
    * + the codegen merge-intersect kernel
    * ([[graft.functions.VectorExpressions.sortedIntersectCount]],
    * bit-pinned in FunctionsSpec): identical values, different shape —
    * two id-keyed joins moving ONE array per touched doc instead of the
    * exploded (pair × shingle) intersection join. The right engine when
    * the row set is already candidate-restricted (the incremental
    * probe: rows ≈ touched docs only — measured 1.6 → ~0.4 s on the
    * x2c verify stage); the exploded form remains right when rows span
    * the corpus and only a sliver is touched per pair. Exactness is
    * oracle-anchored directly: the x2d gate runs THIS kernel against
    * DuckDB's first-principles Jaccard. */
  def verifyJaccardArrays(pairs: DataFrame, rows: DataFrame): DataFrame = {
    val sets = rows.groupBy("id")
      .agg(sort_array(collect_set(col("shingle"))).as("sh"))
    pairs
      .join(sets.select(col("id").as("id1"), col("sh").as("sh1")), "id1")
      .join(sets.select(col("id").as("id2"), col("sh").as("sh2")), "id2")
      .withColumn("n_inter", graft.functions.VectorExpressions
        .sortedIntersectCount(col("sh1"), col("sh2")).cast("long"))
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (size(col("sh1")).cast("long") + size(col("sh2")) - col("n_inter")))
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: shingle → signature → bands →
    * candidate pairs → exact-Jaccard verification ≥ threshold.
    * Precision 1.0 by construction (verified); recall set by
    * (numHashes, bands). Default 96/32 (3 rows per band): P(candidate)
    * = 1-(1-J³)³² ≈ 0.99 at J=0.5 while a background-similarity pair
    * (J≈0.05) survives with only ~4e-3 — the rows-per-band exponent is
    * what keeps the verify stage linear instead of quadratic when the
    * corpus shares vocabulary. */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 96, bands: Int = 32,
      threshold: Double = 0.5): DataFrame = {
    // the shingle explode feeds four consumers (signature, sizes, and
    // both sides of the intersection join) — materialize it once; at
    // warehouse scale this is the "shingle table" you'd write to storage.
    // The result (small: verified pairs) is eagerly checkpointed so the
    // cache can be released before returning — no leaked blocks per call.
    val rows = shingleRows(df, idCol, textCol, shingleN).persist()
    try minhashNearDupsFromRows(rows, numHashes, bands, threshold)
    finally rows.unpersist()
  }

  /** The same pipeline over a PRE-MATERIALIZED shingle table — the
    * warehouse-scale shape where (id, shingle) is written/persisted once
    * and reused across dedup runs (caller owns the rows' lifecycle).
    * The small verified-pairs result is eagerly checkpointed so no plan
    * references escape. */
  def minhashNearDupsFromRows(rows: DataFrame, numHashes: Int, bands: Int,
      threshold: Double): DataFrame = {
    val sig = minhashSignature(rows, numHashes)
    val cand = candidatePairs(lshBuckets(sig, numHashes, bands))
    verifyJaccard(cand, rows)
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
      .localCheckpoint(true)
  }

  // -- incremental near-dup (persisted band store) ------------------------

  /** Write the MinHash band store for a corpus snapshot: `dir/bands` =
    * (id, band, bucket) partitioned by band, `dir/shingles` = (id,
    * shingle). This is the artifact that makes daily near-dup INCREMENTAL
    * at 100 TB: signatures depend only on document content (seeded
    * xxhash64 over the doc's own shingles — no corpus statistics), so a
    * batch's bands/shingles never have to be recomputed once stored, and
    * [[incrementalNearDups]] probes a new batch against the store at
    * batch-join cost instead of re-banding the corpus. The same
    * batch-cost contract as [[graft.ext.Retrieval.mergeIndex]] and
    * [[snapshotDiff]]. */
  def writeBandStore(df: DataFrame, idCol: String, textCol: String, dir: String,
      shingleN: Int = 3, numHashes: Int = 96, bands: Int = 32): Unit = {
    val rows = shingleRows(df, idCol, textCol, shingleN).persist()
    try {
      // shingles FIRST: the two writes are not atomic, and the failure
      // modes are asymmetric — bands without shingles yields candidate
      // pairs whose verification join silently DROPS them (an inner
      // join on sizes under-reports duplicates), while shingles without
      // bands yields no candidates at all, which a probe of a torn
      // store surfaces as "zero pairs", loud and obviously wrong.
      rows.write.mode("overwrite").parquet(s"$dir/shingles")
      lshBuckets(minhashSignature(rows, numHashes), numHashes, bands)
        .write.mode("overwrite").partitionBy("band").parquet(s"$dir/bands")
    } finally rows.unpersist()
  }

  /** Fold a new batch into a stored band store at delta cost: only the
    * batch shingles/signatures compute; stored rows are untouched.
    * (Parquet append — the batch becomes new files alongside the old.)
    *
    * PRECONDITION: the batch's ids must be DISJOINT from ids already in
    * the store ([[Dedup.snapshotDiff]]'s `added` set — diff first, then
    * append). A re-appended id duplicates its (id, band, bucket) and
    * (id, shingle) rows: the store bloats permanently (compaction
    * preserves duplicates — [[deleteFromBandStore]] then re-append is
    * the repair), candidate generation emits redundant copies of its
    * pairs, and any consumer that counts stored shingle rows directly
    * (the exploded [[verifyJaccard]] over raw store reads) computes
    * inflated set sizes. The probe paths themselves stay value-correct
    * — [[verifyJaccardArrays]]'s collect_set collapses doubled rows —
    * but the contract is the store's, not the probe's. */
  def appendBandStore(batch: DataFrame, idCol: String, textCol: String, dir: String,
      shingleN: Int = 3, numHashes: Int = 96, bands: Int = 32): Unit = {
    val rows = shingleRows(batch, idCol, textCol, shingleN).persist()
    try {
      rows.write.mode("append").parquet(s"$dir/shingles") // shingles-first: see writeBandStore
      lshBuckets(minhashSignature(rows, numHashes), numHashes, bands)
        .write.mode("append").partitionBy("band").parquet(s"$dir/bands")
    } finally rows.unpersist()
  }

  /** [[writeBandStore]] as catalog BUCKETED tables — the store layout
    * that makes the incremental probe's IO incremental, not just its
    * CPU: `<prefix>_bands` bucketed+sorted on (band, bucket) — the
    * candidate join's exact key — and `<prefix>_shingles`
    * bucketed+sorted on (id) — the verification fetch's key. Joins
    * against a bucketed scan satisfy their distribution from the file
    * layout, so [[incrementalNearDupsBucketed]] exchanges ONLY the
    * batch side: the store is read, never shuffled (ExtSpec
    * plan-asserts no Exchange above either stored scan). Same
    * `bucketBy` machinery as [[graft.store.Bucketing]] — catalog tables
    * because Spark reads bucket metadata only through the catalog.
    * Same shingles-first torn-write discipline as [[writeBandStore]]. */
  def writeBandStoreBucketed(df: DataFrame, idCol: String, textCol: String,
      tablePrefix: String, buckets: Int = 32,
      shingleN: Int = 3, numHashes: Int = 96, bands: Int = 32): Unit = {
    // clear catalog entries AND orphaned warehouse locations from a
    // previous JVM — Overwrite alone fails on an unregistered leftover
    graft.store.Bucketing.dropWithLocation(df.sparkSession, s"${tablePrefix}_shingles")
    graft.store.Bucketing.dropWithLocation(df.sparkSession, s"${tablePrefix}_bands")
    val rows = shingleRows(df, idCol, textCol, shingleN).persist()
    try {
      // repartition ON THE BUCKET KEY with numPartitions = buckets:
      // repartition's hash is the bucket hash, so each write task holds
      // exactly one bucket → ONE file per bucket. With multiple files
      // per bucket (the default: one per input-partition × bucket) the
      // scan cannot report the sortBy ordering and every probe re-SORTS
      // the merged bucket — measured as a full-store sort per query,
      // worse than the shuffle the layout exists to remove.
      rows.repartition(buckets, col("id"))
        .write.mode("overwrite")
        .bucketBy(buckets, "id").sortBy("id")
        .format("parquet").saveAsTable(s"${tablePrefix}_shingles")
      lshBuckets(minhashSignature(rows, numHashes), numHashes, bands)
        .repartition(buckets, col("band"), col("bucket"))
        .write.mode("overwrite")
        .bucketBy(buckets, "band", "bucket").sortBy("band", "bucket")
        .format("parquet").saveAsTable(s"${tablePrefix}_bands")
    } finally rows.unpersist()
  }

  /** Delta-cost append into a bucketed band store (bucket spec must
    * match the existing tables; Spark appends new per-bucket files).
    * Same DISJOINT-ids precondition as [[appendBandStore]] — the
    * sanctioned update path for a re-appearing id is
    * [[deleteFromBandStore]] then re-append. `assertDisjoint = true`
    * ENFORCES the precondition before writing: one batch-id-sized
    * left-semi count against the stored shingle ids (the store side is
    * bucketed on `id`, so the check shuffles only the batch's distinct
    * ids), failing loudly instead of silently skewing every later
    * probe's Jaccard. Opt-in because the maintenance path
    * ([[graft.streaming.DocumentIngest]]'s nearDupMaintenance /
    * snapshotDiff-gated callers) already guarantees disjointness and
    * the extra count is pure cost there.
    * NOTE: an
    * append adds a second file per bucket, so subsequent probes pay a
    * per-bucket merge-sort until the store is compacted (re-written via
    * [[writeBandStoreBucketed]]) — the standard LSM-style trade:
    * appends are delta-cost, a periodic compaction restores the
    * sort-reporting one-file-per-bucket layout. */
  def appendBandStoreBucketed(batch: DataFrame, idCol: String, textCol: String,
      tablePrefix: String, buckets: Int = 32,
      shingleN: Int = 3, numHashes: Int = 96, bands: Int = 32,
      assertDisjoint: Boolean = false): Unit = {
    if (assertDisjoint) {
      val spark = batch.sparkSession
      if (spark.catalog.tableExists(s"${tablePrefix}_shingles")) {
        val dup = batch.select(col(idCol).as("id")).distinct()
          .join(spark.table(s"${tablePrefix}_shingles").select("id"),
            Seq("id"), "left_semi")
        val offenders = dup.limit(5).collect().map(_.get(0)).mkString(", ")
        require(offenders.isEmpty,
          s"appendBandStoreBucketed: batch ids already present in " +
            s"'${tablePrefix}_shingles' (e.g. $offenders) - a re-appended " +
            "id permanently bloats the store and inflates stored set " +
            "sizes. Use deleteFromBandStore + re-append to update.")
      }
    }
    val rows = shingleRows(batch, idCol, textCol, shingleN).persist()
    try {
      rows.repartition(buckets, col("id"))
        .write.mode("append")
        .bucketBy(buckets, "id").sortBy("id")
        .format("parquet").saveAsTable(s"${tablePrefix}_shingles")
      lshBuckets(minhashSignature(rows, numHashes), numHashes, bands)
        .repartition(buckets, col("band"), col("bucket"))
        .write.mode("append")
        .bucketBy(buckets, "band", "bucket").sortBy("band", "bucket")
        .format("parquet").saveAsTable(s"${tablePrefix}_bands")
    } finally rows.unpersist()
  }

  /** Compact a bucketed band store back to the one-file-per-bucket
    * sort-reporting layout after appends — the LSM cycle's third verb
    * (write once / append daily / compact periodically). Reads the
    * STORED tables and rewrites them: no document is re-shingled and no
    * signature recomputes — the cost is one read+write of the store,
    * amortized across every probe that stops paying the per-bucket
    * merge-sort appends cause. Staged via temp tables because Spark
    * cannot overwrite a table from a plan that reads it. */
  def compactBandStore(spark: org.apache.spark.sql.SparkSession,
      tablePrefix: String, buckets: Int = 32): Unit = {
    val stage = s"${tablePrefix}_compact_stage"
    def rewrite(suffix: String, keys: Seq[String]): Unit = {
      recoverLive(spark, s"$tablePrefix$suffix")
      graft.store.Bucketing.dropWithLocation(spark, s"$stage$suffix")
      // read the FILES, not the catalog table: a bucketed scan reports
      // hash partitioning on the keys, the optimizer then removes the
      // repartition as redundant, and the physical scan may still fall
      // back to a plain file grouping (auto bucketed scan) — leaving
      // tasks with mixed buckets and one output file per (task, bucket)
      // instead of per bucket. A path read keeps the repartition, so
      // the write aligns tasks with buckets: exactly one file each.
      val loc = spark.sql(s"DESCRIBE TABLE EXTENDED `$tablePrefix$suffix`")
        .filter(col("col_name") === "Location")
        .head.getString(1)
      spark.read.parquet(loc)
        .repartition(buckets, keys.map(col): _*)
        .write.bucketBy(buckets, keys.head, keys.tail: _*)
        .sortBy(keys.head, keys.tail: _*)
        .format("parquet").saveAsTable(s"$stage$suffix")
      swapInto(spark, s"$stage$suffix", s"$tablePrefix$suffix")
    }
    rewrite("_shingles", Seq("id"))
    rewrite("_bands", Seq("band", "bucket"))
  }

  /** Atomically-enough swap `stage` into `target` by catalog renames
    * (a managed-table rename moves the location too): target → _old,
    * stage → target, drop _old. A live table exists under `target` at
    * every instant except the sub-second gap between the two renames —
    * never a window where the only copy sits under the stage name (the
    * drop-then-rename order would strand the store there on a crash).
    * A leftover `_old` from a previous crash is reclaimed first. */
  private def swapInto(spark: org.apache.spark.sql.SparkSession,
      stage: String, target: String): Unit = {
    val old = s"${target}_old"
    graft.store.Bucketing.dropWithLocation(spark, old)
    if (spark.catalog.tableExists(target))
      spark.sql(s"ALTER TABLE `$target` RENAME TO `$old`")
    spark.sql(s"ALTER TABLE `$stage` RENAME TO `$target`")
    graft.store.Bucketing.dropWithLocation(spark, old)
  }

  /** Crash recovery for [[swapInto]]'s one unguarded instant: if a
    * previous run died between its two renames, the live copy sits
    * under `<target>_old` — restore it before any rewrite DESCRIBEs
    * the target. Called at the top of every staged rewrite. */
  private def recoverLive(spark: org.apache.spark.sql.SparkSession,
      target: String): Unit =
    if (!spark.catalog.tableExists(target) &&
        spark.catalog.tableExists(s"${target}_old"))
      spark.sql(s"ALTER TABLE `${target}_old` RENAME TO `$target`"): Unit

  /** Recovery-aware existence check for a band store — what every
    * bootstrap guard must use instead of bare `tableExists`: after a
    * [[swapInto]] crash the live name is absent while the store's data
    * sits under `_old`, and a bare check would re-bootstrap from the
    * current batch, silently discarding all cumulative near-dup state
    * (the [[graft.store.Bucketing.recoverCompacted]] discipline). */
  def recoverBandStore(spark: org.apache.spark.sql.SparkSession,
      tablePrefix: String): Boolean = {
    recoverLive(spark, s"${tablePrefix}_shingles")
    recoverLive(spark, s"${tablePrefix}_bands")
    spark.catalog.tableExists(s"${tablePrefix}_bands")
  }

  /** Delete documents from a bucketed band store — the takedown /
    * GDPR-erasure verb, and the recovery primitive for a torn append
    * ([[graft.streaming.DocumentIngest.nearDupMaintenance]] scrubs a
    * possibly-partially-appended batch with it before retrying). A
    * staged bucketed rewrite of both tables with the ids anti-joined
    * out, swapped in by [[swapInto]]'s always-live rename cycle; the
    * layout (bucketing, sort, one file per bucket) is preserved, so
    * probe plans are unchanged. Cost: one read + one write of the
    * store — batch deletes, not per-id calls. */
  def deleteFromBandStore(spark: org.apache.spark.sql.SparkSession,
      tablePrefix: String, ids: DataFrame, buckets: Int = 32): Unit = {
    val del = ids.select(col(ids.columns.head).as("id"))
    val stage = s"${tablePrefix}_delete_stage"
    def rewrite(suffix: String, keys: Seq[String]): Unit = {
      recoverLive(spark, s"$tablePrefix$suffix")
      graft.store.Bucketing.dropWithLocation(spark, s"$stage$suffix")
      val loc = spark.sql(s"DESCRIBE TABLE EXTENDED `$tablePrefix$suffix`")
        .filter(col("col_name") === "Location")
        .head.getString(1)
      spark.read.parquet(loc) // path read: see compactBandStore
        .join(del, Seq("id"), "left_anti")
        .repartition(buckets, keys.map(col): _*)
        .write.bucketBy(buckets, keys.head, keys.tail: _*)
        .sortBy(keys.head, keys.tail: _*)
        .format("parquet").saveAsTable(s"$stage$suffix")
      swapInto(spark, s"$stage$suffix", s"$tablePrefix$suffix")
    }
    rewrite("_shingles", Seq("id"))
    rewrite("_bands", Seq("band", "bucket"))
  }

  /** Near-dups of a NEW batch against a stored corpus + within itself,
    * without re-banding the corpus: the batch's bands (delta cost) join
    * the stored bands on (band, bucket) for cross candidates; batch-
    * internal candidates come from the batch bands alone; exact-Jaccard
    * verification reads stored shingles ONLY for the touched candidate
    * ids. Because signatures are content-local, the result is exactly
    * the full-recompute pairs restricted to pairs touching the batch
    * (spec-pinned in ExtSpec). Returns (id1, id2, jaccard), id1 < id2.
    *
    * 100-TB shape: the expensive side (stored bands/shingles) is
    * scanned once, moves only 8-byte keys, and nothing re-hashes old
    * documents; candidate volume is governed by the same rows-per-band
    * exponent as the batch pipeline. */
  def incrementalNearDups(spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, idCol: String, textCol: String, dir: String,
      shingleN: Int = 3, numHashes: Int = 96, bands: Int = 32,
      threshold: Double = 0.5): DataFrame = {
    val storedBands = spark.read.parquet(s"$dir/bands")
      .select(col("id"), col("band").cast("int").as("band"), col("bucket"))
    val storedShingles = spark.read.parquet(s"$dir/shingles")
    incrementalProbe(batch, idCol, textCol, storedBands, storedShingles,
      shingleN, numHashes, bands, threshold)
  }

  /** [[incrementalNearDups]] against a BUCKETED band store
    * ([[writeBandStoreBucketed]]): identical result, but both stored-
    * side joins satisfy their distribution from the bucketed file
    * layout — the candidate join reads `<prefix>_bands` pre-clustered
    * on (band, bucket) and the verification fetch reads
    * `<prefix>_shingles` pre-clustered on (id), so only the batch side
    * exchanges. This is the layout that keeps a daily probe's shuffle
    * cost proportional to the BATCH at 100 TB (the store is scanned,
    * never re-shuffled; ExtSpec plan-asserts it). */
  def incrementalNearDupsBucketed(spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, idCol: String, textCol: String, tablePrefix: String,
      shingleN: Int = 3, numHashes: Int = 96, bands: Int = 32,
      threshold: Double = 0.5): DataFrame =
    incrementalProbe(batch, idCol, textCol,
      spark.table(s"${tablePrefix}_bands"),
      spark.table(s"${tablePrefix}_shingles"),
      shingleN, numHashes, bands, threshold)

  private def incrementalProbe(batch: DataFrame, idCol: String, textCol: String,
      storedBands: DataFrame, storedShingles: DataFrame,
      shingleN: Int, numHashes: Int, bands: Int, threshold: Double): DataFrame = {
    val newRows = shingleRows(batch, idCol, textCol, shingleN).persist()
    try {
      val newBands = lshBuckets(minhashSignature(newRows, numHashes), numHashes, bands)
        .persist()
      try {
        val newIds = batch.select(col(idCol).as("id")).distinct()
        val (cand0, rows0) =
          incrementalCandidateRows(newBands, newRows, newIds, storedBands, storedShingles)
        // The verify stage references `pairs` and `rows` multiple times
        // inside one plan, so without a persist the candidate join AND
        // the store fetch re-execute per reference — measured as >2×
        // the whole probe's cost. Both frames are candidate-sized
        // (bounded by the rows-per-band exponent), so persisting them
        // is metadata-scale memory. Verification runs the sorted-array
        // kernel: rows are already touched-restricted here, so two
        // array joins beat the exploded intersection join (the
        // verifyJaccardArrays scaladoc's boundary).
        val cand = cand0.persist()
        val rows = rows0.persist()
        try {
          verifyJaccardArrays(cand, rows)
            .filter(col("jaccard") >= threshold)
            .select("id1", "id2", "jaccard")
            .localCheckpoint(true)
        } finally { cand.unpersist(); rows.unpersist(); () }
      } finally newBands.unpersist()
    } finally newRows.unpersist()
  }

  /** The incremental probe's two intermediate frames — (candidate
    * pairs, touched shingle rows) — exposed so the plan discipline is
    * testable: ExtSpec asserts that with a bucketed store NO shuffle
    * exchange sits above either stored scan. Shapes:
    *
    *   - candidates = (batch × store) band-bucket matches, with ids the
    *     batch re-appended EXCLUDED from the stored side (so cross
    *     pairs are genuinely (old, new)), plus batch-internal pairs.
    *   - rows = stored ∪ batch shingles RESTRICTED to candidate ids —
    *     each side semi-joined against the touched-id set BEFORE the
    *     union, because a union erases the stored scan's bucketed
    *     partitioning: filtering first means the store-sized frame
    *     never crosses an exchange, and everything downstream of here
    *     (the Jaccard joins) moves candidate-sized data only. */
  def incrementalCandidateRows(newBands: DataFrame, newRows: DataFrame,
      newIds: DataFrame, storedBands: DataFrame,
      storedShingles: DataFrame): (DataFrame, DataFrame) = {
    // batch ids may also be in the store (appended earlier): exclude
    // them so cross pairs are genuinely (old, new). The exclusion
    // anti-joins the CANDIDATE frame (candidate-sized), not the stored
    // bands (store-sized): an id-keyed anti-join on the stored side
    // would both cost a store shuffle and erase the (band, bucket)
    // bucketing the candidate join is about to use.
    val cross = newBands.select(col("band"), col("bucket"), col("id").as("nid"))
      .join(storedBands.select(col("band"), col("bucket"), col("id").as("oid")),
        Seq("band", "bucket"))
      .join(newIds.select(col("id").as("oid")), Seq("oid"), "left_anti")
      .select(least(col("nid"), col("oid")).as("id1"),
        greatest(col("nid"), col("oid")).as("id2"))
    // within-batch candidates, raw (candidatePairs' trailing distinct
    // would be a wasted exchange here: ONE distinct over the union
    // dedups across bands AND across the cross/within split)
    val a = newBands.select(col("band"), col("bucket"), col("id").as("id1"))
    val b = newBands.select(col("band"), col("bucket"), col("id").as("id2"))
    val within = a.join(b, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2")
    val cand = cross.unionByName(within).distinct()
    (cand, incrementalRowsFor(cand, newRows, newIds, storedShingles))
  }

  /** The touched-shingle side of [[incrementalCandidateRows]], over an
    * EXPLICIT candidate frame: verify against the union of stored +
    * batch shingles, but only rows whose id appears in a candidate
    * pair move. Each side is restricted BEFORE the union: a union
    * erases the stored scan's bucketed partitioning, so filtering
    * first keeps the store-sized frame on its own side of every
    * exchange — downstream (the Jaccard joins) only candidate-sized
    * data moves. Stored rows for re-appended batch ids are excluded at
    * the touched-id level (candidate-sized anti-join), never by
    * touching the store.
    *
    * Exposed separately so a caller that MATERIALIZES the candidates
    * (checkpoint — the gate posture, where persist can't be unwound)
    * can derive the rows from the materialized frame: built through
    * [[incrementalCandidateRows]]'s return values, the rows plan
    * embeds the candidate plan, and a checkpoint of each would run
    * candidate discovery twice (the r19 x2d finding — localCheckpoint,
    * unlike persist, is invisible to the plan cache). */
  def incrementalRowsFor(cand: DataFrame, newRows: DataFrame,
      newIds: DataFrame, storedShingles: DataFrame): DataFrame = {
    val touched = cand.select(col("id1").as("id"))
      .unionByName(cand.select(col("id2").as("id"))).distinct()
    val oldTouched = touched.join(newIds, Seq("id"), "left_anti")
    val oldRows = storedShingles
      .join(oldTouched, Seq("id"), "left_semi")
      .select(col("id"), col("shingle"))
    val batchRows = newRows.join(touched, Seq("id"), "left_semi")
    oldRows.unionByName(batchRows)
  }

  /** SimHash: 64-bit signature whose bit i is the sign of
    * Σ tokens tf·(±1 per hash bit i). Near-dups = small Hamming
    * distance.
    *
    * Computed as 64 conditional-sum aggregates in one hash groupBy
    * (single shuffle of 8-byte token hashes, map-side partials).
    * Measured note: an explode-free `aggregate`-fold variant (64-field
    * struct rebuilt per token) is 4× SLOWER — per-element struct
    * allocation beats the shuffle it avoids; the vectorized hash-agg
    * is the right engine for this shape. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Σ_tokens tf·(±1 per bit) == Σ_occurrences ±1 — no tf pre-pass
    // needed, so the whole signature is ONE hash aggregate over the
    // exploded token hashes (single shuffle, map-side partials).
    val occ = df.select(col(idCol).as("id"),
      explode(transform(split(trim(lower(col(textCol))), "\\s+"),
        t => xxhash64(t))).as("th"))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("th"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    val sums = occ.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map(i =>
        when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce(_ + _)
    sums.select(col("id"), sig.as("simhash"))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dups: block on the 4 16-bit quarters of the signature
    * (a pair within Hamming ≤ 3 must agree exactly on ≥1 quarter —
    * pigeonhole), then verify full Hamming ≤ maxHamming. */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame =
    signatureNearDups(simhash(df, idCol, textCol), "id", "simhash", maxHamming)

  /** Hamming near-dups over ANY 64-bit signature column — the
    * block-banding engine of [[simhashNearDups]], signature-agnostic:
    * text SimHash, an image perceptual hash ([[Multimodal.imageDHash]]),
    * any 64-bit sketch. Pigeonhole bound picks the block width by the
    * requested radius: 4 blocks of 16 bits are exhaustive for
    * maxHamming ≤ 3 (fewer exploded rows); 8 blocks of 8 bits extend
    * the bound to maxHamming ≤ 7 — the radius real dHash/pHash image
    * dedup runs at. Beyond 7 fail loudly rather than silently miss
    * pairs.
    *
    * EXACT-SIGNATURE PRE-COLLAPSE: the band join runs over DISTINCT
    * signatures only — a signature carried by N byte-identical images
    * costs the bucket join ONE row instead of fanning N copies into
    * every block bucket; equal-signature id pairs (hamming 0) are
    * emitted by a separate bounded equi-join, and cross-signature
    * pairs expand back to ids only after the distinct-signature
    * verify. Same 100-TB shape as every banded dedup: pairs meet only
    * inside a (block, value) bucket, never all-pairs. */
  def signatureNearDups(sig: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"8-bit-block banding is exhaustive only for maxHamming <= 7 (got $maxHamming)")
    // materialize the signatures ONCE: the self-join + banding + id
    // expansion reference this frame up to 4 ways, and signature
    // DERIVATION is usually the expensive part (an image dHash decode,
    // a text shingle pass) while the frame itself is 16 bytes/row —
    // without the checkpoint every reference re-runs the derivation
    // (measured 5x the image decode on the x12l gate)
    val s = sig.select(col(idCol).as("id"), col(sigCol).as("__sig"))
      .localCheckpoint(true)
    // equal-signature pairs: hamming 0 by construction, found by an
    // equi-join on the signature itself (no banding needed)
    val within = s.select(col("__sig"), col("id").as("id1"))
      .join(s.select(col("__sig"), col("id").as("id2")), "__sig")
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), lit(0).cast("int").as("hamming"))
    if (maxHamming == 0) return within // distinct sigs can't pair at radius 0
    val dsig = s.select("__sig").distinct()
    val (nBlocks, width) = if (maxHamming <= 3) (4, 16) else (8, 8)
    val mask = (1L << width) - 1
    val blocks = dsig.select(col("__sig"),
        explode(array((0 until nBlocks).map(qi =>
          struct(lit(qi).as("q"),
            shiftright(col("__sig"), qi * width).bitwiseAND(mask).as("qv"))): _*)).as("blk"))
      .select(col("__sig"), col("blk.q").as("q"), col("blk.qv").as("qv"))
    val a = blocks.select(col("q"), col("qv"), col("__sig").as("s1"))
    val b = blocks.select(col("q"), col("qv"), col("__sig").as("s2"))
    val sigPairs = a.join(b, Seq("q", "qv")).filter(col("s1") < col("s2"))
      .select(col("s1"), col("s2"),
        hamming(col("s1"), col("s2")).cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") > 0 && col("hamming") <= maxHamming)
    val cross = sigPairs
      .join(s.select(col("__sig").as("s1"), col("id").as("ida")), "s1")
      .join(s.select(col("__sig").as("s2"), col("id").as("idb")), "s2")
      .select(least(col("ida"), col("idb")).as("id1"),
        greatest(col("ida"), col("idb")).as("id2"), col("hamming"))
    cross.unionByName(within)
  }

  /** Connected components over duplicate pairs — the cluster-resolution
    * stage a real dedup pipeline needs between "pairs" and "keep one":
    * if A~B and B~C then {A,B,C} is one duplicate set even though A~C
    * was never emitted, so keeping `min(id)` per *pair* both
    * over-deletes and under-deletes. Returns `(id, component)` where
    * `component` is the smallest id reachable from `id`.
    *
    * Algorithm: min-label propagation with one pointer-jump per round
    * (label ← label's label), i.e. hash-to-min with path compression —
    * convergence is logarithmic in component diameter (the bound of the
    * large-star/small-star family, Kiveris et al. "Connected Components
    * in MapReduce and Beyond"), and duplicate clusters in practice have
    * tiny diameter, so 2–4 rounds settle it.
    *
    * Scale: per-round state is one `(id, component)` table hash-joined
    * against the edge list — every shuffle is bounded by |edges|, never
    * |V|². Each round is `localCheckpoint`ed to truncate lineage
    * (iterative DataFrame plans otherwise grow exponentially and
    * re-execute from the source), and convergence is an aggregate
    * (count of changed labels), not a collect. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    // edge layout keyed on dst ONCE — the per-round neighbor join's key
    // (the distinct's (src,dst) partitioning forced a full edge
    // re-shuffle every round; the Graph.hits r12 lesson); no pinned
    // partition count — AQE sizes the layout to the data
    val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .union(pairs.select(col("id2").as("src"), col("id1").as("dst")))
      .distinct()
      .repartition(col("dst"))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("component"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    var prevSum: Option[java.math.BigDecimal] = None
    while (!converged && iter < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("component")), "dst")
        .groupBy(col("src").as("id")).agg(min(col("component")).as("nbr_min"))
      val propagated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr_min"), col("component"))).as("component"))
        // materialized ONCE: the pointer jump below references this
        // frame on BOTH join sides with DIFFERENT keys (component vs
        // id), so the two exchanges cannot share a stage and the whole
        // edges⋈labels→groupBy subtree executed twice per round. Eager
        // checkpoint, no observe — two downstream references plus the
        // jump's own observe stay inside the 2-reference Catalyst
        // bound (the Graph.pageRankLoop footgun note).
        .localCheckpoint(true)
      // pointer jump: component ← that node's own current component.
      // Labels are always node ids (min includes self), so the self-join
      // key always resolves.
      // Convergence via the label-sum invariant: labels only ever
      // DECREASE (min-propagation), so Σ component is strictly monotone
      // and "sum unchanged ⇔ no label changed". The sum rides the
      // round's checkpoint job as an observe() metric (exact decimal,
      // order-independent — the Graph.pageRank dangling-mass pattern),
      // so a round is ONE job, not checkpoint + aggregate.
      val obs = org.apache.spark.sql.Observation()
      val next = propagated.as("p")
        .join(propagated.select(col("id").as("component"), col("component").as("cc")).as("j"),
          Seq("component"))
        .select(col("id"), col("cc").as("component"))
        .observe(obs, org.apache.spark.sql.functions
          .sum(col("component").cast("decimal(38,0)")).as("s"))
        .localCheckpoint(true)
      val sum = obs.get.get("s").orNull.asInstanceOf[java.math.BigDecimal]
      // next is eagerly materialized above — release the round's
      // intermediate (a long CC run would otherwise hold one dead
      // checkpoint per round in executor memory)
      propagated.unpersist(blocking = false)
      labels.unpersist(blocking = false)
      converged = prevSum.contains(sum)
      prevSum = Some(sum)
      labels = next
      iter += 1
    }
    // Round count IS the cost at fixture scale (two jobs per round —
    // propagate+checkpoint, jump+checkpoint; measured: x20 converges
    // in 4 rounds, x26b's chain-heavy threshold-0.3 graph in 16). True
    // pointer-DOUBLING was TRIED (r21): a second jump per round, each
    // stage behind its own eager checkpoint within the 2-reference
    // bound — Spark 4.1's stats estimator spun the driver for minutes
    // and then threw `ArithmeticException: BigInteger would overflow
    // supported range` inside SizeInBytesOnlyStatsPlanVisitor while
    // planning the round's checkpoint. Reverted; revisit only if a
    // real corpus shows diameters past ~25 (maxIter).
    labels
  }

  /** Duplicate-cluster summary: one row per component with member count
    * and the canonical (minimum) id to keep. */
  def clusterStats(components: DataFrame): DataFrame =
    components.groupBy(col("component").as("cluster_id"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("id")).as("keep_id"), max(col("id")).as("max_id"))

  /** Keep exactly one document per duplicate cluster (the minimum id),
    * plus every document that appears in no pair. One broadcast-size
    * join when the pair set is small relative to the corpus; a shuffle
    * join otherwise — Catalyst picks via AQE. */
  def dropDuplicateClusters(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val losers = connectedComponents(pairs)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** QUALITY-AWARE dedup decision — the keep-best refinement of
    * [[dropDuplicateClusters]] real pipelines run once a quality signal
    * exists (RefinedWeb/FineWeb keep the best-scoring member of each
    * near-dup cluster, not an arbitrary one): per duplicate cluster
    * keep the HIGHEST-`scoreCol` document (ties: smallest id — fully
    * deterministic), docs in no pair survive untouched. Implementation
    * is windows-free for cluster-size safety (a boilerplate cluster at
    * 100 TB can be corpus-sized, so `row_number() over (partition by
    * component)` is banned here): two hash aggregations — max score
    * per component, then min id among the max-score members — and one
    * anti-join of the losers. Returns `df`'s rows minus the losers. */
  def keepBestPerCluster(df: DataFrame, idCol: String, scoreCol: String,
      pairs: DataFrame): DataFrame = {
    val comp = connectedComponents(pairs)
    val scored = df.select(col(idCol).as("id"), col(scoreCol).as("_s"))
      .join(comp, Seq("id"))
    val best = scored.groupBy(col("component")).agg(max(col("_s")).as("_ms"))
    val keep = scored.join(best, Seq("component"))
      .filter(col("_s") === col("_ms"))
      .groupBy(col("component")).agg(min(col("id")).as("_keep"))
    val losers = scored.join(keep, Seq("component"))
      .filter(col("id") =!= col("_keep"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** SPLIT-LEAKAGE audit + repair — the pre-training gate that keeps
    * duplicate content from straddling train/val/test: evaluating on a
    * near-copy of a training document inflates every metric silently.
    * Given a duplicate-cluster key (`keyCol` — a normalized-text hash,
    * a MinHash cluster id, a [[connectedComponents]] component) and a
    * split assignment per doc, returns `df` with the per-cluster facts
    * joined on: `keep_id` (min id — the cluster leader), `cluster_size`,
    * `n_splits` (distinct splits BEFORE repair — >1 = leaked),
    * `repaired_split` (the LEADER's split: every member moves to it,
    * deterministic under any partitioning), and `moved` (this row's
    * split changed). A NULL `keyCol` means "no cluster evidence" — the
    * row passes through as its own singleton (keep_id = own id,
    * cluster_size = 1, n_splits = 1, repaired_split = own split,
    * moved = false) instead of being silently dropped by the equi-join
    * or lumped into one giant null-key "cluster" by a null-safe join.
    * `moved` is null-safe, so a NULL split compares as a value (a
    * leader with a NULL split moving a labeled member still reads
    * moved = true), never as a NULL verdict. Scale shape: one hash
    * aggregation on the dedup key + one key equi-join — the exact
    * shapes the dedup stage itself runs; no windows (a boilerplate
    * cluster can be corpus-sized). */
  def repairSplitLeakage(df: DataFrame, idCol: String, keyCol: String,
      splitCol: String): DataFrame = {
    val facts = df.filter(col(keyCol).isNotNull).groupBy(col(keyCol)).agg(
      min(col(idCol)).as("keep_id"),
      count(lit(1)).as("cluster_size"),
      countDistinct(col(splitCol)).as("n_splits"),
      min_by(col(splitCol), col(idCol)).as("repaired_split"))
    df.join(facts, Seq(keyCol), "left")
      .withColumn("keep_id", coalesce(col("keep_id"), col(idCol)))
      .withColumn("cluster_size", coalesce(col("cluster_size"), lit(1L)))
      .withColumn("n_splits", coalesce(col("n_splits"), lit(1L)))
      .withColumn("repaired_split",
        when(col(keyCol).isNull, col(splitCol)).otherwise(col("repaired_split")))
      .withColumn("moved", !(col(splitCol) <=> col("repaired_split")))
  }

  /** Cross-set n-gram decontamination (benchmark-leakage scan): flag
    * corpus docs sharing ≥ `minShared` distinct word n-grams with any
    * doc of a probe/eval set. The canonical pre-training hygiene step:
    * the probe side (benchmark suites) is tiny, so its gram table
    * broadcasts; corpus grams are hashed to longs at the explode so the
    * join moves 8-byte keys. Returns (id, n_shared_grams, n_probes). */
  def ngramContamination(corpus: DataFrame, probes: DataFrame, idCol: String,
      textCol: String, n: Int, minShared: Int = 1): DataFrame = {
    val cg = shingleRows(corpus, idCol, textCol, n)
    val pg = shingleRows(probes, idCol, textCol, n)
      .select(col("id").as("probe_id"), col("shingle")).distinct()
    cg.join(broadcast(pg), "shingle")
      .groupBy("id")
      .agg(countDistinct(col("shingle")).as("n_shared_grams"),
        countDistinct(col("probe_id")).as("n_probes"))
      .filter(col("n_shared_grams") >= minShared)
  }

  /** [[ngramContamination]] with a Bloom prefilter — the 100-TB shape.
    *
    * The exact path broadcasts the full probe gram table to every task;
    * fine for one benchmark suite, but a decontamination run against a
    * large eval battery (millions of grams × 8 bytes × replicated per
    * executor) makes the broadcast itself the bottleneck. Here the probe
    * grams aggregate into ONE serialized Bloom filter (`numBits` bits
    * total, e.g. 2^23 ≈ 1 MB for ~1M grams at 1% fp), the corpus gram
    * stream drops definite-misses against the broadcast filter — in the
    * SCAN stage, before any shuffle — and only the surviving sliver
    * (true hits + the fp rate) pays the exact join that removes false
    * positives. That cleanup join carries NO broadcast hint: at the
    * million-gram scale this path exists for, forcing the full probe
    * gram table over the wire would resurrect the bottleneck the Bloom
    * removed — Catalyst/AQE broadcasts it only when it is actually
    * small. No false negatives by Bloom contract, so the result is
    * row-for-row IDENTICAL to [[ngramContamination]] (spec-pinned, and
    * the x35 gate shares x21's oracle).
    */
  /** Build the probe-side Bloom filter once — a persistable artifact
    * (numBits/8 bytes of model metadata, same discipline as IVF
    * centroids): one decontamination campaign builds it, every corpus
    * scan reuses it. The binary is collected to the driver because
    * `might_contain` requires a CONSTANT filter; as a literal it
    * reaches every scan task without a join. */
  def probeGramBloom(probes: DataFrame, idCol: String, textCol: String,
      n: Int, expectedItems: Long = 1000000L,
      numBits: Long = 1L << 23): Array[Byte] =
    shingleRows(probes, idCol, textCol, n)
      .select(col("shingle")).distinct()
      .agg(graft.functions.BloomFunctions
        .bloomFilterAgg(col("shingle"), expectedItems, numBits).as("__bf")) match {
      case agg =>
        val bf = agg.head().getAs[Array[Byte]]("__bf")
        // an empty probe set aggregates to null; might_contain(null, …)
        // is null and would silently drop every corpus row downstream —
        // reached-by-accident "no contamination" at a query edge, but a
        // silent everything-or-nothing coin flip at the streaming gate.
        // Zero probes means the gate is a no-op: say so loudly instead.
        require(bf != null,
          "probeGramBloom: the probe set produced no shingles — " +
          "decontamination against zero probes is a no-op; skip the gate")
        bf
    }

  def ngramContaminationBloom(corpus: DataFrame, probes: DataFrame,
      idCol: String, textCol: String, n: Int, minShared: Int = 1,
      expectedItems: Long = 1000000L, numBits: Long = 1L << 23,
      bloom: Option[Array[Byte]] = None): DataFrame = {
    val cg = shingleRows(corpus, idCol, textCol, n)
    val pg = shingleRows(probes, idCol, textCol, n)
      .select(col("id").as("probe_id"), col("shingle")).distinct()
    val bloomBytes = bloom.getOrElse(
      probeGramBloom(probes, idCol, textCol, n, expectedItems, numBits))
    val prefiltered = cg.filter(graft.functions.BloomFunctions
      .mightContain(lit(bloomBytes), col("shingle")))
    // no broadcast hint: at million-gram probe scale the full pg table
    // over the wire is the bottleneck this path removes — let AQE
    // broadcast only when pg is actually small
    prefiltered.join(pg, "shingle")
      .groupBy("id")
      .agg(countDistinct(col("shingle")).as("n_shared_grams"),
        countDistinct(col("probe_id")).as("n_probes"))
      .filter(col("n_shared_grams") >= minShared)
  }

  /** Exact n-token window duplication across documents — the relational
    * approximation of suffix-array substring dedup (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better"): doc
    * pairs sharing ≥ `minShared` exact n-token windows.
    *
    * Scale valve: windows occurring in more than `maxDf` docs are
    * dropped BEFORE pair generation — a boilerplate gram shared by B
    * docs otherwise yields B² pair rows. Pairs are generated inside the
    * per-gram doc list (bounded by `maxDf`), so the join never sees an
    * unbounded bucket. */
  def windowDupPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, maxDf: Int = 50, minShared: Int = 1): DataFrame = {
    val rows = shingleRows(df, idCol, textCol, n)
    val byGram = rows.groupBy("shingle")
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxDf)
    // all (i < j) pairs within the bounded per-gram id list
    val pairsPerGram = byGram.select(explode(flatten(
      transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))),
          y => struct(x.as("id1"), y.as("id2")))))).as("p"))
    pairsPerGram.groupBy(col("p.id1").as("id1"), col("p.id2").as("id2"))
      .agg(count(lit(1)).as("n_windows"))
      .filter(col("n_windows") >= minShared)
  }

  /** Corpus snapshot diff — incremental-curation bookkeeping: classify
    * every key as added / removed / changed / unchanged between two
    * corpus snapshots, comparing md5 content hashes of `contentCols`
    * (the x1b normalization discipline applies upstream if wanted).
    * One full outer join keyed on `idCol`; both inputs reduce to
    * (key, hash) projections first, so the shuffle carries 2 hashes per
    * key, never the payloads. The scale shape of "what changed since
    * the last curation run" — feed `added ∪ changed` to the cleaning
    * pipeline instead of recleaning 100 TB. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
      contentCols: Seq[String]): DataFrame = {
    def hashed(df: DataFrame, h: String) = df.select(col(idCol),
      md5(concat_ws("\u0001", contentCols.map(c => col(c).cast("string")): _*)).as(h))
    hashed(oldSnap, "__h_old").join(hashed(newSnap, "__h_new"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__h_old").isNull, "added")
          .when(col("__h_new").isNull, "removed")
          .when(col("__h_old") =!= col("__h_new"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Exact word-set Jaccard for all pairs within a blocking column —
    * the SQL-portable dedup variant (oracle-checked).
    *
    * Pair join on the block key only, with token SETS carried as array
    * columns and intersected per pair via `array_intersect` — O(pairs ×
    * set size) with hash sets, versus the token-level self-join
    * formulation whose joined row count is Σ_tok (docs containing
    * tok)², quadratic in token frequency (a common token in a B-doc
    * block alone yields B² rows). Blocks bound the pair count either
    * way; this keeps the constant small. */
  def wordJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    val toks = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
      // hash tokens to longs (8-byte shuffles, long compares) and sort
      // ONCE per doc so every pair intersects by linear merge
      sort_array(array_distinct(transform(
        split(trim(lower(col(textCol))), "\\s+"), t => xxhash64(t)))).as("toks"))
    val a = toks.select(col("blk"), col("id").as("id1"), col("toks").as("t1"))
    val b = toks.select(col("blk"), col("id").as("id2"), col("toks").as("t2"))
    a.join(b, Seq("blk")).filter(col("id1") < col("id2"))
      .withColumn("n_inter",
        graft.functions.VectorExpressions.sortedIntersectCount(col("t1"), col("t2")))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (size(col("t1")) + size(col("t2")) - col("n_inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("blk"), col("id1"), col("id2"), col("jaccard"))
  }

  /** Line-level exact dedup ACROSS documents (the RefinedWeb/FineWeb
    * "remove duplicated lines" pass, the sub-document complement of
    * whole-doc dedup): a line occurring in ≥ `minDocs` distinct
    * documents is removed from every document containing it, and each
    * document is reassembled from its surviving lines in order. Lines
    * follow the repo's portable convention (x24): consecutive
    * `lineTokens`-token chunks of the whitespace token stream.
    *
    * Returns (idCol, n_lines, n_removed, clean_text) for EVERY input
    * document — a doc whose lines are all duplicated survives with
    * empty text (drop on `n_removed === n_lines` downstream if whole
    * removal is wanted).
    *
    * Scale shape: one explode → one hash aggregation → one join of the
    * duplicate set back to the exploded frame → one by-doc aggregation
    * for reassembly. Nothing is all-pairs and no window is involved.
    * Both the dup aggregation's exchange and the dup join KEY on
    * `xxhash64(line)` — an 8-byte key instead of the line string (the
    * x21 "grams hashed to longs pre-shuffle" precedent: hashing, sort
    * and comparison on the exchange work on fixed-width longs) — while
    * exactness is preserved structurally: the aggregation still GROUPS
    * by (hash, line) (the hash-only repartition co-locates every equal
    * line, so no second exchange is planned and colliding lines count
    * separately), and the join re-checks string equality, so a hash
    * collision can never merge or mis-flag distinct lines. */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
      minDocs: Int = 2, lineTokens: Int = 8): DataFrame = {
    val w = split(trim(col(textCol)), "\\s+")
    val lines = df
      .select(col(idCol), w.as("__w"),
        ceil(size(w) / lit(lineTokens.toDouble)).cast("int").as("__nl"))
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), col("__nl") - 1),
        i => concat_ws(" ", slice(col("__w"), i * lineTokens + 1, lit(lineTokens))))))
      .withColumnRenamed("pos", "__i").withColumnRenamed("col", "__line")
      .withColumn("__lh", xxhash64(col("__line")))
    val dup = lines.repartition(col("__lh"))
      .groupBy(col("__lh"), col("__line"))
      .agg(countDistinct(col(idCol)).as("__dc"))
      .filter(col("__dc") >= minDocs)
      .select(col("__lh"), col("__line").as("__dline"), lit(true).as("__dup"))
    lines.join(dup,
        lines("__lh") === dup("__lh") && col("__line") === col("__dline"), "left")
      .withColumn("__keep", coalesce(col("__dup"), lit(false)) === false)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("__keep"), 0L).otherwise(1L)).as("n_removed"),
        array_join(transform(
          array_sort(collect_list(when(col("__keep"),
            struct(col("__i"), col("__line"))))),
          s => s.getField("__line")), " ").as("clean_text"))
  }

  /** Exact substring-span dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better" — the ExactSubstr
    * pass, re-shaped from their suffix array to Spark aggregations):
    * every duplicated window of `windowTokens` consecutive tokens
    * keeps its corpus-wide FIRST occurrence (min (id, start)) and is
    * removed everywhere else; a token is dropped when any removed
    * window covers it. Unlike [[lineDedup]]'s block-aligned
    * all-occurrence removal, windows SLIDE — a shared span is caught
    * at any token offset (the property the suffix array buys) — and
    * exactly ONE copy of every duplicated span survives, so repeated
    * boilerplate keeps one canonical occurrence instead of vanishing
    * from the corpus entirely. Output: (idCol, n_tokens, n_removed,
    * clean_text) — every input doc, untouched docs included.
    *
    * Scale shape — TWO-PHASE, so the corpus-wide exchange never
    * carries window strings: windows explode to ONE row per token
    * (not per pair), and phase 1 aggregates duplicate DISCOVERY on the
    * 8-byte `xxhash64(window)` alone — (id, start, hash) rows, ~16
    * bytes/token over the wire, where shuffling the L-token strings
    * would be ~`windowTokens`× the corpus bytes. Phase 2 re-derives
    * window strings ONLY at candidate positions (hash seen ≥ 2): the
    * candidate (id, start) set folds per doc and joins back to the
    * token arrays, and the exact aggregation — still grouped by
    * (hash, window) with keeper = in-aggregation `min(struct)` — plus
    * the equality-rechecked mark join run over candidates only.
    * Exactness is structural, not probabilistic: a hash collision can
    * only ADD a unique window to the candidate set, where the
    * string-grouped recount (`__c >= 2`) discards it; it can never
    * merge distinct spans or drop a true duplicate (every row of a
    * true duplicate group carries a ≥2-count hash, so all of them
    * reach phase 2). Covered-position explode is bounded by duplicated
    * windows × `windowTokens`; reassembly is one by-doc aggregation.
    * No all-pairs anywhere. The candidate window frame is DERIVED
    * TWICE (once under the exact aggregation, once for the mark join)
    * on purpose: persisting it would materialize the candidate window
    * strings, while re-slicing is two cheap scans of candidate docs. */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 50): DataFrame = {
    require(windowTokens >= 1, "windowTokens must be positive")
    val L = windowTokens
    val base = df
      .select(col(idCol), TextOps.tokens(coalesce(col(textCol), lit(""))).as("__t"))
      .withColumn("__n", size(col("__t")))
    // phase 1: hash-only rows; the ONLY full-corpus exchanges in the
    // pipeline move (id, start, hash), never window strings
    val winsH = base.filter(col("__n") >= L)
      .select(col(idCol), explode(sequence(lit(0), col("__n") - L)).as("__s"),
        col("__t"))
      .select(col(idCol), col("__s"),
        xxhash64(concat_ws(" ", slice(col("__t"), col("__s") + 1, lit(L))))
          .as("__wh"))
    val dupH = winsH.groupBy(col("__wh"))
      .agg(count(lit(1)).as("__hc")).filter(col("__hc") >= 2)
      .select(col("__wh"))
    val candPos = winsH.join(dupH, Seq("__wh"), "left_semi")
    // phase 2: candidate docs re-slice their candidate windows WITH
    // strings (per-doc position fold, then one keyed join onto the
    // token arrays — candidate-doc-sized, and AQE broadcasts the fold
    // when it is small)
    val candByDoc = candPos.groupBy(col(idCol))
      .agg(collect_list(col("__s")).as("__ss"))
    def candWins = base.join(candByDoc, Seq(idCol))
      .select(col(idCol), col("__t"), explode(col("__ss")).as("__s"))
      .select(col(idCol), col("__s"),
        concat_ws(" ", slice(col("__t"), col("__s") + 1, lit(L))).as("__w"))
      .withColumn("__wh", xxhash64(col("__w")))
    val dup = candWins.repartition(col("__wh"))
      .groupBy(col("__wh"), col("__w"))
      .agg(count(lit(1)).as("__c"),
        min(struct(col(idCol), col("__s"))).as("__keep"))
      .filter(col("__c") >= 2)
      .select(col("__wh"), col("__w").as("__dw"), col("__keep"))
    val cw = candWins
    // no distinct() before the per-doc fold: collect_set IS the dedup.
    // (Catalyst's RemoveRedundantAggregates already dropped the
    // explicit distinct below the duplicate-agnostic collect_set —
    // plan-verified identical, plans/r21/x58 — so this is source-level
    // honesty, not a plan change: the (id, pos) set shuffles once.)
    val marks = cw.join(dup,
        cw("__wh") === dup("__wh") && col("__w") === col("__dw"))
      .filter(!(col(idCol) === col("__keep").getField(idCol) &&
        col("__s") === col("__keep").getField("__s")))
      .select(col(idCol), explode(sequence(col("__s"), col("__s") + L - 1)).as("__p"))
    val mp = marks.groupBy(idCol).agg(collect_set(col("__p")).as("__mp"))
    val mpc = coalesce(col("__mp"), array().cast("array<int>"))
    val kept = when(col("__n") === 0, array().cast("array<int>"))
      .otherwise(array_except(sequence(lit(0), col("__n") - 1), mpc))
    base.join(mp, Seq(idCol), "left")
      .select(col(idCol),
        col("__n").cast("long").as("n_tokens"),
        size(mpc).cast("long").as("n_removed"),
        concat_ws(" ",
          transform(kept, p => element_at(col("__t"), p + 1))).as("clean_text"))
  }
}
