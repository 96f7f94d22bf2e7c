package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Accumulated CDX capture index as a BUCKETED, urlkey-SORTED catalog
  * store — the serving-side complement of the per-batch cdx sidecars
  * [[graft.streaming.DocumentIngest.sidecarMaintenance]] derives: the
  * per-batch layout is write-cheap but a site-scoped query over it
  * must LIST and touch every `batch_id=N` directory, a cost that grows
  * with batch count even though zone maps prune within each file. This
  * store folds the accumulating batches into one bucketed table
  * (hash-bucketed on (urlkey, row-signature) — the append anti-join's exact keys, so the bucketed scan is reused and appends never re-shuffle the store — and SORTED on `urlkey`), so
  *
  *  - a SITE query ([[capturesForSite]]) is a contiguous-range
  *    predicate over the SURT keyspace ([[UrlOps.surtKey]]: one site =
  *    one key range) that reaches the parquet scan as a pushed filter
  *    and prunes to the site's own row groups via min/max zone maps —
  *    listing cost is one table, not one directory per batch;
  *  - the APPEND anti-join — the per-micro-batch hot loop — runs with
  *    NO store-side Exchange: its (urlkey, row-signature) keys are
  *    exactly the bucket columns, so the bucketed scan is reused and
  *    only the batch shuffles (plan-asserted);
  *  - appends are REPLAY-SAFE: a re-delivered micro-batch anti-joins
  *    against the store on full row identity via the stored signature
  *    and appends nothing.
  *
  * Maintenance follows the seen-store protocol exactly: per-batch
  * appends accumulate one file per bucket per batch; [[compact]] folds
  * them back to one sorted file per bucket through the crash-safe
  * rename-aside swap ([[graft.store.Bucketing.compactSwap]]), and every
  * existence-guarded path runs [[graft.store.Bucketing
  * .recoverCompacted]] first.
  *
  * 100-TB shape: append cost ∝ batch (the store side of the anti-join
  * scans Exchange-free in bucket layout); compaction is one
  * bucket-preserving rewrite on a maintenance cadence; a site read
  * costs the site's row groups, never the index.
  *
  * Reference: rearview keeps no capture archive (persistence is
  * Rails-side, `app/models/job.rb`); this is corpus-pipeline extension
  * surface, the CommonCrawl CDX-index serving shape expressed
  * Spark-native. */
object CdxStore {

  /** Every stored row carries its full-content signature as a REAL
    * column: the replay-dedup anti-join must run on BARE attributes —
    * a null-safe comparison per column compiles the join keys into
    * `coalesce/isnull` EXPRESSIONS, which can never match the bucket
    * layout's `HashPartitioning(urlkey)`, so every append re-shuffled
    * the whole accumulated index (CdxStoreSpec's one-Exchange plan
    * assert is the regression gate). sha1-over-to_json is
    * collision-safe per schema (distinct rows → distinct JSON; null
    * fields are omitted, which is unambiguous within one schema) and
    * null-proof (a null field cannot null the signature). */
  val SigCol = "row_sig"
  private[graft] def withSig(df: DataFrame): DataFrame =
    df.withColumn(SigCol, sha1(to_json(struct(
      df.columns.sorted.map(col).toIndexedSeq: _*))))

  /** Rows of `captures` (any schema that includes a string `urlkey`
    * column) folded into the store at batch cost. Rows with a NULL
    * urlkey (unparseable URLs) are dropped — they cannot live in a
    * urlkey-keyed range store; count them upstream if they matter.
    * Creates the store when absent; idempotent under replay (anti-join
    * on (urlkey, [[SigCol]]) — full-row identity via the stored
    * signature, bare-attribute keys so the store side keeps its bucket
    * layout and only the batch shuffles). The stored schema gains the
    * [[SigCol]] column; readers that care select their own columns. */
  def append(captures: DataFrame, table: String, buckets: Int = 32): Unit = {
    val spark = captures.sparkSession
    val rows = withSig(captures.filter(col("urlkey").isNotNull))
    if (!graft.store.Bucketing.recoverCompacted(spark, table)) {
      graft.store.Bucketing.dropWithLocation(spark, table)
      rows.repartition(buckets, col("urlkey"), col(SigCol))
        .write.mode("overwrite")
        .bucketBy(buckets, "urlkey", SigCol).sortBy("urlkey")
        .format("parquet").saveAsTable(table)
    } else {
      val delta = freshAgainstStore(rows, table).persist()
      try {
        // steady-state fast path: a replayed batch appends nothing
        if (!delta.isEmpty)
          delta.repartition(buckets, col("urlkey"), col(SigCol))
            .write.mode("append")
            .bucketBy(buckets, "urlkey", SigCol).sortBy("urlkey")
            .format("parquet").saveAsTable(table)
      } finally {
        delta.unpersist()
        ()
      }
    }
  }

  /** Fold the per-batch append files back to ONE sorted file per
    * bucket (zone maps are only as tight as the files they describe —
    * a site's key range fragments across every batch's file until
    * compacted). Crash-safe swap; run on a maintenance cadence. */
  def compact(spark: SparkSession, table: String, buckets: Int = 32): Unit =
    graft.store.Bucketing.compactSwap(spark, table) { tmp =>
      spark.table(table).distinct()
        .repartition(buckets, col("urlkey"), col(SigCol))
        .write.mode("overwrite")
        .bucketBy(buckets, "urlkey", SigCol).sortBy("urlkey")
        .format("parquet").saveAsTable(tmp)
    }

  /** The exclusive upper bound of a SURT prefix's key range: the
    * prefix with its final char incremented — every key that STARTS
    * WITH the prefix (and nothing else) falls in [prefix, end). */
  private[graft] def siteRangeEnd(prefix: String): String = {
    require(prefix.nonEmpty, "empty site prefix")
    prefix.init + (prefix.last + 1).toChar
  }

  /** Every stored capture of one site, as a RANGE predicate over the
    * SURT keyspace — `urlkey >= 'com,example)' AND urlkey <
    * 'com,example*'` — that reaches the parquet scan pushed
    * (CdxStoreSpec plan-asserts it) and zone-map-prunes to the site's
    * own row groups. `sitePrefix` is the [[UrlOps.surtKey]] form of
    * the site, e.g. `com,example)` for every path under example.com,
    * or a deeper prefix (`com,example)/docs/`) for a subtree. */
  def capturesForSite(spark: SparkSession, table: String,
      sitePrefix: String): DataFrame = {
    require(graft.store.Bucketing.recoverCompacted(spark, table),
      s"no such cdx store: $table")
    spark.table(table)
      .filter(col("urlkey") >= lit(sitePrefix) &&
        col("urlkey") < lit(siteRangeEnd(sitePrefix)))
  }

  /** SITE-scoped latest-capture SERVING straight from the store — the
    * weekly-recrawl serving shape, end to end: range-prune the site's
    * captures ([[capturesForSite]]), decide winners on that metadata,
    * resolve revisit winners through Refers-To with the digest gate
    * ([[Warc.readLatestCapturesDeduped]]), fetch exactly the winners'
    * byte ranges. Works on a PLAIN index store too (no linkage
    * columns → the plain fused path).
    *
    * Cross-site mirrors: a revisit inside the site can Refer-To a
    * capture OUTSIDE the site's key range. The referred keys are
    * derived from the slice (site-bounded), and their store rows fetch
    * through a PUSHED IN-predicate when the distinct key count fits
    * `maxRefKeys` (zone maps prune to the referred row groups — cost
    * stays ∝ site); past the cap it falls back to an urlkey equi-join
    * over the index — one index-metadata shuffle, never archive
    * bytes. */
  def serveLatestCaptures(spark: SparkSession, table: String,
      sitePrefix: String, normalize: Boolean = true,
      maxRefKeys: Int = 10000): DataFrame =
    serveLatestCaptures(spark, table, sitePrefix, None, normalize, maxRefKeys)

  /** [[serveLatestCaptures]] AS OF a date — the wayback query shape:
    * only captures with `warc_date <= asOf` (ISO-8601 compares
    * chronologically as a string) compete for winner-ship, so the
    * site serves exactly as it stood at that instant. The as-of
    * filter applies to the DECISION slice only: a revisit's original
    * always predates it (the dedup winner is the EARLIEST capture),
    * so every resolvable original is inside the cut by construction,
    * and the out-of-range originals lookup stays unfiltered (those
    * rows are named explicitly by Refers-To). */
  def serveLatestCaptures(spark: SparkSession, table: String,
      sitePrefix: String, asOf: Option[String], normalize: Boolean,
      maxRefKeys: Int): DataFrame = {
    val slice0 = capturesForSite(spark, table, sitePrefix)
    val slice = asOf.fold(slice0)(t => slice0.filter(col("warc_date") <= lit(t)))
    val linkage = Seq("payload_digest", "refers_to_uri", "warc_type")
    if (!linkage.forall(slice.columns.contains(_)))
      return Warc.readLatestCaptures(slice, normalize)
    val end = siteRangeEnd(sitePrefix)
    // referred keys OUTSIDE the site's own range (in-range originals
    // are already in the slice), site-bounded by construction
    val refKeys = slice.filter(col("warc_type") === "revisit")
      .select(UrlOps.surtKey(col("refers_to_uri")).as("__rk"))
      .filter(col("__rk").isNotNull &&
        (col("__rk") < lit(sitePrefix) || col("__rk") >= lit(end)))
      .distinct()
    val keys = refKeys.limit(maxRefKeys + 1).collect().map(_.getString(0))
    val extra =
      if (keys.isEmpty) slice.limit(0)
      else if (keys.length <= maxRefKeys)
        spark.table(table).filter(col("urlkey").isin(keys.toSeq: _*))
      else // too many refs for a pushed IN list: bucket-layout join
        spark.table(table).join(refKeys.withColumnRenamed("__rk", "urlkey"),
          Seq("urlkey"), "left_semi")
    Warc.readLatestCapturesDeduped(slice, slice.unionByName(extra), normalize)
  }

  /** ZIPNUM-style serving export + "cluster.idx" SECONDARY INDEX (the
    * index-of-the-index CommonCrawl publishes): the store re-laid out
    * RANGE-SORTED on `urlkey` — `blocks` files, each covering a
    * CONTIGUOUS slice of the SURT keyspace — plus one tiny parquet
    * table with a row per block (file, key min/max, rows).
    *
    * Why a second layout: the live store is HASH-bucketed on urlkey
    * (that is what makes appends Exchange-free), so every bucket file
    * spans the whole keyspace and a site query must touch every
    * bucket's zone maps — cheap, but the LISTING term is O(files) and
    * at petabyte CDX scale (10⁵–10⁶ block files) even listing + footer
    * reads dominate a one-site lookup. The range layout makes a site a
    * contiguous run of blocks, and the secondary index — kilobytes —
    * names exactly those blocks, so a lookup touches cluster.idx + its
    * own blocks and NOTHING else ([[capturesForSiteIndexed]];
    * CdxStoreSpec asserts the touched-file set). Rebuild on the
    * compaction cadence: one range shuffle + one small aggregation,
    * cost ∝ store — the read-optimized twin of the write-optimized
    * bucket store, exactly CommonCrawl's cdx-…gz + cluster.idx pair. */
  def exportRangeLayout(spark: SparkSession, table: String, dir: String,
      blocks: Int = 64): Unit = {
    require(graft.store.Bucketing.recoverCompacted(spark, table),
      s"no such cdx store: $table")
    require(blocks > 0, s"blocks must be positive, got $blocks")
    // VERSIONED publish: an in-place overwrite would delete blocks a
    // reader is mid-scan over (and a crash mid-rebuild would leave
    // blocks/ and cluster.idx disagreeing). Each rebuild writes a
    // complete v=N, then atomically swaps the `_current` pointer;
    // versions older than the PREVIOUS are swept, so a reader that
    // resolved the root just before the swap keeps a consistent layout
    // for the duration of one whole rebuild cycle.
    val conf = spark.sparkContext.hadoopConfiguration
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(conf)
    // what readers CURRENTLY resolve — read BEFORE publishing: the
    // sweep must key on the pointer, not on version numbers (a crashed
    // rebuild leaves an unpublished partial with the HIGHEST number;
    // sweeping "all but the last two numbers" would then delete the
    // version readers actually resolve while retaining the useless
    // partial)
    val prevPublished = publishedVersion(fs, base)
    val existing = listVersions(fs, base)
    val next = existing.foldLeft(-1L)(_ max _) + 1
    val root = s"$dir/v=$next"
    spark.table(table)
      .repartitionByRange(blocks, col("urlkey"))
      .sortWithinPartitions("urlkey")
      .write.mode("overwrite").parquet(s"$root/blocks")
    spark.read.parquet(s"$root/blocks")
      .groupBy(input_file_name().as("file"))
      .agg(min("urlkey").as("k_min"), max("urlkey").as("k_max"),
        count(lit(1)).as("n_rows"))
      .repartition(1) // block-count-sized: the whole point is it's tiny
      .write.mode("overwrite").parquet(s"$root/cluster.idx")
    publishAndSweep(spark, fs, base, next, prevPublished, existing)
  }

  /** Versions present on disk (published or not). */
  private def listVersions(fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path): Seq[Long] =
    if (!fs.exists(base)) Seq.empty[Long]
    else fs.listStatus(base).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .flatMap(n => scala.util.Try(n.stripPrefix("v=").toLong).toOption)

  /** The version `_current` points at, if any. */
  private def publishedVersion(fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path): Option[Long] = {
    val cur = new org.apache.hadoop.fs.Path(base, "_current")
    if (!fs.exists(cur)) None
    else {
      val in = fs.open(cur)
      val v = try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](256)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        new String(bos.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8).trim
      } finally in.close()
      scala.util.Try(v.stripPrefix("v=").toLong).toOption
    }
  }

  /** Versions whose block FILES a version's cluster.idx references —
    * an incremental refresh ([[refreshRangeLayout]]) reuses untouched
    * block files in place, so a live index may point into OLDER version
    * directories; those must survive the sweep. */
  private def referencedVersions(spark: SparkSession, dir: String,
      v: Long): Set[Long] = {
    val idx = s"$dir/v=$v/cluster.idx"
    val re = java.util.regex.Pattern.compile("/v=(\\d+)/blocks/")
    spark.read.parquet(idx).select("file").collect().iterator
      .map(_.getString(0))
      .flatMap { f =>
        val m = re.matcher(f)
        if (m.find()) Some(m.group(1).toLong) else None
      }.toSet
  }

  /** Atomically swap `_current` to `v=next`, then sweep: every version
    * except the new one, the PREVIOUSLY PUBLISHED one (a reader that
    * resolved the pointer just before the swap keeps a consistent
    * layout for one whole rebuild cycle), and any version either of
    * their indexes still references (file reuse) is deleted —
    * including unpublished partials from crashed rebuilds. */
  private def publishAndSweep(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, base: org.apache.hadoop.fs.Path,
      next: Long, prevPublished: Option[Long], existing: Seq[Long]): Unit = {
    AtomicSink.writeCommitted(fs, new org.apache.hadoop.fs.Path(base, "_current"),
        attemptId = next) { tmp =>
      val out = fs.create(tmp, true)
      try out.write(s"v=$next".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    val dir = base.toString
    val keep = (Set(next) ++ prevPublished) ++
      referencedVersions(spark, dir, next) ++
      prevPublished.toSet.flatMap((p: Long) => referencedVersions(spark, dir, p))
    existing.filterNot(keep).foreach(v =>
      fs.delete(new org.apache.hadoop.fs.Path(base, s"v=$v"), true))
  }

  /** INCREMENTAL range-layout refresh — the rebuild-cost closure for
    * the petabyte posture: [[exportRangeLayout]] re-shuffles the WHOLE
    * store every rebuild, but appends since the last publish touch few
    * key ranges. This rewrites ONLY the blocks whose key range
    * intersects `delta`'s urlkeys (each affected block re-derived from
    * the STORE — the source of truth — via a pushed range predicate, so
    * the cost is the affected ranges' row groups, never the store), and
    * the new version's cluster.idx REUSES every untouched block file in
    * place (absolute paths; the sweep keeps any version a live index
    * still references). Versioned-publish contract unchanged: complete
    * v=N+1, atomic `_current` swap, previous published version kept one
    * full cycle.
    *
    * `delta` is the newly appended rows (or just their `urlkey`s) since
    * the last publish — the append loop has them in hand; rows must
    * already be in the store. Keys assigned to blocks by the same rule
    * lookups use (last block with k_min ≤ key; keys below the first
    * block extend block 0, keys past the last extend the final block).
    * A refreshed block absorbs its range's growth unsplit — re-balance
    * on the full-export cadence. No previous published version (or a
    * pre-versioning layout) falls back to a full export. */
  def refreshRangeLayout(spark: SparkSession, table: String, dir: String,
      delta: DataFrame, blocks: Int = 64): Unit = {
    require(graft.store.Bucketing.recoverCompacted(spark, table),
      s"no such cdx store: $table")
    val conf = spark.sparkContext.hadoopConfiguration
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(conf)
    val prevPublished = publishedVersion(fs, base)
    if (prevPublished.isEmpty)
      return exportRangeLayout(spark, table, dir, blocks)
    val prev = prevPublished.get
    // the previous index: sorted disjoint ranges (block-count-sized)
    val prevIdx = spark.read.parquet(s"$dir/v=$prev/cluster.idx")
      .select("file", "k_min", "k_max", "n_rows")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)))
      .sortBy(_._2)
    if (prevIdx.isEmpty) return exportRangeLayout(spark, table, dir, blocks)
    // affected block ids: assign every delta key DISTRIBUTEDLY by the
    // lookup rule (last k_min ≤ key, keys below the first block extend
    // block 0) against the broadcast block-boundary table, and collect
    // only the distinct BLOCK ids — block-count-bounded, never
    // delta-sized (a big append must not funnel its keyset through the
    // driver)
    val mins = prevIdx.map(_._2)
    import spark.implicits._
    val bounds = mins.zipWithIndex.map { case (m, i) =>
      (i, if (i == 0) "" else m, // block 0 unbounded below
        if (i == mins.length - 1) None else Some(mins(i + 1)))
    }.toSeq.toDF("__blk", "__lo", "__hi")
    val affected = scala.collection.mutable.SortedSet.empty[Int] ++
      delta.filter(col("urlkey").isNotNull).select("urlkey")
        .join(broadcast(bounds),
          col("urlkey") >= col("__lo") &&
            (col("__hi").isNull || col("urlkey") < col("__hi")))
        .select("__blk").distinct().collect().map(_.getInt(0))
    if (affected.isEmpty) return // nothing new: keep the current version
    val existing = listVersions(fs, base)
    val next = existing.foldLeft(-1L)(_ max _) + 1
    val root = s"$dir/v=$next"
    // rewrite the affected blocks from the store under their ASSIGNMENT
    // ranges [k_min(i), k_min(i+1)) — first block unbounded below, last
    // unbounded above — in ONE JOB, boundary-ALIGNED: a single
    // range-repartitioned write over scattered affected blocks would
    // let a sampled partition boundary span untouched blocks' ranges,
    // and the binary-search lookup (last k_min ≤ key, one candidate)
    // would then miss keys hiding past a kept entry. So the block id
    // itself is the partition key: one OR-of-ranges predicate (pushed —
    // the store scan reads only matching row groups), the broadcast
    // bounds join tags each row's block, and a hash repartition on the
    // tag + partitionBy writes exactly one file per block into a
    // scratch dir, whose part files rename into blocks/ — driver
    // renames ∝ affected blocks, one Spark job total (the per-block
    // job loop this replaces scheduled K store scans).
    val ids = affected.toSeq
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/blocks"))
    val affectedBoundsDf = ids.map { i =>
      (i, if (i == 0) null else mins(i),
        if (i == prevIdx.length - 1) null else mins(i + 1))
    }.toDF("__blk", "__lo", "__hi")
    val cond = ids.map { i =>
      val lo = if (i == 0) None else Some(mins(i))
      val hi = if (i == prevIdx.length - 1) None else Some(mins(i + 1))
      lo.fold(lit(true))(l => col("urlkey") >= lit(l)) &&
        hi.fold(lit(true))(h => col("urlkey") < lit(h))
    }.reduce(_ || _)
    val scratch = s"$root/_rewrite"
    spark.table(table).filter(cond)
      .join(broadcast(affectedBoundsDf),
        (col("__lo").isNull || col("urlkey") >= col("__lo")) &&
          (col("__hi").isNull || col("urlkey") < col("__hi")))
      .drop("__lo", "__hi")
      .repartition(ids.size, col("__blk"))
      .sortWithinPartitions(col("__blk"), col("urlkey"))
      .write.mode("overwrite").partitionBy("__blk").parquet(scratch)
    val newFiles = ids.map { i =>
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$scratch/__blk=$i"))
        .map(_.getPath).filter(_.getName.endsWith(".parquet"))
      require(part.length == 1, s"block $i: ${part.length} part files")
      val dest = new org.apache.hadoop.fs.Path(
        s"$root/blocks", f"block-r$i%05d.parquet")
      require(fs.rename(part.head, dest), s"rename ${part.head} -> $dest")
      dest.toString
    }
    fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
    val newEntries = spark.read.parquet(newFiles: _*)
      .groupBy(input_file_name().as("file"))
      .agg(min("urlkey").as("k_min"), max("urlkey").as("k_max"),
        count(lit(1)).as("n_rows"))
    // new index = untouched prev entries (files reused in place) ∪ the
    // rewritten blocks' entries
    import spark.implicits._
    val kept = prevIdx.zipWithIndex.collect {
      case ((f, kmin, kmax, n), i) if !affected.contains(i) => (f, kmin, kmax, n)
    }.toSeq.toDF("file", "k_min", "k_max", "n_rows")
    kept.unionByName(newEntries)
      .repartition(1)
      .write.mode("overwrite").parquet(s"$root/cluster.idx")
    publishAndSweep(spark, fs, base, next, prevPublished, existing)
  }

  /** The published layout root: versioned exports resolve through the
    * `_current` pointer; a pre-versioning layout (blocks/ directly
    * under `dir`) reads as-is. */
  private[graft] def currentRoot(spark: SparkSession, dir: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val cur = new org.apache.hadoop.fs.Path(dir, "_current")
    val fs = cur.getFileSystem(conf)
    if (!fs.exists(cur)) dir
    else {
      val in = fs.open(cur)
      val v = try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](256)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        new String(bos.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8).trim
      } finally in.close()
      s"$dir/$v"
    }
  }

  /** Site lookup THROUGH the secondary index: read cluster.idx
    * (kilobytes), keep blocks whose [k_min, k_max] intersects the
    * site's SURT range, scan ONLY those files (plus the residual range
    * predicate — a block can straddle site boundaries). The collect is
    * cluster.idx-sized (≤ blocks rows), never data-sized. */
  def capturesForSiteIndexed(spark: SparkSession, dir: String,
      sitePrefix: String): DataFrame =
    capturesForSiteAt(spark, currentRoot(spark, dir), sitePrefix)

  /** [[capturesForSiteIndexed]] against an already-resolved version
    * root — every lookup resolves the `_current` pointer exactly ONCE,
    * so a rebuild swapping the pointer mid-query can never mix two
    * versions' files. */
  private def capturesForSiteAt(spark: SparkSession, root: String,
      sitePrefix: String): DataFrame = {
    val end = siteRangeEnd(sitePrefix)
    val files = selectedBlocksAt(spark, root, sitePrefix)
    if (files.isEmpty) spark.read.parquet(s"$root/blocks").limit(0)
    else spark.read.parquet(files: _*)
      .filter(col("urlkey") >= lit(sitePrefix) && col("urlkey") < lit(end))
  }

  /** The block files the secondary index selects for a site — the IO
    * set [[capturesForSiteIndexed]] touches (package-visible so the
    * spec can assert the scan reads exactly these and nothing else). */
  private[graft] def selectedBlocks(spark: SparkSession, dir: String,
      sitePrefix: String): Seq[String] =
    selectedBlocksAt(spark, currentRoot(spark, dir), sitePrefix)

  /** cluster.idx rows (file, k_min, k_max) sorted by k_min, memoized
    * per RESOLVED VERSION ROOT: published roots are immutable (every
    * rebuild writes a complete `v=N` and atomically swaps `_current`,
    * so a new version is a new key and a swept root's entry is dead
    * weight, kilobytes). This is the zipnum serving posture — the
    * secondary index pinned in memory, exactly what cdx servers do
    * with cluster.idx — NOT cross-run result caching: the memo is
    * in-process, index metadata only, and every block scan still reads
    * the landed files. Saves a Spark read+collect job pair per probe. */
  private val clusterIdxMemo = new java.util.concurrent.ConcurrentHashMap[
    String, Array[(String, String, String)]]()
  private def clusterIdxAt(spark: SparkSession,
      root: String): Array[(String, String, String)] =
    clusterIdxMemo.computeIfAbsent(root, _ =>
      spark.read.parquet(s"$root/cluster.idx")
        .select("file", "k_min", "k_max")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
        .sortBy(_._2))

  private def selectedBlocksAt(spark: SparkSession, root: String,
      sitePrefix: String): Seq[String] = {
    val end = siteRangeEnd(sitePrefix)
    clusterIdxAt(spark, root)
      .collect { case (f, kmin, kmax) if kmax >= sitePrefix && kmin < end => f }
      .toSeq.sorted
  }

  /** [[serveLatestCaptures]] THROUGH the range layout: the same
    * revisit-aware (optionally as-of) site serving, with BOTH lookups
    * index-routed — the site slice through [[capturesForSiteIndexed]]
    * and the out-of-range referred originals through [[blocksForKeys]]
    * (one cluster.idx read + a binary search per key) — so a
    * petabyte-scale layout serves a site touching the kilobyte index,
    * the site's own blocks, and the referred originals' blocks only.
    * Past `maxRefKeys` the originals fetch falls back to a semi-join
    * over the full layout (index metadata, never archive bytes). */
  def serveLatestCapturesIndexed(spark: SparkSession, dir: String,
      sitePrefix: String, asOf: Option[String] = None,
      normalize: Boolean = true, maxRefKeys: Int = 10000): DataFrame = {
    val root = currentRoot(spark, dir) // resolved ONCE for the query
    val slice0 = capturesForSiteAt(spark, root, sitePrefix)
    val slice = asOf.fold(slice0)(t => slice0.filter(col("warc_date") <= lit(t)))
    val linkage = Seq("payload_digest", "refers_to_uri", "warc_type")
    if (!linkage.forall(slice.columns.contains(_)))
      return Warc.readLatestCaptures(slice, normalize)
    val end = siteRangeEnd(sitePrefix)
    val refKeys = slice.filter(col("warc_type") === "revisit")
      .select(UrlOps.surtKey(col("refers_to_uri")).as("__rk"))
      .filter(col("__rk").isNotNull &&
        (col("__rk") < lit(sitePrefix) || col("__rk") >= lit(end)))
      .distinct()
    val keys = refKeys.limit(maxRefKeys + 1).collect().map(_.getString(0))
    val extra =
      if (keys.isEmpty) slice.limit(0)
      else if (keys.length <= maxRefKeys) {
        val blocks = blocksForKeysAt(spark, root, keys.toSeq)
        if (blocks.isEmpty) slice.limit(0)
        else spark.read.parquet(blocks: _*)
          .filter(col("urlkey").isin(keys.toSeq: _*))
      } else
        spark.read.parquet(s"$root/blocks")
          .join(refKeys.withColumnRenamed("__rk", "urlkey"),
            Seq("urlkey"), "left_semi")
    Warc.readLatestCapturesDeduped(slice, slice.unionByName(extra), normalize)
  }

  /** Blocks containing any of `keys`: ONE cluster.idx read (block-
    * count-sized collect) + a binary search per key over the sorted,
    * disjoint block ranges — O(keys · log blocks) driver work, never
    * keys × blocks. */
  private[graft] def blocksForKeys(spark: SparkSession, dir: String,
      keys: Seq[String]): Seq[String] =
    blocksForKeysAt(spark, currentRoot(spark, dir), keys)

  private def blocksForKeysAt(spark: SparkSession, root: String,
      keys: Seq[String]): Seq[String] = {
    val idx = clusterIdxAt(spark, root) // sorted by k_min (memo contract)
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    keys.foreach { k =>
      // last block with k_min <= k: with sorted disjoint ranges it is
      // the only candidate; membership confirmed against its k_max
      var lo = 0; var hi = idx.length - 1; var best = -1
      while (lo <= hi) {
        val m = (lo + hi) >>> 1
        if (idx(m)._2 <= k) { best = m; lo = m + 1 } else hi = m - 1
      }
      if (best >= 0 && k <= idx(best)._3) out += idx(best)._1
    }
    out.toSeq.sorted
  }

  /** The store-side anti-join on (urlkey, [[SigCol]]) — full-row
    * identity through the stored signature, BARE-attribute equi keys:
    * the store side scans in bucket layout and Spark reuses its
    * `HashPartitioning(urlkey)` (a subset of the join keys) as the
    * join distribution, so only `candidates` — batch-sized, already
    * signature-stamped — shuffles. CdxStoreSpec plan-asserts exactly
    * one Exchange. Package-visible for that assert. */
  private[graft] def freshAgainstStore(candidates: DataFrame,
      table: String): DataFrame =
    candidates.join(
      candidates.sparkSession.table(table).select(col("urlkey"), col(SigCol)),
      Seq("urlkey", SigCol), "left_anti")
}
