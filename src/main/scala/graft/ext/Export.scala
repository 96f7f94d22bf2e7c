package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Training-shard export — the pipeline's last mile: the curated,
  * tokenized corpus leaves as size-bounded shards plus a MANIFEST the
  * training side trusts (WebDataset/streaming-loader convention: the
  * loader reads the manifest, not the directory listing).
  *
  * Shard assignment is [[Packing.packContiguous]]'s cumulative-sum
  * machinery specialized to whole documents: docs are laid out in a
  * deterministic order (seeded-hash shuffle — the [[Sampling]] global
  * shuffle — or a caller-given sort) and cut every `tokensPerShard`
  * tokens, so shard contents are a pure function of (corpus, seed,
  * budget): re-running the export reproduces byte-identical shards.
  *
  * Scale shape: ONE window cumsum over (ntok) — per deterministic
  * hash GROUP when `groups > 1` (the 100-TB posture: no global-ordered
  * window exists at corpus scale) — then a partitioned parquet write (`shard=NNN` directories,
  * one task per shard via repartition on the shard id) and a
  * manifest aggregation (shard-count rows: docs, tokens, and an
  * order-invariant content checksum = sum of per-doc xxhash64, exact
  * DECIMAL so the manifest is engine/partition-independent). */
object Export {

  /** Assign each doc a shard id by deterministic contiguous layout:
    * (idCol, ntokCol, shard). A doc lands WHOLE in the shard where its
    * first token falls (no document straddles a shard boundary in the
    * manifest's accounting; a shard may therefore exceed the budget by
    * less than one document).
    *
    * `groups` is the 100-TB path: with `groups > 1` the layout runs
    * INDEPENDENTLY inside `groups` deterministic hash groups (the
    * packContiguous `partitionCols` move — no global-ordered window
    * exists at corpus scale); global shard ids stay contiguous and
    * collision-free via per-group offsets (shard = groupOffset +
    * localShard, offsets from one groups-sized aggregation).
    * `groups = 1` (default) keeps the exact single-sequence layout. */
  def assignShards(df: DataFrame, idCol: String, ntokCol: String,
      tokensPerShard: Long, seed: Long = 42L, groups: Int = 1): DataFrame = {
    require(tokensPerShard > 0, "tokensPerShard must be positive")
    require(groups >= 1, "groups must be positive")
    val grp =
      if (groups == 1) lit(0L)
      else pmod(xxhash64(col(idCol), lit(seed + 1)), lit(groups.toLong))
    val w = Window.partitionBy(grp)
      .orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))
    val cum = sum(col(ntokCol)).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    val local = df.withColumn("_grp", grp)
      .withColumn("_lshard", (coalesce(cum, lit(0L)) / tokensPerShard).cast("long"))
    if (groups == 1) local.withColumn("shard", col("_lshard")).drop("_grp", "_lshard")
    else {
      // groups-sized frame: contiguous global offsets in group order
      val wg = Window.orderBy("_grp")
      val offsets = local.groupBy("_grp")
        .agg((max(col("_lshard")) + 1).as("_n"))
        .select(col("_grp"),
          coalesce(sum(col("_n")).over(
            wg.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("_off"))
      local.join(broadcast(offsets), "_grp")
        .withColumn("shard", col("_off") + col("_lshard"))
        .drop("_grp", "_lshard", "_off")
    }
  }

  /** Can xxhash64 hash this type? (Hash expressions reject MapType —
    * map iteration order is undefined — at any nesting depth.) */
  private def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => false
    case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
    case _ => true
  }

  /** The columns the manifest checksum covers: the caller's choice, or
    * every HASHABLE column except the shard id in sorted-name order (so
    * the term is schema-order-independent, and a frame carrying a map
    * column still exports instead of failing analysis). Covering
    * content by default means a shard whose TEXT was corrupted in
    * transit — same ids, same token counts — still fails the audit. */
  private def checksumColumns(df: DataFrame, checksumCols: Seq[String]): Seq[String] = {
    val cs =
      if (checksumCols.nonEmpty) checksumCols
      else df.schema.fields
        .filter(f => f.name != "shard" && hashable(f.dataType))
        .map(_.name).toSeq.sorted
    require(cs.nonEmpty, "no checksum columns")
    cs
  }

  /** Order-invariant exact checksum over the given columns: per-doc
    * xxhash64 summed as exact DECIMAL. */
  private def checksumTerm(cs: Seq[String]) =
    sum(xxhash64(cs.map(col): _*).cast(DecimalType(38, 0)))

  /** Write `shard=NNN`-partitioned parquet + `_manifest` (one row per
    * shard: n_docs, n_tokens, checksum). Returns the manifest.
    * `checksumCols` picks the columns the manifest checksum covers —
    * default: ALL of them (audit with the same choice). */
  def writeShards(df: DataFrame, idCol: String, ntokCol: String,
      outDir: String, tokensPerShard: Long, seed: Long = 42L,
      groups: Int = 1, checksumCols: Seq[String] = Nil): DataFrame = {
    val assigned = assignShards(df, idCol, ntokCol, tokensPerShard, seed, groups)
      .localCheckpoint(true) // one layout pass feeds both writes
    try {
      // one output file per shard: repartition ON the shard id so the
      // write task holds exactly its shard (the bucketed-store "one
      // file per bucket" discipline). Empty input ⇒ empty shard dir +
      // empty (schema-complete) manifest, not an NPE on max(shard).
      val maxShard = assigned.agg(max(col("shard"))).head
      val nShards = if (maxShard.isNullAt(0)) 0 else maxShard.getLong(0).toInt + 1
      if (nShards > 0)
        assigned.repartition(nShards, col("shard"))
          .write.mode("overwrite").partitionBy("shard").parquet(outDir)
      else assigned.write.mode("overwrite").partitionBy("shard").parquet(outDir)
      // the manifest RECORDS its checksum-column choice, so the audit
      // side re-derives with the same columns instead of trusting the
      // caller to repeat them (a mismatched choice reads as corruption)
      val cs = checksumColumns(assigned, checksumCols)
      val manifest = assigned.groupBy("shard").agg(
          count(lit(1)).as("n_docs"),
          sum(col(ntokCol)).as("n_tokens"),
          // order-invariant exact checksum: per-doc xxhash64 summed as
          // DECIMAL — any dropped/duplicated/altered doc (CONTENT
          // included, not just id/ntok) changes it
          checksumTerm(cs).as("checksum"))
        .withColumn("checksum_cols", lit(cs.mkString(",")))
        .orderBy("shard")
      manifest.repartition(1).write.mode("overwrite")
        .parquet(s"$outDir/_manifest")
      manifest
    } finally assigned.unpersist(): Unit
  }

  /** JSONL twin of [[writeShards]] — the interchange format most
    * training stacks consume directly (one JSON object per line,
    * gzip-compressed shard files): same deterministic shard layout
    * ([[assignShards]]), same manifest contract, and the CHECKSUMS are
    * computed over the COLUMN VALUES (not the serialized lines), so a
    * parquet export and a jsonl export of the same frame carry
    * identical manifests — a loader can audit either against the
    * other. Field order inside each JSON object is the frame's column
    * order (deterministic); shard files land as
    * `shard=NNN/part-*.txt.gz`, which `spark.read.json(outDir)` (or
    * any gzip-aware JSONL reader) consumes transparently. */
  def writeShardsJsonl(df: DataFrame, idCol: String, ntokCol: String,
      outDir: String, tokensPerShard: Long, seed: Long = 42L,
      groups: Int = 1, checksumCols: Seq[String] = Nil,
      compression: String = "gzip"): DataFrame = {
    val assigned = assignShards(df, idCol, ntokCol, tokensPerShard, seed, groups)
      .localCheckpoint(true)
    try {
      val maxShard = assigned.agg(max(col("shard"))).head
      val nShards = if (maxShard.isNullAt(0)) 0 else maxShard.getLong(0).toInt + 1
      val dataCols = assigned.columns.filter(_ != "shard").toSeq
      val lines = assigned.select(col("shard"),
        to_json(struct(dataCols.map(col): _*)).as("value"))
      val laid =
        if (nShards > 0) lines.repartition(nShards, col("shard")) else lines
      laid.write.mode("overwrite").partitionBy("shard")
        .option("compression", compression).text(outDir)
      val cs = checksumColumns(assigned, checksumCols)
      val manifest = assigned.groupBy("shard").agg(
          count(lit(1)).as("n_docs"),
          sum(col(ntokCol)).as("n_tokens"),
          checksumTerm(cs).as("checksum"))
        .withColumn("checksum_cols", lit(cs.mkString(",")))
        .orderBy("shard")
      manifest.repartition(1).write.mode("overwrite")
        .parquet(s"$outDir/_manifest")
      manifest
    } finally assigned.unpersist(): Unit
  }

  /** Re-derive the manifest from landed shards and compare — the
    * integrity check a loader (or a post-copy audit) runs: returns
    * rows that DISAGREE (empty = intact). The checksum columns come
    * from the manifest's own `checksum_cols` record (manifests written
    * before that field existed: pass the write's `checksumCols`
    * explicitly). An empty export (no data files) audits clean against
    * an empty manifest — and flags every manifest row as lost when the
    * manifest says shards should exist. */
  def auditShards(spark: SparkSession, outDir: String, idCol: String,
      ntokCol: String, checksumCols: Seq[String] = Nil): DataFrame = {
    val manifest = spark.read.parquet(s"$outDir/_manifest")
    val cs: Seq[String] =
      if (checksumCols.nonEmpty) checksumCols
      else if (manifest.columns.contains("checksum_cols"))
        manifest.select("checksum_cols").limit(1).collect()
          .headOption.map(_.getString(0).split(",").toSeq).getOrElse(Nil)
      else Nil
    val manifestCmp =
      if (manifest.columns.contains("checksum_cols")) manifest.drop("checksum_cols")
      else manifest
    // a zero-row export writes no parquet data files — detect via the
    // listing (only _manifest/_SUCCESS present) instead of letting the
    // schema-less read throw
    val p = new org.apache.hadoop.fs.Path(outDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) &&
      fs.listStatus(p).exists(s => !s.getPath.getName.startsWith("_"))
    val landed =
      if (hasData) {
        val shards = spark.read.parquet(outDir)
        shards.groupBy("shard").agg(
          count(lit(1)).as("n_docs"),
          sum(col(ntokCol)).as("n_tokens"),
          checksumTerm(checksumColumns(shards, cs)).as("checksum"))
      } else manifestCmp.limit(0)
    landed.as("l").join(manifestCmp.as("m"), "shard", "full_outer")
      .filter(col("l.n_docs").isNull || col("m.n_docs").isNull ||
        col("l.n_docs") =!= col("m.n_docs") ||
        col("l.n_tokens") =!= col("m.n_tokens") ||
        col("l.checksum") =!= col("m.checksum"))
  }

  /** [[auditShards]] for a [[writeShardsJsonl]] export: the landed
    * side reads back through the JSON lines under the WRITER'S data
    * schema (`dataSchema` — pass `df.schema`; JSON inference would
    * widen/re-type columns and the checksum over re-typed values would
    * read as corruption). Shortest-repr JSON round-trips doubles and
    * longs exactly, so value checksums match the parquet export's. */
  def auditShardsJsonl(spark: SparkSession, outDir: String, idCol: String,
      ntokCol: String, dataSchema: org.apache.spark.sql.types.StructType,
      checksumCols: Seq[String] = Nil): DataFrame = {
    val manifest = spark.read.parquet(s"$outDir/_manifest")
    val cs: Seq[String] =
      if (checksumCols.nonEmpty) checksumCols
      else manifest.select("checksum_cols").limit(1).collect()
        .headOption.map(_.getString(0).split(",").toSeq).getOrElse(Nil)
    val manifestCmp = manifest.drop("checksum_cols")
    val p = new org.apache.hadoop.fs.Path(outDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) &&
      fs.listStatus(p).exists(s => !s.getPath.getName.startsWith("_"))
    val landed =
      if (hasData) {
        val shards = spark.read.schema(dataSchema).json(outDir)
        shards.groupBy("shard").agg(
          count(lit(1)).as("n_docs"),
          sum(col(ntokCol)).as("n_tokens"),
          checksumTerm(checksumColumns(shards, cs)).as("checksum"))
      } else manifestCmp.limit(0)
    landed.as("l").join(manifestCmp.as("m"), "shard", "full_outer")
      .filter(col("l.n_docs").isNull || col("m.n_docs").isNull ||
        col("l.n_docs") =!= col("m.n_docs") ||
        col("l.n_tokens") =!= col("m.n_tokens") ||
        col("l.checksum") =!= col("m.checksum"))
  }
}
