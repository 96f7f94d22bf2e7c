package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** WebDataset-style TAR shards — the packaging multimodal training
  * data actually ships in (the WebDataset convention: a corpus is a
  * set of `.tar` files; a SAMPLE is the group of consecutive entries
  * sharing a basename, one entry per field — `000123.txt`,
  * `000123.jpg`, `000123.json` — and loaders stream shards
  * sequentially). First-principles POSIX ustar framing, the
  * [[Warc]]/[[Multimodal]] JDK-pure discipline: 512-byte headers
  * (octal size, checksum-over-spaces, `ustar` magic), data padded to
  * the block, two zero blocks at the end — any `tar` implementation
  * reads the shards, and this reader accepts any ustar/pax-minimal
  * archive whose entries fit the (name, size) basics.
  *
  * 100-TB shape: one shard per partition on the write side (shard
  * size = the caller's `repartition(n)`, the knob WebDataset training
  * jobs tune); the read side parallelizes per FILE (tar has no
  * interior index — sequential streaming per shard is the format's
  * contract and exactly what training loaders do). Entries of one
  * sample are written consecutively in declared field order, the
  * grouping loaders rely on.
  *
  * Reference: rearview ships nothing like this (its data lives in
  * Graphite); extension surface for the training-data mandate,
  * matching the public WebDataset convention (Breuel et al.). */
object WebDataset {

  private val Block = 512

  /** One tar entry: (shard path, sample key, field extension, bytes). */
  final case class TarEntry(shard: String, key: String, ext: String,
      payload: Array[Byte])

  // -- ustar framing --------------------------------------------------------

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits, NUL terminated (the ustar convention)
    val s = java.lang.Long.toOctalString(v)
    val pad = "0" * (width - 1 - s.length) + s
    (pad + "\u0000").getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  }

  private[graft] def header(name: String, size: Long): Array[Byte] = {
    val nb = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    require(nb.length <= 100, s"tar entry name too long (${nb.length} > 100): $name")
    val h = new Array[Byte](Block)
    System.arraycopy(nb, 0, h, 0, nb.length)
    System.arraycopy(octal(420 /* 0644 */, 8), 0, h, 100, 8) // mode
    System.arraycopy(octal(0, 8), 0, h, 108, 8) // uid
    System.arraycopy(octal(0, 8), 0, h, 116, 8) // gid
    System.arraycopy(octal(size, 12), 0, h, 124, 12)
    System.arraycopy(octal(0, 12), 0, h, 136, 12) // mtime 0: deterministic
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces
    h(156) = '0' // regular file
    System.arraycopy("ustar\u000000".getBytes("US-ASCII"), 0, h, 257, 8)
    var sum = 0L
    var i = 0
    while (i < Block) { sum += h(i) & 0xff; i += 1 }
    val cs = java.lang.Long.toOctalString(sum)
    val cp = "0" * (6 - cs.length) + cs
    System.arraycopy((cp + "\u0000 ").getBytes("US-ASCII"), 0, h, 148, 8)
    h
  }

  /** Parse entries off one tar stream: (name, bytes) until the
    * terminating zero block (or EOF — a truncated tail stops the
    * iterator, the [[Warc.parseStream]] tolerance). Non-regular
    * entries (directories, pax headers) are skipped. */
  private[graft] def parseStream(in: java.io.InputStream): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private val din = new java.io.DataInputStream(in)
      private var nextE: Option[(String, Array[Byte])] = advance()
      private def readBlock(): Option[Array[Byte]] = {
        val b = new Array[Byte](Block)
        try { din.readFully(b); Some(b) }
        catch { case _: java.io.EOFException => None }
      }
      @scala.annotation.tailrec
      private def advance(): Option[(String, Array[Byte])] =
        readBlock() match {
          case None => None
          case Some(h) if h.forall(_ == 0) => None // end-of-archive
          case Some(h) =>
            val z = h.indexWhere(_ == 0)
            val nameEnd = if (z < 0 || z > 100) 100 else z
            val name = new String(h, 0, nameEnd,
              java.nio.charset.StandardCharsets.UTF_8)
            val sizeStr = new String(h, 124, 12, "US-ASCII")
              .takeWhile(c => c >= '0' && c <= '7')
            val size = if (sizeStr.isEmpty) 0L else
              java.lang.Long.parseLong(sizeStr, 8)
            // a corrupt (or >2 GiB — legal ustar, unsupported here)
            // size field must stop the iterator (the documented
            // truncation tolerance), not overflow toInt and throw
            if (size < 0L || size > Int.MaxValue - Block) return None
            val data = new Array[Byte](size.toInt)
            try din.readFully(data)
            catch { case _: java.io.EOFException => return None }
            val padding = (Block - (size % Block).toInt) % Block
            if (padding > 0) {
              val p = new Array[Byte](padding)
              try din.readFully(p)
              catch { case _: java.io.EOFException => return None }
            }
            if (h(156) == '0' || h(156) == 0) Some(name -> data)
            else advance() // dirs/links/pax headers: skip
        }
      override def hasNext: Boolean = nextE.isDefined
      override def next(): (String, Array[Byte]) = {
        val e = nextE.get; nextE = advance(); e
      }
    }

  // -- distributed write / read ---------------------------------------------

  /** Write `.tar` shards, one per partition: each row becomes one
    * SAMPLE — entries `<key>.<ext>` for every (ext, column) in
    * `fields`, in declared order, consecutive (the grouping WebDataset
    * loaders rely on). Columns cast to binary (string columns land as
    * UTF-8); NULL fields are SKIPPED (the convention for optional
    * fields — a sample without a caption simply has no `.txt` entry).
    * Shard size is the caller's partitioning. Hadoop FS output —
    * remote outDirs work. */
  def writeShards(df: DataFrame, keyCol: String,
      fields: Seq[(String, Column)], outDir: String): Unit = {
    require(fields.nonEmpty, "writeShards needs at least one field")
    val cols = col(keyCol).cast("string").as("__k") +:
      fields.map { case (ext, c) => c.cast("binary").as(s"__f_$ext") }
    val exts = fields.map(_._1)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.select(cols: _*).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val ctx = org.apache.spark.TaskContext.get()
          val dest = new org.apache.hadoop.fs.Path(outDir,
            f"shard-${ctx.partitionId()}%05d.tar")
          val fs = dest.getFileSystem(conf.value)
          // temp + rename-on-commit ([[AtomicSink]]): a speculative
          // duplicate attempt can never interleave with a winner
          AtomicSink.writeCommitted(fs, dest, ctx.taskAttemptId()) { tmp =>
            val out = fs.create(tmp, true)
            try {
              it.foreach { row =>
                val key = row.getString(0)
                exts.zipWithIndex.foreach { case (ext, i) =>
                  val bytes = row.getAs[Array[Byte]](i + 1)
                  if (bytes != null) {
                    out.write(header(s"$key.$ext", bytes.length.toLong))
                    out.write(bytes)
                    val pad = (Block - (bytes.length % Block)) % Block
                    if (pad > 0) out.write(new Array[Byte](pad))
                  }
                }
              }
              out.write(new Array[Byte](2 * Block)) // end-of-archive
            } finally out.close()
          }
        }
    }
  }

  /** BYTE-TARGETED shards: assign each sample to a shard so every
    * shard's tar size lands ≈ `targetBytes` (the ~1 GB-shard
    * convention training loaders want), WITHOUT a global sort — the
    * [[Sampling]] critical-bucket discipline applied to a prefix sum:
    *
    *   1. each sample gets a seeded draw; its leading 16 bits bucket
    *      the row (prefix ⇒ bucket asc == draw asc) — pure per-row
    *      expression;
    *   2. ONE hash aggregation → per-bucket byte totals (≤ 65536 rows,
    *      metadata-sized); a running sum over that tiny frame gives
    *      each bucket's global STARTING byte offset;
    *   3. the per-row prefix completes inside each bucket — a window
    *      partitioned by bucket (65536-way parallel, each partition
    *      ~corpus/65536 — a bounded distributed prefix-sum, never a
    *      single-partition sort);
    *   4. shard id = floor(global prefix / targetBytes); rows
    *      hash-partition by shard id (a shard never splits across
    *      tasks) and a roll-on-shard-change writer emits one `.tar`
    *      per shard under the [[AtomicSink]] commit protocol.
    *
    * Sample sizes are TAR-EXACT (512-byte header + payload padded to
    * the block, per non-null field), so shard sizes sit within one
    * max-sample of the target (the final shard may undershoot). A
    * sample is one row — it can never split across shards. */
  def writeShardsBySize(df: DataFrame, keyCol: String,
      fields: Seq[(String, Column)], outDir: String, targetBytes: Long,
      seed: String = "wds-shards"): Unit = {
    val assigned = assignShardsBySize(df, keyCol, fields, targetBytes, seed)
    writeAssignedShards(assigned, fields.map(_._1), outDir)
  }

  /** [[writeShardsBySize]] + the [[Export]] MANIFEST contract for tar
    * shards: one row per shard (shard, n_samples, n_bytes — tar-EXACT —
    * checksum, checksum_cols), where the checksum is the
    * order-invariant per-sample `xxhash64(key, field-bytes…)` summed as
    * exact DECIMAL over COLUMN VALUES — so a parquet [[Export]] of the
    * same frame with the same checksum columns carries comparable
    * checksums (xxhash64 over a string and over its UTF-8 binary cast
    * agree), and a lost or TRUNCATED `.tar` — which without a manifest
    * surfaced only at training time — is one [[auditTarShards]] away.
    * The layout runs ONCE (localCheckpoint) and feeds both the shard
    * write and the manifest aggregation. Returns the manifest (also
    * landed at `<outDir>/_manifest`). */
  def writeShardsBySizeWithManifest(df: DataFrame, keyCol: String,
      fields: Seq[(String, Column)], outDir: String, targetBytes: Long,
      seed: String = "wds-shards"): DataFrame = {
    val assigned = assignShardsBySize(df, keyCol, fields, targetBytes, seed)
      .localCheckpoint(true) // one layout pass feeds write AND manifest
    try {
      writeAssignedShards(assigned, fields.map(_._1), outDir)
      writeTarManifest(assigned, fields.map(_._1), outDir)
    } finally assigned.unpersist(): Unit
  }

  /** [[writeShards]] (one shard per partition) + the tar manifest —
    * shard id = partition id, pinned by a localCheckpoint so the write
    * and the manifest see the same assignment. */
  def writeShardsWithManifest(df: DataFrame, keyCol: String,
      fields: Seq[(String, Column)], outDir: String): DataFrame = {
    require(fields.nonEmpty, "writeShards needs at least one field")
    val exts = fields.map(_._1)
    val assigned = df.select(Seq(
        spark_partition_id().cast("long").as("__shard"),
        col(keyCol).cast("string").as("__k"),
        sampleTarBytes(fields).as("__bytes")) ++
        fields.map { case (ext, c) => c.cast("binary").as(s"__f_$ext") }: _*)
      .withColumn("__d", col("__k")) // write order within a partition
      .localCheckpoint(true)
    try {
      writeAssignedShards(assigned, exts, outDir, repartitionByShard = false)
      writeTarManifest(assigned, exts, outDir)
    } finally assigned.unpersist(): Unit
  }

  /** Tar-exact bytes of one sample: Σ non-null fields (512-byte header
    * + payload rounded up to the block). 512 = 2^9 ⇒ shifts. */
  private def sampleTarBytes(fields: Seq[(String, Column)]): Column =
    fields.map { case (_, c) =>
      val b = c.cast("binary")
      when(b.isNotNull, lit(Block.toLong) +
        shiftleft(shiftright(octet_length(b).cast("long") + (Block - 1), 9), 9))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** The roll-on-shard-change tar writer over an assignment frame
    * carrying (__shard, __d, __k, __f_<ext>…): rows hash-partition by
    * shard id (a shard never splits across tasks) unless the input's
    * own partitioning already IS the assignment
    * (`repartitionByShard = false` — the partition-per-shard mode). */
  private def writeAssignedShards(assigned: DataFrame, exts: Seq[String],
      outDir: String, repartitionByShard: Boolean = true): Unit = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      assigned.sparkSession.sparkContext.hadoopConfiguration)
    val sel = assigned
      .select(col("__shard") +: col("__d") +: col("__k") +:
        exts.map(e => col(s"__f_$e")): _*)
    val laid =
      if (repartitionByShard)
        sel.repartition(col("__shard"))
          .sortWithinPartitions("__shard", "__d", "__k")
      else sel
    laid.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val ctx = org.apache.spark.TaskContext.get()
      var fs: org.apache.hadoop.fs.FileSystem = null
      var out: java.io.OutputStream = null
      var tmp: org.apache.hadoop.fs.Path = null
      var dest: org.apache.hadoop.fs.Path = null
      var curShard = Long.MinValue
      def finish(): Unit = if (out != null) {
        out.write(new Array[Byte](2 * Block)) // end-of-archive
        out.close(); out = null
        AtomicSink.commit(fs, tmp, dest)
      }
      try {
        it.foreach { row =>
          val shard = row.getLong(0)
          if (shard != curShard) {
            finish()
            dest = new org.apache.hadoop.fs.Path(outDir, f"shard-$shard%05d.tar")
            if (fs == null) fs = dest.getFileSystem(conf.value)
            tmp = AtomicSink.tempFor(dest, ctx.taskAttemptId())
            out = fs.create(tmp, true)
            curShard = shard
          }
          val key = row.getString(2)
          exts.zipWithIndex.foreach { case (ext, i) =>
            val bytes = row.getAs[Array[Byte]](i + 3)
            if (bytes != null) {
              out.write(header(s"$key.$ext", bytes.length.toLong))
              out.write(bytes)
              val pad = (Block - (bytes.length % Block)) % Block
              if (pad > 0) out.write(new Array[Byte](pad))
            }
          }
        }
        finish()
      } catch {
        case t: Throwable =>
          if (out != null) { out.close(); AtomicSink.abort(fs, tmp) }
          throw t
      }
    }
  }

  /** The manifest aggregation + `_manifest` parquet: per-shard sample
    * count, tar-exact byte total, and the order-invariant column-value
    * checksum (per-sample xxhash64 over (key, field bytes…) summed as
    * exact DECIMAL — null fields skip, matching the writer's
    * skip-null-entries convention). `checksum_cols` records the term
    * layout so the audit re-derives it from the manifest alone. */
  private def writeTarManifest(assigned: DataFrame, exts: Seq[String],
      outDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val term = xxhash64(col("__k") +: exts.map(e => col(s"__f_$e")): _*)
    val manifest = assigned.groupBy(col("__shard").as("shard")).agg(
        count(lit(1)).as("n_samples"),
        sum(col("__bytes")).as("n_bytes"),
        sum(term.cast(DecimalType(38, 0))).as("checksum"))
      .withColumn("checksum_cols", lit(("key" +: exts).mkString(",")))
      .orderBy("shard")
    manifest.repartition(1).write.mode("overwrite")
      .parquet(s"$outDir/_manifest")
    manifest
  }

  /** Re-derive the manifest from the LANDED `.tar` shards and compare —
    * the post-copy/pre-training integrity gate: returns rows that
    * DISAGREE (empty = intact). A LOST shard surfaces as a
    * manifest-only row; a TRUNCATED shard (tar tail cut — the parser's
    * documented tolerance stops at the damage) as count/byte/checksum
    * drift. Field layout comes from the manifest's own `checksum_cols`.
    * Cost ∝ archive bytes (one streaming pass per shard — the same
    * read a loader pays). */
  def auditTarShards(spark: SparkSession, outDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val manifest = spark.read.parquet(s"$outDir/_manifest")
    val exts: Seq[String] = manifest.select("checksum_cols").limit(1)
      .collect().headOption
      .map(_.getString(0).split(",").toSeq.drop(1))
      .getOrElse(Seq.empty)
    require(exts.nonEmpty, s"manifest at $outDir/_manifest records no fields")
    val manifestCmp = manifest.drop("checksum_cols")
    val entries = readEntries(spark, s"$outDir/shard-*.tar").toDF()
      .withColumn("__shard",
        regexp_extract(col("shard"), "shard-([0-9]+)\\.tar$", 1).cast("long"))
    // per-(shard, key): one column per field ext, then the SAME
    // per-sample term the writer's manifest used
    val fieldAggs = exts.map(e =>
      max(when(col("ext") === e, col("payload"))).as(s"__f_$e"))
    val bySample = entries.groupBy(col("__shard"), col("key"))
      .agg(fieldAggs.head, fieldAggs.tail: _*)
    val term = xxhash64(col("key") +: exts.map(e => col(s"__f_$e")): _*)
    val bytes = exts.map { e =>
      val b = col(s"__f_$e")
      when(b.isNotNull, lit(Block.toLong) +
        shiftleft(shiftright(octet_length(b).cast("long") + (Block - 1), 9), 9))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val landed = bySample.groupBy(col("__shard").as("shard")).agg(
      count(lit(1)).as("n_samples"),
      sum(bytes).as("n_bytes"),
      sum(term.cast(DecimalType(38, 0))).as("checksum"))
    landed.as("l").join(manifestCmp.as("m"), Seq("shard"), "full_outer")
      .filter(col("l.n_samples").isNull || col("m.n_samples").isNull ||
        col("l.n_samples") =!= col("m.n_samples") ||
        col("l.n_bytes") =!= col("m.n_bytes") ||
        col("l.checksum") =!= col("m.checksum"))
  }

  /** The size-prefix-sum shard ASSIGNMENT behind [[writeShardsBySize]],
    * exposed for plan assertions: returns the field-projected rows plus
    * (__bkt, __d, __k, __bytes, __prefix, __shard). No global sort by
    * construction — the only order-sensitive steps are the window over
    * the ≤65536-row bucket-total metadata frame and the 65536-way
    * bucket-partitioned prefix windows. */
  private[graft] def assignShardsBySize(df: DataFrame, keyCol: String,
      fields: Seq[(String, Column)], targetBytes: Long,
      seed: String): DataFrame = {
    require(fields.nonEmpty, "writeShardsBySize needs at least one field")
    require(targetBytes >= 2L * Block,
      s"targetBytes must be at least one header+block (got $targetBytes)")
    // tar-exact bytes per sample ([[sampleTarBytes]])
    val sampleBytes = sampleTarBytes(fields)
    val d = Sampling.drawHex(col(keyCol), seed)
    val rows = df.select(Seq(col(keyCol).cast("string").as("__k"),
        sampleBytes.as("__bytes"), d.as("__d")) ++
        fields.map { case (ext, c) => c.cast("binary").as(s"__f_$ext") }: _*)
      .withColumn("__bkt", conv(substring(col("__d"), 1, 4), 16, 10).cast("long"))
    val perBucket = rows.groupBy("__bkt").agg(sum(col("__bytes")).as("__bb"))
    val wB = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val starts = perBucket
      .withColumn("__bstart", coalesce(sum(col("__bb")).over(wB), lit(0L)))
      .select(col("__bkt"), col("__bstart"))
    val wIn = Window.partitionBy(col("__bkt")).orderBy(col("__d"), col("__k"))
      .rowsBetween(Window.unboundedPreceding, -1)
    rows.join(starts, Seq("__bkt"))
      .withColumn("__prefix",
        col("__bstart") + coalesce(sum(col("__bytes")).over(wIn), lit(0L)))
      .withColumn("__shard", floor(col("__prefix") / targetBytes))
  }

  /** Read tar shards back as ENTRY rows: (shard, key, ext, payload) —
    * key/ext split at the LAST dot (WebDataset keys may contain dots;
    * extensions may not... except they may: `.json.gz`-style compound
    * extensions split at the FIRST dot after the basename per the
    * WebDataset spec — this reader splits at the first dot FOLLOWING
    * the last '/' like the reference implementation, so `a/b.c.json`
    * gives key `a/b`, ext `c.json`). One streaming pass per shard
    * file, file-count parallelism. */
  def readEntries(spark: SparkSession, glob: String): Dataset[TarEntry] = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val pat = new org.apache.hadoop.fs.Path(glob)
    val files = Option(pat.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .globStatus(pat)).getOrElse(Array.empty)
      .filter(_.isFile).map(_.getPath.toString).toSeq.sorted
    spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size,
        spark.sparkContext.defaultParallelism)))
      .mapPartitions { paths =>
        // close the CURRENT shard stream on task end, not on iterator
        // exhaustion — a downstream limit/take abandons the iterator
        // mid-shard and the by-name `++ close` form would leak the
        // Hadoop stream until GC (the Warc.readIndexed listener shape)
        var open: org.apache.hadoop.fs.FSDataInputStream = null
        val ctx = org.apache.spark.TaskContext.get()
        if (ctx != null) ctx.addTaskCompletionListener[Unit] { _ =>
          if (open != null) { open.close(); open = null }
        }
        paths.flatMap { p =>
          if (open != null) { open.close(); open = null }
          val hp = new org.apache.hadoop.fs.Path(p)
          open = hp.getFileSystem(conf.value).open(hp)
          parseStream(open).map { case (name, data) =>
            val base = name.lastIndexOf('/') + 1
            val dot = name.indexOf('.', base)
            val (key, ext) =
              if (dot < 0) (name, "") else (name.substring(0, dot), name.substring(dot + 1))
            TarEntry(p, key, ext, data)
          }
        }
      }
  }

  /** Entry rows → one row per SAMPLE with a field map: (key,
    * fields: Map[ext, bytes]) — the shape a training-prep join
    * consumes. Keys written by [[writeShards]] are globally unique,
    * but [[readEntries]] accepts ARBITRARY ustar input (overlapping
    * re-runs, foreign tars), and Spark's default
    * mapKeyDedupPolicy=EXCEPTION would turn a duplicate (key, ext)
    * into a runtime throw at map build — so entries dedup on
    * (key, ext) first, keeping the payload from the lexicographically
    * FIRST (shard, payload) pair (deterministic, order-independent).
    * Two hash aggregations, both keyed ≤ one row per tar entry. */
  def samples(entries: Dataset[TarEntry]): DataFrame =
    entries.toDF()
      .groupBy(col("key"), col("ext"))
      .agg(min(struct(col("shard"), col("payload"))).as("m"))
      .groupBy(col("key"))
      .agg(map_from_entries(collect_list(struct(col("ext"), col("m.payload"))))
        .as("fields"))
}
