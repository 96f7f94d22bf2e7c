package graft

import org.apache.spark.sql.functions._

import graft.ext.Export
import graft.store.Tables

/** Shard export: deterministic layout, budget bounds, manifest
  * integrity, and the audit's tamper detection. */
class ExportSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def docsWithTok = Tables.documents(spark, dir)
    .select(col("doc_id"), col("text"),
      size(split(trim(col("text")), "\\s+")).as("ntok"))

  test("shards: conservation, budget bound, contiguity, determinism") {
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val manifest = Export.writeShards(docsWithTok, "doc_id", "ntok", out,
      tokensPerShard = 2000)
    val m = manifest.collect()
    // conservation: every doc accounted once, token totals preserved
    val totalDocs = m.map(_.getAs[Long]("n_docs")).sum
    val totalToks = m.map(_.getAs[Long]("n_tokens")).sum
    assert(totalDocs == docsWithTok.count())
    assert(totalToks == docsWithTok.agg(sum("ntok")).head.getLong(0))
    // budget: a shard exceeds 2000 by at most one doc's tokens (the
    // whole-doc placement rule); shard ids contiguous from 0
    val maxDoc = docsWithTok.agg(max("ntok")).head.getInt(0)
    assert(m.forall(_.getAs[Long]("n_tokens") <= 2000 + maxDoc))
    assert(m.map(_.getAs[Long]("shard")).toSeq == (0L until m.length).toSeq)
    assert(m.length >= 2, "test corpus should span multiple shards")
    // landed files: exactly one parquet file per shard directory
    val shardDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard="))
    assert(shardDirs.length == m.length)
    assert(shardDirs.forall(
      _.listFiles().count(_.getName.endsWith(".parquet")) == 1))
    // audit: intact store has zero disagreements
    assert(Export.auditShards(spark, out, "doc_id", "ntok").isEmpty)
    // determinism: a second export yields an identical manifest
    val out2 = java.nio.file.Files.createTempDirectory("graft-shards2").toString
    val m2 = Export.writeShards(docsWithTok.repartition(13), "doc_id", "ntok",
      out2, tokensPerShard = 2000).collect()
    assert(m.map(_.toString).toSeq == m2.map(_.toString).toSeq)
  }

  test("grouped layout (the 100-TB path): contiguous collision-free shards, conservation, audit-clean") {
    val out = java.nio.file.Files.createTempDirectory("graft-shards-g").toString
    val manifest = Export.writeShards(docsWithTok, "doc_id", "ntok", out,
      tokensPerShard = 1500, groups = 4)
    val m = manifest.collect()
    assert(m.map(_.getAs[Long]("shard")).toSeq == (0L until m.length).toSeq,
      "global shard ids must stay contiguous across groups")
    assert(m.map(_.getAs[Long]("n_docs")).sum == docsWithTok.count())
    assert(m.map(_.getAs[Long]("n_tokens")).sum ==
      docsWithTok.agg(sum("ntok")).head.getLong(0))
    assert(Export.auditShards(spark, out, "doc_id", "ntok").isEmpty)
    // grouped assignment itself is deterministic across partitionings
    val a = Export.assignShards(docsWithTok, "doc_id", "ntok", 1500, groups = 4)
      .select("doc_id", "shard").as[(Long, Long)].collect().toSet
    val b = Export.assignShards(docsWithTok.repartition(11), "doc_id", "ntok",
        1500, groups = 4)
      .select("doc_id", "shard").as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("audit detects a tampered shard") {
    val out = java.nio.file.Files.createTempDirectory("graft-shards3").toString
    Export.writeShards(docsWithTok, "doc_id", "ntok", out, tokensPerShard = 4000)
    // tamper: drop one shard's file (simulates a lost/partial copy)
    val victim = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard=")).head
    victim.listFiles().filter(_.getName.endsWith(".parquet")).foreach(_.delete())
    val bad = Export.auditShards(spark, out, "doc_id", "ntok")
    assert(bad.count() >= 1)
  }

  test("audit detects CONTENT corruption: altered text under identical (id, ntok)") {
    val out = java.nio.file.Files.createTempDirectory("graft-shards4").toString
    Export.writeShards(docsWithTok, "doc_id", "ntok", out, tokensPerShard = 4000)
    // tamper one shard's text in place: same ids, same token counts —
    // only the content-covering checksum can see this
    val victim = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard=")).minBy(_.getName)
    val rewritten = spark.read.parquet(victim.getAbsolutePath)
      .withColumn("text", concat(col("text"), lit("!")))
      .localCheckpoint(true) // sever lineage from the files being replaced
    victim.listFiles().foreach(_.delete())
    rewritten.repartition(1).write.mode("overwrite")
      .parquet(victim.getAbsolutePath)
    val bad = Export.auditShards(spark, out, "doc_id", "ntok")
    assert(bad.count() == 1, "exactly the corrupted shard must disagree")
  }

  test("empty input: no NPE — empty manifest written, zero shards, audit clean") {
    val out = java.nio.file.Files.createTempDirectory("graft-shards5").toString
    val m = Export.writeShards(docsWithTok.filter(lit(false)), "doc_id", "ntok",
      out, tokensPerShard = 4000)
    assert(m.count() == 0)
    assert(spark.read.parquet(s"$out/_manifest").count() == 0)
    // the paired audit must read the zero-data-file directory as an
    // intact empty export, not throw on schema inference
    assert(Export.auditShards(spark, out, "doc_id", "ntok").count() == 0)
  }

  test("a map-typed column exports (checksum skips unhashable types) and audits clean") {
    val out = java.nio.file.Files.createTempDirectory("graft-shards6").toString
    val withMap = docsWithTok.withColumn("meta",
      map(lit("source"), col("doc_id").cast("string")))
    val m = Export.writeShards(withMap, "doc_id", "ntok", out, tokensPerShard = 4000)
    // the recorded checksum choice covers the hashable columns only
    val cols = m.select("checksum_cols").as[String].head.split(",").toSet
    assert(cols == Set("doc_id", "ntok", "text"))
    assert(Export.auditShards(spark, out, "doc_id", "ntok").count() == 0)
  }

  test("audit re-derives with the MANIFEST's recorded checksum columns") {
    val out = java.nio.file.Files.createTempDirectory("graft-shards7").toString
    // write covering ONLY (doc_id, ntok); the audit passes no choice and
    // must follow the manifest record — re-deriving with the all-columns
    // default instead would read every intact shard as corrupt
    Export.writeShards(docsWithTok, "doc_id", "ntok", out,
      tokensPerShard = 4000, checksumCols = Seq("doc_id", "ntok"))
    assert(Export.auditShards(spark, out, "doc_id", "ntok").count() == 0)
  }

  test("binary token shards: round-trip exact, byte-identical re-runs, positioned single-doc fetch, audit flags lost/truncated/bit-flipped bins") {
    // a token stream with known per-doc content (id = doc_id*100 + pos)
    val tokens = (0L until 40L).flatMap { d =>
      (0 until (d % 7 + 1).toInt).map(p => (d, p, 0, (d * 100 + p).toInt))
    }.toDF("doc_id", "pos", "subpos", "token_id")
    val out = java.nio.file.Files.createTempDirectory("graft-bin").toString
    val manifest = Export.writeTokenBin(tokens, "doc_id", out,
      tokensPerShard = 16)
    val shards = manifest.select("shard").as[Long].collect().sorted
    assert(shards.length > 3, shards.toSeq)
    // manifest accounting: bytes = 4 x tokens; totals conserve
    assert(manifest.filter(col("n_bytes") =!= col("n_tokens") * 4).isEmpty)
    assert(manifest.agg(sum("n_tokens")).head.getLong(0) == tokens.count())
    // full round-trip through the index: every doc's ids in order
    val back = Export.readTokenBin(
        spark.read.parquet(s"$out/idx"), "doc_id", out)
      .as[(Long, Seq[Int])].collect().toMap
    (0L until 40L).foreach { d =>
      val want = (0 until (d % 7 + 1).toInt).map(p => (d * 100 + p).toInt)
      assert(back(d) == want, s"doc $d: ${back(d)}")
    }
    // single-doc fetch: one positioned read, same answer
    val one = Export.readTokenBin(
        spark.read.parquet(s"$out/idx").filter(col("doc_id") === 13L),
        "doc_id", out)
      .as[(Long, Seq[Int])].collect().toMap
    assert(one == Map(13L -> Seq(1300, 1301, 1302, 1303, 1304, 1305, 1306)))
    // audit clean; re-run byte-identical (same sha1 per shard)
    assert(Export.auditTokenBin(spark, out).isEmpty)
    val out2 = java.nio.file.Files.createTempDirectory("graft-bin2").toString
    val m2 = Export.writeTokenBin(tokens.orderBy(col("token_id").desc),
      "doc_id", out2, tokensPerShard = 16)
    def sha(m: org.apache.spark.sql.DataFrame) =
      m.select("shard", "sha1").as[(Long, String)].collect().sorted.toSeq
    assert(sha(manifest) == sha(m2))
    // tamper: truncate one bin, bit-flip another, delete a third
    def binFile(s: Long) = new java.io.File(out, f"shard-$s%05d.bin")
    val raf = new java.io.RandomAccessFile(binFile(shards(0)), "rw")
    raf.setLength(raf.length() - 4); raf.close()
    val raf2 = new java.io.RandomAccessFile(binFile(shards(1)), "rw")
    raf2.seek(0); val b = raf2.read(); raf2.seek(0); raf2.write(b ^ 1); raf2.close()
    assert(binFile(shards(2)).delete())
    val bad = Export.auditTokenBin(spark, out)
      .select("shard").as[Long].collect().sorted.toSeq
    assert(bad == Seq(shards(0), shards(1), shards(2)), bad)
  }

  test("token-bin idx/ is shard-partitioned: one directory per shard, no single-task funnel, shard filter prunes") {
    val tokens = (0L until 40L).flatMap { d =>
      (0 until (d % 7 + 1).toInt).map(p => (d, p, 0, (d * 100 + p).toInt))
    }.toDF("doc_id", "pos", "subpos", "token_id")
    val out = java.nio.file.Files.createTempDirectory("graft-binidx").toString
    val manifest = Export.writeTokenBin(tokens, "doc_id", out, tokensPerShard = 16)
    val shards = manifest.select("shard").as[Long].collect().sorted
    // layout: idx/ holds one shard=K directory per manifest shard (the
    // per-document index never funnels through one task's file)
    val dirs = new java.io.File(out, "idx").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      .map(_.getName.stripPrefix("shard=").toLong).sorted
    assert(dirs.toSeq == shards.toSeq, s"idx dirs $dirs vs shards $shards")
    // the write plan has no single-partition exchange over the index
    assert(shards.length > 3)
    // a shard-filtered read prunes to that shard's directory (partition
    // pruning visible as a pushed partition filter — count stays right)
    val one = spark.read.parquet(s"$out/idx")
      .filter(col("shard") === shards(1))
    assert(one.count() > 0)
    assert(one.select("doc_id").distinct().count() == one.count())
    // and the positioned fetch still round-trips through the new layout
    val back = Export.readTokenBin(
        spark.read.parquet(s"$out/idx").filter(col("doc_id") === 13L),
        "doc_id", out)
      .as[(Long, Seq[Int])].collect().toMap
    assert(back == Map(13L -> Seq(1300, 1301, 1302, 1303, 1304, 1305, 1306)))
  }

  test("Megatron binary .idx: round-trips the parquet index row-for-row, byte-identical re-export, corrupt header fails loudly") {
    val tokens = (0L until 40L).flatMap { d =>
      (0 until (d % 7 + 1).toInt).map(p => (d, p, 0, (d * 100 + p).toInt))
    }.toDF("doc_id", "pos", "subpos", "token_id")
    val out = java.nio.file.Files.createTempDirectory("graft-mmidx").toString
    Export.writeTokenBin(tokens, "doc_id", out, tokensPerShard = 16)
    val m1 = Export.exportMegatronIdx(spark, out)
      .select("shard", "n_docs", "idx_bytes", "sha1")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(m1.nonEmpty)
    // round-trip: the binary index carries exactly the parquet idx's
    // (shard, offset, n_tokens) in layout (offset) order
    val back = Export.importMegatronIdx(spark, out)
      .select("shard", "offset", "n_tokens")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val pq = spark.read.parquet(s"$out/idx")
      .select(col("shard").cast("long"), col("offset").cast("long"),
        col("n_tokens").cast("long"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(back == pq)
    // seq is the offset-sorted position within its shard
    val seqs = Export.importMegatronIdx(spark, out)
      .select("shard", "seq").as[(Long, Long)].collect()
      .groupBy(_._1).values
    seqs.foreach(g => assert(g.map(_._2).sorted.toSeq == (0L until g.length).toSeq))
    // deterministic: re-export is byte-identical (same sha1 per shard)
    val m2 = Export.exportMegatronIdx(spark, out)
      .select("shard", "n_docs", "idx_bytes", "sha1")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(m1 == m2)
    // a corrupted header fails LOUDLY on import (drop the local-FS
    // checksum sidecar so the tamper reaches the parser, not Hadoop's
    // own checksum layer)
    val f = new java.io.File(out, f"shard-${m1.head._1}%05d.idx")
    new java.io.File(out, f".shard-${m1.head._1}%05d.idx.crc").delete()
    val raf = new java.io.RandomAccessFile(f, "rw")
    raf.seek(0); raf.write('X'); raf.close()
    val e = intercept[Exception] { Export.importMegatronIdx(spark, out).collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("bad magic")), messages(e))
  }

  test("packed-sequence binary shards: sequence order preserved, positioned fetch exact, Megatron idx round-trips, audit + determinism hold") {
    // a packed frame straight from the packing machinery: 30 docs of
    // varying length packed into budget-16 sequences
    val docs = (0L until 30L).map(d => (d, (d % 9 + 1).toInt))
      .toDF("doc_id", "ntok")
    val tokens = (0L until 30L).flatMap { d =>
      (0 until (d % 9 + 1).toInt).map(p => (d, p, 0, (d * 100 + p).toInt))
    }.toDF("doc_id", "pos", "subpos", "token_id")
    val packing = graft.ext.Packing.packContiguous(
      docs, "ntok", 16L, Seq(col("doc_id")))
    val packed = graft.ext.Packing.packTokenIds(tokens, "doc_id", packing, 16L)
    val want = packed.select("seq", "token_ids")
      .as[(Long, Seq[Int])].collect().sortBy(_._1).toSeq
    assert(want.length > 4)
    val out = java.nio.file.Files.createTempDirectory("graft-seqbin").toString
    val m1 = Export.writeSequenceBin(packed, out, seqsPerShard = 3)
    // manifest conserves; shards hold <= 3 sequences each
    assert(m1.agg(sum("n_tokens")).head.getLong(0) == want.map(_._2.size).sum)
    assert(m1.filter(col("n_docs") > 3).isEmpty)
    // positioned fetch: every sequence exact through the idx
    val back = Export.readTokenBin(
        spark.read.parquet(s"$out/idx"), "seq", out)
      .as[(Long, Seq[Int])].collect().toMap
    want.foreach { case (s, ids) => assert(back(s) == ids, s"seq $s") }
    // sequence ORDER inside a shard is the packing order: shard 0's raw
    // bytes are seqs 0,1,2 concatenated (packed data is order-defined)
    val bin0 = java.nio.file.Files.readAllBytes(
      new java.io.File(out, "shard-00000.bin").toPath)
    val bb = java.nio.ByteBuffer.wrap(bin0).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val flat0 = want.filter(_._1 < 3).flatMap(_._2)
    assert(bin0.length == flat0.size * 4)
    flat0.foreach(tok => assert(bb.getInt == tok))
    // the binary Megatron idx composes: round-trips the parquet idx
    Export.exportMegatronIdx(spark, out)
    val mm = Export.importMegatronIdx(spark, out)
      .select("shard", "offset", "n_tokens")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val pq = spark.read.parquet(s"$out/idx")
      .select(col("shard").cast("long"), col("offset").cast("long"),
        col("n_tokens").cast("long"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(mm == pq)
    // the BINARY index alone drives the fetch — a loader with no
    // engine parquet reader composes importMegatronIdx → readTokenBin
    // (seq identity = offset-sorted position, which IS the in-shard
    // sequence order here)
    val viaBinary = Export.readTokenBin(
        Export.importMegatronIdx(spark, out)
          .withColumn("gseq", col("shard") * 3 + col("seq"))
          .drop("seq").withColumnRenamed("gseq", "seq"),
        "seq", out)
      .as[(Long, Seq[Int])].collect().toMap
    want.foreach { case (s, ids) => assert(viaBinary(s) == ids, s"bin-idx seq $s") }
    // audit clean; deterministic re-run (permuted input, same bytes)
    assert(Export.auditTokenBin(spark, out).isEmpty)
    val out2 = java.nio.file.Files.createTempDirectory("graft-seqbin2").toString
    val m2 = Export.writeSequenceBin(packed.orderBy(col("seq").desc), out2,
      seqsPerShard = 3)
    def sha(m: org.apache.spark.sql.DataFrame) =
      m.select("shard", "sha1").as[(Long, String)].collect().sorted.toSeq
    assert(sha(m1) == sha(m2))
  }

  test("coalesceSpans: contiguous spans merge into one read, gaps and the byte cap split, order and content preserved") {
    // (id, offset, n): 0-2 contiguous, gap, 3-4 contiguous
    val spans = Seq((0L, 0L, 4), (1L, 4L, 2), (2L, 6L, 3),
      (10L, 100L, 5), (11L, 105L, 1))
    val runs = Export.coalesceSpans(spans, maxTokens = 1000L)
    assert(runs.map(_.map(_._1)) == Seq(Seq(0L, 1L, 2L), Seq(10L, 11L)))
    assert(runs.flatten == spans) // nothing lost, order preserved
    // the cap splits a contiguous run (4+2 <= 6, +3 would exceed)
    val capped = Export.coalesceSpans(spans.take(3), maxTokens = 6L)
    assert(capped.map(_.map(_._1)) == Seq(Seq(0L, 1L), Seq(2L)))
    // singletons and empty input
    assert(Export.coalesceSpans(Nil, 10L).isEmpty)
    assert(Export.coalesceSpans(Seq((7L, 3L, 2)), 1L) == Seq(Seq((7L, 3L, 2))))
  }

  test("readTokenBin rejects an n_tokens past the 2 GiB positioned-read bound instead of overflowing the buffer size") {
    val tokens = Seq((1L, 0, 0, 7)).toDF("doc_id", "pos", "subpos", "token_id")
    val out = java.nio.file.Files.createTempDirectory("graft-bigdoc").toString
    Export.writeTokenBin(tokens, "doc_id", out, tokensPerShard = 16)
    // an index row claiming a >Int.MaxValue/4 token count (e.g. from a
    // corrupted or foreign idx) must fail with the bound named, not
    // allocate a negative-size array
    val bogus = Seq((0L, 1L, 0L, (Int.MaxValue / 4 + 1L)))
      .toDF("shard", "doc_id", "offset", "n_tokens")
    val e = intercept[Exception] {
      Export.readTokenBin(bogus, "doc_id", out).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("positioned")), messages(e))
  }

  private def tokens40 = (0L until 40L).flatMap { d =>
    (0 until (d % 7 + 1).toInt).map(p => (d, p, 0, (d * 100 + p).toInt))
  }.toDF("doc_id", "pos", "subpos", "token_id")

  test("uint16 dtype: half the bytes, exact round-trip, Megatron dtype code 8, out-of-range ids rejected loudly") {
    val out16 = java.nio.file.Files.createTempDirectory("graft-u16").toString
    val out32 = java.nio.file.Files.createTempDirectory("graft-u16c").toString
    val m16 = Export.writeTokenBin(tokens40, "doc_id", out16,
      tokensPerShard = 16, dtype = "uint16")
    Export.writeTokenBin(tokens40, "doc_id", out32, tokensPerShard = 16)
    // manifest: dtype recorded, bytes exactly halved vs int32
    assert(m16.select("dtype").distinct().as[String].collect().toSeq == Seq("uint16"))
    assert(m16.filter(col("n_bytes") =!= col("n_tokens") * 2).isEmpty)
    assert(Export.binDtype(spark, out16) == "uint16" &&
      Export.binDtype(spark, out32) == "int32")
    // identical ids back from both dtypes; audit (byte-level) clean
    def back(o: String) = Export.readTokenBin(
        spark.read.parquet(s"$o/idx"), "doc_id", o)
      .as[(Long, Seq[Int])].collect().toMap
    assert(back(out16) == back(out32))
    assert(Export.auditTokenBin(spark, out16).isEmpty)
    // Megatron idx: dtype code 8 in the header byte, pointers in
    // 2-byte units — the binary round-trips the parquet idx exactly
    Export.exportMegatronIdx(spark, out16)
    val idxBytes = java.nio.file.Files.readAllBytes(
      new java.io.File(out16, "shard-00000.idx").toPath)
    assert(idxBytes(17) == 8, s"dtype byte ${idxBytes(17)}")
    val mm = Export.importMegatronIdx(spark, out16)
      .select("shard", "offset", "n_tokens")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val pq = spark.read.parquet(s"$out16/idx")
      .select(col("shard").cast("long"), col("offset").cast("long"),
        col("n_tokens").cast("long"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(mm == pq)
    // an id past 65535 must fail the write loudly, not truncate
    val big = Seq((1L, 0, 0, 70000)).toDF("doc_id", "pos", "subpos", "token_id")
    val outBad = java.nio.file.Files.createTempDirectory("graft-u16bad").toString
    val e = intercept[Exception] {
      Export.writeTokenBin(big, "doc_id", outBad, 16, dtype = "uint16")
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("uint16")), messages(e))
  }

  test("zero-row token export: idx/ stays readable (schema-carrying empty file), audit and Megatron export are clean no-ops") {
    val out = java.nio.file.Files.createTempDirectory("graft-bin0").toString
    val m = Export.writeTokenBin(tokens40.filter(lit(false)), "doc_id", out, 16)
    assert(m.count() == 0)
    // the r19 wart: partitionBy over zero rows left NO data file and
    // this read threw on schema inference
    val idx = spark.read.parquet(s"$out/idx")
    assert(idx.count() == 0 &&
      idx.columns.toSet == Set("shard", "doc_id", "offset", "n_tokens"))
    assert(Export.auditTokenBin(spark, out).isEmpty)
    assert(Export.exportMegatronIdx(spark, out).count() == 0)
  }

  test("appendTokenBin: only tail+new files written (untouched keep byte identity), audit clean over the union, replay is a no-op, Megatron refresh only touches the delta") {
    val out = java.nio.file.Files.createTempDirectory("graft-append").toString
    val m1 = Export.writeTokenBin(tokens40, "doc_id", out, tokensPerShard = 16)
    Export.exportMegatronIdx(spark, out)
    val shards1 = m1.select("shard").as[Long].collect().sorted
    val tail = shards1.max
    def binBytes(): Map[String, Seq[Byte]] =
      new java.io.File(out).listFiles().filter(_.getName.endsWith(".bin"))
        .map(f => f.getName ->
          java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
    def idxFiles(): Map[String, Seq[Byte]] =
      new java.io.File(out, "idx").listFiles().filter(_.isDirectory)
        .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath ->
          java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
    val binsBefore = binBytes()
    val idxBefore = idxFiles()
    // batch 2: 20 fresh docs
    val batch2 = (100L until 120L).flatMap { d =>
      (0 until (d % 5 + 1).toInt).map(p => (d, p, 0, (d * 100 + p).toInt))
    }.toDF("doc_id", "pos", "subpos", "token_id")
    val delta = Export.appendTokenBin(batch2, "doc_id", out, tokensPerShard = 16)
    val touched = delta.select("shard").as[Long].collect().sorted.toSeq
    assert(touched.nonEmpty && touched.head >= tail,
      s"append may only touch the tail or beyond: $touched (tail $tail)")
    // untouched bins byte-identical; touched tail (if touched) keeps
    // its old bytes as a PREFIX (old content + appended tokens)
    val binsAfter = binBytes()
    binsBefore.foreach { case (name, bytes) =>
      val shard = name.stripPrefix("shard-").stripSuffix(".bin").toLong
      if (touched.contains(shard))
        assert(binsAfter(name).take(bytes.size) == bytes, s"$name prefix")
      else assert(binsAfter(name) == bytes, s"$name identity")
    }
    // every pre-append idx parquet file survives byte-identical (the
    // append lands NEW files only)
    val idxAfter = idxFiles()
    idxBefore.foreach { case (path, bytes) =>
      assert(idxAfter.get(path).contains(bytes), s"idx file $path identity")
    }
    // audit clean across the union; all 60 docs round-trip exactly
    assert(Export.auditTokenBin(spark, out).isEmpty)
    val back = Export.readTokenBin(
        spark.read.parquet(s"$out/idx"), "doc_id", out)
      .as[(Long, Seq[Int])].collect().toMap
    assert(back.size == 60)
    (0L until 40L).foreach { d =>
      assert(back(d) == (0 until (d % 7 + 1).toInt).map(p => (d * 100 + p).toInt)) }
    (100L until 120L).foreach { d =>
      assert(back(d) == (0 until (d % 5 + 1).toInt).map(p => (d * 100 + p).toInt)) }
    // folded manifest on disk = untouched old rows + delta rows
    val folded = spark.read.parquet(s"$out/_manifest")
    assert(folded.agg(sum("n_tokens")).head.getLong(0) ==
      tokens40.count() + batch2.count())
    assert(folded.select("shard").as[Long].collect().sorted.toSeq ==
      (shards1.toSet ++ touched).toSeq.sorted)
    // Megatron refresh of ONLY the touched shards leaves every binary
    // idx (old untouched + refreshed delta) agreeing with the parquet
    Export.exportMegatronIdx(spark, out, onlyShards = touched)
    val mm = Export.importMegatronIdx(spark, out)
      .select("shard", "offset", "n_tokens")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val pq = spark.read.parquet(s"$out/idx")
      .select(col("shard").cast("long"), col("offset").cast("long"),
        col("n_tokens").cast("long"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(mm == pq)
    // replayed batch: every id already stored → empty delta, no writes
    val binsBeforeReplay = binBytes()
    val replay = Export.appendTokenBin(batch2, "doc_id", out, tokensPerShard = 16)
    assert(replay.count() == 0)
    assert(binBytes() == binsBeforeReplay)
    assert(Export.auditTokenBin(spark, out).isEmpty)
  }

  test("appendSequenceBin: sequences renumber past the stored count, tail fills, audit + round-trip hold, mismatched budget rejected") {
    val docs = (0L until 30L).map(d => (d, (d % 9 + 1).toInt))
      .toDF("doc_id", "ntok")
    val toks = (0L until 30L).flatMap { d =>
      (0 until (d % 9 + 1).toInt).map(p => (d, p, 0, (d * 100 + p).toInt))
    }.toDF("doc_id", "pos", "subpos", "token_id")
    val packing = graft.ext.Packing.packContiguous(docs, "ntok", 16L, Seq(col("doc_id")))
    val packed = graft.ext.Packing.packTokenIds(toks, "doc_id", packing, 16L)
    val out = java.nio.file.Files.createTempDirectory("graft-seqapp").toString
    val m1 = Export.writeSequenceBin(packed, out, seqsPerShard = 3)
    val nSeqs1 = m1.agg(sum("n_docs")).head.getLong(0)
    val want1 = packed.select("seq", "token_ids")
      .as[(Long, Seq[Int])].collect().sortBy(_._1).toSeq
    // batch 2: a fresh corpus packed independently (seq restarts at 0)
    val docs2 = (100L until 115L).map(d => (d, (d % 6 + 1).toInt))
      .toDF("doc_id", "ntok")
    val toks2 = (100L until 115L).flatMap { d =>
      (0 until (d % 6 + 1).toInt).map(p => (d, p, 0, (d * 100 + p).toInt))
    }.toDF("doc_id", "pos", "subpos", "token_id")
    val packed2 = graft.ext.Packing.packTokenIds(toks2, "doc_id",
      graft.ext.Packing.packContiguous(docs2, "ntok", 16L, Seq(col("doc_id"))), 16L)
    val want2 = packed2.select("seq", "token_ids")
      .as[(Long, Seq[Int])].collect().sortBy(_._1).toSeq
    val delta = Export.appendSequenceBin(packed2, out, seqsPerShard = 3)
    assert(delta.count() > 0)
    assert(Export.auditTokenBin(spark, out).isEmpty)
    // every sequence — stored and appended (shifted by nSeqs1) — exact
    val back = Export.readTokenBin(
        spark.read.parquet(s"$out/idx"), "seq", out)
      .as[(Long, Seq[Int])].collect().toMap
    assert(back.size == want1.size + want2.size)
    want1.foreach { case (s, ids) => assert(back(s) == ids, s"stored seq $s") }
    want2.foreach { case (s, ids) => assert(back(s + nSeqs1) == ids, s"new seq $s") }
    // a different seqsPerShard cannot silently corrupt the layout
    val e = intercept[Exception] {
      Export.appendSequenceBin(packed2.filter(lit(false)), out, seqsPerShard = 5)
    }
    assert(Option(e.getMessage).exists(_.contains("stored layout")), e.getMessage)
  }

  test("append follows the stored dtype (uint16) and the grouped layout starts at fresh shards") {
    // uint16 export + append: the append reads the element width from
    // the manifest — a mixed-width tail rewrite would corrupt every
    // offset after it
    val out = java.nio.file.Files.createTempDirectory("graft-u16app").toString
    Export.writeTokenBin(tokens40, "doc_id", out, 16, dtype = "uint16")
    val batch = (200L until 210L).flatMap { d =>
      (0 until 3).map(p => (d, p, 0, (d * 100 + p).toInt))
    }.toDF("doc_id", "pos", "subpos", "token_id")
    val delta = Export.appendTokenBin(batch, "doc_id", out, 16)
    assert(delta.select("dtype").distinct().as[String].collect().toSeq == Seq("uint16"))
    assert(delta.filter(col("n_bytes") =!= col("n_tokens") * 2).isEmpty)
    assert(Export.auditTokenBin(spark, out).isEmpty)
    val back = Export.readTokenBin(spark.read.parquet(s"$out/idx"), "doc_id", out)
      .as[(Long, Seq[Int])].collect().toMap
    assert(back.size == 50)
    assert(back(205L) == Seq(20500, 20501, 20502))
    // grouped append: every existing file (tail included) keeps byte
    // identity — the corpus-scale layout trades tail-filling for
    // window-free layout and only opens FRESH shards
    val outG = java.nio.file.Files.createTempDirectory("graft-gapp").toString
    val mG = Export.writeTokenBin(tokens40, "doc_id", outG, 16)
    val tailG = mG.agg(max("shard")).head.getLong(0)
    def allBins(o: String) = new java.io.File(o).listFiles()
      .filter(_.getName.endsWith(".bin"))
      .map(f => f.getName -> java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
    val before = allBins(outG)
    val dG = Export.appendTokenBin(batch, "doc_id", outG, 16, groups = 2)
    assert(dG.select("shard").as[Long].collect().forall(_ > tailG))
    assert(allBins(outG).view.filterKeys(before.contains).toMap == before)
    assert(Export.auditTokenBin(spark, outG).isEmpty)
  }

  test("appendSequenceBin composes with the Megatron idx refresh on only the touched shards") {
    val docs = (0L until 12L).map(d => (d, 4)).toDF("doc_id", "ntok")
    val toks = (0L until 12L).flatMap { d =>
      (0 until 4).map(p => (d, p, 0, (d * 100 + p).toInt))
    }.toDF("doc_id", "pos", "subpos", "token_id")
    val packed = graft.ext.Packing.packTokenIds(toks, "doc_id",
      graft.ext.Packing.packContiguous(docs, "ntok", 8L, Seq(col("doc_id"))), 8L)
    val out = java.nio.file.Files.createTempDirectory("graft-seqmm").toString
    Export.writeSequenceBin(packed, out, seqsPerShard = 2)
    Export.exportMegatronIdx(spark, out)
    val docs2 = (100L until 106L).map(d => (d, 4)).toDF("doc_id", "ntok")
    val toks2 = (100L until 106L).flatMap { d =>
      (0 until 4).map(p => (d, p, 0, (d * 100 + p).toInt))
    }.toDF("doc_id", "pos", "subpos", "token_id")
    val packed2 = graft.ext.Packing.packTokenIds(toks2, "doc_id",
      graft.ext.Packing.packContiguous(docs2, "ntok", 8L, Seq(col("doc_id"))), 8L)
    val delta = Export.appendSequenceBin(packed2, out, seqsPerShard = 2)
    val touched = delta.select("shard").as[Long].collect().sorted.toSeq
    Export.exportMegatronIdx(spark, out, onlyShards = touched)
    val mm = Export.importMegatronIdx(spark, out)
      .select("shard", "offset", "n_tokens")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val pq = spark.read.parquet(s"$out/idx")
      .select(col("shard").cast("long"), col("offset").cast("long"),
        col("n_tokens").cast("long"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(mm == pq && mm.nonEmpty)
    assert(Export.auditTokenBin(spark, out).isEmpty)
  }

  test("importMegatronIdx accepts a foreign monotone doc_idx (multi-sequence documents) and rejects a non-monotone one") {
    def craft(dir: String, docIdx: Seq[Long]): Unit = {
      val bos = new java.io.ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(bos)
      def u64(v: Long): Unit = o.write(java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array())
      def i32(v: Int): Unit = o.write(java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array())
      o.write("MMIDIDX".getBytes("US-ASCII")); o.write(0); o.write(0)
      u64(1L); o.writeByte(4)
      u64(3L); u64(docIdx.length.toLong)
      Seq(2, 3, 4).foreach(i32)          // sizes
      Seq(0L, 8L, 20L).foreach(u64)      // byte pointers (int32 units ×4)
      docIdx.foreach(u64)
      o.close()
      java.nio.file.Files.write(
        new java.io.File(dir, "shard-00000.idx").toPath, bos.toByteArray)
    }
    // Megatron-preprocessing style: doc 0 = seqs {0,1}, doc 1 = {2}
    val ok = java.nio.file.Files.createTempDirectory("graft-mmok").toString
    craft(ok, Seq(0L, 2L, 3L))
    val got = Export.importMegatronIdx(spark, ok)
      .select("seq", "offset", "n_tokens")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0L, 0L, 2L), (1L, 2L, 3L), (2L, 5L, 4L)))
    // non-monotone boundaries fail loudly
    val bad = java.nio.file.Files.createTempDirectory("graft-mmbad").toString
    craft(bad, Seq(0L, 3L, 2L, 3L))
    val e = intercept[Exception] {
      Export.importMegatronIdx(spark, bad).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("monotone")), messages(e))
  }

  test("epochShufflePlan: deterministic seeded block permutation, dense epoch_pos, content preserved, reads coalesce per block not per doc") {
    val out = java.nio.file.Files.createTempDirectory("graft-epoch").toString
    Export.writeTokenBin(tokens40, "doc_id", out, tokensPerShard = 16)
    val idx = spark.read.parquet(s"$out/idx")
    def planOf(seedV: Long) =
      Export.epochShufflePlan(idx, blockTokens = 8, epochSeed = seedV)
        .select(col("shard").cast("long"), col("doc_id").cast("long"),
          col("offset").cast("long"), col("n_tokens").cast("int"),
          col("block").cast("long"), col("epoch_pos").cast("long"))
        .as[(Long, Long, Long, Int, Long, Long)].collect()
    val p7 = planOf(7L)
    // dense permutation of every doc, deterministic per seed
    assert(p7.map(_._6).sorted.toSeq == (0L until p7.length).toSeq)
    assert(p7.map(_._2).sorted.toSeq == (0L until 40L).toSeq)
    assert(planOf(7L).map(r => r._2 -> r._6).toMap ==
      p7.map(r => r._2 -> r._6).toMap)
    // a different seed gives a different visit order
    assert(planOf(11L).map(r => r._2 -> r._6).toMap !=
      p7.map(r => r._2 -> r._6).toMap)
    // within a block epoch order IS offset order (the coalescing
    // invariant); a trainer reading in epoch order per shard pays ≤
    // one IO per BLOCK, far fewer than one per doc
    p7.groupBy(r => (r._1, r._5)).values.foreach { blk =>
      val inEpoch = blk.sortBy(_._6).map(_._3).toSeq
      assert(inEpoch == inEpoch.sorted, "offset order inside a block")
    }
    var runs = 0; var blocks = 0
    p7.groupBy(_._1).foreach { case (_, rows) =>
      val spans = rows.sortBy(_._6).map(r => (r._2, r._3, r._4)).toSeq
      runs += Export.coalesceSpans(spans, maxTokens = 1L << 20).size
      blocks += rows.map(_._5).distinct.size
    }
    assert(runs <= blocks, s"$runs runs > $blocks blocks")
    assert(runs < 40, s"coalescing must beat one read per doc ($runs)")
    // the shuffled plan fetches the same bytes
    val back = Export.readTokenBin(
        Export.epochShufflePlan(idx, 8, 7L), "doc_id", out)
      .as[(Long, Seq[Int])].collect().toMap
    (0L until 40L).foreach { d =>
      assert(back(d) == (0 until (d % 7 + 1).toInt).map(p => (d * 100 + p).toInt)) }
  }

  test("jsonl export: manifest identical to parquet's, gzip round-trip exact, audit clean, lost shard flagged") {
    val pq = java.nio.file.Files.createTempDirectory("graft-shards-pq").toString
    val jl = java.nio.file.Files.createTempDirectory("graft-shards-jl").toString
    val df = docsWithTok
    val mPq = Export.writeShards(df, "doc_id", "ntok", pq, tokensPerShard = 4000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDecimal(3))).toSeq
    val mJl = Export.writeShardsJsonl(df, "doc_id", "ntok", jl, tokensPerShard = 4000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDecimal(3))).toSeq
    // value checksums are format-independent: same frame, same manifest
    assert(mPq == mJl && mPq.nonEmpty)
    // gzip files, readable back as JSON with the writer's schema —
    // content round-trips exactly
    val files = new java.io.File(jl).listFiles()
      .filter(_.getName.startsWith("shard=")).flatMap(_.listFiles())
      .filter(_.getName.startsWith("part-"))
    assert(files.nonEmpty && files.forall(_.getName.endsWith(".txt.gz")))
    val back = spark.read.schema(df.schema).json(jl)
      .select("doc_id", "text", "ntok")
      .as[(Long, String, Int)].collect().toSet
    assert(back == df.as[(Long, String, Int)].collect().toSet)
    assert(Export.auditShardsJsonl(spark, jl, "doc_id", "ntok", df.schema)
      .count() == 0)
    // a lost shard directory is flagged
    val victim = new java.io.File(jl).listFiles()
      .filter(_.getName.startsWith("shard=")).head
    victim.listFiles().foreach(_.delete()); victim.delete()
    assert(Export.auditShardsJsonl(spark, jl, "doc_id", "ntok", df.schema)
      .count() >= 1)
  }
}
