package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.ext.WebDataset

/** WebDataset tar shards: ustar framing round-trip, null-field
  * skipping, sample grouping, truncation tolerance, and external
  * interchange (a real `tar` binary reads our shards). */
class WebDatasetSpec extends SparkTestBase {
  import spark.implicits._

  test("writeShards -> readEntries round-trips; null fields skipped; samples() groups per key") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wds").toString
    val df = Seq(
      ("a0", "alpha text", "{\"k\":0}"),
      ("a1", "beta — utf8 café", null: String), // no json entry
      ("a2", "", "{\"k\":2}")) // empty payload is a real 0-byte entry
      .toDF("key", "txt", "json")
    WebDataset.writeShards(df.repartition(2), "key",
      Seq("txt" -> col("txt"), "json" -> col("json")), dir)
    val entries = WebDataset.readEntries(spark, dir + "/*.tar")
    val got = entries.collect()
      .map(e => (e.key, e.ext, new String(e.payload, UTF_8))).toSet
    assert(got == Set(
      ("a0", "txt", "alpha text"), ("a0", "json", "{\"k\":0}"),
      ("a1", "txt", "beta — utf8 café"),
      ("a2", "txt", ""), ("a2", "json", "{\"k\":2}")))
    // per-sample grouping: one row per key, fields as a map
    val s = WebDataset.samples(entries).collect()
      .map(r => r.getString(0) ->
        r.getMap[String, Array[Byte]](1).view.mapValues(new String(_, UTF_8)).toMap)
      .toMap
    assert(s.keySet == Set("a0", "a1", "a2"))
    assert(s("a1") == Map("txt" -> "beta — utf8 café"))
    assert(s("a2")("txt") == "")
    // entries of one sample are CONSECUTIVE in the shard, declared order
    val inOrder = entries.collect().groupBy(_.shard).values.flatMap(_.toSeq)
    val a0 = inOrder.filter(_.key == "a0").map(_.ext).toSeq
    assert(a0 == Seq("txt", "json"))
  }

  test("interchange: the system tar lists and extracts our shards byte-faithfully") {
    val tarBin = Seq("/usr/bin/tar", "/bin/tar").find(p => new java.io.File(p).canExecute)
    assume(tarBin.isDefined, "no tar binary on this host")
    val dir = java.nio.file.Files.createTempDirectory("graft-wds2").toString
    WebDataset.writeShards(
      Seq(("k1", "payload one"), ("k2", "payload two")).toDF("key", "txt")
        .repartition(1),
      "key", Seq("txt" -> col("txt")), dir)
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).head
    def run(args: String*): (Int, String) = {
      val pb = new ProcessBuilder((tarBin.get +: args): _*)
      pb.redirectErrorStream(true)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), UTF_8)
      (p.waitFor(), out)
    }
    val (lc, listing) = run("-tf", shard.getAbsolutePath)
    assert(lc == 0, listing)
    assert(listing.split("\n").map(_.trim).filter(_.nonEmpty).sorted.toSeq ==
      Seq("k1.txt", "k2.txt"))
    val xd = java.nio.file.Files.createTempDirectory("graft-wds2x").toString
    val (xc, xout) = run("-xf", shard.getAbsolutePath, "-C", xd)
    assert(xc == 0, xout)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(xd, "k1.txt")), UTF_8) == "payload one")
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(xd, "k2.txt")), UTF_8) == "payload two")
  }

  test("writeShardsBySize: non-final shards within [0.5, 1.5]x target; round-trip complete; samples never split") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wds-size").toString
    // 400 samples x ~1.5 KiB tar bytes each, 16 KiB target -> ~38 shards
    val df = (0 until 400)
      .map(i => (f"k$i%04d", "x" * (400 + (i % 7) * 64), s"m$i"))
      .toDF("key", "txt", "meta")
    WebDataset.writeShardsBySize(df.repartition(8), "key",
      Seq("txt" -> col("txt"), "meta" -> col("meta")), dir,
      targetBytes = 16384)
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).sortBy(_.getName)
    assert(shards.length > 5, s"expected many shards, got ${shards.length}")
    // every shard but the last (highest id, the prefix-sum tail) sits
    // within [0.5, 1.5] of the byte target; sizes exclude the 1 KiB
    // end-of-archive trailer the assignment doesn't model
    shards.init.foreach { f =>
      val payload = f.length() - 1024
      assert(payload >= 8192 && payload <= 24576,
        s"${f.getName}: $payload bytes off [0.5x, 1.5x] of 16384")
    }
    // round-trip: every sample back, both fields, exactly once
    val back = WebDataset.samples(
      WebDataset.readEntries(spark, dir + "/*.tar")).collect()
    assert(back.length == 400)
    back.foreach { r =>
      val m = r.getMap[String, Array[Byte]](1)
      assert(m.keysIterator.toSet == Set("txt", "meta"), r.getString(0))
    }
    // the scale claim, plan-asserted: the assignment never plans a
    // GLOBAL row sort over the corpus — the only range exchange
    // belongs to the metadata bucket-total window (sized <= 65536),
    // whose sort key is the bucket id, never the per-row draw
    val assigned = WebDataset.assignShardsBySize(df, "key",
      Seq("txt" -> col("txt"), "meta" -> col("meta")), 16384, "wds-shards")
    assigned.collect()
    val plan = assigned.queryExecution.executedPlan.toString
    val rangeExchanges = "rangepartitioning\\(([^)]*)".r
      .findAllMatchIn(plan.toLowerCase).map(_.group(1)).toSeq
    assert(rangeExchanges.forall(k => k.contains("__bkt") && !k.contains("__d")),
      s"global-order exchange over corpus rows:\n$plan")
    // determinism: a re-run with the same seed lands identical shards
    val dir2 = java.nio.file.Files.createTempDirectory("graft-wds-size2").toString
    WebDataset.writeShardsBySize(df.repartition(3), "key",
      Seq("txt" -> col("txt"), "meta" -> col("meta")), dir2,
      targetBytes = 16384)
    val names2 = new java.io.File(dir2).listFiles()
      .filter(_.getName.endsWith(".tar")).map(_.getName).sorted.toSeq
    assert(names2 == shards.map(_.getName).toSeq)
  }

  test("binary fields round-trip byte-exactly (PNG with NULs + all byte values)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wds-bin").toString
    // a real PNG and a worst-case blob covering every byte value
    val png = graft.ext.Multimodal.ImageIoCodec.syntheticPng(7L, 11, 9)
    val blob = Array.tabulate[Byte](1024)(i => i.toByte)
    val rows = Seq(("s0", png, "caption zero"), ("s1", blob, "caption one"))
    val df = spark.createDataFrame(rows).toDF("key", "img", "txt")
    WebDataset.writeShards(df.repartition(1), "key",
      Seq("png" -> col("img"), "txt" -> col("txt")), dir)
    val back = WebDataset.samples(WebDataset.readEntries(spark, dir + "/*.tar"))
      .collect().map(r => r.getString(0) -> r.getMap[String, Array[Byte]](1)).toMap
    assert(java.util.Arrays.equals(back("s0")("png"), png))
    assert(java.util.Arrays.equals(back("s1")("png"), blob))
    assert(new String(back("s0")("txt"), UTF_8) == "caption zero")
    // the decoded image survives the tar round-trip content-identically
    assert(graft.ext.Multimodal.ImageIoCodec.checksum(back("s0")("png")) ==
      graft.ext.Multimodal.ImageIoCodec.checksum(png))
  }

  test("corrupt/oversized tar size field stops the parse cleanly instead of throwing") {
    val good = WebDataset.header("ok.txt", 4L) ++ "dat\n".getBytes(UTF_8) ++
      new Array[Byte](508)
    // an entry claiming > Int.MaxValue bytes (legal ustar, unsupported):
    // must stop the iterator, not NegativeArraySizeException
    val huge = WebDataset.header("huge.bin", 3000000000L)
    val bytes = good ++ huge ++ new Array[Byte](1024)
    val parsed = WebDataset.parseStream(
      new java.io.ByteArrayInputStream(bytes)).toSeq
    assert(parsed.map(_._1) == Seq("ok.txt"))
  }

  test("samples(): duplicate (key, ext) across shards dedups deterministically instead of throwing on map build") {
    // two shards carrying the SAME (key, ext) — an overlapping re-run
    // or a foreign tar; mapKeyDedupPolicy=EXCEPTION would throw at
    // map_from_entries without the pre-dedup
    val dir = java.nio.file.Files.createTempDirectory("graft-wds-dup").toString
    def shard(name: String, payload: String): Unit = {
      val b = WebDataset.header("k1.txt", payload.length.toLong) ++
        payload.getBytes(UTF_8) ++
        new Array[Byte]((512 - payload.length % 512) % 512) ++
        new Array[Byte](1024)
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name), b)
    }
    shard("shard-00000.tar", "from-shard-0")
    shard("shard-00001.tar", "from-shard-1")
    val s = WebDataset.samples(WebDataset.readEntries(spark, dir + "/*.tar"))
      .collect()
    assert(s.length == 1)
    // deterministic winner: lexicographically first (shard, payload)
    assert(new String(s.head.getMap[String, Array[Byte]](1)
      .apply("txt"), UTF_8) == "from-shard-0")
  }

  test("readEntries: partial consumption (limit 1) leaves no open shard stream") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wds-fd").toString
    WebDataset.writeShards(
      (0 until 64).map(i => (s"k$i", "y" * 2048)).toDF("key", "txt")
        .repartition(4),
      "key", Seq("txt" -> col("txt")), dir)
    val one = WebDataset.readEntries(spark, dir + "/*.tar").limit(1).collect()
    assert(one.length == 1)
    // the task-completion listener must have closed the shard streams:
    // no fd of this JVM may still point into the shard dir
    val fdDir = new java.io.File("/proc/self/fd")
    assume(fdDir.isDirectory, "no /proc on this host")
    val leaked = fdDir.listFiles().flatMap { f =>
      try Some(java.nio.file.Files.readSymbolicLink(f.toPath).toString)
      catch { case _: java.io.IOException => None }
    }.filter(_.startsWith(dir))
    assert(leaked.isEmpty, s"leaked fds: ${leaked.toSeq}")
  }

  test("AtomicSink: a duplicate attempt can never interleave — one complete file wins") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("graft-atomic").toString
    val dest = new Path(dir, "part-00000.bin")
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // attempt 1 writes and commits
    graft.ext.AtomicSink.writeCommitted(fs, dest, attemptId = 1L) { tmp =>
      val o = fs.create(tmp, true); o.write("attempt-one".getBytes(UTF_8)); o.close()
    }
    // attempt 2 (speculative duplicate) writes its OWN temp file —
    // never the final path — and commits a complete replacement
    graft.ext.AtomicSink.writeCommitted(fs, dest, attemptId = 2L) { tmp =>
      assert(tmp.getName != dest.getName && tmp.getName.startsWith("."))
      assert(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "part-00000.bin")), UTF_8) == "attempt-one",
        "winner must stay complete while the duplicate writes")
      val o = fs.create(tmp, true); o.write("attempt-two".getBytes(UTF_8)); o.close()
    }
    // (the Hadoop local FS writes .crc checksum siblings — those are
    // the filesystem's own bookkeeping, renamed with the file)
    def visible() = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.endsWith(".crc")).toSeq
    assert(visible() == Seq("part-00000.bin"), s"litter: ${visible()}")
    val content = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "part-00000.bin")), UTF_8)
    assert(content == "attempt-one" || content == "attempt-two")
    // a FAILED attempt aborts its temp and leaves the winner untouched
    intercept[RuntimeException] {
      graft.ext.AtomicSink.writeCommitted(fs, dest, attemptId = 3L) { tmp =>
        val o = fs.create(tmp, true); o.write("partial".getBytes(UTF_8)); o.close()
        throw new RuntimeException("task died")
      }
    }
    assert(visible() == Seq("part-00000.bin"))
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "part-00000.bin")), UTF_8) == content)
  }

  test("reader tolerance: truncated tail stops cleanly; foreign tar (dirs + long padding) parses the regular files") {
    // build a shard, truncate mid-entry: the parsed prefix survives
    val dir = java.nio.file.Files.createTempDirectory("graft-wds3").toString
    WebDataset.writeShards(
      (0 until 8).map(i => (s"k$i", "x" * (100 + i))).toDF("key", "txt")
        .repartition(1),
      "key", Seq("txt" -> col("txt")), dir)
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).head
    val bytes = java.nio.file.Files.readAllBytes(shard.toPath)
    val cut = java.util.Arrays.copyOf(bytes, bytes.length - 1536 - 100)
    val parsed = WebDataset.parseStream(
      new java.io.ByteArrayInputStream(cut)).toSeq
    assert(parsed.nonEmpty && parsed.size < 8)
    assert(parsed.forall { case (n, d) => n.startsWith("k") && d.nonEmpty })
  }

  test("tar manifest + audit: clean export audits empty; lost shard and truncated shard both flagged; checksums match the parquet export's") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wdsman").toString
    val df = (0 until 60).map(i =>
      (f"s$i%03d", s"text body $i " + ("x" * (i * 7 % 300)),
        if (i % 5 == 0) null else s"""{"i":$i}"""))
      .toDF("key", "txt", "json")
    val manifest = WebDataset.writeShardsBySizeWithManifest(df, "key",
      Seq("txt" -> col("txt"), "json" -> col("json")), dir,
      targetBytes = 8192)
    assert(manifest.agg(sum("n_samples")).head.getLong(0) == 60)
    // intact export: audit has nothing to flag
    assert(WebDataset.auditTarShards(spark, dir).count() == 0)
    // the manifest is over COLUMN VALUES: the parquet Export of the
    // same frame with the same term layout carries the same corpus
    // checksum (xxhash64 agrees across a string and its binary cast)
    val pq = java.nio.file.Files.createTempDirectory("graft-wdsman-pq").toString
    val pman = graft.ext.Export.writeShards(
      df.withColumn("ntok", lit(1L)), "key", "ntok", pq,
      tokensPerShard = 20, checksumCols = Seq("key", "txt", "json"))
    val tarSum = manifest.agg(sum("checksum")).head.getDecimal(0)
    val pqSum = pman.agg(sum("checksum")).head.getDecimal(0)
    assert(tarSum.compareTo(pqSum) == 0, s"tar=$tarSum parquet=$pqSum")
    // LOST shard: delete one tar — audit flags exactly that shard row
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.matches("shard-\\d+\\.tar")).sortBy(_.getName)
    assert(shards.length >= 2, shards.map(_.getName).toSeq)
    val lostId = shards.head.getName.stripPrefix("shard-")
      .stripSuffix(".tar").toLong
    assert(shards.head.delete())
    val flaggedLost = WebDataset.auditTarShards(spark, dir)
      .select("shard").as[Long].collect().toSet
    assert(flaggedLost == Set(lostId), flaggedLost)
    // TRUNCATED shard: cut the tail of another — flagged too
    val victim = shards(1)
    val bytes = java.nio.file.Files.readAllBytes(victim.toPath)
    java.nio.file.Files.write(victim.toPath,
      java.util.Arrays.copyOfRange(bytes, 0, bytes.length / 2))
    val flagged2 = WebDataset.auditTarShards(spark, dir)
      .select("shard").as[Long].collect().toSet
    val truncId = victim.getName.stripPrefix("shard-")
      .stripSuffix(".tar").toLong
    assert(flagged2 == Set(lostId, truncId), flagged2)
  }

  test("writeShardsWithManifest (partition-per-shard): manifest matches landed shards, audit clean") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wdsman2").toString
    val df = (0 until 30).map(i => (f"p$i%03d", s"payload $i"))
      .toDF("key", "txt")
    val manifest = WebDataset.writeShardsWithManifest(df.repartition(3),
      "key", Seq("txt" -> col("txt")), dir)
    assert(manifest.count() == 3)
    assert(manifest.agg(sum("n_samples")).head.getLong(0) == 30)
    assert(WebDataset.auditTarShards(spark, dir).count() == 0)
    // the landed tar bytes really are the manifest's n_bytes plus the
    // fixed tar close (2 zero blocks)
    val sizes = new java.io.File(dir).listFiles()
      .filter(_.getName.matches("shard-\\d+\\.tar"))
      .map(f => f.getName.stripPrefix("shard-").stripSuffix(".tar").toLong ->
        f.length()).toMap
    manifest.collect().foreach { r =>
      assert(sizes(r.getLong(0)) == r.getLong(2) + 2 * 512,
        s"shard ${r.getLong(0)}")
    }
  }
}
