package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.ext.Warc

/** The DataSource V2 `warc` format: short-name registration, parity
  * with Warc.read, per-file partitions, and column pruning that skips
  * payload ALLOCATION (the metadata-pass contract). */
class WarcSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def record(typ: String, uri: String, payload: String): Array[Byte] = {
    val pb = payload.getBytes(UTF_8)
    (s"WARC/1.0\r\nWARC-Type: $typ\r\nWARC-Target-URI: $uri\r\n" +
      "WARC-Date: 2026-08-15T00:00:00Z\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${pb.length}\r\n\r\n").getBytes(UTF_8) ++
      pb ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  test("format(\"warc\"): parity with Warc.read on plain + gzip files; per-file partitions") {
    val dir = java.nio.file.Files.createTempDirectory("warcsource").toFile
    try {
      java.nio.file.Files.write(new java.io.File(dir, "a.warc").toPath,
        record("response", "https://a.example/1", "HTTP/1.1 200 OK\r\n\r\nbody one") ++
          record("response", "https://a.example/2", "HTTP/1.1 200 OK\r\n\r\nbody two"))
      java.nio.file.Files.write(new java.io.File(dir, "b.warc.gz").toPath,
        gz(record("warcinfo", "", "software: test\n")))
      val glob = dir.getAbsolutePath + "/*"
      val viaSource = spark.read.format("warc").load(glob)
      val viaReader = Warc.read(spark, glob).toDF()
      val key = (df: org.apache.spark.sql.DataFrame) => df
        .select(col("path"), col("idx"), col("warc_type"), col("target_uri"),
          col("content_length"), col("payload").cast("string"))
        .as[(String, Long, String, String, Long, String)].collect().toSet
      assert(key(viaSource) == key(viaReader) && key(viaSource).size == 3)
      // one partition per file
      assert(viaSource.rdd.getNumPartitions == 2)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete(): Unit
    }
  }

  test("column pruning reaches the reader: payload-free scans report declared lengths; pruned schema in the plan") {
    val dir = java.nio.file.Files.createTempDirectory("warcsource2").toFile
    try {
      java.nio.file.Files.write(new java.io.File(dir, "a.warc").toPath,
        record("response", "https://p.example/x", "0123456789"))
      val pruned = spark.read.format("warc").load(dir.getAbsolutePath + "/*")
        .select("target_uri", "content_length")
      val rows = pruned.collect()
      assert(rows.length == 1 && rows.head.getString(0) == "https://p.example/x" &&
        rows.head.getLong(1) == 10L) // declared length, payload never allocated
      // the scan itself carries only the required columns
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
      def scans(p: SparkPlan): Seq[BatchScanExec] = p match {
        case b: BatchScanExec => Seq(b)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: QueryStageExec => scans(q.plan)
        case other => other.children.flatMap(scans)
      }
      val s = scans(pruned.queryExecution.executedPlan)
      assert(s.nonEmpty, "no BatchScanExec found")
      assert(s.head.output.map(_.name).toSet == Set("target_uri", "content_length"),
        s"scan not pruned: ${s.head.output.map(_.name)}")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete(): Unit
    }
  }

  test(".warc.zst transport: multi-frame zstd parses like multi-member gzip, through the source too") {
    val dir = java.nio.file.Files.createTempDirectory("warcsource-zst").toFile
    try {
      // one zstd FRAME per record, concatenated — the splittable layout
      val r1 = com.github.luben.zstd.Zstd.compress(
        record("response", "https://z.example/1", "HTTP/1.1 200 OK\r\n\r\nzst one"), 3)
      val r2 = com.github.luben.zstd.Zstd.compress(
        record("response", "https://z.example/2", "HTTP/1.1 200 OK\r\n\r\nzst two"), 3)
      java.nio.file.Files.write(new java.io.File(dir, "a.warc.zst").toPath, r1 ++ r2)
      val direct = Warc.parseBytes(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, "a.warc.zst").toPath)).toSeq
      assert(direct.map(_.header("WARC-Target-URI").get) ==
        Seq("https://z.example/1", "https://z.example/2"))
      val viaSource = spark.read.format("warc").load(dir.getAbsolutePath + "/*")
        .select(col("target_uri"), col("payload").cast("string"))
        .as[(String, String)].collect().toMap
      assert(viaSource == Map(
        "https://z.example/1" -> "HTTP/1.1 200 OK\r\n\r\nzst one",
        "https://z.example/2" -> "HTTP/1.1 200 OK\r\n\r\nzst two"))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete(): Unit
    }
  }

  test("multiple load paths and the full pipeline compose: source -> htmlResponses-style filtering") {
    val d1 = java.nio.file.Files.createTempDirectory("warcsource3a").toFile
    val d2 = java.nio.file.Files.createTempDirectory("warcsource3b").toFile
    try {
      java.nio.file.Files.write(new java.io.File(d1, "a.warc").toPath,
        record("response", "https://m.example/1",
          "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>Hello body</p>"))
      java.nio.file.Files.write(new java.io.File(d2, "b.warc").toPath,
        record("response", "https://m.example/2",
          "HTTP/1.1 404 NF\r\nContent-Type: text/html\r\n\r\n<p>gone</p>"))
      val df = spark.read.format("warc")
        .load(d1.getAbsolutePath + "/*", d2.getAbsolutePath + "/*")
      assert(df.count() == 2)
      val kept = df
        .filter(Warc.httpStatus(col("payload")) === 200 &&
          Warc.isHtmlResponse(col("payload")))
        .select(col("target_uri"), Warc.httpBodyText(col("payload")).as("html"))
        .as[(String, String)].collect().toSeq
      assert(kept == Seq(("https://m.example/1", "<p>Hello body</p>")))
    } finally {
      Seq(d1, d2).foreach { d => d.listFiles().foreach(_.delete()); d.delete() }
      ()
    }
  }

  test("filter pushdown reaches the reader: non-matching payloads never allocate; idx stays global; plan shows PushedFilters") {
    val dir = java.nio.file.Files.createTempDirectory("warcsource4").toFile
    try {
      // a mixed file, the CommonCrawl layout: request + response +
      // metadata per capture — a response-only metadata pass over it
      // is the dominant-CPU case pushdown exists for
      val reqBody = "GET /x HTTP/1.1\r\nHost: f.example\r\n\r\n"
      val metaBody = "fetchTimeMs: 120\r\n"
      val resp1 = "HTTP/1.1 200 OK\r\n\r\n" + ("A" * 1000)
      val resp2 = "HTTP/1.1 200 OK\r\n\r\n" + ("B" * 1000)
      java.nio.file.Files.write(new java.io.File(dir, "mixed.warc").toPath,
        record("request", "https://f.example/1", reqBody) ++
          record("response", "https://f.example/1", resp1) ++
          record("metadata", "https://f.example/1", metaBody) ++
          record("request", "https://f.example/2", reqBody) ++
          record("response", "https://f.example/2", resp2) ++
          record("metadata", "https://f.example/2", metaBody))
      val q = spark.read.format("warc").load(dir.getAbsolutePath + "/*")
        .filter(col("warc_type") === "response")
        .select("idx", "target_uri", "payload")
      // the pushed filter is visible in the scan's plan description
      assert(q.queryExecution.executedPlan.toString.contains("PushedFilters"),
        q.queryExecution.executedPlan.toString)
      val before = graft.ext.Warc.payloadBytesAllocated.get()
      val rows = q.collect().sortBy(_.getLong(0))
      val allocated = graft.ext.Warc.payloadBytesAllocated.get() - before
      // idx is the GLOBAL record index (1, 4) — pushdown must return
      // exactly what a post-scan filter would
      assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 4L))
      assert(rows.map(r => new String(r.getAs[Array[Byte]]("payload"), UTF_8)).toSeq ==
        Seq(resp1, resp2))
      // ONLY the two matching response payloads were ever allocated —
      // requests and metadata took the skip path despite `payload`
      // being projected
      assert(allocated == resp1.getBytes(UTF_8).length + resp2.getBytes(UTF_8).length,
        s"allocated $allocated")
      // parity with the unpushed path on every column
      val unpushed = spark.read.format("warc").load(dir.getAbsolutePath + "/*")
        .collect().filter(_.getAs[String]("warc_type") == "response")
        .sortBy(_.getAs[Long]("idx"))
      assert(unpushed.map(_.getAs[Long]("idx")).toSeq == Seq(1L, 4L))
      // composite shapes: prefix + length range + disjunction
      val n = spark.read.format("warc").load(dir.getAbsolutePath + "/*")
        .filter(col("target_uri").startsWith("https://f.example/2") &&
          col("content_length") > 100L)
        .count()
      assert(n == 1L) // only /2's response clears 100 bytes
      val disj = spark.read.format("warc").load(dir.getAbsolutePath + "/*")
        .filter(col("warc_type") === "metadata" || col("warc_type") === "request")
      assert(disj.queryExecution.executedPlan.toString.contains("PushedFilters"))
      assert(disj.count() == 4L)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete(): Unit
    }
  }

  test("paths option parses as real JSON: commas inside a path (glob alternation) survive") {
    // the DSv2 multi-load convention serializes paths as a JSON array;
    // a hand-split on ',' would shred '/x/{a,b}/*.warc.gz'
    val got = graft.sources.WarcDataSource.pathsOf(Map(
      "paths" -> """["/x/{a,b}/*.warc.gz","/y/plain, with space.warc"]"""))
    assert(got == Seq("/x/{a,b}/*.warc.gz", "/y/plain, with space.warc"))
    val single = graft.sources.WarcDataSource.pathsOf(Map("path" -> "/z/*.warc"))
    assert(single == Seq("/z/*.warc"))
    intercept[IllegalArgumentException](
      graft.sources.WarcDataSource.pathsOf(Map.empty))
  }

  test("streaming offset is COMPACT: O(1) batch-id JSON per trigger, file lists in the source log; restart-resume across 3 triggers") {
    import org.apache.spark.sql.streaming.Trigger
    val warcDir = java.nio.file.Files.createTempDirectory("graft-ckoff").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-ckoff-out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-ckoff-ck").toString
    def drop(name: String, uris: String*): Unit = {
      val f = new java.io.FileOutputStream(s"$warcDir/$name")
      val w = new Warc.MemberGzipWriter(f)
      try uris.foreach(u => w.writeMember(record("response", u, "HTTP/1.1 200 OK\r\n\r\nbody")))
      finally { w.end(); f.close() }
    }
    def runOnce(): Unit = {
      val q = spark.readStream.format("warc").load(warcDir + "/*.warc.gz")
        .select("path", "target_uri")
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // three restarts, each with one new file — each must resume from
    // the checkpointed batch id alone and consume exactly the new file
    drop("d1.warc.gz", "https://o.example/1", "https://o.example/2")
    runOnce()
    drop("d2.warc.gz", "https://o.example/3")
    runOnce()
    drop("d3.warc.gz", "https://o.example/4")
    runOnce()
    val got = spark.read.parquet(outDir).select("target_uri")
      .as[String].collect().sorted.toSeq
    assert(got == (1 to 4).map(i => s"https://o.example/$i"))
    // the WAL offsets Spark rewrites per trigger are O(1) — a batch id,
    // NOT the file list (the pre-compaction format grew with the corpus)
    val offsetsDir = new java.io.File(ckDir, "offsets")
    val offsetFiles = offsetsDir.listFiles().filter(_.getName.matches("\\d+"))
    assert(offsetFiles.length >= 3)
    offsetFiles.foreach { f =>
      val body = new String(java.nio.file.Files.readAllBytes(f.toPath), UTF_8)
      val line = body.split("\n").last.trim
      assert(line.matches("""\{"batch":-?\d+\}"""), s"${f.getName}: $line")
      assert(line.length <= 24)
    }
    // the compacted log: one file per non-empty batch, each a JSON array
    val logDir = new java.io.File(s"$ckDir/sources/0/warc-file-log")
    val logs = logDir.listFiles().filter(_.getName.matches("\\d+")).sortBy(_.getName.toLong)
    assert(logs.map(_.getName).toSeq == Seq("0", "1", "2"), logs.mkString(","))
    val logged = logs.flatMap { f =>
      // delta entries are [path, modTime] pairs (legacy bare strings
      // still parse on the read side; new logs always write pairs)
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
        java.nio.file.Files.readAllBytes(f.toPath))
      (0 until node.size).map { i =>
        val e = node.get(i)
        if (e.isTextual) e.asText() else e.get(0).asText()
      }
    }
    assert(logged.map(p => p.substring(p.lastIndexOf('/') + 1)).sorted.toSeq ==
      Seq("d1.warc.gz", "d2.warc.gz", "d3.warc.gz"))
    // replay with no new files: a no-op (offset does not advance)
    runOnce()
    assert(spark.read.parquet(outDir).count() == 4)
    assert(logDir.listFiles().count(_.getName.matches("\\d+")) == 3)
  }

  test("admission control: maxFilesPerTrigger=k drains N files in ceil(N/k) batches, across restarts; replay no-op") {
    import org.apache.spark.sql.streaming.Trigger
    val warcDir = java.nio.file.Files.createTempDirectory("graft-adm").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-adm-out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-adm-ck").toString
    def drop(name: String, uri: String): Unit = {
      val f = new java.io.FileOutputStream(s"$warcDir/$name")
      val w = new Warc.MemberGzipWriter(f)
      try w.writeMember(record("response", uri, "HTTP/1.1 200 OK\r\n\r\nbody")): Unit
      finally { w.end(); f.close() }
    }
    // a COLD START over an existing 5-file archive — the unbounded-
    // first-batch hazard admission control exists for
    (1 to 5).foreach(i => drop(f"d$i%02d.warc.gz", s"https://adm.example/$i"))
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    def runOnce(): Unit = {
      val q = spark.readStream.format("warc")
        .option("maxFilesPerTrigger", 2)
        .load(warcDir + "/*.warc.gz")
        .select("path", "target_uri")
        .writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val n = b.select("path").distinct().count()
          batchSizes.synchronized { batchSizes += n }
          b.write.mode("append").parquet(outDir)
        }
        .option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    // 5 files at 2/trigger = 3 batches (2, 2, 1 files)
    assert(batchSizes.sorted.toSeq == Seq(1L, 2L, 2L), batchSizes.toSeq)
    assert(spark.read.parquet(outDir).count() == 5)
    // restart with 3 new files: 2 more batches, nothing re-read
    batchSizes.clear()
    (6 to 8).foreach(i => drop(f"d$i%02d.warc.gz", s"https://adm.example/$i"))
    runOnce()
    assert(batchSizes.sorted.toSeq == Seq(1L, 2L), batchSizes.toSeq)
    val got = spark.read.parquet(outDir).select("target_uri")
      .as[String].collect().sorted.toSeq
    assert(got == (1 to 8).map(i => s"https://adm.example/$i").sorted)
    // the per-batch log: one file per admitted batch, none over the cap
    val logDir = new java.io.File(s"$ckDir/sources/0/warc-file-log")
    val logs = logDir.listFiles().filter(_.getName.matches("\\d+"))
    assert(logs.length == 5) // 3 + 2 batches
    logs.foreach { f =>
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
        java.nio.file.Files.readAllBytes(f.toPath))
      assert(node.size <= 2, s"${f.getName}: ${node.size} files")
    }
    // replay with no new files: a no-op
    batchSizes.clear()
    runOnce()
    assert(batchSizes.isEmpty || batchSizes.forall(_ == 0L), batchSizes.toSeq)
    assert(spark.read.parquet(outDir).count() == 8)
  }

  test("byte-based admission: maxBytesPerTrigger splits on the byte budget; an over-budget single file still flows") {
    import org.apache.spark.sql.streaming.Trigger
    val warcDir = java.nio.file.Files.createTempDirectory("graft-badm").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-badm-out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-badm-ck").toString
    def drop(name: String, uri: String, bodyLen: Int): Unit = {
      val f = new java.io.FileOutputStream(s"$warcDir/$name")
      val w = new Warc.MemberGzipWriter(f)
      // incompressible body so the on-disk size tracks bodyLen
      val rnd = new java.util.Random(uri.hashCode.toLong)
      val body = new Array[Byte](bodyLen); rnd.nextBytes(body)
      try w.writeMember(record("response", uri,
        "HTTP/1.1 200 OK\r\n\r\n") ++ body): Unit
      finally { w.end(); f.close() }
    }
    // ~8 KB each; one 40 KB whale
    (1 to 4).foreach(i => drop(f"d$i%02d.warc.gz", s"https://b.example/$i", 8000))
    drop("d05.warc.gz", "https://b.example/5", 40000)
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val q = spark.readStream.format("warc")
      .option("maxBytesPerTrigger", 20000)
      .load(warcDir + "/*.warc.gz")
      .select("path")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val files = b.select("path").distinct()
          .collect().map(_.getString(0)).toSeq
        batches.synchronized {
          batches += files.map(p => p.substring(p.lastIndexOf('/') + 1)).sorted
        }
        b.write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = batches.sortBy(_.head)
    // 2 x 8KB fit one 20KB budget; the 40KB whale exceeds it alone but
    // must still flow as its own batch
    assert(got.flatten.sorted ==
      (1 to 5).map(i => f"d$i%02d.warc.gz"), got)
    assert(got.forall(b => b.size <= 2), got)
    assert(got.exists(_ == Seq("d05.warc.gz")), got)
    assert(spark.read.parquet(outDir).select("path").distinct().count() == 5)
  }

  test("log compaction bounds recovery: restart reads <= snapshot+tail log files, not one per batch ever; replay no-op") {
    import org.apache.spark.sql.streaming.Trigger
    val warcDir = java.nio.file.Files.createTempDirectory("graft-cmp").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-cmp-out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-cmp-ck").toString
    def drop(name: String, uri: String): Unit = {
      val f = new java.io.FileOutputStream(s"$warcDir/$name")
      val w = new Warc.MemberGzipWriter(f)
      try w.writeMember(record("response", uri, "HTTP/1.1 200 OK\r\n\r\nbody")): Unit
      finally { w.end(); f.close() }
    }
    def runOnce(): Unit = {
      val q = spark.readStream.format("warc")
        .option("maxFilesPerTrigger", 1) // one file per batch → 1 batch/file
        .load(warcDir + "/*.warc.gz")
        .select("path", "target_uri")
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    (1 to 25).foreach(i => drop(f"d$i%02d.warc.gz", s"https://cmp.example/$i"))
    runOnce() // 25 batches (ids 0..24); compactions at 9 and 19
    val logDir = new java.io.File(s"$ckDir/sources/0/warc-file-log")
    def logNames(): Seq[String] = logDir.listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq // ignore hadoop .crc sidecars
    // ONE snapshot + the post-snapshot tail — NOT 25 per-batch files
    assert(logNames() == Seq("19.compact", "20", "21", "22", "23", "24"), logNames())
    // recovery is O(snapshot + tail): 1 + 5 reads here, <= 1 + interval always
    val log = new graft.sources.WarcFileLog(
      new org.apache.hadoop.fs.Path(logDir.toString),
      spark.sparkContext.hadoopConfiguration)
    val (maxBatch, seen) = log.recover()
    assert(maxBatch == 24L)
    assert(seen.size == 25) // the snapshot still covers every file
    assert(log.recoverLogReads == 6, log.recoverLogReads)
    // restart with one new file: exactly it is consumed (batch 25)
    drop("d26.warc.gz", "https://cmp.example/26")
    runOnce()
    assert(spark.read.parquet(outDir).count() == 26)
    // replay with nothing new: a no-op, log did not grow
    runOnce()
    assert(spark.read.parquet(outDir).count() == 26)
    assert(logNames() ==
      Seq("19.compact", "20", "21", "22", "23", "24", "25"))
    // readRange serves compacted batches from the snapshot: batch 3's
    // file was folded into 19.compact yet is still individually replayable
    assert(log.readRange(3, 3).map(p => p.substring(p.lastIndexOf('/') + 1))
      == Seq("d04.warc.gz"))
  }

  test("maxFileAge: too-old files are never admitted, aged seen entries are evicted from the compacted log, eviction never re-admits") {
    import org.apache.spark.sql.streaming.Trigger
    val warcDir = java.nio.file.Files.createTempDirectory("graft-age").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-age-out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-age-ck").toString
    val day = 86400000L
    val now = System.currentTimeMillis()
    def drop(name: String, uri: String, mtime: Long): Unit = {
      val f = new java.io.FileOutputStream(s"$warcDir/$name")
      val w = new Warc.MemberGzipWriter(f)
      try w.writeMember(record("response", uri, "HTTP/1.1 200 OK\r\n\r\nbody")): Unit
      finally { w.end(); f.close() }
      assert(new java.io.File(s"$warcDir/$name").setLastModified(mtime))
    }
    def runOnce(): Unit = {
      val q = spark.readStream.format("warc")
        .option("maxFileAge", "1d")
        .option("logCompactInterval", 2) // compact at batches 1, 3, …
        .load(warcDir + "/*.warc.gz")
        .select("path", "target_uri")
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def uris(): Seq[String] =
      spark.read.parquet(outDir).select("target_uri").as[String]
        .collect().sorted.toSeq
    // 1) ancient A next to fresh-ish B: only B is admitted — too-old
    //    files are IGNORED, not queued
    drop("a.warc.gz", "https://age.example/A", now - 10 * day)
    drop("b.warc.gz", "https://age.example/B", now - 5 * day)
    runOnce() // batch 0: B alone (A is 5d older than the newest file)
    assert(uris() == Seq("https://age.example/B"))
    // 2) fresh C arrives: the newest-file clock advances, B ages past
    //    the cutoff; batch 1 compacts, and the snapshot must have
    //    EVICTED B (and never contained A)
    drop("c.warc.gz", "https://age.example/C", now)
    runOnce() // batch 1: C alone, then compaction
    assert(uris() == Seq("https://age.example/B", "https://age.example/C"))
    val logDir = new java.io.File(s"$ckDir/sources/0/warc-file-log")
    assert(logDir.listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq == Seq("1.compact"))
    def snapPaths(name: String): Seq[String] = {
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
        java.nio.file.Files.readAllBytes(new java.io.File(logDir, name).toPath))
      (0 until node.size).map(i => node.get(i).get(0).asText())
        .map(p => p.substring(p.lastIndexOf('/') + 1)).sorted
    }
    // B aged past the cutoff, but its batch is not yet past THIS run's
    // committed watermark — the snapshot keeps it so a replay of its
    // batch can never silently lose files (the replayability guard);
    // A was never admitted and never appears
    assert(snapPaths("1.compact") == Seq("b.warc.gz", "c.warc.gz"))
    // the invariant itself: batch 0 is still individually replayable
    // from the log even though its file aged out
    val log0 = new graft.sources.WarcFileLog(
      new org.apache.hadoop.fs.Path(logDir.toString),
      spark.sparkContext.hadoopConfiguration, 2)
    assert(log0.readRange(0, 0).map(p => p.substring(p.lastIndexOf('/') + 1))
      == Seq("b.warc.gz"))
    // 3) eviction never re-admits: B ages out of the SEEN set, but the
    //    age gate runs FIRST, so a restart with a fresh D consumes
    //    exactly D — B (and A) stay out, nothing is re-read
    drop("d.warc.gz", "https://age.example/D", now)
    runOnce() // batch 2: D alone
    assert(uris() == Seq("https://age.example/B", "https://age.example/C",
      "https://age.example/D"))
    runOnce() // replay: no-op
    assert(uris().size == 3)
    // 4) once batch 0 is past the committed watermark, the NEXT
    //    compaction evicts aged B from the persisted log too — the
    //    heap/log bound survives, eviction is merely commit-gated
    drop("e.warc.gz", "https://age.example/E", now)
    runOnce() // batch 3: E alone, then compaction
    assert(uris().size == 4)
    assert(snapPaths("3.compact") == Seq("c.warc.gz", "d.warc.gz", "e.warc.gz"))
  }

  test("legacy array offsets migrate: seen files excluded, uncommitted legacy batch replans as the diff, new commits are compact") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val warcDir = java.nio.file.Files.createTempDirectory("graft-leg").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-leg-ck").toString
    def drop(name: String, uri: String): String = {
      val f = new java.io.FileOutputStream(s"$warcDir/$name")
      val w = new Warc.MemberGzipWriter(f)
      try w.writeMember(record("response", uri, "HTTP/1.1 200 OK\r\n\r\nbody")): Unit
      finally { w.end(); f.close() }
      new org.apache.hadoop.fs.Path(s"$warcDir/$name").getFileSystem(
        spark.sparkContext.hadoopConfiguration)
        .globStatus(new org.apache.hadoop.fs.Path(s"$warcDir/$name"))
        .head.getPath.toString
    }
    val f1 = drop("a.warc.gz", "https://leg.example/1")
    val f2 = drop("b.warc.gz", "https://leg.example/2")
    val f3 = drop("c.warc.gz", "https://leg.example/3")
    val stream = new graft.sources.WarcMicroBatchStream(
      Seq(warcDir + "/*.warc.gz"), graft.sources.WarcDataSource.Schema,
      Array.empty, ckDir)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // a pre-upgrade checkpoint: committed = [f1], planned-end = [f1,f2]
    val committed = stream.deserializeOffset(
      mapper.writeValueAsString(Array(f1)))
    val plannedEnd = stream.deserializeOffset(
      mapper.writeValueAsString(Array(f1, f2)))
    // 1) the uncommitted legacy batch replans as exactly the diff
    val replay = stream.planInputPartitions(committed, plannedEnd)
      .map(_.asInstanceOf[graft.sources.WarcInputPartition].path)
    assert(replay.toSeq == Seq(f2))
    // 2) advancing from the legacy committed offset sees f1+f2 as seen
    //    (f2 via its logged replay? no — via the END offset's files
    //    being folded when IT was the start; here start=plannedEnd)
    val next = stream.latestOffset(plannedEnd, ReadLimit.allAvailable())
    assert(next.isInstanceOf[graft.sources.WarcOffset])
    assert(next.json().matches("""\{"batch":\d+\}""")) // compact from now on
    val fresh = stream.planInputPartitions(plannedEnd, next)
      .map(_.asInstanceOf[graft.sources.WarcInputPartition].path)
    assert(fresh.toSeq == Seq(f3), fresh.toSeq)
  }
}
