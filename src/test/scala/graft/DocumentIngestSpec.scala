package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ext.{QualityClassifier, TextOps}
import graft.store.Tables
import graft.streaming.DocumentIngest

/** Streaming document cleaning: stream == batch on the same corpus,
  * state limited to the watermark dedup, gates identical to the batch
  * pipeline's, and the stateless classifier scorer agrees with the
  * join-based batch scorer. */
class DocumentIngestSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("scoreCol (plan-literal fold) == score (broadcast join) on the real corpus") {
    val docs = Tables.documents(spark, dir)
      .withColumn("y", (col("lang") === "en").cast("int"))
    val m = QualityClassifier.train(docs.limit(200), "doc_id", "text", "y",
      dim = 256, iters = 10, lr = 50.0)
    val joined = QualityClassifier.score(docs, m, "doc_id", "text")
      .withColumnRenamed("score", "s_join")
      .join(docs.select(col("doc_id"),
        QualityClassifier.scoreCol(col("text"), m).as("s_fold")), "doc_id")
      .select(abs(col("s_join") - col("s_fold")).as("d"))
      .agg(max(col("d"))).as[Double].collect().head
    assert(joined < 1e-9, s"max |join - fold| = $joined")
  }

  test("streaming clean == batch clean on the same documents (AvailableNow, 2 batches)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-docstream")
    val cfg = DocumentIngest.CleanConfig(minTokens = 5)

    val base = Tables.documents(spark, dir).limit(60)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    // monotonic event time: wraparound would (correctly) make later
    // batches late against the watermark and drop them
    def ts(i: Int) = new Timestamp(
      Timestamp.valueOf("2024-01-01 00:00:00").getTime + i * 60000L)
    val rows = base.zipWithIndex.map { case ((id, tx), i) => (id, tx, ts(i)) }
    // plant an exact content dup of a LATE batch-1 row (inside the
    // watermark horizon when batch 2 runs — the semantics the stream
    // dedup guarantees; older state is correctly evicted) and a junk doc
    val planted = rows :+ ((9901L, rows(29)._2, ts(31))) :+ ((9902L, "tiny", ts(62)))

    val ms = MemoryStream[(Long, String, Timestamp)]
    val cleaned = DocumentIngest.cleanStream(
      ms.toDF().toDF("doc_id", "text", "ts"),
      "doc_id", "text", "ts", lateness = "10 minutes", cfg)
    def drain(): Unit = {
      val q = cleaned.writeStream.format("parquet")
        .option("path", s"$tmp/out").option("checkpointLocation", s"$tmp/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val (b1, b2) = planted.splitAt(30)
    ms.addData(b1.toSeq); drain()
    ms.addData(b2.toSeq); drain()
    val streamed = spark.read.parquet(s"$tmp/out")

    val batch = DocumentIngest.cleanStream(
      planted.toSeq.toDF("doc_id", "text", "ts"),
      "doc_id", "text", "ts", lateness = "10 minutes", cfg)

    // the junk doc is gated out, the planted content-dup collapses
    assert(!streamed.select("doc_id").as[Long].collect().contains(9902L))
    assert(streamed.filter(col("doc_id") === 9901L).count() == 0)
    // stream == batch: same kept ids, same redacted text, same n_tokens
    val sKeys = streamed.select("doc_id", "text", "n_tokens")
      .as[(Long, String, Int)].collect().toSet
    val bKeys = batch.select("doc_id", "text", "n_tokens")
      .as[(Long, String, Int)].collect().toSet
    assert(sKeys == bKeys, s"stream-only=${sKeys -- bKeys} batch-only=${bKeys -- sKeys}")
    assert(sKeys.nonEmpty)
  }

  test("crawl front door: extract(html) -> clean streams == batch, chrome-only pages die early") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-crawlstream")
    val cfg = DocumentIngest.CleanConfig(minTokens = 5, redactPii = false)

    def page(body: String): String =
      s"<html><head><title>t</title></head><body><nav><a>Home</a> <a>About</a></nav>" +
        s"<p>$body</p><footer>chrome</footer></body></html>"
    val base = Tables.documents(spark, dir).limit(40)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    def ts(i: Int) = new Timestamp(
      Timestamp.valueOf("2024-01-01 00:00:00").getTime + i * 60000L)
    val rows = base.zipWithIndex.map { case ((id, tx), i) => (id, page(tx), ts(i)) }
    // a chrome-only page: extraction is empty -> must die before dedup
    val planted = rows :+ ((9901L, "<body><nav><a>Only</a> <a>Chrome</a></nav></body>", ts(41)))

    val ms = MemoryStream[(Long, String, Timestamp)]
    val cleaned = DocumentIngest.cleanStream(
      DocumentIngest.extractHtml(
        ms.toDF().toDF("doc_id", "html", "ts"), "html", "text"),
      "doc_id", "text", "ts", lateness = "10 minutes", cfg)
    def drain(): Unit = {
      val q = cleaned.writeStream.format("parquet")
        .option("path", s"$tmp/out").option("checkpointLocation", s"$tmp/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val (b1, b2) = planted.splitAt(20)
    ms.addData(b1.toSeq); drain()
    ms.addData(b2.toSeq); drain()
    val streamed = spark.read.parquet(s"$tmp/out")

    val batch = DocumentIngest.cleanStream(
      DocumentIngest.extractHtml(
        planted.toSeq.toDF("doc_id", "html", "ts"), "html", "text"),
      "doc_id", "text", "ts", lateness = "10 minutes", cfg)
    val sKeys = streamed.select("doc_id", "text", "n_tokens")
      .as[(Long, String, Int)].collect().toSet
    val bKeys = batch.select("doc_id", "text", "n_tokens")
      .as[(Long, String, Int)].collect().toSet
    assert(sKeys == bKeys, s"stream-only=${sKeys -- bKeys} batch-only=${bKeys -- sKeys}")
    assert(sKeys.nonEmpty && !sKeys.exists(_._1 == 9901L))
    // extraction really stripped the chrome: no nav/footer text leaked
    assert(sKeys.forall { case (_, t, _) => !t.contains("Home") && !t.contains("chrome") })
  }

  test("front door under the CONTEXTUAL policy: stream == batch, policy == direct call") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import graft.ext.Extract
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-ctxstream")
    val cfg = DocumentIngest.CleanConfig(minTokens = 3, redactPii = false)
    val policy = Extract.ExtractPolicy.Contextual(lengthLow = 10, lengthHigh = 40)

    // a page shape only the contextual pass gets right: the short
    // heading between two long paragraphs survives; the same-length
    // stub inside the widget cluster dies
    def page(body: String): String =
      "<html><body><nav><a>Home</a> <a>About</a></nav>" +
        "<p>A first paragraph long enough to be decided good on length alone.</p>" +
        "<h2>Kept heading</h2>" +
        s"<p>$body endless prose that also clears the length bar comfortably.</p>" +
        "<div><a>w1</a></div><p>Lost stub</p><div><a>w2</a></div>" +
        "</body></html>"
    val base = Tables.documents(spark, dir).limit(30)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    def ts(i: Int) = new Timestamp(
      Timestamp.valueOf("2024-01-01 00:00:00").getTime + i * 60000L)
    val rows = base.zipWithIndex.map { case ((id, tx), i) =>
      (id, page(tx.replaceAll("\\s+", " ").take(80)), ts(i))
    }

    val ms = MemoryStream[(Long, String, Timestamp)]
    val cleaned = DocumentIngest.cleanStream(
      DocumentIngest.extractHtml(
        ms.toDF().toDF("doc_id", "html", "ts"), "html", "text", policy),
      "doc_id", "text", "ts", lateness = "10 minutes", cfg)
    ms.addData(rows.toSeq) // before start: AvailableNow snapshots offsets at init
    val q = cleaned.writeStream.format("parquet")
      .option("path", s"$tmp/out").option("checkpointLocation", s"$tmp/ckpt")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.read.parquet(s"$tmp/out")
      .select("doc_id", "text").as[(Long, String)].collect().toSet

    val batchDf = rows.toSeq.toDF("doc_id", "html", "ts")
    val batch = DocumentIngest.cleanStream(
      DocumentIngest.extractHtml(batchDf, "html", "text", policy),
      "doc_id", "text", "ts", lateness = "10 minutes", cfg)
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // the contextual signal actually drove the output
    assert(streamed.forall { case (_, t) =>
      t.contains("Kept heading") && !t.contains("Lost stub") && !t.contains("Home")
    })
    // the policy front door is the direct extractor, verbatim
    val direct = batchDf.select(col("doc_id"),
        Extract.contextualMainText(col("html"), 10, 40).as("text"))
      .filter(col("text") =!= "").as[(Long, String)].collect().toSet
    val viaPolicy = DocumentIngest.extractHtml(batchDf, "html", "text", policy)
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    assert(viaPolicy == direct)
  }

  test("front door under the STOPWORDED policy wires the induced list through") {
    import graft.ext.Extract
    val docs = Tables.documents(spark, dir).limit(50)
    val induced = Extract.induceStopwords(docs, "doc_id", "text", k = 20)
      .select("term").as[String].collect().toSeq
    assert(induced.nonEmpty)
    val policy = Extract.ExtractPolicy.Stopworded(induced, minStopRatio = 0.05)
    val pages = docs.select(col("doc_id"),
      concat(lit("<html><body><nav><a>x</a></nav><p>"), col("text"),
        lit("</p><p>zzqq-gibberish-only</p></body></html>")).as("html"))
    val out = DocumentIngest.extractHtml(pages, "html", "text", policy)
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(out.nonEmpty)
    // the stopword floor dropped the gibberish block the density gate keeps
    assert(out.forall { case (_, t) => !t.contains("zzqq-gibberish-only") })
    val direct = pages.select(col("doc_id"),
        Extract.mainTextStopworded(col("html"), induced, minStopRatio = 0.05).as("text"))
      .filter(col("text") =!= "").as[(Long, String)].collect()
    assert(out.toSet == direct.toSet)
  }

  test("language gate: only allowed languages survive the edge; stream == batch; lang_pred attached") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import graft.ext.LangId
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-langgate")
    val langs = Seq("en", "de", "fr", "es", "ru", "zh")
    val m = LangId.train(
      LangId.Seed.corpus(spark, docsPerLang = 12).filter(col("lang").isin(langs: _*)),
      "sid", "text", "lang", dim = 512, iters = 12, lr = 100.0)
    val cfg = DocumentIngest.CleanConfig(minTokens = 3, redactPii = false,
      langGate = Some(DocumentIngest.LangGate(m, allow = Set("en", "de"))))
    // mixed-language arrivals, ids carry the truth for the assert
    val arrivals = LangId.Seed.corpus(spark, docsPerLang = 6, salt = 5)
      .filter(col("lang").isin(langs: _*))
      .select(col("sid"), col("lang"), col("text"))
      .collect().zipWithIndex.map { case (r, i) =>
        (r.getString(0), r.getString(1), r.getString(2),
          new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime + i * 60000L))
      }

    val ms = MemoryStream[(String, String, String, Timestamp)]
    val cleaned = DocumentIngest.cleanStream(
      ms.toDF().toDF("sid", "truth", "text", "ts"),
      "sid", "text", "ts", lateness = "10 minutes", cfg)
    ms.addData(arrivals.toSeq) // before start: AvailableNow snapshots offsets at init
    val q = cleaned.writeStream.format("parquet")
      .option("path", s"$tmp/out").option("checkpointLocation", s"$tmp/ckpt")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.read.parquet(s"$tmp/out")
      .select("sid", "truth", "lang_pred").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))

    assert(streamed.nonEmpty)
    // nothing outside the allow set leaks past the edge
    assert(streamed.forall { case (_, _, p) => p == "en" || p == "de" })
    // the gate is driven by a real prediction: a large majority of
    // survivors are genuinely en/de (the model is imperfect, not absent)
    val truthOk = streamed.count { case (_, t, _) => t == "en" || t == "de" }
    assert(truthOk.toDouble / streamed.length >= 0.9)
    // stream == batch under the same gate
    val batch = DocumentIngest.cleanStream(
      arrivals.toSeq.toDF("sid", "truth", "text", "ts"),
      "sid", "text", "ts", lateness = "10 minutes", cfg)
      .select("sid").as[String].collect().toSet
    assert(streamed.map(_._1).toSet == batch)
  }

  test("crawl front door, WARC form: record explode -> extract keeps 200 HTML responses only") {
    val mk = (uri: String, body: String, status: Int) => {
      val payload = s"HTTP/1.1 $status OK\r\nContent-Type: text/html\r\n\r\n$body"
      val pb = payload.getBytes("UTF-8")
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${pb.length}\r\n\r\n").getBytes("UTF-8") ++ pb ++
        "\r\n\r\n".getBytes("UTF-8")
    }
    val json = "HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n\r\n" +
      "{\"looks\": \"like text but is not html and must not pollute the corpus\"}"
    val jb = json.getBytes("UTF-8")
    val jsonRec = (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://x.example/api\r\n" +
      s"Content-Length: ${jb.length}\r\n\r\n").getBytes("UTF-8") ++ jb ++
      "\r\n\r\n".getBytes("UTF-8")
    val blobs = Seq(
      (1L, mk("https://x.example/a", "<p>kept article body text here</p>", 200) ++
        mk("https://x.example/b", "<p>second record in same capture</p>", 200)),
      (2L, mk("https://x.example/gone", "<p>not found page text</p>", 404) ++ jsonRec))
      .toDF("capture_id", "blob")
    val out = DocumentIngest.extractWarc(blobs, "blob", "text")
      .select("capture_id", "record_idx", "target_uri", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3))).toSet
    assert(out == Set(
      (1L, 0, "https://x.example/a", "kept article body text here"),
      (1L, 1, "https://x.example/b", "second record in same capture")))
  }

  test("streaming warc source: extractWarcRecords over readStream == batch pipeline across 2 AvailableNow triggers") {
    import org.apache.spark.sql.streaming.Trigger
    val mkRec = (uri: String, body: String, status: Int, typ: String) => {
      val payload = s"HTTP/1.1 $status OK\r\nContent-Type: text/html\r\n\r\n$body"
      val pb = payload.getBytes("UTF-8")
      (s"WARC/1.0\r\nWARC-Type: $typ\r\nWARC-Target-URI: $uri\r\n" +
        s"WARC-Date: 2026-08-15T00:00:00Z\r\n" +
        s"Content-Length: ${pb.length}\r\n\r\n").getBytes("UTF-8") ++ pb ++
        "\r\n\r\n".getBytes("UTF-8")
    }
    val warcDir = Files.createTempDirectory("graft-streamwarc").toString
    val outDir = Files.createTempDirectory("graft-streamwarc-out").toString
    val ckDir = Files.createTempDirectory("graft-streamwarc-ck").toString
    def gz(path: String, recs: Array[Byte]*): Unit = {
      val f = new java.io.FileOutputStream(path)
      val w = new graft.ext.Warc.MemberGzipWriter(f)
      try recs.foreach(w.writeMember) finally { w.end(); f.close() }
    }
    def runOnce(): Unit = {
      val src = spark.readStream.format("warc").load(warcDir + "/*.warc.gz")
      val q = DocumentIngest.extractWarcRecords(src, "text")
        .select("path", "idx", "target_uri", "text")
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // drop 1: one file — two kept responses, one request (pushed-filter
    // skip path), one 404
    gz(s"$warcDir/drop1.warc.gz",
      mkRec("https://sw.example/a", "<p>first drop article text body</p>", 200, "response"),
      mkRec("https://sw.example/a", "GET /a HTTP/1.1", 200, "request"),
      mkRec("https://sw.example/gone", "<p>not found text</p>", 404, "response"),
      mkRec("https://sw.example/b", "<p>second kept body in drop one</p>", 200, "response"))
    runOnce()
    // drop 2: a NEW file arrives; the checkpointed offset must replay
    // nothing from drop 1 and consume exactly the new file
    gz(s"$warcDir/drop2.warc.gz",
      mkRec("https://sw.example/c", "<p>third article, second trigger</p>", 200, "response"))
    runOnce()
    val streamed = spark.read.parquet(outDir)
      .select("target_uri", "text").as[(String, String)].collect().toSeq.sorted
    // batch twin: the DSv2 batch scan over the same files through the
    // same flat-row extractor
    val batch = DocumentIngest.extractWarcRecords(
        spark.read.format("warc").load(warcDir + "/*.warc.gz"), "text")
      .select("target_uri", "text").as[(String, String)].collect().toSeq.sorted
    assert(streamed == batch && streamed.map(_._1) ==
      Seq("https://sw.example/a", "https://sw.example/b", "https://sw.example/c"))
    // no duplicates: each file consumed by exactly one micro-batch
    assert(streamed.size == 3)
    // replay with the same checkpoint and no new files: a no-op
    runOnce()
    assert(spark.read.parquet(outDir).count() == 3)
  }

  test("streaming near-dup maintenance: pairs across micro-batches == batch pipeline; replay is a no-op") {
    val docs = Tables.documents(spark, dir)
    val srcDir = Files.createTempDirectory("nd-src").toString
    // two slices as two FILES so maxFilesPerTrigger=1 forces two
    // micro-batches: batch 1 bootstraps the store, batch 2 probes it
    def writeOneFile(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("nd-slice").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, java.nio.file.Paths.get(srcDir, name))
      ()
    }
    writeOneFile(docs.filter(col("doc_id") % 2 === 0), "a.parquet")
    writeOneFile(docs.filter(col("doc_id") % 2 === 1), "b.parquet")
    val pairsDir = Files.createTempDirectory("nd-pairs").toString + "/out"
    val ckpt = Files.createTempDirectory("nd-ckpt").toString
    val prefix = "ndmaint_spec"
    try {
      DocumentIngest.nearDupMaintenance(spark, srcDir, pairsDir, ckpt, prefix,
        "doc_id", "text", buckets = 4, shingleN = 3, numHashes = 96,
        bands = 32, threshold = 0.5, maxFilesPerTrigger = Some(1))
      val got = spark.read.parquet(pairsDir)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      // batch-1 within-pairs + batch-2 (within + cross) == ALL pairs of
      // the full corpus: signatures are content-local
      val want = graft.ext.Dedup
        .minhashNearDups(docs, "doc_id", "text", 3, 96, 32, 0.5)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      assert(want.nonEmpty && got == want,
        s"missed=${want -- got} extra=${got -- want}")
      assert(spark.read.parquet(pairsDir).select("batch_id").distinct().count() >= 2,
        "expected the source to split into >= 2 micro-batches")
      // replay with the same checkpoint: markers skip every batch — no
      // duplicate pairs, no duplicate store rows
      val storeCount = spark.table(s"${prefix}_shingles").count()
      DocumentIngest.nearDupMaintenance(spark, srcDir, pairsDir, ckpt, prefix,
        "doc_id", "text", buckets = 4, shingleN = 3, numHashes = 96,
        bands = 32, threshold = 0.5, maxFilesPerTrigger = Some(1))
      assert(spark.read.parquet(pairsDir).count() == got.size)
      assert(spark.table(s"${prefix}_shingles").count() == storeCount)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${prefix}_bands")
      spark.sql(s"DROP TABLE IF EXISTS ${prefix}_shingles")
    }
  }

  test("near-dup maintenance torn-append recovery: scrub + re-run reaches the identical end state") {
    val docs = Tables.documents(spark, dir)
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val pairsDir = Files.createTempDirectory("nd2-pairs").toString + "/out"
    val ckpt = Files.createTempDirectory("nd2-ckpt").toString
    val prefix = "ndmaint_spec2"
    def run(batch: org.apache.spark.sql.DataFrame, id: Long): Unit =
      DocumentIngest.nearDupProcessBatch(batch, id, pairsDir, ckpt, prefix,
        "doc_id", "text", buckets = 4, shingleN = 3, numHashes = 96,
        bands = 32, threshold = 0.5)
    try {
      run(a, 0) // bootstrap
      run(b, 1) // append against the store
      val basePairs = spark.read.parquet(pairsDir)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      val baseCount = spark.read.parquet(pairsDir).count()
      val baseStore = spark.table(s"${prefix}_shingles").count()
      // crash window: batch 1's append landed but its done marker did
      // not — on re-delivery the retry must scrub batch 1's ids (the
      // possibly-partial append) and re-run to the identical end state,
      // REPLACING its pairs partition
      assert(new java.io.File(s"$ckpt/graft_band_batches/1.done").delete())
      run(b, 1)
      val afterPairs = spark.read.parquet(pairsDir)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      assert(afterPairs == basePairs)
      assert(spark.read.parquet(pairsDir).count() == baseCount,
        "recovery must replace the batch's pairs, not append to them")
      assert(spark.table(s"${prefix}_shingles").count() == baseStore,
        "scrub + re-append must leave the store row count unchanged")
      // and a further replay with intact markers is a pure no-op
      run(b, 1)
      assert(spark.read.parquet(pairsDir).count() == baseCount)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${prefix}_bands")
      spark.sql(s"DROP TABLE IF EXISTS ${prefix}_shingles")
    }
  }

  test("streaming frontier maintenance: later batches exclude earlier crawls via the seen store; replay is a no-op") {
    val srcDir = Files.createTempDirectory("fr-src").toString
    def writeOneFile(df: org.apache.spark.sql.DataFrame, name: String,
        mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("fr-slice").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = java.nio.file.Paths.get(srcDir, name)
      Files.copy(part.toPath, dst)
      assert(dst.toFile.setLastModified(mtime)) // deterministic batch order
      ()
    }
    // batch 1 crawls P (links to X); batch 2 crawls X (links BACK to P
    // — must die at the store anti-join — and on to new Y)
    val t0 = System.currentTimeMillis() - 120000
    writeOneFile(Seq(("https://p.example/one",
      """<a href="https://x.example/two">x</a>""")).toDF("url", "html"),
      "a.parquet", t0)
    writeOneFile(Seq(("https://x.example/two",
      """<a href="https://p.example/one">back</a><a href="https://y.example/three">y</a>"""))
      .toDF("url", "html"), "b.parquet", t0 + 60000)
    val frontierDir = Files.createTempDirectory("fr-out").toString + "/out"
    val ckpt = Files.createTempDirectory("fr-ckpt").toString
    val table = "frontier_maint_spec"
    try {
      DocumentIngest.frontierMaintenance(spark, srcDir, frontierDir, ckpt,
        table, buckets = 4, maxFilesPerTrigger = Some(1))
      val got = spark.read.parquet(frontierDir)
        .select(col("batch_id").cast("long"), col("url"))
        .as[(Long, String)].collect().toSet
      // batch 0's frontier is X; batch 1's is ONLY Y — P was crawled in
      // batch 0, and the cumulative store (not batch 1's own pages)
      // excludes it
      assert(got == Set((0L, "https://x.example/two"),
        (1L, "https://y.example/three")), s"got $got")
      val storeUrls = spark.table(table).as[String].collect().toSet
      assert(storeUrls == Set("https://p.example/one", "https://x.example/two"))
      // replay with the same checkpoint: AvailableNow re-delivers
      // nothing; and a manual re-run of a batch is idempotent
      DocumentIngest.frontierMaintenance(spark, srcDir, frontierDir, ckpt,
        table, buckets = 4, maxFilesPerTrigger = Some(1))
      assert(spark.read.parquet(frontierDir).count() == 2)
      assert(spark.table(table).count() == 2)
      graft.streaming.DocumentIngest.frontierProcessBatch(
        Seq(("https://x.example/two",
          """<a href="https://p.example/one">back</a><a href="https://y.example/three">y</a>"""))
          .toDF("url", "html"),
        1L, frontierDir, table, "url", "html", Nil, 100,
        "graft-frontier-v1", 10, 4)
      assert(spark.read.parquet(frontierDir)
        .select(col("batch_id").cast("long"), col("url"))
        .as[(Long, String)].collect().toSet == got)
      assert(spark.table(table).count() == 2)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      ()
    }
  }

  test("frontierMaintenanceWarc: the crawl loop straight from .warc.gz drops == the parquet-fed loop; replay no-op") {
    val warcDir = Files.createTempDirectory("frw-src").toString
    val frontierDir = Files.createTempDirectory("frw-out").toString + "/out"
    val ckpt = Files.createTempDirectory("frw-ckpt").toString
    val table = "frontier_warc_spec"
    def capture(uri: String, html: String): Array[Byte] = {
      val payload =
        s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$html"
      val pb = payload.getBytes("UTF-8")
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"WARC-Date: 2026-08-15T00:00:00Z\r\nContent-Length: ${pb.length}\r\n\r\n")
        .getBytes("UTF-8") ++ pb ++ "\r\n\r\n".getBytes("UTF-8")
    }
    def drop(name: String, recs: Array[Byte]*): Unit = {
      val f = new java.io.FileOutputStream(s"$warcDir/$name")
      val w = new graft.ext.Warc.MemberGzipWriter(f)
      try recs.foreach(w.writeMember) finally { w.end(); f.close() }
    }
    try {
      // drop 1: the fetcher archived P (links to X) + a request record
      // that must die at the pushed warc_type filter
      drop("drop1.warc.gz",
        capture("https://p.example/one",
          """<a href="https://x.example/two">x</a>"""),
        ("WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: https://p.example/one\r\n" +
          "Content-Length: 0\r\n\r\n\r\n\r\n").getBytes("UTF-8"))
      DocumentIngest.frontierMaintenanceWarc(spark, warcDir + "/*.warc.gz",
        frontierDir, ckpt, table, buckets = 4)
      // drop 2: X crawled — links BACK to P (must die at the seen
      // store) and on to new Y
      drop("drop2.warc.gz",
        capture("https://x.example/two",
          """<a href="https://p.example/one">back</a><a href="https://y.example/three">y</a>"""))
      DocumentIngest.frontierMaintenanceWarc(spark, warcDir + "/*.warc.gz",
        frontierDir, ckpt, table, buckets = 4)
      val got = spark.read.parquet(frontierDir)
        .select(col("batch_id").cast("long"), col("url"))
        .as[(Long, String)].collect().toSet
      assert(got == Set((0L, "https://x.example/two"),
        (1L, "https://y.example/three")), s"got $got")
      assert(spark.table(table).as[String].collect().toSet ==
        Set("https://p.example/one", "https://x.example/two"))
      // replay: same checkpoint, no new archives — nothing re-delivers
      DocumentIngest.frontierMaintenanceWarc(spark, warcDir + "/*.warc.gz",
        frontierDir, ckpt, table, buckets = 4)
      assert(spark.read.parquet(frontierDir).count() == 2)
      assert(spark.table(table).count() == 2)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      ()
    }
  }

  test("cumulative frontier maintenance: batch-2 priorities rank against the WHOLE crawl's graph; replay no-op") {
    val srcDir = Files.createTempDirectory("frg-src").toString
    def writeOneFile(df: org.apache.spark.sql.DataFrame, name: String,
        mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("frg-slice").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = java.nio.file.Paths.get(srcDir, name)
      Files.copy(part.toPath, dst)
      assert(dst.toFile.setLastModified(mtime))
      ()
    }
    val t0 = System.currentTimeMillis() - 120000
    // batch 1: P links to X; batch 2: X links to Y. Under the
    // cumulative store, batch 2's rank for y.example must come from
    // PageRank over BOTH batches' edges {p→x, x→y} — batch 2's own
    // graph ({x→y} alone) ranks y differently.
    writeOneFile(Seq(("https://p.example/one",
      """<a href="https://x.example/two">x</a>""")).toDF("url", "html"),
      "a.parquet", t0)
    writeOneFile(Seq(("https://x.example/two",
      """<a href="https://y.example/three">y</a>""")).toDF("url", "html"),
      "b.parquet", t0 + 60000)
    val frontierDir = Files.createTempDirectory("frg-out").toString + "/out"
    val ckpt = Files.createTempDirectory("frg-ckpt").toString
    val table = "frontier_cumul_seen"
    val gprefix = "frontier_cumul_graph"
    try {
      DocumentIngest.frontierMaintenance(spark, srcDir, frontierDir, ckpt,
        table, buckets = 4, maxFilesPerTrigger = Some(1),
        graphStorePrefix = Some(gprefix), prIterations = 5,
        compactEvery = Some(1))
      // the per-batch compaction cadence held both stores at ≤ one
      // file per bucket
      assert(spark.table(table).inputFiles.length <= 4)
      assert(spark.table(s"${gprefix}_edges_src").inputFiles.length <= 4)
      val got = spark.read.parquet(frontierDir)
        .select(col("batch_id").cast("long"), col("url"), col("rank"))
        .as[(Long, String, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got.keySet == Set((0L, "https://x.example/two"),
        (1L, "https://y.example/three")))
      // the store accumulated both batches' edges
      val stored = spark.table(s"${gprefix}_edges_src")
        .as[(String, String)].collect().toSet
      assert(stored == Set(("p.example", "x.example"),
        ("x.example", "y.example")))
      // batch 2's rank for y.example == PageRank over the UNION graph,
      // bitwise (the store-backed loop is the same consensus math)
      val want = graft.ext.Graph.pageRank(
          Seq(("p.example", "x.example"), ("x.example", "y.example"))
            .toDF("src", "dst"), 5)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got((1L, "https://y.example/three")) == want("y.example"))
      // replay: no new frontier rows, no new edges
      DocumentIngest.frontierMaintenance(spark, srcDir, frontierDir, ckpt,
        table, buckets = 4, maxFilesPerTrigger = Some(1),
        graphStorePrefix = Some(gprefix), prIterations = 5)
      assert(spark.read.parquet(frontierDir).count() == 2)
      assert(spark.table(s"${gprefix}_edges_src").count() == 2)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${gprefix}_edges_src")
      spark.sql(s"DROP TABLE IF EXISTS ${gprefix}_edges_dst")
      ()
    }
  }

  test("rank cadence: between-recompute batches rank from the snapshot; recompute batches match the per-batch loop bitwise") {
    def mkSrc(tag: String): String = {
      val srcDir = Files.createTempDirectory(s"$tag-src").toString
      def writeOneFile(df: org.apache.spark.sql.DataFrame, name: String,
          mtime: Long): Unit = {
        val tmp = Files.createTempDirectory(s"$tag-slice").toString
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dst = java.nio.file.Paths.get(srcDir, name)
        Files.copy(part.toPath, dst)
        assert(dst.toFile.setLastModified(mtime))
        ()
      }
      val t0 = System.currentTimeMillis() - 120000
      writeOneFile(Seq(("https://p.example/one",
        """<a href="https://x.example/two">x</a>""")).toDF("url", "html"),
        "a.parquet", t0)
      writeOneFile(Seq(("https://x.example/two",
        """<a href="https://y.example/three">y</a>""")).toDF("url", "html"),
        "b.parquet", t0 + 60000)
      srcDir
    }
    def run(tag: String, table: String, gprefix: String,
        rankEvery: Int): Map[(Long, String), Double] = {
      val frontierDir = Files.createTempDirectory(s"$tag-out").toString + "/out"
      val ckpt = Files.createTempDirectory(s"$tag-ckpt").toString
      DocumentIngest.frontierMaintenance(spark, mkSrc(tag), frontierDir, ckpt,
        table, buckets = 4, maxFilesPerTrigger = Some(1),
        graphStorePrefix = Some(gprefix), prIterations = 5,
        rankEvery = rankEvery)
      spark.read.parquet(frontierDir)
        .select(col("batch_id").cast("long"), col("url"), col("rank"))
        .as[(Long, String, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    }
    val tables = Seq("fr_rc_seen_a", "fr_rc_seen_b",
      "fr_rc_ga_edges_src", "fr_rc_ga_edges_dst", "fr_rc_ga_ranks",
      "fr_rc_gb_edges_src", "fr_rc_gb_edges_dst")
    try {
      val cadenced = run("frrc-a", "fr_rc_seen_a", "fr_rc_ga", rankEvery = 2)
      val perBatch = run("frrc-b", "fr_rc_seen_b", "fr_rc_gb", rankEvery = 1)
      // batch 0 recomputes under BOTH cadences — bitwise identical
      assert(cadenced((0L, "https://x.example/two")) ==
        perBatch((0L, "https://x.example/two")))
      // batch 1 between recomputes: ranked from the batch-0 snapshot,
      // which predates y.example entirely → rank 0.0; the per-batch
      // loop recomputes over the cumulative graph and ranks y > 0
      assert(cadenced((1L, "https://y.example/three")) == 0.0)
      assert(perBatch((1L, "https://y.example/three")) > 0.0)
      // the snapshot holds the batch-0 graph's hosts only...
      val snap0 = graft.ext.Graph.readRankSnapshot(spark, "fr_rc_ga_ranks")
        .get.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(snap0.keySet == Set("p.example", "x.example"))
      // ...and the edge store still folded BOTH batches (only the
      // derived ranks go stale, never the graph)
      assert(spark.table("fr_rc_ga_edges_src").count() == 2)
      // a recompute batch (id % rankEvery == 0) refreshes the snapshot
      DocumentIngest.frontierProcessBatch(
        Seq(("https://y.example/three",
          """<a href="https://z.example/four">z</a>""")).toDF("url", "html"),
        2L, Files.createTempDirectory("frrc-c").toString + "/out",
        "fr_rc_seen_a", "url", "html", Nil, 100, "graft-frontier-v1", 5, 4,
        graphStorePrefix = Some("fr_rc_ga"), rankEvery = 2)
      val snap2 = graft.ext.Graph.readRankSnapshot(spark, "fr_rc_ga_ranks")
        .get.collect().map(r => r.getString(0)).toSet
      assert(snap2 == Set("p.example", "x.example", "y.example", "z.example"))
    } finally {
      tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      ()
    }
  }

  test("seed maintenance: robots -> sitemap targets -> page seeds; seeded store dedups re-fetches; replay no-op") {
    val srcDir = Files.createTempDirectory("seed-src").toString
    def writeOneFile(df: org.apache.spark.sql.DataFrame, name: String,
        mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("seed-slice").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = java.nio.file.Paths.get(srcDir, name)
      Files.copy(part.toPath, dst)
      assert(dst.toFile.setLastModified(mtime))
      ()
    }
    val t0 = System.currentTimeMillis() - 120000
    val robotsTxt =
      "User-agent: *\nDisallow: /private/\nSitemap: https://a.example/sm.xml\n"
    // batch 0: the fetched robots file — emits one sitemap target
    writeOneFile(Seq(("https://a.example/robots.txt",
        robotsTxt.getBytes("UTF-8"), "robots"))
      .toDF("url", "payload", "kind"), "a.parquet", t0)
    // batch 1: the fetched sitemap (an index + a urlset would be two
    // fetches; here one urlset) PLUS a RE-fetched robots file — the
    // seeded store must swallow the repeat
    val urlset =
      """<urlset><url><loc>https://a.example/p1</loc>
        |<lastmod>2026-05-01</lastmod></url>
        |<url><loc>https://a.example/p2</loc></url></urlset>""".stripMargin
    writeOneFile(Seq(
        ("https://a.example/sm.xml", urlset.getBytes("UTF-8"), "sitemap"),
        ("https://a.example/robots.txt", robotsTxt.getBytes("UTF-8"), "robots"))
      .toDF("url", "payload", "kind"), "b.parquet", t0 + 60000)
    val seedsDir = Files.createTempDirectory("seed-out").toString + "/seeds"
    val targetsDir = Files.createTempDirectory("seed-tgt").toString + "/targets"
    val ckpt = Files.createTempDirectory("seed-ckpt").toString
    val table = "seed_maint_store"
    try {
      DocumentIngest.seedMaintenance(spark, srcDir, seedsDir, targetsDir,
        ckpt, table, buckets = 4, maxFilesPerTrigger = Some(1))
      val targets = spark.read.parquet(targetsDir)
        .select(col("batch_id").cast("long"), col("url"))
        .as[(Long, String)].collect().toSet
      // batch 0 scheduled the sitemap fetch; batch 1's robots repeat
      // emitted nothing (seeded store)
      assert(targets == Set((0L, "https://a.example/sm.xml")), s"$targets")
      val seeds = spark.read.parquet(seedsDir)
        .select(col("batch_id").cast("long"), col("url"),
          col("lastmod")).collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) null else r.getString(2))).toSet
      assert(seeds == Set(
        (1L, "https://a.example/p1", "2026-05-01"),
        (1L, "https://a.example/p2", null)), s"$seeds")
      // the seeded store accumulated every emission
      assert(spark.table(table).as[String].collect().toSet == Set(
        "https://a.example/sm.xml", "https://a.example/p1",
        "https://a.example/p2"))
      // replay through the streaming entry point: AvailableNow
      // re-delivers nothing; a manual batch re-run (done marker) keeps
      // outputs and store byte-identical
      DocumentIngest.seedMaintenance(spark, srcDir, seedsDir, targetsDir,
        ckpt, table, buckets = 4, maxFilesPerTrigger = Some(1))
      DocumentIngest.seedProcessBatch(
        Seq(("https://a.example/sm.xml", urlset.getBytes("UTF-8"), "sitemap"))
          .toDF("url", "payload", "kind"),
        1L, seedsDir, targetsDir, ckpt, table, "url", "payload", "kind",
        Nil, 4)
      assert(spark.read.parquet(seedsDir).count() == 2)
      assert(spark.read.parquet(targetsDir).count() == 1)
      assert(spark.table(table).count() == 3)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      ()
    }
  }

  test("robots store governs the streaming frontier: latest fetch per host wins; replay + compaction stable") {
    import graft.ext.Robots
    val rtable = "robots_store_spec"
    val stable = "robots_seen_spec"
    val t1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2026-02-01 00:00:00")
    def page = Seq(("https://src.example/p",
      """<a href="https://a.example/x">x</a><a href="https://a.example/y">y</a>"""))
      .toDF("url", "html")
    def run(outTag: String): Set[String] = {
      val out = Files.createTempDirectory(s"rs-$outTag").toString + "/f"
      spark.sql(s"DROP TABLE IF EXISTS $stable") // fresh seen store per run
      DocumentIngest.frontierProcessBatch(page, 0L, out, stable,
        "url", "html", Nil, 100, "graft-frontier-v1", 5, 4,
        robotsTable = Some(rtable))
      spark.read.parquet(out).select("url").as[String].collect().toSet
    }
    try {
      // epoch 1: /x disallowed
      Robots.appendRobotsStore(
        Seq(("https://a.example/robots.txt", "User-agent: *\nDisallow: /x\n", t1))
          .toDF("rurl", "rtxt", "fa"), "rurl", "rtxt", "fa", rtable, buckets = 4)
      assert(run("e1") == Set("https://a.example/y"))
      // epoch 2: policy relaxed — the NEWER fetch must govern
      Robots.appendRobotsStore(
        Seq(("https://a.example/robots.txt", "User-agent: *\nDisallow:\n", t2))
          .toDF("rurl", "rtxt", "fa"), "rurl", "rtxt", "fa", rtable, buckets = 4)
      assert(run("e2") == Set("https://a.example/x", "https://a.example/y"))
      // replayed append of identical rows cannot change the view
      Robots.appendRobotsStore(
        Seq(("https://a.example/robots.txt", "User-agent: *\nDisallow:\n", t2))
          .toDF("rurl", "rtxt", "fa"), "rurl", "rtxt", "fa", rtable, buckets = 4)
      val latest = Robots.latestRobots(spark, rtable).collect()
      assert(latest.length == 1 && latest.head.getAs[String]("txt")
        .contains("Disallow:\n"))
      // compaction: history folds to one row per host, view unchanged
      Robots.compactRobotsStore(spark, rtable, buckets = 4)
      assert(spark.table(rtable).count() == 1)
      assert(run("e3") == Set("https://a.example/x", "https://a.example/y"))
    } finally {
      Seq(rtable, s"${rtable}_compacting", s"${rtable}_retired", stable)
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      ()
    }
  }

  test("normalizeForm: composed and decomposed spellings dedup to one; off by default they do not") {
    val composed = "caf\u00E9 hash join scan filter window batch sort merge group value spark query fast run"
    val decomposed = "cafe\u0301 hash join scan filter window batch sort merge group value spark query fast run"
    val docs = Seq((1L, composed, ts0(0)), (2L, decomposed, ts0(1)))
      .toDF("doc_id", "text", "ts")
    val off = DocumentIngest.cleanStream(docs, "doc_id", "text", "ts",
      "10 minutes", DocumentIngest.CleanConfig(minTokens = 3))
    assert(off.count() == 2, "without normalization the spellings differ")
    val on = DocumentIngest.cleanStream(docs, "doc_id", "text", "ts",
      "10 minutes", DocumentIngest.CleanConfig(minTokens = 3,
        normalizeForm = Some("NFC")))
    val rows = on.select("doc_id", "text").as[(Long, String)].collect()
    assert(rows.map(_._1).toSeq == Seq(1L), s"got ${rows.toSeq}")
    assert(rows.head._2 == composed, "landed text carries the normalized form")
  }

  test("gates drop repetitive and short docs; survivors carry quality_score when configured") {
    val docs = Seq(
      (1L, "hash join scan filter window batch sort merge group value spark query fast run", ts0(0)),
      (2L, "dup dup dup dup dup dup dup dup dup dup", ts0(1)),   // top-2-gram loop
      (3L, "too short", ts0(2))).toDF("doc_id", "text", "ts")
    val labeled = Tables.documents(spark, dir)
      .withColumn("y", (col("lang") === "en").cast("int"))
    val m = QualityClassifier.train(labeled.limit(100), "doc_id", "text", "y",
      dim = 128, iters = 5, lr = 10.0)
    val out = DocumentIngest.cleanStream(docs, "doc_id", "text", "ts",
      lateness = "10 minutes",
      DocumentIngest.CleanConfig(minTokens = 5, classifier = Some(m), minScore = 0.0))
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L), s"kept $kept")
    assert(out.columns.contains("quality_score"))
  }

  test("edge decontamination gate == batch contamination verdicts on the real corpus") {
    val docs = Tables.documents(spark, dir)
    val probes = docs.filter(col("doc_id") % 41 === 0)
    val corpus = docs.filter(col("doc_id") % 41 =!= 0)
    // the exact batch scan's verdicts at the same (n, minShared)
    val flagged = graft.ext.Dedup.ngramContamination(
        corpus, probes, "doc_id", "text", n = 3, minShared = 3)
      .select(col("id")).as[Long].collect().toSet
    assert(flagged.nonEmpty, "fixture must flag something")
    val bloom = graft.ext.Dedup.probeGramBloom(probes, "doc_id", "text", n = 3)
    // repetition thresholds 1e9, not 1.0: overlapping grams make the
    // char-mass fractions exceed 1 on loop-y docs, so 1.0 still gates
    val cfg = DocumentIngest.CleanConfig(minTokens = 0,
      repetition = TextOps.RepetitionThresholds(
        maxTop2GramCharFrac = 1e9, maxDup3GramCharFrac = 1e9), redactPii = false,
      decontam = Some(DocumentIngest.DecontamGate(bloom, n = 3, minShared = 3)))
    val kept = DocumentIngest.cleanStream(
        corpus.select(col("doc_id"), col("text"),
          to_timestamp(col("doc_id")).as("ts")),
        "doc_id", "text", "ts", lateness = "10 minutes", cfg)
      .select("doc_id").as[Long].collect().toSet
    val dropped = corpus.select("doc_id").as[Long].collect().toSet -- kept
    // the pipeline's content dedup also drops normalized dups (first
    // arrival = min id here since ts follows doc_id) — fold those into
    // the expectation so the assert isolates the decontamination gate
    val dupLosers = corpus
      .withColumn("_ck", DocumentIngest.contentKey(col("text")))
      .withColumn("_first", min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("_ck")))
      .filter(col("doc_id") =!= col("_first"))
      .select("doc_id").as[Long].collect().toSet
    // well-sized filter on this gram count: fp ≈ 0, so the edge gate
    // reproduces the batch verdicts exactly; had there been fp noise it
    // could only ADD drops (supersetness is the Bloom guarantee)
    assert(dropped == (flagged ++ dupLosers),
      s"edge-only=${dropped -- flagged -- dupLosers} missed=${(flagged ++ dupLosers) -- dropped}")
  }

  private def ts0(i: Int) = Timestamp.valueOf(f"2024-01-01 00:0$i:00")

  test("sidecar maintenance: WET/WAT/CDX per batch over 2 triggers; stream == batch twins; replay no-op") {
    val mk = (uri: String, body: String) => {
      val payload = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$body"
      val pb = payload.getBytes("UTF-8")
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"WARC-Date: 2026-08-15T00:00:00Z\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${pb.length}\r\n\r\n").getBytes("UTF-8") ++ pb ++
        "\r\n\r\n".getBytes("UTF-8")
    }
    val warcDir = Files.createTempDirectory("graft-sc").toString
    val outDir = Files.createTempDirectory("graft-sc-out").toString
    val ckDir = Files.createTempDirectory("graft-sc-ck").toString
    def gz(path: String, recs: Array[Byte]*): Unit = {
      val f = new java.io.FileOutputStream(path)
      val w = new graft.ext.Warc.MemberGzipWriter(f)
      try recs.foreach(w.writeMember) finally { w.end(); f.close() }
    }
    def runOnce(): Unit = DocumentIngest.sidecarMaintenance(
      spark, warcDir + "/*.warc.gz", outDir, ckDir)
    gz(s"$warcDir/d1.warc.gz",
      mk("https://sc.example/a", "<html><head><title>A</title></head>" +
        "<body><p>alpha body text long enough to keep</p>" +
        "<a href=\"/next\">n</a></body></html>"),
      mk("https://sc.example/b", "<p>beta body text long enough to keep</p>"))
    runOnce()
    gz(s"$warcDir/d2.warc.gz",
      mk("https://sc.example/c", "<p>gamma body text long enough to keep</p>"))
    runOnce()
    // one sidecar set per non-empty batch
    def batches(kind: String) = new java.io.File(s"$outDir/$kind").listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName).sorted.toSeq
    assert(batches("wet") == batches("wat") && batches("wet").size == 2,
      s"${batches("wet")}")
    // WET: conversion records whose text == the batch extractor's
    val wet = graft.ext.Warc.wetTexts(
        graft.ext.Warc.read(spark, outDir + "/wet/*/*.warc.gz"))
      .select("target_uri", "text").as[(String, String)].collect().toMap
    val batchTexts = graft.ext.Warc.htmlResponses(
        graft.ext.Warc.read(spark, warcDir + "/*.warc.gz"))
      .select(col("target_uri"),
        graft.ext.Extract.mainText(col("html")).as("text"))
      .as[(String, String)].collect().toMap
    assert(wet == batchTexts && wet.keySet ==
      Set("https://sc.example/a", "https://sc.example/b", "https://sc.example/c"))
    // WAT: envelopes match the batch derivation, links included
    val wat = graft.ext.Warc.watEnvelopes(
        graft.ext.Warc.read(spark, outDir + "/wat/*/*.warc.gz"))
      .select("target_uri", "title", "links")
      .as[(String, String, Seq[String])].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(wat("https://sc.example/a")._1 == "A")
    assert(wat("https://sc.example/a")._2 == Seq("https://sc.example/next"))
    // CDX: urlkey-keyed rows for every record, accumulated
    val cdx = spark.read.parquet(outDir + "/cdx")
    assert(cdx.count() == 3)
    assert(cdx.select("urlkey").as[String].collect().forall(
      _.startsWith("example,sc)")))
    // replay with no new files: a no-op everywhere
    runOnce()
    assert(batches("wet").size == 2 && cdx.count() == 3)
  }
}
