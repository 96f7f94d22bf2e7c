package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Ivf, Pq, Similarity}
import graft.store.Tables

/** Cross-SF invariance for the engine-specific (rows-only) gate
  * families: each CORRECTNESS gate pins behavior at one scale factor —
  * these specs assert the properties that must SURVIVE a scale-up
  * (exact-verification precision, monotone discovery, ANN recall
  * floors) at BOTH sf0.01 and sf0.1, so a scale regression surfaces in
  * `sbt test`, not in a future bench. Scoped to the cheap families
  * (candidate generators + ANN); BPE induction and classifier training
  * are pinned by their own closed-form specs and are not re-run per SF
  * here (minutes, not seconds, at sf0.1).
  */
class ScaleInvarianceSpec extends SparkTestBase {
  import spark.implicits._

  private val sfs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("crawl front door (x47/x49/x51 families): structural invariants hold at each SF") {
    for (dir <- sfs) {
      val docs = Tables.documents(spark, dir)
      // the x47 template yields 8 blocks + 1 iff the collapsed text is
      // nonempty, at ANY corpus size; kept main text never contains
      // chrome; the WARC record round-trips its computed Content-Length
      val esc = regexp_replace(regexp_replace(regexp_replace(
        col("text"), "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
      val html = concat(
        lit("<html><head><title>T</title></head><body><nav><a>Home</a></nav><p>"),
        esc, lit("</p><footer>chrome</footer></body></html>"))
      val checked = docs.select(
        col("doc_id"),
        size(graft.ext.Extract.htmlBlocks(html)).as("nb"),
        (length(trim(regexp_replace(col("text"), "\\s+", " "))) > 0).as("hasText"),
        graft.ext.Extract.mainText(html).contains("Home").as("leakNav"),
        graft.ext.Extract.mainText(html).contains("chrome").as("leakFooter"))
      assert(checked.filter(
        col("nb") =!= when(col("hasText"), 4).otherwise(3) ||
          col("leakNav") || col("leakFooter")).count() == 0, dir)
      // WARC framing: payload length reported == payload bytes, every doc
      val payload = concat(lit("HTTP/1.1 200 OK\r\n\r\n"), col("text"))
      val rec = concat(lit("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: "),
        octet_length(payload).cast("string"), lit("\r\n\r\n"), payload, lit("\r\n\r\n"))
      val parsed = docs.select(
        explode(graft.ext.Warc.records(rec.cast("binary"))).as("r"))
      assert(parsed.filter(
        octet_length(col("r.payload")) =!=
          element_at(col("r.headers"), "Content-Length").cast("int")).count() == 0, dir)
      assert(parsed.count() == docs.count(), dir)
    }
  }

  test("minhash near-dups (x2 family): zero false positives at each SF; discovery monotone") {
    val counts = sfs.map { dir =>
      val docs = Tables.documents(spark, dir)
      val found = Dedup.minhashNearDups(docs, "doc_id", "text", 3, 64, 16, 0.5)
      // exact re-verification of every emitted pair — bounded by
      // |found|, never all-pairs
      val rows = Dedup.shingleRows(docs, "doc_id", "text", 3)
      val bad = Dedup.verifyJaccard(found.select("id1", "id2"), rows)
        .filter(col("jaccard") < 0.5).count()
      assert(bad == 0, s"$dir: $bad pairs below threshold")
      found.count()
    }
    assert(counts.head > 0, "sf0.01 must find planted near-dups")
    assert(counts(1) >= counts.head,
      s"pair discovery must not shrink with the corpus: $counts")
  }

  test("incremental band-store probe (x2c family): probe == full recompute at each SF") {
    val counts = sfs.map { dir =>
      val docs = Tables.documents(spark, dir)
      val old = docs.filter(col("doc_id") % 5 =!= 0)
      val batch = docs.filter(col("doc_id") % 5 === 0)
      val prefix = s"scaleinv_bs_${Integer.toHexString(dir.hashCode).replace('-', 'n')}"
      Dedup.writeBandStoreBucketed(old, "doc_id", "text", prefix, buckets = 8,
        shingleN = 3, numHashes = 64, bands = 16)
      try {
        val inc = Dedup.incrementalNearDupsBucketed(spark, batch, "doc_id",
            "text", prefix, 3, 64, 16, 0.5)
          .select("id1", "id2").as[(Long, Long)].collect().toSet
        val batchIds = batch.select("doc_id").as[Long].collect().toSet
        val full = Dedup.minhashNearDups(docs, "doc_id", "text", 3, 64, 16, 0.5)
          .select("id1", "id2").as[(Long, Long)].collect().toSet
          .filter(p => batchIds(p._1) || batchIds(p._2))
        assert(inc == full,
          s"$dir: missed=${full -- inc} extra=${inc -- full}")
        inc.size.toLong
      } finally {
        spark.sql(s"DROP TABLE IF EXISTS ${prefix}_bands")
        spark.sql(s"DROP TABLE IF EXISTS ${prefix}_shingles")
      }
    }
    assert(counts.head > 0, "sf0.01 must find pairs touching the batch")
    assert(counts(1) >= counts.head,
      s"incremental discovery must not shrink with the corpus: $counts")
  }

  test("simhash near-dups (x3 family): hamming verdicts exact at each SF; discovery monotone") {
    val counts = sfs.map { dir =>
      val docs = Tables.documents(spark, dir)
      val found = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3)
      val sig = Dedup.simhash(docs, "doc_id", "text")
      val s1 = sig.select(col("id").as("id1"), col("simhash").as("s1"))
      val s2 = sig.select(col("id").as("id2"), col("simhash").as("s2"))
      val bad = found.join(s1, "id1").join(s2, "id2")
        .filter(Dedup.hamming(col("s1"), col("s2")) =!= col("hamming") ||
          col("hamming") > 3)
        .count()
      assert(bad == 0, s"$dir: $bad wrong hamming verdicts")
      found.count()
    }
    assert(counts.head > 0 && counts(1) >= counts.head, counts.toString)
  }

  test("embedding LSH near-dups (x5b family): discovery monotone; verified cosines honest") {
    val counts = sfs.map { dir =>
      val emb = Tables.embeddings(spark, dir)
      val found = Similarity.embeddingNearDupsLsh(emb, threshold = 0.4)
      assert(found.filter(col("cos") < 0.4).count() == 0)
      found.count()
    }
    assert(counts.head > 0 && counts(1) >= counts.head, counts.toString)
  }

  test("ANN recall floors hold at both SFs (x7 LSH / x7b IVF / x36 PQ families)") {
    sfs.foreach { dir =>
      val emb = Tables.embeddings(spark, dir)
      val q = emb.filter(col("vec_id") % 50 === 0)
      val exact = Similarity.bruteForceTopK(q, emb, k = 10)

      def mean(approx: org.apache.spark.sql.DataFrame): Double =
        Similarity.recallAtK(approx, exact, k = 10)
          .agg(avg(col("recall"))).as[Double].collect().head

      val lsh = mean(Similarity.lshTopK(q, emb, k = 10))
      assert(lsh >= 0.6, s"$dir: LSH recall@10 $lsh")

      val idx = Ivf.build(emb, k = 8)
      val ivf = mean(Ivf.topK(q, idx, k = 10, nprobe = 4))
      assert(ivf >= 0.6, s"$dir: IVF recall@10 $ivf")

      // the PQ scale contract is recall at a fixed probe FRACTION (a
      // fixed absolute shortlist trivially dilutes 10x per SF step)
      val shortlist = math.max(50, (emb.count() / 10).toInt)
      val model = Pq.fit(emb, m = 8, ksub = 32)
      val pq = mean(Pq.topKReranked(q, Pq.encode(emb, model), emb, model,
        k = 10, shortlist = shortlist))
      assert(pq >= 0.7, s"$dir: PQ reranked recall@10 $pq at shortlist $shortlist")
    }
  }

  test("SemDeDup (x26 family): within-cell pairs honest at each SF; dedup keeps fewer rows of a bigger corpus") {
    val kept = sfs.map { dir =>
      val emb = Tables.embeddings(spark, dir)
      val assigned = Ivf.build(emb, k = 8).assigned
      val pairs = Similarity.semanticDupPairsFromCells(assigned, threshold = 0.4)
      assert(pairs.filter(col("cos") < 0.4).count() == 0)
      val keptN = Dedup.dropDuplicateClusters(emb, "vec_id", pairs).count()
      val total = emb.count()
      assert(keptN <= total && keptN > 0)
      (total, total - keptN)
    }
    // a 10x corpus with the same planted-dup rate must DROP at least as
    // many semantic duplicates
    assert(kept(1)._2 >= kept.head._2,
      s"dropped counts must not shrink with the corpus: $kept")
  }

  test("video decode (x12g/x12h families): frame accounting exact at each SF; volume monotone") {
    val totals = sfs.map { dir =>
      val media = graft.ext.Multimodal.syntheticVideoTable(spark, dir)
      // full fan-out: exactly Σ (doc_id % 6 + 2) frames, none dropped
      val frames = graft.ext.Multimodal.videoFrameTable(media)
      val perClip = frames.groupBy("media_id").count()
      val bad = perClip.join(media.toDF().select(col("media_id"),
          (col("media_id") % 6 + 2).as("nf")), "media_id")
        .filter(col("count") =!= col("nf")).count()
      assert(bad == 0, s"$dir: $bad clips with wrong frame counts")
      // selective decode is a strict subset of the full fan-out
      val sampled = graft.ext.Multimodal.sampleFramesDecoded(media, 250).toDF()
      val extra = sampled.select("media_id", "frame_idx")
        .except(frames.toDF().select("media_id", "frame_idx")).count()
      assert(extra == 0, s"$dir: sampled frames outside the full set")
      frames.count()
    }
    assert(totals(1) > totals.head,
      s"decoded frame volume must grow with the corpus: $totals")
  }

  test("heavy hitters (x45 family): sketch exact regime holds at each SF") {
    sfs.foreach { dir =>
      val toks = split(trim(col("text")), "\\s+")
      val grams = Tables.documents(spark, dir)
        .select(explode(graft.functions.TextExpressions.wordNgramsOf(toks, 2)).as("gram"))
      val sk = grams
        .agg(graft.functions.SketchAggregates.spaceSavingTopK(col("gram"), 2048).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.term").as("gram"), col("e.count").as("cnt"), col("e.err").as("err"))
      val truth = grams.groupBy("gram").count()
      // the corpus vocabulary stays under capacity at every SF (the
      // gate's exact-regime contract): counts equal truth, err ≡ 0
      val bad = sk.join(truth, "gram")
        .filter(col("cnt") =!= col("count") || col("err") =!= 0).count()
      val missing = truth.join(sk, Seq("gram"), "left_anti").count()
      assert(bad == 0 && missing == 0, s"$dir: $bad wrong, $missing missing")
    }
  }

  test("quantile sketch (x46 family): exact regime at gate capacity; compacted bound at forced k") {
    import graft.functions.QuantileSketches
    sfs.foreach { dir =>
      val docs = Tables.documents(spark, dir)
      // gate capacity (1024) >= per-source counts at both SFs: exact
      val flags = docs.groupBy("source")
        .agg(QuantileSketches.quantileSketch(col("n_chars").cast("double"), 1024).as("sk"))
        .select(col("sk.exact")).collect()
      assert(flags.forall(_.getBoolean(0)), s"$dir: gate capacity must stay exact")
      // forced-compaction regime (k=16): p50 rank error within the
      // documented levels*n/(2k) bound against the true global ranks
      val k = 16
      val n = docs.count().toInt
      val got = docs
        .agg(QuantileSketches.quantileSketch(col("n_chars").cast("double"), k).as("sk"))
        .select(QuantileSketches.sketchQuantiles(col("sk"), Seq(0.5)).as("q"),
          col("sk.items.weight").as("w"))
        .head
      val v = got.getSeq[Double](0).head
      val levels = got.getSeq[Long](1).max.toDouble
      val bound = (math.log(levels) / math.log(2) + 1.0) * n / (2.0 * k) + 1.0
      val below = docs.filter(col("n_chars") < v).count().toDouble
      val atOrBelow = docs.filter(col("n_chars") <= v).count().toDouble
      val h = (n - 1) * 0.5
      val err = math.max(below - h, h - atOrBelow).max(0.0)
      assert(err <= bound, s"$dir: p50 rank error $err > bound $bound")
    }
  }

  test("frontier + sitemap seeds (x64/x66 families): structural invariants hold at each SF") {
    import graft.ext.{Frontier, UrlOps, Warc}
    for (dir <- sfs) {
      // the x64-shaped fixture: pages with item links + planted gates
      val id = col("doc_id").cast("string")
      val sk = (col("doc_id") % 50).cast("string")
      val html = concat(
        lit("<a href=\"https://h"), ((col("doc_id") * 7 + 1) % 50).cast("string"),
        lit(".example/item"), id, lit("-1\">i</a>"),
        lit("<a href=\"javascript:void(0)\">j</a>"),
        lit("<a href=\"https://spam.blocked.example/x"), id, lit("\">s</a>"))
      val pages = Tables.documents(spark, dir)
        .filter(col("doc_id") % 50 < 40)
        .select(concat(lit("https://h"), sk, lit(".example/page"), id).as("url"),
          html.as("html"))
      val cap = 7
      val f = Frontier.fromPages(pages, "url", "html",
          blockedDomains = Seq("blocked.example"), perHostCap = cap,
          prIterations = 3)
        .select(col("host"), col("url"), col("rank"),
          UrlOps.normalizeUrl(col("url")).as("renorm"))
        .localCheckpoint(true)
      // cap respected per host; no blocked domain leaks; outputs are
      // normalize-idempotent; ranks finite and non-negative
      assert(f.groupBy("host").count().filter(col("count") > cap).count() == 0,
        s"$dir: politeness cap exceeded")
      assert(f.filter(col("url").contains("blocked.example")).count() == 0)
      assert(f.filter(col("url") =!= col("renorm")).count() == 0,
        s"$dir: frontier emitted non-canonical urls")
      assert(f.filter(col("rank") < 0.0 || isnan(col("rank"))).count() == 0)
      assert(f.count() > 0)
      // sitemap seeds: gzip and plain forms agree at each SF, outputs
      // canonical and http(s)-only
      val xml = concat(lit("<urlset><url><loc>https://h"), sk,
        lit(".example/sm"), id, lit("</loc></url>" +
          "<url><loc>ftp://nope.example/x</loc></url></urlset>"))
      val fetched = Tables.documents(spark, dir)
        .filter(col("doc_id") % 50 < 40)
        .select(concat(lit("https://h"), sk, lit(".example/s.xml")).as("url"),
          when(col("doc_id") % 2 === 0, Warc.gzipBytes(xml.cast("binary")))
            .otherwise(xml.cast("binary")).as("payload"))
      val seeds = Frontier.seedsFromSitemaps(fetched, "url", "payload")
        .localCheckpoint(true)
      val n = Tables.documents(spark, dir).filter(col("doc_id") % 50 < 40).count()
      assert(seeds.count() == n, s"$dir: expected one seed per page")
      assert(seeds.filter(!col("url").startsWith("https://")).count() == 0)
      assert(seeds.filter(
        UrlOps.normalizeUrl(col("url")) =!= col("url")).count() == 0)
    }
  }
}
