package graft

import org.apache.spark.sql.functions._

import graft.ext.Retrieval

/** BM25 retrieval: hand-checked scores on a tiny corpus, ranking
  * sanity (term frequency up, document length down, rare terms weigh
  * more), and decimal-sum order independence. */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark catalyst optimizer rules"),
    (2L, "spark spark spark streaming"),
    (3L, "duckdb vectorized execution engine with many extra words padding length"),
    (4L, "catalyst expression codegen")).toDF("id", "text")

  test("postings and doc lengths are exact") {
    val p = Retrieval.postings(corpus, "id", "text")
      .as[(String, Long, Double)].collect().toSet
    assert(p.contains(("spark", 2L, 3.0)))
    assert(p.contains(("catalyst", 1L, 1.0)))
    val dl = Retrieval.docLengths(corpus, "id", "text")
      .as[(Long, Double)].collect().toMap
    assert(dl == Map(1L -> 4.0, 2L -> 4.0, 3L -> 10.0, 4L -> 3.0))
  }

  test("bm25 matches the closed form on a single-term query") {
    // term "catalyst": df=2, N=4, avgdl=(4+4+10+3)/4=5.25
    val idf = math.log((4.0 - 2 + 0.5) / (2 + 0.5) + 1.0)
    def cf(tf: Double, dl: Double): Double =
      BigDecimal(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 5.25)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Retrieval.bm25TopK(corpus, "id", "text", Seq("catalyst"), k = 10)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == Set(1L, 4L))
    assert(math.abs(got(1L) - BigDecimal(cf(1, 4)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // shorter doc 4 outranks doc 1 at equal tf
    assert(got(4L) > got(1L))
  }

  test("ranking: higher tf wins; rare term outweighs common term") {
    val top = Retrieval.bm25TopK(corpus, "id", "text", Seq("spark"), k = 1)
      .as[(Long, Double)].collect()
    assert(top.head._1 == 2L, "tf=3 doc must rank first")
    // "duckdb" (df=1) must contribute more than "spark" (df=2) at tf=1, same doc length
    val both = Retrieval.bm25(corpus, "id", "text", Seq("spark", "duckdb"))
      .withColumn("score", col("score_dec").cast("double"))
      .select("id", "score").as[(Long, Double)].collect().toMap
    assert(both(3L) > both(1L))
  }

  test("plan: the query-term filter is pushed below the postings aggregate") {
    // at 100 TB this is the difference between scanning 3 terms'
    // postings and aggregating the whole corpus: Catalyst's
    // PushDownPredicates moves `term IN (...)` (a grouping column)
    // under both the tf and df aggregates, directly above the explode;
    // the corpus stats side rides a broadcast hint
    val docs = graft.store.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Retrieval.bm25(docs, "doc_id", "text", Seq("data", "dup"))
      .queryExecution.optimizedPlan.toString
    val pushed = "IN \\(data,dup\\)".r.findAllIn(plan).length
    assert(pushed >= 2, s"expected the term filter below both aggregates:\n$plan")
    assert(plan.contains("strategy=broadcast"), "stats row should broadcast")
  }

  test("hybrid RRF: fusion surfaces docs neither modality alone finds, accumulates shared hits") {
    // planted corpus: doc 1 is LEXICAL-only relevant (query terms,
    // orthogonal embedding), doc 2 is SEMANTIC-only relevant (no term
    // overlap, near-parallel embedding), doc 3 is weakly relevant in
    // BOTH; docs 4-5 are noise. Query: terms {alpha, beta} + vector e1.
    val docs = Seq(
      (1L, "alpha beta alpha beta"),
      (2L, "delta epsilon zeta"),
      (3L, "alpha filler filler filler"),
      (4L, "noise words only here"),
      (5L, "more unrelated noise")).toDF("id", "text")
    val emb = Seq(
      (1L, Array(0f, 1f, 0f)),
      (2L, Array(0.95f, 0.05f, 0f)),
      (3L, Array(0.6f, 0.4f, 0f)),
      (4L, Array(0f, 0f, 1f)),
      (5L, Array(0f, -1f, 0f)),
      (0L, Array(1f, 0f, 0f))).toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 0L)
    val ann = graft.ext.Similarity.bruteForceTopK(q, emb.filter(col("vec_id") =!= 0L),
      k = 2, idCol = "vec_id")
    // each modality ALONE misses one relevant doc
    val lexOnly = Retrieval.bm25TopK(docs, "id", "text", Seq("alpha", "beta"), k = 2)
      .as[(Long, Double)].collect().map(_._1).toSet
    val semOnly = ann.select("neighbor_id").as[Long].collect().toSet
    assert(!lexOnly.contains(2L), "doc 2 shares no query term")
    assert(!semOnly.contains(1L), "doc 1's embedding is orthogonal")
    // fused: docs 1, 2, 3 all surface in the top 3
    val fused = Retrieval.hybridTopK(docs, "id", "text", Seq("alpha", "beta"),
      ann, k = 3, perList = 2)
      .as[(Long, Double)].collect()
    assert(fused.map(_._1).toSet == Set(1L, 2L, 3L), fused.mkString(", "))
    // doc 3 sits in BOTH lists at rank 2 → 2/(60+2) beats either rank-1
    // singleton's 1/61: accumulation, the point of fusion
    assert(fused.head._1 == 3L, fused.mkString(", "))
    val expected = BigDecimal(2.0 * BigDecimal(1.0 / 62.0)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(fused.head._2 - expected) < 1e-9)
  }

  test("bm25TopKBatch / hybridTopKBatch == the per-query driver loop, exactly") {
    // the eval-battery contract: one plan over a (query_id, term) frame
    // must reproduce the Seq[String]-form results query for query
    val dir = "/root/testdata/sf0.001"
    val docs = graft.store.Tables.documents(spark, dir)
    val emb = graft.store.Tables.embeddings(spark, dir)
    val queries = docs.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("query_id"),
        explode(slice(split(trim(col("text")), "\\s+"), 1, 4)).as("term"))
    val qids = queries.select("query_id").distinct().as[Long].collect().sorted
    assert(qids.length >= 2)
    val termsOf = queries.as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

    val batch = Retrieval.bm25TopKBatch(docs, "doc_id", "text", queries, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    val looped = qids.flatMap { q =>
      Retrieval.bm25TopK(docs, "doc_id", "text", termsOf(q), k = 5)
        .as[(Long, Double)].collect().zipWithIndex
        .map { case ((id, sc), i) => (q, id, sc, i + 1) }
    }.toSet
    assert(batch == looped, "bm25 batch must equal the per-query loop")

    // hybrid: the ANN side is already batched (bruteForceTopK takes a
    // query frame); fuse per query and compare to the per-query fusion
    val ann = graft.ext.Similarity.bruteForceTopK(
      emb.filter(col("vec_id").isin(qids: _*)), emb, k = 20)
      .withColumnRenamed("query_id", "qid")
    val hBatch = Retrieval.hybridTopKBatch(docs, "doc_id", "text", queries,
        ann.withColumnRenamed("qid", "query_id"), k = 5, perList = 20)
      .as[(Long, Long, Double, Int)].collect().toSet
    val hLooped = qids.flatMap { q =>
      Retrieval.hybridTopK(docs, "doc_id", "text", termsOf(q),
          ann.filter(col("qid") === q), k = 5, perList = 20)
        .as[(Long, Double)].collect().zipWithIndex
        .map { case ((id, r), i) => (q, id, r, i + 1) }
    }.toSet
    assert(hBatch == hLooped, "hybrid batch must equal the per-query loop")
  }

  test("LexIndex: write/read round-trip; FromIndex scoring == inline, single and batched") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.store.Tables.documents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft-lex").toString
    Retrieval.writeIndex(Retrieval.buildIndex(docs, "doc_id", "text"), tmp)
    val stored = Retrieval.readIndex(spark, tmp)

    val terms = Seq("data", "dup", "spark")
    val inline = Retrieval.bm25(docs, "doc_id", "text", terms)
      .as[(Long, java.math.BigDecimal)].collect().toMap
    val fromIdx = Retrieval.bm25FromIndex(stored, "doc_id", terms)
      .as[(Long, java.math.BigDecimal)].collect().toMap
    assert(inline.nonEmpty && fromIdx == inline)

    val queries = docs.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("query_id"),
        explode(slice(split(trim(col("text")), "\\s+"), 1, 4)).as("term"))
    val inlineB = Retrieval.bm25Batch(docs, "doc_id", "text", queries)
      .as[(Long, Long, java.math.BigDecimal)].collect().toSet
    val fromIdxB = Retrieval.bm25BatchFromIndex(stored, "doc_id", queries)
      .as[(Long, Long, java.math.BigDecimal)].collect().toSet
    assert(inlineB.nonEmpty && fromIdxB == inlineB)

    // single-query top-k serving form == the inline form, order included
    val inlineTop = Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 25)
      .as[(Long, Double)].collect().toSeq
    val fromIdxTop = Retrieval.bm25TopKFromIndex(stored, "doc_id", terms, k = 25)
      .as[(Long, Double)].collect().toSeq
    assert(inlineTop.nonEmpty && fromIdxTop == inlineTop)
  }

  test("tfidfTopKFromIndex == inline tfidfTopK; stored postings files are term-sorted") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.store.Tables.documents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft-lex-tfidf").toString
    Retrieval.writeIndex(Retrieval.buildIndex(docs, "doc_id", "text"), tmp)
    val stored = Retrieval.readIndex(spark, tmp)
    val inline = Retrieval.tfidfTopK(docs, "doc_id", "text", k = 5)
      .select("doc_id", "term", "tfidf", "rk")
      .as[(Long, String, Double, Int)].collect().toSet
    val fromIdx = Retrieval.tfidfTopKFromIndex(stored, "doc_id", k = 5)
      .select("doc_id", "term", "tfidf", "rk")
      .as[(Long, String, Double, Int)].collect().toSet
    assert(inline.nonEmpty && fromIdx == inline)
    // layout: each postings FILE is sorted by term, so parquet
    // row-group min/max ranges are disjoint and a term fetch prunes on
    // stats instead of clustering luck
    val byFile = spark.read.parquet(s"$tmp/postings")
      .select(input_file_name().as("f"), col("term"))
      .as[(String, String)].collect().groupBy(_._1)
    assert(byFile.nonEmpty)
    byFile.values.foreach { rows =>
      val terms = rows.map(_._2).toSeq
      assert(terms == terms.sorted, "postings file not term-sorted")
    }
  }

  test("mergeIndex: incremental fold of an added batch == full rebuild, exactly") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.store.Tables.documents(spark, dir)
    val old = docs.filter(col("doc_id") % 5 =!= 0)
    val added = docs.filter(col("doc_id") % 5 === 0)
    val merged = Retrieval.mergeIndex(
      Retrieval.buildIndex(old, "doc_id", "text"), added, "doc_id", "text")
    val full = Retrieval.buildIndex(docs, "doc_id", "text")
    // index contents identical
    // postings carry the denormalized dl column — compare all four
    assert(merged.postings.as[(String, Long, Double, Double)].collect().toSet ==
      full.postings.as[(String, Long, Double, Double)].collect().toSet)
    assert(merged.docLengths.as[(Long, Double)].collect().toSet ==
      full.docLengths.as[(Long, Double)].collect().toSet)
    // stats bit-identical (dl is integer-valued, the sum is exact)
    assert(merged.stats.as[(Double, Double)].collect().toSeq ==
      full.stats.as[(Double, Double)].collect().toSeq)
    // df merges by sum over the disjoint doc sets — bit-identical to the
    // rebuild's count over merged postings (integer-valued doubles)
    assert(merged.dfreq.as[(String, Double)].collect().toSet ==
      full.dfreq.as[(String, Double)].collect().toSet)
    // and so is every downstream score
    val terms = Seq("data", "dup", "spark")
    val a = Retrieval.bm25FromIndex(merged, "doc_id", terms)
      .as[(Long, java.math.BigDecimal)].collect().toMap
    val b = Retrieval.bm25FromIndex(full, "doc_id", terms)
      .as[(Long, java.math.BigDecimal)].collect().toMap
    assert(a.nonEmpty && a == b)
  }

  test("stored-index batched hybrid: recall@10 >= 0.8 vs brute-force hybrid; ADC scan prunes") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.store.Tables.documents(spark, dir)
    val emb = graft.store.Tables.embeddings(spark, dir)
    // stored structures: LexIndex + IVF-PQ layout
    val lexTmp = java.nio.file.Files.createTempDirectory("graft-lex-hyb").toString
    Retrieval.writeIndex(Retrieval.buildIndex(docs, "doc_id", "text"), lexTmp)
    val lex = Retrieval.readIndex(spark, lexTmp)
    val ivf = graft.ext.Ivf.build(emb, k = 8)
    val model = graft.ext.Pq.fit(emb, m = 8, ksub = 32)
    val pqTmp = java.nio.file.Files.createTempDirectory("graft-ivfpq-hyb").toString
    graft.ext.Pq.writeIvfPq(ivf, model, pqTmp)

    val queries = docs.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("query_id"),
        explode(slice(split(trim(col("text")), "\\s+"), 1, 4)).as("term"))
    val qv = emb.filter(col("vec_id") % 20 === 0)

    val stored = Retrieval.hybridTopKBatchFromIndex(lex, "doc_id", queries,
      graft.ext.Pq.topKStoredIvfPq(qv, spark, pqTmp, model,
        k = 20, nprobe = 6, shortlist = 40),
      k = 10, perList = 20)
    val brute = Retrieval.hybridTopKBatchFromIndex(lex, "doc_id", queries,
      graft.ext.Similarity.bruteForceTopK(qv, emb, k = 20),
      k = 10, perList = 20)

    // recall@10 of the stored-index serving path against the brute
    // hybrid, via the library's own monitoring probe
    val rec = graft.ext.Similarity.recallAtK(
        stored.select(col("query_id"), col("doc_id").as("neighbor_id"), col("rk")),
        brute.select(col("query_id"), col("doc_id").as("neighbor_id"), col("rk")),
        k = 10)
      .agg(avg(col("recall"))).head.getDouble(0)
    assert(rec >= 0.8, s"stored-index hybrid recall@10 = $rec")

    // the ADC scan under the fused plan still prunes cell partitions
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val self = p match {
        case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("corpus")) => Seq(f)
        case _ => Nil
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self ++ kids.flatMap(scans)
    }
    val ss = scans(stored.queryExecution.executedPlan)
    assert(ss.nonEmpty, "no ADC corpus scan found in the fused plan")
    ss.foreach { sc =>
      assert(sc.partitionFilters.exists(_.references.exists(_.name == "cell")),
        s"no cell partition filter in:\n$sc")
    }
  }

  test("decimal contributions: repartitioned corpus returns identical scores and order") {
    val docs = graft.store.Tables.documents(spark, "/root/testdata/sf0.001")
    val q = Seq("data", "dup", "spark")
    val a = Retrieval.bm25TopK(docs, "doc_id", "text", q, 25)
      .as[(Long, Double)].collect().toSeq
    val b = Retrieval.bm25TopK(docs.repartition(13), "doc_id", "text", q, 25)
      .as[(Long, Double)].collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("tfidfTopK: closed-form scores, per-doc k cap, term-asc tie rule") {
    // 4 docs; "rare" appears only in doc 1, "common" in all docs (idf =
    // ln(1) = 0), "pair" in two
    val docs = Seq(
      (1L, "rare common pair"),
      (2L, "common pair common"),
      (3L, "common"),
      (4L, "common")).toDF("id", "text")
    val got = Retrieval.tfidfTopK(docs, "id", "text", k = 2)
      .select("id", "term", "tfidf", "rk")
      .as[(Long, String, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).toSeq).toMap
    def s(tf: Double, dl: Double, df: Double): Double =
      BigDecimal(tf / dl * math.log(4.0 / df))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1: rare (1/3)·ln(4/1) beats pair (1/3)·ln(4/2); common scores 0
    assert(got(1L) == Seq((1L, "rare", s(1, 3, 1), 1), (1L, "pair", s(1, 3, 2), 2)))
    // doc 2: pair (1/3)·ln2 first, then common (2/3)·ln1 = 0
    assert(got(2L).map(_._2) == Seq("pair", "common"))
    assert(got(2L).map(_._3) == Seq(s(1, 3, 2), 0.0))
    // docs 3/4: single term, score 0, still ranked (k cap, not score cut)
    assert(got(3L) == Seq((3L, "common", 0.0, 1)))
    // every doc emits <= k rows
    assert(got.values.forall(_.size <= 2))
  }

  test("buildIndexFromTerms == buildIndex over the space-joined text") {
    val fromText = Retrieval.buildIndex(corpus, "id", "text")
    val terms = corpus.select(col("id"),
      explode(split(trim(col("text")), "\\s+")).as("term"))
    val fromTerms = Retrieval.buildIndexFromTerms(terms, "id")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(fromTerms.postings) == rows(fromText.postings))
    assert(rows(fromTerms.docLengths) == rows(fromText.docLengths))
    assert(rows(fromTerms.stats) == rows(fromText.stats))
    assert(rows(fromTerms.dfreq) == rows(fromText.dfreq))
  }

  test("bm25f: anchor-only matches surface; weight 0 == body-only; weight scales the anchor term") {
    val body = Retrieval.buildIndex(corpus, "id", "text")
    // doc 3's body has no query term, but two links point at it with
    // 'spark' anchors; doc 1 gets one 'optimizer' anchor
    val anchorTerms = Seq(
      (3L, "spark"), (3L, "spark"), (3L, "engine"), (1L, "optimizer"))
      .toDF("id", "term")
    val anchor = Retrieval.buildIndexFromTerms(anchorTerms, "id")
    def scores(w: Double): Map[Long, Double] =
      Retrieval.bm25fTopKFromIndex(body, anchor, "id",
          Seq("spark", "optimizer"), k = 10, anchorWeight = w)
        .as[(Long, Double)].collect().toMap
    val bodyOnly = Retrieval.bm25TopKFromIndex(body, "id",
        Seq("spark", "optimizer"), k = 10)
      .as[(Long, Double)].collect().toMap
    // weight 0: every anchor contribution rounds to 0 — scores equal
    // body-only on the shared docs; doc 3 appears with score 0 (it
    // matched the anchor field, so it is scored, at zero weight)
    val w0 = scores(0.0)
    bodyOnly.foreach { case (id, s) => assert(w0(id) == s) }
    assert(w0(3L) == 0.0)
    // doc 3 has NO body match: absent from body-only, present with a
    // positive score once the anchor field weighs in
    assert(!bodyOnly.contains(3L))
    val w1 = scores(1.0)
    assert(w1(3L) > 0.0)
    // the weight knob scales anchor-only docs (round-9 granularity)
    // and leaves body-only docs untouched
    val wHalf = scores(0.5)
    assert(wHalf(3L) > 0.0 && wHalf(3L) < w1(3L))
    assert(wHalf(2L) == bodyOnly(2L)) // doc 2: body 'spark' only, no anchors
    // per-field stats: anchor idf/dl derive from the anchor field
    // itself (3 anchor tokens for doc 3, 1 for doc 1), not the body's
    val a3 = w1(3L)
    // closed form: anchor field N=2 docs, df(spark)=1, avgdl=(3+1)/2=2,
    // dl(3)=3, tf=2 → idf=ln((2-1+0.5)/(1+0.5)+1)=ln(2),
    // tfpart=2·2.2/(2+1.2·(0.25+0.75·3/2))=4.4/(2+1.65)
    val expected = BigDecimal(math.log(2.0) * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 3.0 / 2.0)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(a3 == expected, s"a3=$a3 expected=$expected")
  }

  test("buildIndexFromTermCounts == buildIndexFromTerms over the exploded occurrences; anchorTerms output plugs in") {
    val counted = Seq((1L, "spark", 3L), (1L, "engine", 1L),
      (2L, "spark", 1L), (2L, "spark", 1L), // same pair twice: tf sums to 2
      (3L, "docs", 2L)).toDF("id", "term", "n")
    val fromCounts = Retrieval.buildIndexFromTermCounts(counted, "id")
    val exploded = counted.select(col("id"),
        explode(flatten(array_repeat(array(col("term")), col("n").cast("int"))))
          .as("term"))
    val fromTerms = Retrieval.buildIndexFromTerms(exploded, "id")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(fromCounts.postings) == rows(fromTerms.postings))
    assert(rows(fromCounts.docLengths) == rows(fromTerms.docLengths))
    assert(rows(fromCounts.stats) == rows(fromTerms.stats))
    assert(rows(fromCounts.dfreq) == rows(fromTerms.dfreq))
    // the anchorTerms profile shape (target, term, n, rk) feeds directly
    val profile = graft.ext.Graph.anchorTerms(
      Seq(("t1", "spark engine"), ("t1", "spark"), ("t2", "docs"))
        .toDF("target", "anchor"), "target", "anchor", k = 8)
    val idx = Retrieval.buildIndexFromTermCounts(profile, "target")
    val tf = idx.postings.select("term", "target", "tf")
      .as[(String, String, Double)].collect().toSet
    assert(tf == Set(("spark", "t1", 2.0), ("engine", "t1", 1.0),
      ("docs", "t2", 1.0)))
  }

  test("bm25f batch == the per-query bm25fTopKFromIndex loop, exactly") {
    val body = Retrieval.buildIndex(corpus, "id", "text")
    val anchor = Retrieval.buildIndexFromTerms(
      Seq((3L, "spark"), (3L, "spark"), (1L, "optimizer"), (4L, "engine"))
        .toDF("id", "term"), "id")
    val queries = Seq(
      ("q1", "spark"), ("q1", "optimizer"),
      ("q2", "engine"), ("q2", "execution"),
      ("q3", "nomatch")).toDF("query_id", "term")
    val batch = Retrieval.bm25fTopKBatchFromIndex(body, anchor, "id",
        queries, k = 3, anchorWeight = 0.7)
      .as[(String, Long, Double, Int)].collect().toSet
    val loop = Seq(
      "q1" -> Seq("spark", "optimizer"),
      "q2" -> Seq("engine", "execution"),
      "q3" -> Seq("nomatch")).flatMap { case (qid, terms) =>
      Retrieval.bm25fTopKFromIndex(body, anchor, "id", terms, k = 3,
          anchorWeight = 0.7)
        .as[(Long, Double)].collect().zipWithIndex
        .map { case ((id, s), i) => (qid, id, s, i + 1) }
    }.toSet
    assert(batch == loop && batch.nonEmpty)
    assert(!batch.exists(_._1 == "q3")) // no-match query yields nothing
  }

  test("hardNegatives: positives and self excluded, re-ranked 1..k, fetchDepth guards starvation") {
    // corpus: doc 1 is the query; docs 2,3 are its dup cluster
    // (positives); 4..9 share the query terms at varying tf
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), // exact dup of the query doc
      (3L, "alpha beta gamma delta"), // another positive
      (4L, "alpha alpha beta unrelated"),
      (5L, "alpha beta filler filler"),
      (6L, "alpha filler filler filler"),
      (7L, "beta filler filler filler"),
      (8L, "gamma filler filler filler"),
      (9L, "totally different content")).toDF("doc_id", "text")
    val index = Retrieval.buildIndex(docs, "doc_id", "text")
    val queries = Seq((1L, "alpha"), (1L, "beta"), (1L, "gamma"))
      .toDF("query_id", "term")
    val positives = Seq((1L, 1L), (1L, 2L), (1L, 3L)).toDF("query_id", "pos_id")
    val got = Retrieval.hardNegatives(index, "doc_id", queries, positives,
        k = 3, fetchDepth = 8)
      .select("query_id", "doc_id", "neg_rank")
      .as[(Long, Long, Int)].collect().sortBy(_._3).toSeq
    // positives 2,3 and self 1 are excluded even though they out-score
    // everything; the take still fills k=3 because fetchDepth > k
    assert(got.map(_._2).toSet.intersect(Set(1L, 2L, 3L)).isEmpty)
    assert(got.map(_._3) == Seq(1, 2, 3))
    // the textbook reference: BM25-rank the corpus for the query,
    // drop {1,2,3}, take 3 in order
    val ref = Retrieval.bm25TopKBatchFromIndex(index, "doc_id", queries, 9)
      .orderBy("rk").select("doc_id").as[Long].collect()
      .filterNot(Set(1L, 2L, 3L)).take(3).toSeq
    assert(got.map(_._2) == ref, s"got ${got.map(_._2)} ref $ref")
    // self is excluded even when positives omit it
    val noSelf = Retrieval.hardNegatives(index, "doc_id", queries,
        Seq((1L, 2L)).toDF("query_id", "pos_id"), k = 8, fetchDepth = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(!noSelf.contains(1L) && !noSelf.contains(2L) && noSelf.contains(3L))
    // fetchDepth must cover the exclusions
    intercept[IllegalArgumentException] {
      Retrieval.hardNegatives(index, "doc_id", queries, positives,
        k = 5, fetchDepth = 3)
    }
  }
}
