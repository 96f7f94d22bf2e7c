package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal, Similarity, TextOps}
import graft.store.Tables

class ExtSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("minhash LSH finds every brute-force near-dup pair (recall) and nothing below threshold (precision)") {
    val docs = Tables.documents(spark, dir)
    val found = Dedup.minhashNearDups(docs, "doc_id", "text", 3, 96, 32, 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // brute force: exact shingle jaccard over all pairs (small at sf0.001)
    val rows = Dedup.shingleRows(docs, "doc_id", "text", 3)
    val all = docs.select(col("doc_id").as("id1"))
      .crossJoin(docs.select(col("doc_id").as("id2")))
      .filter(col("id1") < col("id2"))
    val truth = Dedup.verifyJaccard(all, rows)
      .filter(col("jaccard") >= 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "test data should contain planted near-dups")
    assert(found == truth, s"missed=${truth -- found} extra=${found -- truth}")
    // the x2 gate's trimmed operating point (64 hashes / 16 bands) must
    // hold the same recall: planted near-dups sit at J ≥ 0.89, where
    // P(candidate) ≈ 1 even with 4 rows per band
    val found64 = Dedup.minhashNearDups(docs, "doc_id", "text", 3, 64, 16, 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(found64 == truth, s"64/16 missed=${truth -- found64} extra=${found64 -- truth}")
  }

  test("incremental near-dups against a stored band store == full recompute restricted to the batch") {
    val docs = Tables.documents(spark, dir)
    val old = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    assert(batch.count() > 0 && old.count() > 0)
    val store = java.nio.file.Files.createTempDirectory("band-store").toString
    Dedup.writeBandStore(old, "doc_id", "text", store, 3, 96, 32)
    val inc = Dedup.incrementalNearDups(spark, batch, "doc_id", "text", store,
        3, 96, 32, 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // truth: the full-corpus pipeline's pairs that touch a batch id —
    // signatures are content-local, so incremental must reproduce them
    val batchIds = batch.select("doc_id").as[Long].collect().toSet
    val full = Dedup.minhashNearDups(docs, "doc_id", "text", 3, 96, 32, 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
      .filter(p => batchIds(p._1) || batchIds(p._2))
    assert(full.nonEmpty, "the split must cut across planted near-dup pairs")
    assert(inc == full, s"missed=${full -- inc} extra=${inc -- full}")
    // jaccard values agree exactly with the batch pipeline's
    val incJ = Dedup.incrementalNearDups(spark, batch, "doc_id", "text", store,
        3, 96, 32, 0.5)
      .select("id1", "id2", "jaccard").as[(Long, Long, Double)].collect()
      .map(t => ((t._1, t._2), t._3)).toMap
    val fullJ = Dedup.minhashNearDups(docs, "doc_id", "text", 3, 96, 32, 0.5)
      .select("id1", "id2", "jaccard").as[(Long, Long, Double)].collect()
      .map(t => ((t._1, t._2), t._3)).toMap
    incJ.foreach { case (k, j) => assert(fullJ(k) == j, s"$k jaccard drift") }
    // append folds the batch in at delta cost; a re-probe of the SAME
    // batch against the appended store must not pair a doc with its own
    // stored copy and must reproduce the same pairs
    Dedup.appendBandStore(batch, "doc_id", "text", store, 3, 96, 32)
    val reprobe = Dedup.incrementalNearDups(spark, batch, "doc_id", "text", store,
        3, 96, 32, 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(reprobe == full, s"after append: missed=${full -- reprobe} extra=${reprobe -- full}")
    assert(reprobe.forall { case (a, b) => a != b })
  }

  /** Every path from a scan of a table whose location contains `substr`
    * up to its first enclosing join must be Exchange-free — the
    * bucketed-store contract: the store is read pre-partitioned, only
    * the probe side shuffles. (Shuffles ABOVE the join — distinct,
    * aggregation — are candidate-sized and allowed.) AQE-aware. */
  private def storedJoinSideUnshuffled(df: org.apache.spark.sql.DataFrame,
      substr: String): Boolean = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    def paths(p: SparkPlan, anc: List[SparkPlan]): Seq[List[SparkPlan]] = p match {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(substr)) =>
        Seq(anc) // ancestors, nearest first
      case a: AdaptiveSparkPlanExec => paths(a.executedPlan, anc)
      case q: QueryStageExec => paths(q.plan, anc)
      case other => other.children.flatMap(c => paths(c, other :: anc))
    }
    val ps = paths(df.queryExecution.executedPlan, Nil)
    assert(ps.nonEmpty, s"no scan of $substr found in the plan")
    ps.forall(_.takeWhile(!_.isInstanceOf[BaseJoinExec])
      .forall(!_.isInstanceOf[ShuffleExchangeLike]))
  }

  test("finite-embeddings contract: finiteOnly gates NaN/Inf; dim/plane misconfig and NaN assignment fail loudly") {
    val vecs = Seq(
      (1L, Array(1f, 2f, 3f, 4f)),
      (2L, Array(1f, Float.NaN, 3f, 4f)),
      (3L, Array(Float.PositiveInfinity, 2f, 3f, 4f)),
      (4L, Array(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    // the ingest gate keeps only finite vectors
    assert(Similarity.finiteOnly(vecs).select("vec_id")
      .as[Long].collect().toSet == Set(1L, 4L))
    // a NaN vector reaching IVF assignment raises instead of landing in
    // the unreachable sentinel cell
    val cents = Array((0, Array(1f, 0f, 0f, 0f)), (1, Array(0f, 1f, 0f, 0f)))
    val ok = graft.ext.Ivf.assign(vecs.filter(col("vec_id") === 1), cents)
    assert(ok.select("cell").as[Int].collect().length == 1)
    intercept[Exception] {
      graft.ext.Ivf.assign(vecs.filter(col("vec_id") === 2), cents).collect()
    }
    // LSH: plane dimension must match the embeddings (raise at exec),
    // and non-divisible plane counts are rejected at build
    val planes8 = Similarity.hyperplanes(8, dim = 8)
    intercept[Exception] {
      vecs.filter(col("vec_id") === 1)
        .select(Similarity.lshSignature(col("embedding"), planes8, 4)).collect()
    }
    intercept[IllegalArgumentException] {
      Similarity.lshSignature(col("embedding"), Similarity.hyperplanes(6, 4), 4)
    }
  }

  test("verifyJaccardArrays == verifyJaccard, bit-for-bit, including zero-intersection pairs") {
    val docs = Tables.documents(spark, dir)
    // the x2b pair table (planted near-dups) + deliberately unrelated
    // pairs (id, id+7) so zero/low-intersection paths are covered
    val near = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("id1"), (col("doc_id") + 1).as("id2"))
    val far = docs.filter(col("doc_id") % 5 === 2)
      .select(col("doc_id").as("id1"), (col("doc_id") + 7).as("id2"))
    val pairs = near.unionByName(far)
      .join(docs.select(col("doc_id").as("id2")), Seq("id2")).select("id1", "id2")
    val rows = Dedup.shingleRows(docs, "doc_id", "text", 3)
    val a = Dedup.verifyJaccard(pairs, rows)
      .select("id1", "id2", "jaccard").as[(Long, Long, Double)].collect().toSet
    val b = Dedup.verifyJaccardArrays(pairs, rows)
      .select("id1", "id2", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(a.nonEmpty && a == b)
  }

  test("bucketed band store: probe == full recompute; the store never shuffles before its joins") {
    val docs = Tables.documents(spark, dir)
    val old = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val prefix = "extspec_bandstore"
    Dedup.writeBandStoreBucketed(old, "doc_id", "text", prefix, buckets = 4,
      shingleN = 3, numHashes = 96, bands = 32)
    try {
      val inc = Dedup.incrementalNearDupsBucketed(spark, batch, "doc_id", "text",
          prefix, 3, 96, 32, 0.5)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      val batchIds = batch.select("doc_id").as[Long].collect().toSet
      val full = Dedup.minhashNearDups(docs, "doc_id", "text", 3, 96, 32, 0.5)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
        .filter(p => batchIds(p._1) || batchIds(p._2))
      assert(full.nonEmpty && inc == full,
        s"missed=${full -- inc} extra=${inc -- full}")
      // plan discipline, asserted on the probe's two intermediate
      // frames (the public API checkpoints, which erases the plan):
      // neither stored scan crosses an Exchange before its join.
      val newRows = Dedup.shingleRows(batch, "doc_id", "text", 3)
      val newBands = Dedup.lshBuckets(
        Dedup.minhashSignature(newRows, 96), 96, 32)
      val newIds = batch.select(col("doc_id").as("id")).distinct()
      val (cand, rows) = Dedup.incrementalCandidateRows(newBands, newRows,
        newIds, spark.table(s"${prefix}_bands"), spark.table(s"${prefix}_shingles"))
      cand.collect(); rows.collect() // materialize AQE's final plans
      assert(storedJoinSideUnshuffled(cand, s"${prefix}_bands"),
        "stored bands shuffled before the candidate join")
      assert(storedJoinSideUnshuffled(rows, s"${prefix}_shingles"),
        "stored shingles shuffled before the verification fetch")
      // append at delta cost, re-probe of the same batch: no self-pairs
      Dedup.appendBandStoreBucketed(batch, "doc_id", "text", prefix,
        buckets = 4, shingleN = 3, numHashes = 96, bands = 32)
      val reprobe = Dedup.incrementalNearDupsBucketed(spark, batch, "doc_id",
          "text", prefix, 3, 96, 32, 0.5)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      assert(reprobe == full,
        s"after append: missed=${full -- reprobe} extra=${reprobe -- full}")
      // assertDisjoint enforces the disjoint-ids precondition: the
      // batch is now IN the store, so a re-append with the flag raises
      // (naming offenders) instead of silently bloating the store
      val dupErr = intercept[IllegalArgumentException] {
        Dedup.appendBandStoreBucketed(batch, "doc_id", "text", prefix,
          buckets = 4, shingleN = 3, numHashes = 96, bands = 32,
          assertDisjoint = true)
      }
      assert(dupErr.getMessage.contains("already present"))
      // the append left >1 file in some bucket; compaction (a pure
      // store rewrite — nothing re-shingles) restores one file per
      // bucket and changes no results
      assert(spark.table(s"${prefix}_shingles").inputFiles.length > 4)
      Dedup.compactBandStore(spark, prefix, buckets = 4)
      assert(spark.table(s"${prefix}_shingles").inputFiles.length <= 4)
      assert(spark.table(s"${prefix}_bands").inputFiles.length <= 4)
      val postCompact = Dedup.incrementalNearDupsBucketed(spark, batch,
          "doc_id", "text", prefix, 3, 96, 32, 0.5)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      assert(postCompact == full)
      // takedown: deleting the appended batch restores the pre-append
      // store exactly (probe results identical, layout preserved)
      Dedup.deleteFromBandStore(spark, prefix, batch.select("doc_id"),
        buckets = 4)
      assert(spark.table(s"${prefix}_shingles").inputFiles.length <= 4)
      val postDelete = Dedup.incrementalNearDupsBucketed(spark, batch,
          "doc_id", "text", prefix, 3, 96, 32, 0.5)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      assert(postDelete == full)
      val storedIds = spark.table(s"${prefix}_shingles")
        .select("id").distinct().as[Long].collect().toSet
      val batchIds2 = batch.select("doc_id").as[Long].collect().toSet
      assert(storedIds.intersect(batchIds2).isEmpty,
        "deleted ids must be gone from the store")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${prefix}_bands")
      spark.sql(s"DROP TABLE IF EXISTS ${prefix}_shingles")
    }
  }

  test("simhash: identical docs collide, hamming 0; near-dups within 3 bits detected") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content about spark catalyst optimizer rules"))
      .toDF("doc_id", "text")
    val sig = Dedup.simhash(docs, "doc_id", "text").orderBy("id").collect()
    assert(sig(0).getLong(1) == sig(1).getLong(1))
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text", 3).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L && r.getInt(2) == 0))
  }

  test("exact dedup keeps min id and counts dups") {
    val df = Seq((5L, "a"), (3L, "a"), (9L, "b")).toDF("id", "k")
    val out = Dedup.exact(df, "id", Seq("k"))
      .select("keep_id", "n_dups").orderBy("keep_id").collect()
    assert(out(0).getLong(0) == 3L && out(0).getLong(1) == 2L)
    assert(out(1).getLong(0) == 9L && out(1).getLong(1) == 1L)
  }

  test("LSH ANN recall ≥ 0.8 vs brute force on sf0.001") {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(q, emb, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(q, emb, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & approx).size.toDouble / brute.size
    assert(recall >= 0.8, s"LSH recall $recall")
  }

  test("IVF ANN recall ≥ 0.6 vs brute force at nprobe=4, and higher nprobe never hurts") {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(q, emb, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val idx = graft.ext.Ivf.build(emb, k = 8)
    def recall(nprobe: Int): Double = {
      val got = graft.ext.Ivf.topK(q, idx, 5, nprobe)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (brute & got).size.toDouble / brute.size
    }
    val r4 = recall(4)
    assert(r4 >= 0.6, s"IVF recall at nprobe=4: $r4")
    assert(recall(8) >= r4, "probing every cell must reach full recall path")
  }

  test("LSH-blocked embedding dedup: precision 1.0, recall ≥ 0.8 vs brute-force pairs") {
    val emb = Tables.embeddings(spark, dir)
    val a = emb.select(col("label").as("blk"), col("vec_id").as("id1"), col("embedding").as("v1"))
    // brute-force ALL pairs ≥ threshold (ignore labels entirely)
    val l = emb.select(col("vec_id").as("id1"), col("embedding").as("v1"))
    val r = emb.select(col("vec_id").as("id2"), col("embedding").as("v2"))
    val brute = l.crossJoin(r).filter(col("id1") < col("id2"))
      .withColumn("cos", Similarity.cosine(col("v1"), col("v2")))
      .filter(col("cos") >= 0.4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val found = Similarity.embeddingNearDupsLsh(emb, 0.4, bitsPerBand = 4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert((found -- brute).isEmpty, "verified pairs can never be false positives")
    if (brute.nonEmpty) {
      val recall = (brute & found).size.toDouble / brute.size
      assert(recall >= 0.8, s"LSH dedup recall $recall over ${brute.size} true pairs")
    }
  }

  test("semantic decontamination: planted probe twin flagged at cos 1; LSH path is a no-FP subset with recall") {
    val emb = Tables.embeddings(spark, dir)
    val probes = emb.filter(col("vec_id") % 41 === 0)
    // plant an exact copy of a probe in the corpus: must be flagged
    // with max_cos ≈ 1 regardless of threshold strictness
    val probeTwin = probes.limit(1)
      .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"), col("label"))
    val corpus = emb.filter(col("vec_id") % 41 =!= 0).unionByName(probeTwin)
    val exact = Similarity.semanticContamination(corpus, probes, threshold = 0.3)
    val twin = exact.filter(col("vec_id") >= 900000L)
      .select("max_cos").as[Double].collect()
    assert(twin.length == 1 && twin.head > 0.999999, s"planted twin: ${twin.toSeq}")

    // LSH-banded path: no false positives — flags are a subset of the
    // exact flags, each max_cos a true cosine bounded by the exact one
    // (LSH may miss the argmax probe while catching another) — and
    // recall stays useful at the 4-bit operating point
    val exactSet = exact.select("vec_id").as[Long].collect().toSet
    val lsh = Similarity.semanticContaminationLsh(corpus, probes, threshold = 0.3)
    val lshRows = lsh.select("vec_id", "max_cos").as[(Long, Double)].collect()
    assert(lshRows.map(_._1).toSet.subsetOf(exactSet), "LSH flags must be a subset")
    val exactCos = exact.select("vec_id", "max_cos").as[(Long, Double)].collect().toMap
    lshRows.foreach { case (id, c) =>
      assert(c >= 0.3 && c <= exactCos(id) + 1e-9, s"max_cos out of range for $id") }
    val recall = lshRows.length.toDouble / exactSet.size
    assert(recall >= 0.6, s"LSH decontam recall $recall over ${exactSet.size} flags")
    assert(lshRows.map(_._1).toSet.exists(_ >= 900000L), "twin must survive banding")
  }

  test("snapshotDiff: planted add/remove/change classified; multi-column separator prevents aliasing") {
    val oldS = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "ab", "c")).toDF("id", "t1", "t2")
    val newS = Seq((2L, "b", "z"), (3L, "a", "bc"), (4L, "d", "w")).toDF("id", "t1", "t2")
    val got = Dedup.snapshotDiff(oldS, newS, "id", Seq("t1", "t2"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "changed", 3L -> "changed", 4L -> "added"))
    // ("ab","c") vs ("a","bc") MUST differ — the control-char separator
    // (row 3 above) — and identical content is unchanged
    val same = Dedup.snapshotDiff(oldS, oldS, "id", Seq("t1", "t2"))
      .filter(col("status") =!= "unchanged").count()
    assert(same == 0)
  }

  test("lineDedup: cross-doc lines removed, within-doc repeats kept, all-removed doc survives empty") {
    val docs = Seq(
      (1L, "a b c d e f g h i j k l m n o p"),
      (2L, "a b c d e f g h z z z z z z z z"),
      (3L, "q r s"),
      (4L, "a b c d e f g h"),
      (5L, "x x x x x x x x x x x x x x x x")).toDF("id", "text")
    val got = Dedup.lineDedup(docs, "id", "text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // "a b c d e f g h" lives in docs 1, 2, 4 → removed from all three
    assert(got(1L) == ((2L, 1L, "i j k l m n o p")))
    assert(got(2L) == ((2L, 1L, "z z z z z z z z")))
    assert(got(3L) == ((1L, 0L, "q r s")))
    // every line duplicated ⇒ doc survives with empty text
    assert(got(4L) == ((1L, 1L, "")))
    // repeats WITHIN one doc are not cross-doc duplicates — both kept
    assert(got(5L) == ((2L, 0L, "x x x x x x x x x x x x x x x x")))
  }

  test("lineDedup: exchanges key on the 8-byte line hash, never the line string") {
    val docs = graft.store.Tables.documents(spark, dir)
    val plan = Dedup.lineDedup(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty)
    // the dup-agg and dup-join exchanges carry __lh; no exchange keys on
    // the raw __line string (the final by-doc agg keys on doc_id)
    assert(exchanges.exists(_.contains("__lh")), s"no hash-keyed exchange:\n$plan")
    assert(!exchanges.exists(e => e.contains("__line#") && !e.contains("__lh")),
      s"an exchange still keys on the line string:\n$plan")
  }

  test("cosine is exact on known vectors") {
    val df = Seq((Array(1f, 0f), Array(0f, 1f)), (Array(1f, 1f), Array(1f, 1f)))
      .toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    val c = df.collect().map(_.getDouble(0))
    assert(math.abs(c(0)) < 1e-12 && math.abs(c(1) - 1.0) < 1e-12)
  }

  test("langId picks marker-dominant language, und on no hits") {
    val df = Seq((1L, "der hund und die katze ist ein tier"),
      (2L, "the cat and the dog is a pet of the house"),
      (3L, "zzz qqq xxx")).toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.langId(col("text")).as("pred"))
    val m = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) == "de" && m(2L) == "en" && m(3L) == "und")
  }

  test("multimodal: metadata pruning before decode, per-partition feature extraction") {
    val media = Multimodal.syntheticMediaTable(spark, dir)
    // metadata-only filter must not touch payload (plan check: pushed filter)
    val videos = media.filter(col("kind") === "video" && col("duration_ms") > 0)
    val feats = Multimodal.extractFeatures(videos.as[Multimodal.MediaRow])
    val rows = feats.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.feature.length == Multimodal.FakeCodec.FeatureDim))
    assert(rows.forall(r => r.n_bytes > 0 && r.checksum != 0))
    // frame sampling fans out ~duration/interval rows
    val frames = Multimodal.sampleFrames(media, 800)
    val perMedia = frames.groupBy("media_id").count().collect()
    assert(perMedia.forall(_.getLong(1) >= 1))
  }

  test("multimodal: injected codec drives the same pipeline (the deployment seam)") {
    // a test codec with a different dimension and recognizable outputs:
    // proves extractFeatures runs whatever Codec is handed in — the
    // seam a deployment uses to swap libjpeg/ffmpeg in for FakeCodec
    object TestCodec extends Multimodal.Codec {
      override def featureDim: Int = 3
      override def decode(payload: Array[Byte]): Array[Float] =
        Array(payload.length.toFloat, payload.headOption.map(_.toFloat).getOrElse(0f), 42f)
      override def checksum(payload: Array[Byte]): Long = payload.length.toLong * 7L
    }
    val media = Multimodal.syntheticMediaTable(spark, dir)
      .filter(col("kind") === "image")
    val rows = Multimodal.extractFeatures(media.as[Multimodal.MediaRow], TestCodec)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.feature.length == 3))
    assert(rows.forall(r => r.feature(0) == r.n_bytes.toFloat && r.feature(2) == 42f))
    assert(rows.forall(r => r.checksum == r.n_bytes.toLong * 7L))
  }

  test("ImageIoCodec: real PNG decode matches first-principles golden pixels") {
    import Multimodal.ImageIoCodec
    // the synthetic pattern's pixel (x, y) for seed s is known in closed
    // form — recompute the expected features independently of the codec
    val (seed, w, h) = (1L, 2, 2)
    val png = ImageIoCodec.syntheticPng(seed, w, h)
    // PNG magic — this is a real container, not a stub byte bag
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    def px(x: Int, y: Int): (Int, Int, Int) = (
      ((seed + x * 7 + y * 13) % 256).toInt,
      ((seed * 3 + x * 11 + y * 5) % 256).toInt,
      ((seed * 5 + x * 3 + y * 17) % 256).toInt)
    val pxs = for (y <- 0 until h; x <- 0 until w) yield px(x, y)
    val f = ImageIoCodec.decode(png)
    assert(f(0) == w.toFloat && f(1) == h.toFloat && f(2) == 1.0f)
    val meanR = pxs.map(_._1 / 255.0).sum / pxs.size
    val meanG = pxs.map(_._2 / 255.0).sum / pxs.size
    val meanB = pxs.map(_._3 / 255.0).sum / pxs.size
    assert(math.abs(f(3) - meanR) < 1e-6 && math.abs(f(4) - meanG) < 1e-6 &&
      math.abs(f(5) - meanB) < 1e-6)
    // checksum is over DECODED ARGB in raster order: recompute it
    var expect = 1125899906842597L
    pxs.foreach { case (r, g, b) =>
      expect = 31 * expect + (0xFF000000 | (r << 16) | (g << 8) | b)
    }
    assert(ImageIoCodec.checksum(png) == expect)
    // re-encoding the same pixels yields the same content checksum
    val reenc = ImageIoCodec.encodePng(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png)))
    assert(ImageIoCodec.checksum(reenc) == expect)
    // the closed-form expectation path (no encode/decode) agrees
    assert(ImageIoCodec.syntheticChecksum(seed, w, h) == expect)
  }

  test("dHash: brightness-shift invariant, resize-proximate, orientation-distinct; imageNearDups finds planted twins only") {
    import Multimodal.ImageIoCodec
    def img(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
      val b = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = f(x, y)
        b.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      ImageIoCodec.encodePng(b)
    }
    // a horizontal gradient capped at 180 so +40 never clamps
    val grad = img(36, 32)((x, _) => x * 5)
    val brighter = img(36, 32)((x, _) => x * 5 + 40)
    val vertical = img(36, 32)((_, y) => y * 5)
    val checker = img(36, 32)((x, y) => if ((x / 4 + y / 4) % 2 == 0) 30 else 150)
    val hGrad = ImageIoCodec.dHash(grad).get
    // uniform brightness shift: every horizontal comparison unchanged
    assert(ImageIoCodec.dHash(brighter).get == hGrad)
    // horizontal gradient: every adjacent-cell comparison increases
    assert(hGrad == -1L) // all 64 bits set
    // vertical gradient: rows are constant, no bit set
    assert(ImageIoCodec.dHash(vertical).get == 0L)
    // a box resize of the smooth gradient stays within the near-dup radius
    val resized = ImageIoCodec.dHash(
      ImageIoCodec.resizePayload(grad, 18)).get
    assert(java.lang.Long.bitCount(hGrad ^ resized) <= 3)
    // undecodable bytes and degenerate widths: None, never a throw
    assert(ImageIoCodec.dHash("not a png".getBytes("UTF-8")).isEmpty)
    assert(ImageIoCodec.dHash(img(1, 4)((_, _) => 9)).isEmpty)

    // the distributed pair stage: identical + brightness twins cluster,
    // orientations don't, the broken payload drops silently
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", grad, 36, 32, 0L),
      Multimodal.MediaRow(2L, "image", brighter, 36, 32, 0L),
      Multimodal.MediaRow(3L, "image", vertical, 36, 32, 0L),
      Multimodal.MediaRow(4L, "image", checker, 36, 32, 0L),
      Multimodal.MediaRow(5L, "image", "broken".getBytes("UTF-8"), 0, 0, 0L),
      Multimodal.MediaRow(6L, "image", grad, 36, 32, 0L))
    val ds = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val pairs = Multimodal.imageNearDups(ds, maxHamming = 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 6L), (2L, 6L)), s"$pairs")
  }

  test("pHash: JPEG re-encode found at radius <= 6 where dHash misses; brightness invariant; undecodable drops") {
    import Multimodal.ImageIoCodec
    // the golden fixture (probe-selected, deterministic): a seeded
    // smooth bilinear field, 48x48 from a 12x12 coarse grid, JPEG
    // re-encoded at quality 0.05 — dHash's near-tie gradient bits flip
    // past radius 6, the low-frequency DCT block does not
    def smooth(seed: Long, n: Int, cg: Int): java.awt.image.BufferedImage = {
      val rnd = new java.util.Random(seed)
      val coarse = Array.fill(cg + 1, cg + 1)(rnd.nextInt(256))
      val im = new java.awt.image.BufferedImage(n, n,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until n; x <- 0 until n) {
        val fx = x * cg.toDouble / n; val fy = y * cg.toDouble / n
        val ix = fx.toInt; val iy = fy.toInt
        val ax = fx - ix; val ay = fy - iy
        val v = coarse(iy)(ix) * (1 - ax) * (1 - ay) +
          coarse(iy)(ix + 1) * ax * (1 - ay) +
          coarse(iy + 1)(ix) * (1 - ax) * ay +
          coarse(iy + 1)(ix + 1) * ax * ay
        val g = math.max(0, math.min(255, v.toInt))
        im.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      im
    }
    def jpeg(im: java.awt.image.BufferedImage, q: Float): Array[Byte] = {
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val p = w.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(q)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      w.setOutput(ios)
      w.write(null, new javax.imageio.IIOImage(im, null, null), p)
      ios.close(); w.dispose()
      bos.toByteArray
    }
    val im = smooth(4L, 48, 12)
    val png = ImageIoCodec.encodePng(im)
    val jpg = jpeg(im, 0.05f)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val dDist = ham(ImageIoCodec.dHash(png).get, ImageIoCodec.dHash(jpg).get)
    val pDist = ham(ImageIoCodec.pHash(png).get, ImageIoCodec.pHash(jpg).get)
    assert(dDist > 6, s"fixture drifted: dHash distance $dDist")
    assert(pDist <= 6, s"pHash distance $pDist")
    // brightness shift (no clipping): only the DC coefficient moves —
    // it was already above the median, so the hash is identical
    def shifted(d: Int): Array[Byte] = {
      val b = new java.awt.image.BufferedImage(48, 48,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 48) {
        val g0 = im.getRGB(x, y) & 0xff
        val g = math.min(200, g0 / 2 + 50) + d // keep headroom for +40
        b.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      ImageIoCodec.encodePng(b)
    }
    assert(ImageIoCodec.pHash(shifted(0)).get == ImageIoCodec.pHash(shifted(40)).get)
    // undecodable bytes: None, never a throw
    assert(ImageIoCodec.pHash("not a png".getBytes("UTF-8")).isEmpty)
    // the distributed pair stage at radius 6: pHash pairs the PNG with
    // its JPEG twin; dHash at the same radius does NOT
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", png, 48, 48, 0L),
      Multimodal.MediaRow(2L, "image", jpg, 48, 48, 0L),
      Multimodal.MediaRow(3L, "image",
        ImageIoCodec.syntheticPng(77L, 18, 14), 18, 14, 0L))
    val ds = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val pPairs = Multimodal.imageNearDupsPhash(ds, maxHamming = 6)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pPairs == Set((1L, 2L)), s"$pPairs")
    val dPairs = Multimodal.imageNearDups(ds, maxHamming = 6)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(dPairs.isEmpty, s"$dPairs")
  }

  test("videoNearDups: byte-identical twin shares every sampled frame; pairs == the closed form over collected hashes") {
    import Multimodal.AviCodec
    val vidA = AviCodec.syntheticAvi(5L, 6, 36, 32, fps = 10)
    val vidB = AviCodec.syntheticAvi(99L, 6, 36, 32, fps = 10)
    val vidC = AviCodec.syntheticAvi(7L, 4, 20, 16, fps = 10)
    val rows = Seq(
      Multimodal.MediaRow(1L, "video", vidA, 36, 32, 600L),
      Multimodal.MediaRow(2L, "video", vidA, 36, 32, 600L), // twin
      Multimodal.MediaRow(3L, "video", vidB, 36, 32, 600L),
      Multimodal.MediaRow(4L, "video", vidC, 20, 16, 400L))
    val ds = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val fh = Multimodal.videoFrameDHash(ds, intervalMs = 100)
      .as[(Long, Int, Long)].collect()
    // the fixture is only meaningful if its frames are discriminative
    val perVid = fh.filter(t => t._3 != 0L && t._3 != -1L)
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert(perVid(1L).nonEmpty)
    assert(perVid(1L) == perVid(2L)) // byte-identical twin
    // pairs must equal the closed form over the SAME hashes — presence
    // and absence both derived from data, not from assumed diversity
    val expected = (for {
      (i, hi) <- perVid.toSeq; (j, hj) <- perVid.toSeq if i < j
      shared = (hi intersect hj).size if shared >= 2
    } yield (i, j, shared.toLong)).toSet
    val got = Multimodal.videoNearDups(ds, intervalMs = 100, minShared = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected, s"got $got expected $expected")
    assert(got.exists(p => p._1 == 1L && p._2 == 2L)) // the twin pair
  }

  test("signatureNearDups: 8-bit-block banding finds radius-6 pairs that quarter blocking provably misses") {
    // s2 differs from s1=0 in 6 bits placed so EVERY 16-bit quarter
    // differs (quarter blocking has no agreeing block -> would miss),
    // while 8-bit blocks 5 and 7 agree (pigeonhole <= 7 holds)
    val s1 = 0L
    val s2 = (1L << 0) | (1L << 8) | (1L << 16) | (1L << 24) |
      (1L << 32) | (1L << 48)
    assert((0 until 4).forall(q => ((s1 ^ s2) >>> (q * 16) & 0xFFFFL) != 0L),
      "fixture must defeat quarter blocking")
    assert(java.lang.Long.bitCount(s1 ^ s2) == 6)
    val sig = Seq((1L, s1), (2L, s2), (3L, 0x5555555555555555L))
      .toDF("id", "sig")
    val at6 = Dedup.signatureNearDups(sig, "id", "sig", maxHamming = 6)
      .select("id1", "id2", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(at6 == Set((1L, 2L, 6)), s"$at6")
    // radius 3 (the quarter path) correctly excludes the distance-6 pair
    assert(Dedup.signatureNearDups(sig, "id", "sig", maxHamming = 3).isEmpty)
    // beyond the pigeonhole bound: loud failure, never silent misses
    intercept[IllegalArgumentException] {
      Dedup.signatureNearDups(sig, "id", "sig", maxHamming = 8)
    }
  }

  test("signatureNearDups: exact-signature pre-collapse keeps all equal-sig pairs and expands cross pairs") {
    // 4 ids share one signature (the massively-duplicated-image case:
    // the band join sees the signature ONCE), one near signature 2 bits
    // away, one far signature
    val shared = 0x0123456789ABCDEFL
    val near = shared ^ ((1L << 3) | (1L << 40))
    val sig = Seq((10L, shared), (11L, shared), (12L, shared), (13L, shared),
      (20L, near), (30L, ~shared)).toDF("id", "sig")
    val got = Dedup.signatureNearDups(sig, "id", "sig", maxHamming = 3)
      .select("id1", "id2", "hamming").as[(Long, Long, Int)].collect().toSet
    val withinPairs = (for (a <- Seq(10L, 11L, 12L, 13L); b <- Seq(10L, 11L, 12L, 13L)
      if a < b) yield (a, b, 0)).toSet
    val crossPairs = Seq(10L, 11L, 12L, 13L).map(a => (a, 20L, 2)).toSet
    assert(got == withinPairs ++ crossPairs, s"$got")
    // radius 0: equal signatures only, no banding
    val at0 = Dedup.signatureNearDups(sig, "id", "sig", maxHamming = 0)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(at0 == withinPairs.map(p => (p._1, p._2)))
  }

  test("videoNearDups: frequency cap drops ubiquitous fingerprints — pair count bounded, not N^2") {
    import Multimodal.AviCodec
    // 6 clones of one video (every frame a shared "intro card" at df=6)
    // plus a twin pair of a different video (df=2)
    val vidA = AviCodec.syntheticAvi(5L, 6, 36, 32, fps = 10)
    val vidB = AviCodec.syntheticAvi(99L, 6, 36, 32, fps = 10)
    val rows = (1L to 6L).map(i => Multimodal.MediaRow(i, "video", vidA, 36, 32, 600L)) ++
      Seq(Multimodal.MediaRow(7L, "video", vidB, 36, 32, 600L),
        Multimodal.MediaRow(8L, "video", vidB, 36, 32, 600L))
    val ds = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    // fixture sanity: A and B carry disjoint non-degenerate hash sets
    // (otherwise the closed forms below wouldn't be exact)
    val fh = Multimodal.videoFrameDHash(ds, intervalMs = 100)
      .filter(col("dhash") =!= 0L && col("dhash") =!= -1L)
      .select("media_id", "dhash").as[(Long, Long)].collect()
    val hA = fh.filter(_._1 == 1L).map(_._2).toSet
    val hB = fh.filter(_._1 == 7L).map(_._2).toSet
    assert(hA.nonEmpty && hB.nonEmpty && (hA & hB).isEmpty,
      "fixture requires disjoint A/B fingerprints")
    // capped at 3: the df=6 fingerprints drop BEFORE the self-join —
    // zero pairs among the 6 clones (not 15), the df=2 twin survives
    val capped = Multimodal.videoNearDups(ds, intervalMs = 100,
        minShared = 1, maxFreq = 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(capped == Set((7L, 8L)), s"$capped")
    // the default cap (1000) leaves the fixture uncapped: all 15 clone
    // pairs plus the twin
    val uncapped = Multimodal.videoNearDups(ds, intervalMs = 100, minShared = 1)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(uncapped.size == 15 + 1, s"${uncapped.size}")
  }

  test("energyHash: gain-doubling invariant, waveform-distinct; audioNearDups finds the planted twin") {
    import Multimodal.WavCodec
    def wav(samples: Array[Short], rate: Int = 8000): Array[Byte] = {
      val n = samples.length * 2
      val bos = new java.io.ByteArrayOutputStream()
      val d = new java.io.DataOutputStream(bos)
      def le32(v: Int): Unit = { d.write(v); d.write(v >> 8); d.write(v >> 16); d.write(v >> 24) }
      def le16(v: Int): Unit = { d.write(v); d.write(v >> 8) }
      d.writeBytes("RIFF"); le32(36 + n); d.writeBytes("WAVE")
      d.writeBytes("fmt "); le32(16); le16(1); le16(1); le32(rate)
      le32(rate * 2); le16(2); le16(16)
      d.writeBytes("data"); le32(n)
      samples.foreach(s => le16(s & 0xffff))
      bos.toByteArray
    }
    // frame energies vary irregularly; magnitudes < 16000 so x2 fits
    val base = Array.tabulate(650)(i =>
      ((((i * 31) % 17) - 8) * (((i / 50) * 7) % 13 + 1) * 90).toShort)
    val hBase = WavCodec.energyHash(wav(base)).get
    // exact gain doubling scales every frame energy by 4: hash identical
    val doubled = base.map(v => (v * 2).toShort)
    assert(WavCodec.energyHash(wav(doubled)).get == hBase)
    // a different waveform lands far away
    val other = Array.tabulate(650)(i =>
      ((((i * 13) % 23) - 11) * (((i / 50) * 5) % 7 + 1) * 90).toShort)
    val hOther = WavCodec.energyHash(wav(other)).get
    assert(java.lang.Long.bitCount(hBase ^ hOther) > 3)
    // too short / undecodable: None, never a throw
    assert(WavCodec.energyHash(wav(Array.tabulate(30)(_.toShort))).isEmpty)
    assert(WavCodec.energyHash("not audio".getBytes("UTF-8")).isEmpty)

    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", wav(base), 0, 0, 650L),
      Multimodal.MediaRow(2L, "audio", wav(doubled), 0, 0, 650L),
      Multimodal.MediaRow(3L, "audio", wav(other), 0, 0, 650L),
      Multimodal.MediaRow(4L, "audio", "junk".getBytes("UTF-8"), 0, 0, 0L))
    val ds = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val pairs = Multimodal.audioNearDups(ds, maxHamming = 0)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"$pairs")
  }

  test("ImageIoCodec: nearest-neighbor resize picks the exact source pixels") {
    import Multimodal.ImageIoCodec
    val (seed, w, h) = (7L, 4, 4)
    val png = ImageIoCodec.syntheticPng(seed, w, h)
    val resized = ImageIoCodec.resizePayload(png, box = 2)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    assert(img.getWidth == 2 && img.getHeight == 2)
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    for (y <- 0 until 2; x <- 0 until 2)
      assert(img.getRGB(x, y) == src.getRGB(x * 4 / 2, y * 4 / 2),
        s"resized pixel ($x,$y) != source pixel (${x * 2},${y * 2})")
    // already-fits payloads keep their pixels (and content checksum)
    val small = ImageIoCodec.resizePayload(png, box = 16)
    assert(ImageIoCodec.checksum(small) == ImageIoCodec.checksum(png))
  }

  test("resizeMediaDecoded: distributed real resize, pixels and metadata agree") {
    import Multimodal.ImageIoCodec
    val media = Multimodal.syntheticImageTable(spark, dir)
    val out = Multimodal.resizeMediaDecoded(media, box = 6).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (w, h) = ((r.media_id % 16 + 4).toInt, (r.media_id % 12 + 4).toInt)
      val longest = math.max(w, h)
      val (ew, eh) =
        if (longest <= 6) (w, h)
        else (math.max(1, w * 6 / longest), math.max(1, h * 6 / longest))
      assert(r.width == ew && r.height == eh,
        s"media ${r.media_id}: dims ${r.width}x${r.height} != ${ew}x$eh")
      // payload is a real PNG of those dims whose pixels are the exact
      // nearest-neighbor picks from the source pattern
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      assert(img.getWidth == ew && img.getHeight == eh)
      for (y <- 0 until eh; x <- 0 until ew) {
        val (sx, sy) = (x * w / ew, y * h / eh)
        val expect = ((((r.media_id + sx * 7 + sy * 13) % 256) << 16) |
          (((r.media_id * 3 + sx * 11 + sy * 5) % 256) << 8) |
          ((r.media_id * 5 + sx * 3 + sy * 17) % 256)).toInt
        assert((img.getRGB(x, y) & 0xFFFFFF) == expect,
          s"media ${r.media_id} pixel ($x,$y)")
      }
    }
  }

  test("ImageIoCodec: distributed decode through the batch path on real PNGs") {
    val media = Multimodal.syntheticImageTable(spark, dir)
    val rows = Multimodal.extractFeatures(media, Multimodal.ImageIoCodec).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = (r.media_id % 16 + 4).toInt
      val h = (r.media_id % 12 + 4).toInt
      assert(r.feature(0) == w.toFloat && r.feature(1) == h.toFloat,
        s"media ${r.media_id}: decoded dims ${r.feature(0)}x${r.feature(1)} != ${w}x$h")
    }
  }

  test("WavCodec: real WAV decode matches closed-form tone features") {
    import Multimodal.WavCodec
    // seed 1 → period 9, amp 12288: a square wave with known samples
    val (seed, n) = (1L, 180)
    val wav = WavCodec.syntheticWav(seed, n)
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF" &&
      new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val f = WavCodec.decode(wav)
    assert(f(0) == n.toFloat && f(1) == 8000f)
    // square wave: every sample is ±amp → rms == peak == amp/32768
    val amp = (8192 + (seed % 5) * 4096) / 32768.0
    assert(math.abs(f(3) - amp) < 1e-6 && math.abs(f(4) - amp) < 1e-6)
    // sign flips exactly at period boundaries: 180 samples / period 9
    // → flips at 9, 18, ... (19 boundaries in 179 adjacent pairs)
    val period = (8 + seed % 25).toInt
    val flips = (1 until n).count(i => (i / period) % 2 != ((i - 1) / period) % 2)
    assert(math.abs(f(5) - flips / (n - 1).toDouble) < 1e-6)
    // checksum is over decoded samples — recompute from the formula
    var expect = 1125899906842597L
    val ampS = (8192 + (seed % 5) * 4096).toInt
    (0 until n).foreach { i =>
      expect = 31 * expect + (if ((i / period) % 2 == 0) ampS else -ampS)
    }
    assert(WavCodec.checksum(wav) == expect)
  }

  test("WavCodec: RIFF fast path decodes identically to AudioSystem") {
    import Multimodal.WavCodec
    for (seed <- 0L to 6L) {
      val wav = WavCodec.syntheticWav(seed, 240)
      // decode the same payload independently through AudioSystem and
      // recompute the sample checksum — the fast chunk-walk must agree
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      val fmt = in.getFormat
      val bytes = in.readAllBytes()
      in.close()
      assert(!fmt.isBigEndian && fmt.getSampleSizeInBits == 16)
      var expect = 1125899906842597L
      (0 until bytes.length / 2).foreach { i =>
        expect = 31 * expect + ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF)).toShort
      }
      assert(WavCodec.checksum(wav) == expect, s"seed $seed checksum")
      val f = WavCodec.decode(wav)
      assert(f(0) == bytes.length / 2f && f(1) == fmt.getSampleRate, s"seed $seed n/rate")
    }
  }

  test("WavCodec: distributed decode through the batch path on real WAVs") {
    val media = Multimodal.syntheticAudioTable(spark, dir)
    val rows = Multimodal.extractFeatures(media, Multimodal.WavCodec).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = (r.media_id % 400 + 100).toInt
      assert(r.feature(0) == n.toFloat,
        s"media ${r.media_id}: decoded ${r.feature(0)} samples, expected $n")
    }
  }

  test("AviCodec: DIB AVI round-trips the exact pattern pixels (golden)") {
    import Multimodal.AviCodec
    val (seed, nf, w, h) = (3L, 3, 5, 4)
    val avi = AviCodec.syntheticAvi(seed, nf, w, h, fps = 10)
    // a real RIFF/AVI container, not a stub byte bag
    assert(new String(avi.slice(0, 4), "US-ASCII") == "RIFF" &&
      new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val parsed = AviCodec.parse(avi)
    assert(parsed.width == w && parsed.height == h &&
      parsed.usPerFrame == 100000L && parsed.frames.length == nf)
    // DIB frames are lossless: every decoded pixel equals the closed form
    for (f <- 0 until nf; y <- 0 until h; x <- 0 until w) {
      val p = parsed.frames(f).getRGB(x, y)
      assert(((p >> 16) & 0xFF) == AviCodec.patR(seed, f, x, y) &&
        ((p >> 8) & 0xFF) == AviCodec.patG(seed, f, x, y) &&
        (p & 0xFF) == AviCodec.patB(seed, f, x, y),
        s"frame $f pixel ($x,$y) mismatch")
    }
    // features vs an independent recomputation of the pattern
    def luma(f: Int, x: Int, y: Int): Double =
      0.299 * AviCodec.patR(seed, f, x, y) / 255.0 +
        0.587 * AviCodec.patG(seed, f, x, y) / 255.0 +
        0.114 * AviCodec.patB(seed, f, x, y) / 255.0
    val lumas = (0 until nf).map(f =>
      (for (y <- 0 until h; x <- 0 until w) yield luma(f, x, y)).sum / (w * h))
    val motion = (1 until nf).map(f =>
      (for (y <- 0 until h; x <- 0 until w)
        yield math.abs(luma(f, x, y) - luma(f - 1, x, y))).sum / (w * h)).sum / (nf - 1)
    val feat = AviCodec.decode(avi)
    assert(feat(0) == nf.toFloat && feat(1) == w.toFloat &&
      feat(2) == h.toFloat && feat(3) == 10f)
    assert(math.abs(feat(4) - lumas.sum / nf) < 1e-6)
    assert(math.abs(feat(5) - motion) < 1e-6)
    assert(math.abs(feat(6) - lumas.head) < 1e-6 &&
      math.abs(feat(7) - lumas.last) < 1e-6)
    // content checksum recomputed from the formula over (frame, raster)
    var expect = 1125899906842597L
    for (f <- 0 until nf; y <- 0 until h; x <- 0 until w)
      expect = 31 * expect + (0xFF000000 | (AviCodec.patR(seed, f, x, y) << 16) |
        (AviCodec.patG(seed, f, x, y) << 8) | AviCodec.patB(seed, f, x, y))
    assert(AviCodec.checksum(avi) == expect)
  }

  test("AviCodec: MJPEG frames decode identically to their wrapped JPEGs") {
    import Multimodal.AviCodec
    val (seed, nf, w, h) = (5L, 2, 6, 4)
    val avi = AviCodec.syntheticAvi(seed, nf, w, h, fps = 10, mjpeg = true)
    val parsed = AviCodec.parse(avi)
    assert(parsed.frames.length == nf && parsed.width == w && parsed.height == h)
    // re-encode the same pattern frame as a standalone JPEG and decode it
    // with ImageIO directly: the parser must have extracted the exact
    // frame bytes, so pixels agree pixel-for-pixel (same encoder, same
    // decoder, same JVM)
    for (f <- 0 until nf) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (AviCodec.patR(seed, f, x, y) << 16) |
          (AviCodec.patG(seed, f, x, y) << 8) | AviCodec.patB(seed, f, x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      val direct = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      for (y <- 0 until h; x <- 0 until w)
        assert((parsed.frames(f).getRGB(x, y) & 0xFFFFFF) ==
          (direct.getRGB(x, y) & 0xFFFFFF),
          s"MJPEG frame $f pixel ($x,$y): container decode != direct decode")
    }
  }

  test("AviCodec: indexed seeks decode exactly the frames the full parse does") {
    import Multimodal.AviCodec
    val (seed, nf, w, h) = (9L, 6, 5, 4)
    for (mjpeg <- Seq(false, true); withIndex <- Seq(true, false)) {
      val avi = AviCodec.syntheticAvi(seed, nf, w, h, fps = 10, mjpeg, withIndex)
      val full = AviCodec.parse(avi).frames
      val lay = AviCodec.layout(avi)
      assert(lay.framePos.length == nf && lay.width == w && lay.height == h,
        s"mjpeg=$mjpeg idx=$withIndex layout")
      // out-of-range and duplicate requests are dropped/deduped
      val got = AviCodec.decodeFramesAt(avi, Seq(4, 1, 1, 4, 99, -1))
      assert(got.map(_._1) == Seq(1, 4), s"mjpeg=$mjpeg idx=$withIndex")
      got.foreach { case (i, img) =>
        for (y <- 0 until h; x <- 0 until w)
          assert(img.getRGB(x, y) == full(i).getRGB(x, y),
            s"mjpeg=$mjpeg idx=$withIndex frame $i pixel ($x,$y): seek != full parse")
      }
    }
  }

  test("AviCodec: sampled decode fans out only the sampled frames, sums exact") {
    import Multimodal.AviCodec
    val media = Multimodal.syntheticVideoTable(spark, dir)
    val rows = Multimodal.sampleFramesDecoded(media, intervalMs = 250).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.media_id).foreach { case (id, fs) =>
      val nf = (id % 6 + 2).toInt
      val expectIdx = (0L until nf * 100L by 250L).map(off => (off / 100).toInt)
        .distinct.filter(_ < nf).sorted
      assert(fs.map(_.frame_idx).sorted.toSeq == expectIdx, s"media $id sampled set")
      val (w, h) = ((id % 8 + 4).toInt, (id % 6 + 4).toInt)
      fs.foreach { r =>
        val sumR = (for (y <- 0 until h; x <- 0 until w)
          yield AviCodec.patR(id, r.frame_idx, x, y).toLong).sum
        assert(r.sum_r == sumR, s"media $id frame ${r.frame_idx} sum_r")
      }
    }
  }

  test("AviCodec: distributed per-frame fan-out with real decode") {
    import Multimodal.AviCodec
    val media = Multimodal.syntheticVideoTable(spark, dir)
    val rows = Multimodal.videoFrameTable(media).collect()
    assert(rows.nonEmpty)
    val byMedia = rows.groupBy(_.media_id)
    byMedia.foreach { case (id, fs) =>
      assert(fs.length == (id % 6 + 2).toInt,
        s"media $id: ${fs.length} frames, expected ${id % 6 + 2}")
      val w = (id % 8 + 4).toInt
      val h = (id % 6 + 4).toInt
      fs.foreach { r =>
        assert(r.width == w && r.height == h)
        assert(r.frame_ms == r.frame_idx * 100L)
        // exact integer channel sums vs the closed form
        val sumR = (for (y <- 0 until h; x <- 0 until w)
          yield AviCodec.patR(id, r.frame_idx, x, y).toLong).sum
        assert(r.sum_r == sumR, s"media $id frame ${r.frame_idx} sum_r")
      }
    }
  }

  test("multimodal resize: aspect fit into the box, payload sliced to out_bytes") {
    val media = Multimodal.syntheticMediaTable(spark, dir)
    val out = Multimodal.resizeToFit(media, box = 224).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (ow, oh) = (r.getAs[Long]("out_w"), r.getAs[Long]("out_h"))
      assert(ow <= math.max(w, 224) && oh <= math.max(h, 224))
      if (math.max(w, h) > 224) assert(math.max(ow, oh) <= 224)
      else assert(ow == w && oh == h) // no upscaling
      // the stub payload really is the promised size
      assert(r.getAs[Array[Byte]]("payload").length == r.getAs[Long]("out_bytes"))
      // aspect preserved within integer rounding (cross-product bound
      // for ow=⌊w·s⌋, oh=⌊h·s⌋); rows clamped to 1 px are excluded —
      // the clamp deliberately wins over aspect at extreme ratios
      if (w > 0 && h > 0 && math.max(w, h) > 224 && ow > 1 && oh > 1)
        assert(math.abs(ow * h - oh * w) <= (w + h).toLong,
          s"aspect broken: ($w,$h) -> ($ow,$oh)")
    }
  }

  test("cleaning pipeline: gates compose, quality knob gates, stats zero-fill") {
    import graft.ext.Cleaning
    val docs = graft.store.Tables.documents(spark, dir)
    val cfg = Cleaning.Config()
    val cleaned = Cleaning.clean(docs, cfg)
    // survivors really pass every gate
    val survivors = cleaned.withColumn("_lang", TextOps.langId(col("text")))
      .withColumn("_n", TextOps.tokenCount(col("text"))).collect()
    assert(survivors.nonEmpty)
    assert(survivors.forall { r =>
      val n = r.getAs[Number]("_n").longValue
      r.getAs[String]("_lang") == "en" && n >= 20 && n <= 200
    })
    // a quality gate strictly below the stopword floor removes rows
    val strict = Cleaning.clean(docs, cfg.copy(minQuality = Some(("stopword_ratio", 0.2))))
    assert(strict.count() < cleaned.count())
    // stats cover every raw block even when a block loses all docs
    val stats = Cleaning.survivalStats(docs, strict, cfg).collect()
    assert(stats.map(_.getAs[String]("source")).toSet ==
      docs.select("source").distinct().collect().map(_.getString(0)).toSet)
    assert(stats.forall(r => r.getAs[Long]("n_kept") <= r.getAs[Long]("n_raw")))
  }

  test("cleaning pipeline: host-prior gate — non-binding == identity, binding drops low-rank hosts, unranked knob") {
    import graft.ext.{Cleaning, Graph}
    val docs = graft.store.Tables.documents(spark, dir)
    val base = Cleaning.clean(docs, Cleaning.Config())
    val baseIds = base.select("doc_id").as[Long].collect().toSet
    // host graph over the corpus's own source labels: every source
    // links to the next (ring) — all ranked, comparable ranks
    val sources = docs.select("source").distinct()
      .as[String].collect().sorted
    val ring = sources.indices.map(i =>
      (sources(i), sources((i + 1) % sources.length))).toDF("src", "dst")
    val ranks = Graph.pageRank(ring, iterations = 3)
    def prior(minRank: Double, keepUnranked: Boolean = true) =
      Cleaning.clean(docs, Cleaning.Config(hostPrior = Some(
        Cleaning.HostPrior(ranks, "source", minRank, keepUnranked))))
    // non-binding floor: identical survivor set
    assert(prior(0.0).select("doc_id").as[Long].collect().toSet == baseIds)
    // binding floor: every source clears it or dies WITH its docs
    val floor = 1.0 / sources.length // ring PageRank is uniform ⇒ all pass
    assert(prior(floor - 1e-6).count() == base.count())
    assert(prior(floor + 1e-6).count() == 0L)
    // partial graph: only half the sources ranked — keepUnranked keeps
    // the absent hosts' docs, strict mode drops them
    val half = Graph.pageRank(
      ring.filter(col("src").isin(sources.take(2): _*) &&
        col("dst").isin(sources.take(2): _*)), 3)
    val rankedSet = half.select("id").as[String].collect().toSet
    val keepU = Cleaning.clean(docs, Cleaning.Config(hostPrior = Some(
      Cleaning.HostPrior(half, "source", 0.0))))
    assert(keepU.select("doc_id").as[Long].collect().toSet == baseIds)
    val strict = Cleaning.clean(docs, Cleaning.Config(hostPrior = Some(
      Cleaning.HostPrior(half, "source", 0.0, keepUnranked = false))))
    assert(strict.select("source").as[String].collect().toSet.subsetOf(rankedSet))
    assert(strict.count() < base.count() && strict.count() > 0)
  }

  test("cleaning pipeline: model gates (repetition, classifier, perplexity) compose") {
    import graft.ext.{Cleaning, LangModel, QualityClassifier}
    val docs = graft.store.Tables.documents(spark, dir)
    val labeled = docs.withColumn("y", (col("lang") === "en").cast("int"))
    val clf = QualityClassifier.train(labeled.limit(150), "doc_id", "text", "y",
      dim = 256, iters = 5, lr = 20.0)
    val lm = LangModel.train(docs.limit(150), "doc_id", "text")
    val cfg = Cleaning.Config(
      repetition = Some(TextOps.RepetitionThresholds(   // non-binding caps:
        maxTop2GramCharFrac = 1e9, maxDup3GramCharFrac = 1e9)),
      classifier = Some((clf, 0.0)),       // threshold 0 — gate wired, no drop
      maxPerplexity = Some((lm, 1e9)))     // huge cap — gate wired, no drop
    val base = Cleaning.clean(docs, Cleaning.Config())
      .select("doc_id").as[Long].collect().toSet
    val gated = Cleaning.clean(docs, cfg)
      .select("doc_id").as[Long].collect().toSet
    // non-binding model gates must not change the result
    assert(gated == base)
    // the default Gopher thresholds DO bind on this corpus
    val repStrict = Cleaning.clean(docs,
        cfg.copy(repetition = Some(TextOps.RepetitionThresholds())))
      .select("doc_id").as[Long].collect().toSet
    assert(repStrict.subsetOf(base) && repStrict.size < base.size)
    // a binding classifier threshold strictly shrinks the kept set and
    // every survivor scores above it
    val scores = QualityClassifier.score(docs, clf, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    val cut = scores.values.toSeq.sorted.apply(scores.size / 2) // median
    val strictSet = Cleaning.clean(docs, cfg.copy(classifier = Some((clf, cut))))
      .select("doc_id").as[Long].collect().toSet
    // NOT a subset of `gated`: dropping a near-dup pair's low-id keeper
    // upstream lets its higher-id twin survive the dedup — gate order
    // is part of the pipeline's semantics
    assert(strictSet.size < gated.size)
    assert(strictSet.forall(id => scores(id) >= cut - 1e-9)) // fold vs join float tail

    // decontamination gate in the batch pipeline: non-binding with an
    // absurd minShared, binding drops exactly the docs whose distinct
    // 3-gram overlap with the probe slice reaches the threshold
    val probes = docs.filter(col("doc_id") % 41 === 0)
    val bloom = graft.ext.Dedup.probeGramBloom(probes, "doc_id", "text", n = 3)
    val dg = graft.streaming.DocumentIngest.DecontamGate(bloom, n = 3, minShared = 3)
    val noBind = Cleaning.clean(docs,
        cfg.copy(decontam = Some(dg.copy(minShared = Int.MaxValue))))
      .select("doc_id").as[Long].collect().toSet
    assert(noBind == gated)
    val flagged = graft.ext.Dedup.ngramContamination(
        docs, probes, "doc_id", "text", n = 3, minShared = 3)
      .select("id").as[Long].collect().toSet
    val decond = Cleaning.clean(docs, cfg.copy(decontam = Some(dg)))
      .select("doc_id").as[Long].collect().toSet
    // kept ∩ flagged = ∅ (gate removes every contaminated doc that the
    // cheap gates hadn't already dropped; probes flag themselves too —
    // self-overlap — so they also go)
    assert(decond.intersect(flagged).isEmpty)
    assert(decond.size < gated.size)
  }

  test("documents shorter than one shingle dedup cleanly (no negative sequence)") {
    val docs = Seq((1L, "just two"), (2L, "a"), (3L, ""),
      (4L, "the quick brown fox jumps over the lazy dog"),
      (5L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    assert(Dedup.shingleRows(docs.filter(col("doc_id") <= 3), "doc_id", "text", 3).count() == 0)
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", 3, 96, 32, 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((4L, 5L))) // short docs drop out, real dup found
  }

  test("sampleFrames: zero-duration video yields zero frames, not an error") {
    val media = Seq((1L, "video", Array[Byte](1), 0, 0, 0L),
      (2L, "video", Array[Byte](1), 0, 0, 1600L))
      .toDF("media_id", "kind", "payload", "width", "height", "duration_ms")
    val frames = Multimodal.sampleFrames(media, 800)
    assert(frames.filter(col("media_id") === 1L).count() == 0)
    assert(frames.filter(col("media_id") === 2L).count() == 2)
  }

  test("rolling fingerprint is order-sensitive (unlike set hashes)") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"))
      .toDF("doc_id", "text")
      .select(TextOps.rollingFingerprint(col("text")).as("fp"))
    val fps = df.collect().map(_.getLong(0))
    assert(fps(0) != fps(1))
  }
}
