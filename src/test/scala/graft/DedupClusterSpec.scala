package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Cluster resolution, decontamination, and exact-window duplication —
  * the round-5 dedup-pipeline completions. */
class DedupClusterSpec extends SparkTestBase {
  import spark.implicits._

  test("repairSplitLeakage: leaked clusters move to the leader's split, clean and singleton clusters untouched") {
    // cluster A leaks (train+val+test), B is clean (all train), C is a
    // singleton; leader = min id, so A repairs to id 1's split
    val d = Seq(
      (1L, "A", "val"), (2L, "A", "train"), (3L, "A", "test"),
      (4L, "B", "train"), (5L, "B", "train"),
      (6L, "C", "test"))
      .toDF("id", "k", "split")
    val r = Dedup.repairSplitLeakage(d, "id", "k", "split")
      .select("id", "keep_id", "cluster_size", "n_splits",
        "repaired_split", "moved")
      .as[(Long, Long, Long, Long, String, Boolean)].collect().sortBy(_._1)
    assert(r.map(x => (x._1, x._2, x._3, x._4, x._5, x._6)).toSeq == Seq(
      (1L, 1L, 3L, 3L, "val", false),
      (2L, 1L, 3L, 3L, "val", true),
      (3L, 1L, 3L, 3L, "val", true),
      (4L, 4L, 2L, 1L, "train", false),
      (5L, 4L, 2L, 1L, "train", false),
      (6L, 6L, 1L, 1L, "test", false)))
    // the repaired assignment has zero leakage by construction
    val post = Dedup.repairSplitLeakage(
      r.map(x => (x._1, if (x._1 <= 3) "A" else if (x._1 <= 5) "B" else "C",
        x._5)).toSeq.toDF("id", "k", "split"),
      "id", "k", "split")
    assert(post.filter(col("n_splits") > 1).isEmpty)
  }

  test("repairSplitLeakage: NULL cluster keys pass through as singletons, NULL splits get a boolean verdict") {
    // id 7 has no cluster evidence (NULL key) — it must survive as its
    // own singleton, not vanish into the inner join or merge with id 8
    // into one phantom null-key cluster; id 2's NULL split still earns
    // a real boolean `moved` (true: the leader's split is 'train').
    val d = Seq(
      (1L, Some("A"), Some("train")), (2L, Some("A"), None),
      (7L, None, Some("val")), (8L, None, Some("test")))
      .toDF("id", "k", "split")
    val r = Dedup.repairSplitLeakage(d, "id", "k", "split")
      .select("id", "keep_id", "cluster_size", "repaired_split", "moved")
      .as[(Long, Long, Long, Option[String], Boolean)].collect().sortBy(_._1)
    assert(r.toSeq == Seq(
      (1L, 1L, 2L, Some("train"), false),
      (2L, 1L, 2L, Some("train"), true),
      (7L, 7L, 1L, Some("val"), false),
      (8L, 8L, 1L, Some("test"), false)))
  }

  test("connectedComponents: transitive closure, multiple components, long chain") {
    // component {1,2,3,4} is a CHAIN (1-2, 2-3, 3-4): no pair (1,4) or
    // (1,3) exists, yet all four must resolve to min-id 1 — keeping
    // min-per-PAIR would get this wrong. {10,11} is a separate component.
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id1", "id2")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: converges on a path longer than a couple hops") {
    // a 33-node path 0-1-2-...-32: diameter 32 — linear propagation
    // would need 32 rounds; pointer jumping must close it well inside
    // the default maxIter of 25 (log2(33) ≈ 5 doubling rounds).
    val pairs = (0L until 32L).map(i => (i, i + 1)).toDF("id1", "id2")
    val got = Dedup.connectedComponents(pairs).as[(Long, Long)].collect()
    assert(got.length == 33 && got.forall(_._2 == 0L))
  }

  test("dropDuplicateClusters keeps one doc per cluster plus all unpaired docs") {
    val docs = Seq((1L, "a"), (2L, "a2"), (3L, "a3"), (7L, "solo"), (10L, "b"), (11L, "b2"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
    val kept = Dedup.dropDuplicateClusters(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 7L, 10L))
  }

  test("clusterStats: sizes and canonical ids") {
    val pairs = Seq((5L, 2L), (2L, 9L), (20L, 21L)).toDF("id1", "id2")
    val stats = Dedup.clusterStats(Dedup.connectedComponents(pairs))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(stats.toSeq == Seq((2L, 3L, 2L, 9L), (20L, 2L, 20L, 21L)))
  }

  test("ngramContamination finds exactly the docs sharing n-grams with probes") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps high"), // shares "the quick brown", "quick brown fox" with probe
      (2L, "totally different words here now"),
      (3L, "the quick brown dog sits")        // shares "the quick brown"
    ).toDF("doc_id", "text")
    val probes = Seq((100L, "the quick brown fox runs")).toDF("doc_id", "text")
    val got = Dedup.ngramContamination(corpus, probes, "doc_id", "text", n = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 2L, 1L), (3L, 1L, 1L)))
  }

  test("ngramContaminationBloom == exact ngramContamination (no false negatives, FPs removed)") {
    // sf0.001 corpus split the same way as the x21/x35 gates — every
    // contaminated doc and every count must survive the Bloom prefilter
    // bit-for-bit, including with a DELIBERATELY undersized filter
    // (high fp rate stresses the exact-join cleanup, not correctness)
    val docs = graft.store.Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.filter(col("doc_id") % 41 =!= 0)
    val probes = docs.filter(col("doc_id") % 41 === 0)
    val exact = Dedup.ngramContamination(corpus, probes, "doc_id", "text",
      n = 3, minShared = 3).as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(exact.nonEmpty, "gate fixture must flag something")
    for (bits <- Seq(1L << 23, 256L)) { // well-sized and pathologically small
      val bloomed = Dedup.ngramContaminationBloom(corpus, probes, "doc_id",
          "text", n = 3, minShared = 3, expectedItems = 100000L, numBits = bits)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(bloomed == exact, s"numBits=$bits")
    }
  }

  test("windowDupPairs: shared-window counts and the document-frequency cap") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta other tail"),  // shares the 4-gram "alpha beta gamma delta" with 1
      (3L, "nothing in common with the rest")
    ).toDF("doc_id", "text")
    val got = Dedup.windowDupPairs(docs, "doc_id", "text", n = 4)
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L, 1L)))

    // cap: the same window in EVERY doc (boilerplate) with maxDf below
    // the doc count must produce zero pairs
    val boiler = (1L to 5L).map(i => (i, s"same exact four tokens unique$i")).toDF("doc_id", "text")
    val capped = Dedup.windowDupPairs(boiler, "doc_id", "text", n = 4, maxDf = 4)
    assert(capped.count() == 0)
    val uncapped = Dedup.windowDupPairs(boiler, "doc_id", "text", n = 4, maxDf = 5)
    assert(uncapped.count() == 10) // C(5,2) pairs sharing "same exact four tokens"
  }

  test("keepBestPerCluster: highest score wins, ties break to min id, unpaired docs survive") {
    val docs = Seq(
      (1L, 10.0), (2L, 30.0), (3L, 30.0), // cluster {1,2,3}: tie at 30 → keep 2
      (4L, 5.0), (5L, 50.0),              // cluster {4,5}: keep 5
      (6L, 1.0)                            // unpaired: survives
    ).toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id1", "id2")
    val kept = Dedup.keepBestPerCluster(docs, "doc_id", "score", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 5L, 6L))
    // degenerate: no pairs — identity
    val none = Dedup.keepBestPerCluster(docs, "doc_id", "score",
      Seq.empty[(Long, Long)].toDF("id1", "id2"))
    assert(none.count() == 6)
  }
}
