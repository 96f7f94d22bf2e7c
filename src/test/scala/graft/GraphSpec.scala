package graft

import org.apache.spark.sql.functions._

import graft.ext.Graph

/** Host-graph analytics: PageRank semantics against an in-spec power
  * iteration, the Σrank=1 invariant, dangling-mass redistribution,
  * partition-order invariance (bitwise, via the decimal quantization
  * contract), and the degree/edge reductions. The oracle gate (x60)
  * pins the full derived-fixture pipeline against DuckDB's unrolled
  * iteration; these pin the algebra on graphs small enough to check by
  * hand. */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  // a → b, a → c, b → c, c → a, d → c, c → e; e is dangling
  private val edges = Seq(
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"), ("c", "e"))

  private def ranksOf(iters: Int): Map[String, Double] =
    Graph.pageRank(edges.toDF("src", "dst"), iterations = iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  /** The same fixed-iteration power iteration in plain Scala doubles
    * (no quantization) — the implementation must track it to well
    * inside the 5e-10/round quantization budget (1e-9 consensus
    * grid). */
  private def reference(iters: Int): Map[String, Double] = {
    val nodes = Seq("a", "b", "c", "d", "e")
    val out = Map("a" -> 2, "b" -> 1, "c" -> 2, "d" -> 1, "e" -> 0)
    val d = 0.85
    val n = nodes.size
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filter(out(_) == 0).map(r).sum
      def in(v: String): Double =
        edges.filter(_._2 == v).map { case (s, _) => r(s) / out(s) }.sum
      r = nodes.map(v => v -> ((1 - d) / n + d * (in(v) + dangling / n))).toMap
    }
    r
  }

  test("pageRank matches an independent power iteration; sums to 1") {
    for (iters <- Seq(1, 3, 10)) {
      val got = ranksOf(iters)
      val want = reference(iters)
      assert(got.keySet == want.keySet)
      for ((k, w) <- want)
        assert(math.abs(got(k) - w) < 1e-7, s"iters=$iters node=$k got=${got(k)} want=$w")
      assert(math.abs(got.values.sum - 1.0) < 1e-7, s"iters=$iters mass leaked")
    }
    // the hub (c: three in-edges) outranks everything; the dangling
    // sink (e) still collects c's share and beats the leaf sources
    val r = ranksOf(10)
    assert(r("c") > r("a") && r("c") > r("e"))
    assert(r("e") > r("b") && r("b") > r("d"))
  }

  test("pageRank is partition-order invariant (bitwise)") {
    val a = Graph.pageRank(edges.toDF("src", "dst").repartition(1), 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = Graph.pageRank(edges.toDF("src", "dst").repartition(7), 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a == b) // exact double equality — the decimal consensus contract
  }

  test("duplicate edges collapse; arg validation") {
    val dup = (edges ++ edges).toDF("src", "dst")
    val once = ranksOf(5)
    val twice = Graph.pageRank(dup, 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(once == twice)
    intercept[IllegalArgumentException](Graph.pageRank(edges.toDF("src", "dst"), 0))
    intercept[IllegalArgumentException](Graph.pageRank(edges.toDF("src", "dst"), 5, 1.0))
  }

  /** HITS power iteration in plain Scala doubles (L1-normalized each
    * half-round, like the implementation but unquantized). */
  private def hitsReference(iters: Int): Map[String, (Double, Double)] = {
    val nodes = Seq("a", "b", "c", "d", "e")
    val n = nodes.size
    var hub = nodes.map(_ -> 1.0 / n).toMap
    var auth = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val ar = nodes.map(v => v -> edges.filter(_._2 == v).map(e => hub(e._1)).sum).toMap
      val as = ar.values.sum
      auth = ar.map { case (k, v) => k -> v / as }
      val hr = nodes.map(u => u -> edges.filter(_._1 == u).map(e => auth(e._2)).sum).toMap
      val hs = hr.values.sum
      hub = hr.map { case (k, v) => k -> v / hs }
    }
    nodes.map(v => v -> (hub(v), auth(v))).toMap
  }

  test("hits matches an independent power iteration; both sides sum to 1") {
    for (iters <- Seq(1, 2, 5)) {
      val got = Graph.hits(edges.toDF("src", "dst"), iters)
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      val want = hitsReference(iters)
      assert(got.keySet == want.keySet)
      for ((k, (wh, wa)) <- want) {
        assert(math.abs(got(k)._1 - wh) < 1e-7, s"iters=$iters hub($k)")
        assert(math.abs(got(k)._2 - wa) < 1e-7, s"iters=$iters auth($k)")
      }
      assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-7)
      assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-7)
    }
    val r = Graph.hits(edges.toDF("src", "dst"), 5)
      .collect().map(x => x.getString(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    // c (3 in-edges) is the authority; the dangling sink e has hub 0;
    // d (out-link only) has auth 0
    assert(r.forall { case (k, (_, a)) => k == "c" || a <= r("c")._2 })
    assert(r("e")._1 == 0.0 && r("d")._2 == 0.0)
  }

  test("hits is partition-order invariant (bitwise)") {
    val a = Graph.hits(edges.toDF("src", "dst").repartition(1), 3)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val b = Graph.hits(edges.toDF("src", "dst").repartition(7), 3)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(a == b)
  }

  test("edge store: pageRank/hits from the bucketed store are bitwise-identical; edge scan crosses no exchange") {
    val prefix = "graphspec_store"
    try {
      Graph.writeEdgeStore(edges.toDF("src", "dst"), prefix, buckets = 4)
      // bitwise equality with the in-memory path — the consensus
      // contract is layout-independent
      val prDirect = Graph.pageRank(edges.toDF("src", "dst"), 5)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val prStored = Graph.pageRankFromStore(spark, prefix, 5)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(prDirect == prStored)
      val hDirect = Graph.hits(edges.toDF("src", "dst"), 3)
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      val hStored = Graph.hitsFromStore(spark, prefix, 3)
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      assert(hDirect == hStored)
      // degreesFromStore (each direction on its own layout) == degrees
      val dStored = Graph.degreesFromStore(spark, prefix)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val dDirect = Graph.degrees(edges.toDF("src", "dst"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(dStored == dDirect)
      // duplicate edges collapse at WRITE time
      Graph.writeEdgeStore((edges ++ edges).toDF("src", "dst"), prefix, buckets = 4)
      assert(spark.table(s"${prefix}_edges_src").count() == edges.size)
      // plan contract: a contribs-shaped join against the stored src
      // layout reads the edge scan with NO exchange above it — the
      // bucket layout is the join distribution
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      import org.apache.spark.sql.execution.joins.BaseJoinExec
      val ranksLike = Seq(("a", 0.2), ("b", 0.2), ("c", 0.2), ("d", 0.2))
        .toDF("src", "c")
      val j = spark.table(s"${prefix}_edges_src")
        .join(ranksLike, "src")
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      j.collect()
      def paths(p: SparkPlan, anc: List[SparkPlan]): Seq[List[SparkPlan]] = p match {
        case f: FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.contains(s"${prefix}_edges_src")) =>
          Seq(anc)
        case a: AdaptiveSparkPlanExec => paths(a.executedPlan, anc)
        case q: QueryStageExec => paths(q.plan, anc)
        case other => other.children.flatMap(ch => paths(ch, other :: anc))
      }
      val ps = paths(j.queryExecution.executedPlan, Nil)
      assert(ps.nonEmpty, "no stored edge scan in the plan")
      assert(ps.forall(_.takeWhile(!_.isInstanceOf[BaseJoinExec])
        .forall(!_.isInstanceOf[ShuffleExchangeLike])),
        "stored edges shuffled before the rank join")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${prefix}_edges_src")
      spark.sql(s"DROP TABLE IF EXISTS ${prefix}_edges_dst")
      ()
    }
  }

  test("edge store append/compact: idempotent fold, incremental == full write, per-table torn repair") {
    val prefix = "graphspec_store2"
    try {
      val (e1, e2) = edges.splitAt(3)
      Graph.appendEdgeStore(e1.toDF("src", "dst"), prefix, buckets = 4) // bootstrap
      Graph.appendEdgeStore(e2.toDF("src", "dst"), prefix, buckets = 4)
      Graph.appendEdgeStore(e2.toDF("src", "dst"), prefix, buckets = 4) // replay: no-op
      assert(spark.table(s"${prefix}_edges_src").count() == edges.size)
      assert(spark.table(s"${prefix}_edges_dst").count() == edges.size)
      val full = Graph.pageRank(edges.toDF("src", "dst"), 5)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val inc = Graph.pageRankFromStore(spark, prefix, 5)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(inc == full) // incrementally-built store == from-scratch, bitwise
      // torn write: an edge landed in the src layout only — the
      // per-table anti-join repairs exactly the missing side
      Seq(("z1", "z2")).toDF("src", "dst")
        .repartition(4, col("src")).write.mode("append")
        .bucketBy(4, "src").sortBy("src")
        .format("parquet").saveAsTable(s"${prefix}_edges_src")
      Graph.appendEdgeStore(Seq(("z1", "z2")).toDF("src", "dst"), prefix, 4)
      assert(spark.table(s"${prefix}_edges_src").count() == edges.size + 1)
      assert(spark.table(s"${prefix}_edges_dst").count() == edges.size + 1)
      // compaction: ≤ one file per bucket per table, values unchanged
      Graph.compactEdgeStore(spark, prefix, buckets = 4)
      assert(spark.table(s"${prefix}_edges_src").inputFiles.length <= 4)
      assert(spark.table(s"${prefix}_edges_dst").inputFiles.length <= 4)
      assert(spark.table(s"${prefix}_edges_src").count() == edges.size + 1)
    } finally {
      Seq("_edges_src", "_edges_dst", "_edges_src_compacting",
        "_edges_dst_compacting").foreach(s =>
        spark.sql(s"DROP TABLE IF EXISTS $prefix$s"))
      ()
    }
  }

  test("edge store crash recovery: mid-swap compaction crash and torn bootstrap never lose cumulative edges") {
    val prefix = "graphspec_crash"
    try {
      Graph.writeEdgeStore(edges.toDF("src", "dst"), prefix, buckets = 4)
      // crash window: compaction of the src layout died between
      // rename-aside and rename-in — live absent, _retired = old,
      // _compacting = complete new copy. A bare tableExists append
      // would rebuild BOTH layouts from the one-edge batch.
      spark.sql(s"ALTER TABLE `${prefix}_edges_src` RENAME TO `${prefix}_edges_src_retired`")
      spark.table(s"${prefix}_edges_src_retired")
        .repartition(4, col("src"))
        .write.bucketBy(4, "src").sortBy("src")
        .format("parquet").saveAsTable(s"${prefix}_edges_src_compacting")
      Graph.appendEdgeStore(Seq(("n1", "n2")).toDF("src", "dst"), prefix, 4)
      assert(spark.table(s"${prefix}_edges_src").count() == edges.size + 1)
      assert(spark.table(s"${prefix}_edges_dst").count() == edges.size + 1)
      assert(!spark.catalog.tableExists(s"${prefix}_edges_src_retired"))
      assert(!spark.catalog.tableExists(s"${prefix}_edges_src_compacting"))
      // torn BOOTSTRAP: one layout missing entirely (writeEdgeStore
      // crashed between its two writes) — the append rebuilds the
      // missing twin from the surviving one, not from the batch
      graft.store.Bucketing.dropWithLocation(spark, s"${prefix}_edges_dst")
      Graph.appendEdgeStore(Seq(("n3", "n4")).toDF("src", "dst"), prefix, 4)
      assert(spark.table(s"${prefix}_edges_dst").count() == edges.size + 2)
      assert(spark.table(s"${prefix}_edges_src").count() == edges.size + 2)
      // contents identical across layouts after all repairs
      val a = spark.table(s"${prefix}_edges_src").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      val b = spark.table(s"${prefix}_edges_dst").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(a == b)
    } finally {
      Seq("_edges_src", "_edges_dst", "_edges_src_compacting",
        "_edges_dst_compacting", "_edges_src_retired",
        "_edges_dst_retired").foreach(s =>
        spark.sql(s"DROP TABLE IF EXISTS $prefix$s"))
      ()
    }
  }

  test("anchorTerms: counts, binary tie order, k cap") {
    val links = Seq(
      ("t1", "Download  Page"), ("t1", "download now"), ("t1", "now now"),
      ("t2", "Zed & Co"), ("t2", "")).toDF("target", "anchor")
    val out = Graph.anchorTerms(links, "target", "anchor", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3))).toSeq
      .sortBy(t => (t._1, t._4))
    // t1 counts: now=3, download=2, page=1 → top2 (now, download);
    // t2: tie at 1 → binary asc: '&' before letters
    assert(out == Seq(
      ("t1", "now", 3L, 1), ("t1", "download", 2L, 2),
      ("t2", "&", 1L, 1), ("t2", "co", 1L, 2)))
  }

  test("anchorScore: weighted anchor-mass fraction in (id, rank) shape; gates through HostPrior") {
    val links = Seq(
      ("good.example", "official documentation here"),
      ("good.example", "official site"),
      ("spam.example", "casino casino bonus"),
      ("plain.example", "some words")).toDF("target", "anchor")
    val w = Map("official" -> 1.0, "documentation" -> 0.5, "casino" -> -1.0)
    val s = Graph.anchorScore(links, "target", "anchor", w)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // good: terms official×2 (w 1.0), documentation×1 (0.5), here/site×1 (0)
    //   → (2·1 + 0.5) / 5 = 0.5
    assert(math.abs(s("good.example") - 0.5) < 1e-12)
    // spam: casino×2 (−1), bonus×1 (0) → −2/3
    assert(math.abs(s("spam.example") + 2.0 / 3) < 1e-12)
    assert(s("plain.example") == 0.0)
    // consumed exactly like any rank frame: a HostPrior floor at 0
    // (strict mode) keeps good+plain hosts' docs, kills the spam host
    import spark.implicits._
    val docs = Seq((1L, "good.example"), (2L, "spam.example"),
      (3L, "plain.example")).toDF("doc_id", "host")
    val ranks = Graph.anchorScore(links, "target", "anchor", w)
    val kept = docs.join(
        org.apache.spark.sql.functions.broadcast(
          ranks.select(col("id").as("host"), col("rank"))), Seq("host"), "left")
      .filter(coalesce(col("rank"), lit(Double.NegativeInfinity)) >= 0.0)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
    intercept[IllegalArgumentException](
      Graph.anchorScore(links, "target", "anchor", Map.empty))
  }

  test("degrees over src ∪ dst; hostEdges drops self-loops/nulls and dedups") {
    val d = Graph.degrees(edges.toDF("src", "dst"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(d == Set(("a", 2L, 1L), ("b", 1L, 1L), ("c", 2L, 3L),
      ("d", 1L, 0L), ("e", 0L, 1L)))
    val raw = Seq(("x", "y"), ("x", "y"), ("x", "x"), (null, "y"), ("y", null))
      .toDF("s", "d")
    val he = Graph.hostEdges(raw, "s", "d")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(he == Seq(("x", "y")))
  }

  test("page-level rank: host-aggregated page rank == host rank bitwise on a host-complete graph; mass additive on multi-page hosts") {
    def hostOf(c: org.apache.spark.sql.Column) =
      graft.functions.UrlExpressions.urlParts(c).getField("host")
    // host-complete fixture: exactly ONE page per host, page links
    // mirror host links — the page graph is the host graph up to id
    // renaming, so host-aggregated page rank must equal host-level
    // rank BITWISE (same n, same edges, same arithmetic)
    val pageLinks = Seq(
      ("https://a.example/only", "https://b.example/only"),
      ("https://b.example/only", "https://c.example/only"),
      ("https://c.example/only", "https://a.example/only"),
      ("https://a.example/only", "https://c.example/only"))
      .toDF("src", "dst")
    val pageRanks = Graph.pageRank(Graph.hostEdges(pageLinks, "src", "dst"),
      iterations = 6)
    val aggregated = Graph.aggregateRanks(pageRanks, hostOf(col("id")))
      .as[(String, Double)].collect().toMap
    val hostRanks = Graph.pageRank(
        Graph.hostEdges(pageLinks.select(
          hostOf(col("src")).as("src"), hostOf(col("dst")).as("dst")),
          "src", "dst"), iterations = 6)
      .as[(String, Double)].collect().toMap
    assert(aggregated == hostRanks, s"$aggregated vs $hostRanks")
    // multi-page host: mass is additive — the host's aggregate is the
    // exact sum of its pages' ranks, and total mass stays ~1
    val multi = Seq(
      ("https://a.example/p1", "https://b.example/x"),
      ("https://a.example/p2", "https://b.example/x"),
      ("https://b.example/x", "https://a.example/p1"))
      .toDF("src", "dst")
    val pr = Graph.pageRank(Graph.hostEdges(multi, "src", "dst"), iterations = 6)
    val agg = Graph.aggregateRanks(pr, hostOf(col("id")))
      .as[(String, Double)].collect().toMap
    val perPage = pr.as[(String, Double)].collect()
    val aSum = BigDecimal(perPage.filter(_._1.contains("a.example"))
      .map(p => BigDecimal(p._2)).sum.toString).toDouble
    assert(math.abs(agg("a.example") - aSum) < 1e-12)
    assert(math.abs(agg.values.sum - 1.0) < 1e-6, s"mass ${agg.values.sum}")
  }
}
