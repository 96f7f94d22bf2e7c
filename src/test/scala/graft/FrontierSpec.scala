package graft

import graft.ext.Frontier

/** Frontier composition on handcrafted pages: each gate observable in
  * isolation (the x64 oracle pins the full pipeline at corpus scale;
  * these pin per-gate behavior on inputs small enough to eyeball). */
class FrontierSpec extends SparkTestBase {
  import spark.implicits._

  private def frontier(pages: Seq[(String, String)], blocked: Seq[String] = Nil,
      cap: Int = 100): Seq[(String, String, Double)] =
    Frontier.fromPages(pages.toDF("url", "html"), "url", "html",
        blockedDomains = blocked, perHostCap = cap)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
      .sortBy(t => (t._1, t._2))

  test("frontierCore leaves no cached relation behind (per-micro-batch hygiene)") {
    // frontierCore persists its link-extract frame for the batch and
    // must unpersist it before returning: the CacheManager is never
    // GC-cleaned, so a leak here grows by one relation per streaming
    // micro-batch of frontierMaintenance, without bound
    spark.sharedState.cacheManager.clearCache()
    frontier(Seq(("https://a.example/p",
      """<a href="https://b.example/x">b</a>""")))
    assert(spark.sharedState.cacheManager.isEmpty,
      "frontier run leaked a cached relation")
  }

  test("gates: javascript/mailto die, blocklist fires, tracking twin merges, self-link anti-joined") {
    val out = frontier(Seq(
      ("https://a.example/page1",
        """<a href="https://b.example/x">b</a>
          |<a href="https://b.example/x?utm_source=t">dup</a>
          |<a href="javascript:void(0)">js</a>
          |<a href="mailto:x@y.example">m</a>
          |<a href="https://spam.bad.example/z">spam</a>
          |<a href="/page1">self</a>""".stripMargin)),
      blocked = Seq("bad.example"))
    assert(out.map(_._2) == Seq("https://b.example/x"))
    assert(out.head._1 == "b.example")
  }

  test("pageLevelOrdering: host set and per-host counts unchanged; within-host slots go to the best-linked pages") {
    // hub.example has 8 candidates against a cap of 3; p1 is linked
    // from three pages, p2 from two, the rest from one — page-level
    // PageRank must hand the hub's slots to p1 and p2 first. Host
    // selection and quota are rank-independent: both modes return the
    // same hosts with the same counts ("ordering changes only within
    // hosts").
    val hubLinks = (1 to 8).map(i =>
      s"""<a href="https://hub.example/p$i">l</a>""").mkString
    val pages = Seq(
      ("https://a.example/idx", hubLinks),
      ("https://b.example/idx",
        """<a href="https://hub.example/p1">1</a>
          |<a href="https://hub.example/p2">2</a>""".stripMargin),
      ("https://c.example/idx",
        """<a href="https://hub.example/p1">1</a>
          |<a href="https://x.example/solo">s</a>""".stripMargin))
      .toDF("url", "html")
    val base = Frontier.fromPages(pages, "url", "html", perHostCap = 3)
      .select("host", "url").as[(String, String)].collect().toSeq
    val paged = Frontier.fromPages(pages, "url", "html", perHostCap = 3,
        pageLevelOrdering = true)
    assert(paged.columns.contains("prank"))
    val pagedRows = paged
      .select("host", "url", "prank").as[(String, String, Double)]
      .collect().toSeq
    // same hosts, same per-host counts
    def quota(rows: Seq[(String, String)]) =
      rows.groupBy(_._1).view.mapValues(_.size).toMap
    assert(quota(base) == quota(pagedRows.map(t => (t._1, t._2))))
    // the hub's 3 slots include the two best-linked pages
    val hubPicked = pagedRows.filter(_._1 == "hub.example").map(_._2).toSet
    assert(hubPicked.contains("https://hub.example/p1") &&
      hubPicked.contains("https://hub.example/p2"), s"$hubPicked")
    // and their page priorities order p1 > p2 > the draw-filled third
    val prank = pagedRows.filter(_._1 == "hub.example")
      .map(t => t._2 -> t._3).toMap
    assert(prank("https://hub.example/p1") > prank("https://hub.example/p2"))
    assert(prank.values.min < prank("https://hub.example/p2"))
    // under-cap host: identical in both modes
    assert(base.filter(_._1 == "x.example").map(_._2) ==
      pagedRows.filter(_._1 == "x.example").map(_._2))
  }

  test("politeness cap binds per host; rank joins from the batch link graph") {
    val links = (1 to 8).map(i => s"""<a href="https://hub.example/p$i">l</a>""").mkString
    val out = frontier(Seq(
      ("https://a.example/idx", links),
      ("https://b.example/idx", """<a href="https://a.example/other">a</a>""")),
      cap = 3)
    val hub = out.filter(_._1 == "hub.example")
    assert(hub.size == 3) // 8 candidates capped at 3
    // hub.example is ranked by the batch graph (a→hub, b→a edges); all
    // rows of one host carry the identical host rank, and a.example
    // (one in-edge) is ranked too
    assert(hub.map(_._3).distinct.size == 1 && hub.head._3 > 0.0)
    val aRow = out.filter(_._1 == "a.example")
    assert(aRow.size == 1 && aRow.head._3 > 0.0)
  }

  test("relative links resolve against their page before entering the frontier") {
    val out = frontier(Seq(
      ("https://site.example/dir/page.html",
        """<a href="sub/x.html">r</a><a href="../up.html">u</a>""")))
    assert(out.map(_._2).sorted == Seq(
      "https://site.example/dir/sub/x.html", "https://site.example/up.html"))
  }

  test("sitemap seeding: robots Sitemap lines become gated (host, url) seeds; seen store excludes fetched ones") {
    val robots = Seq(
      ("https://a.example/robots.txt",
        """User-agent: *
          |Disallow: /private/
          |Sitemap: https://a.example/sitemap.xml
          |Sitemap: /relative-map.xml
          |Sitemap: https://spam.bad.example/sm.xml
          |Sitemap: ftp://a.example/ftp-map.xml
          |""".stripMargin),
      ("https://b.example/robots.txt",
        "User-agent: *\nSitemap: https://a.example/sitemap.xml?utm_source=x\n"))
      .toDF("url", "txt")
    // no store: blocklist + scheme gates fire, the tracking-param twin
    // from b's robots merges with a's own submission at normalize
    val seeds = Frontier.seedsFromRobots(robots, "url", "txt",
        blockedDomains = Seq("bad.example"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(seeds == Seq(
      ("a.example", "https://a.example/relative-map.xml"),
      ("a.example", "https://a.example/sitemap.xml")))
    // with the cumulative store: an already-fetched sitemap drops out
    val table = "frontier_seed_spec"
    try {
      Frontier.writeSeenStore(
        Seq("https://a.example/sitemap.xml").toDF("url"), "url", table, 4)
      val fresh = Frontier.seedsFromRobots(robots, "url", "txt",
          blockedDomains = Seq("bad.example"), seenTable = Some(table))
        .collect().map(_.getString(1)).toSeq
      assert(fresh == Seq("https://a.example/relative-map.xml"))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      ()
    }
  }

  test("withCrawlDelay: per-host politeness attached; agent groups honored; absent robots -> null") {
    val fr = Seq(
      ("a.example", "https://a.example/1", 0.3),
      ("b.example", "https://b.example/2", 0.2),
      ("c.example", "https://c.example/3", 0.1)).toDF("host", "url", "rank")
    val robots = Seq(
      ("https://a.example/robots.txt",
        "User-agent: *\nCrawl-delay: 2\nUser-agent: graftbot\nCrawl-delay: 7\n"),
      ("https://b.example/robots.txt", "User-agent: *\nDisallow: /x\n"))
      .toDF("url", "txt")
    def delays(agent: String): Map[String, Option[Double]] =
      Frontier.withCrawlDelay(fr, robots, "url", "txt", agent)
        .collect().map(r => r.getString(0) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val star = delays("*")
    assert(star == Map("a.example" -> Some(2.0), "b.example" -> None,
      "c.example" -> None))
    assert(delays("graftbot")("a.example") == Some(7.0))
    // rank column untouched by the join
    val ranks = Frontier.withCrawlDelay(fr, robots, "url", "txt")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(ranks == Map("a.example" -> 0.3, "b.example" -> 0.2, "c.example" -> 0.1))
  }

  /** Every path from a scan of a table whose location contains `substr`
    * up to its first enclosing join must be Exchange-free — the
    * bucketed-store contract (ExtSpec's incremental-dedup discipline
    * applied to the seen store). AQE-aware. */
  private def storedJoinSideUnshuffled(df: org.apache.spark.sql.DataFrame,
      substr: String): Boolean = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    def paths(p: SparkPlan, anc: List[SparkPlan]): Seq[List[SparkPlan]] = p match {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(substr)) =>
        Seq(anc)
      case a: AdaptiveSparkPlanExec => paths(a.executedPlan, anc)
      case q: QueryStageExec => paths(q.plan, anc)
      case other => other.children.flatMap(c => paths(c, other :: anc))
    }
    val ps = paths(df.queryExecution.executedPlan, Nil)
    assert(ps.nonEmpty, s"no scan of $substr found in the plan")
    ps.forall(_.takeWhile(!_.isInstanceOf[BaseJoinExec])
      .forall(!_.isInstanceOf[ShuffleExchangeLike]))
  }

  test("cumulative seen store: batch-2 frontier excludes batch-1's crawl; append idempotent; store side unshuffled") {
    val table = "frontier_seen_spec"
    try {
      // batch 1 crawled two urls — they seed the cumulative store
      val batch1 = Seq("https://a.example/seen1", "https://b.example/seen2")
        .toDF("url")
      Frontier.writeSeenStore(batch1, "url", table, buckets = 4)
      // batch 2 links to one already-crawled url and one new one
      val out = Frontier.fromPages(
        Seq(("https://c.example/page",
          """<a href="https://a.example/seen1">old</a>
            |<a href="https://d.example/new1">new</a>""".stripMargin))
          .toDF("url", "html"),
        "url", "html", seenTable = Some(table))
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      assert(out == Seq(("d.example", "https://d.example/new1")))
      // idempotent append: already-seen urls (even as tracking-param
      // twins — the store normalizes at its edge) write nothing
      val n0 = spark.table(table).count()
      Frontier.appendSeenStore(batch1, "url", table, buckets = 4)
      assert(spark.table(table).count() == n0)
      Frontier.appendSeenStore(
        Seq("https://a.example/seen1?utm_source=x").toDF("url"),
        "url", table, buckets = 4)
      assert(spark.table(table).count() == n0)
      Frontier.appendSeenStore(
        Seq("https://d.example/new1").toDF("url"), "url", table, buckets = 4)
      assert(spark.table(table).count() == n0 + 1)
      // compaction rewrites to one file per bucket, contents unchanged
      Frontier.compactSeenStore(spark, table, buckets = 4)
      assert(spark.table(table).count() == n0 + 1)
      assert(spark.table(table).inputFiles.length <= 4) // ≤ 1 file/bucket
      // plan contract: the stored side reaches its anti-join with no
      // Exchange above the scan — only the candidate side shuffles
      val probe = Frontier.freshAgainstStore(
        Seq("https://x.example/q").toDF("url")
          .repartition(4, org.apache.spark.sql.functions.col("url")), table)
      probe.collect()
      assert(storedJoinSideUnshuffled(probe, table),
        "seen store shuffled before the frontier anti-join")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${table}_compacting")
      ()
    }
  }

  test("robots gate: disallowed candidates die before the cap; longest-match allow wins; no robots row = allowed") {
    val pages = Seq(("https://src.example/page",
      """<a href="https://a.example/private/x">p</a>
        |<a href="https://a.example/public/y">q</a>
        |<a href="https://a.example/private/ok">r</a>
        |<a href="https://b.example/private/z">s</a>""".stripMargin))
      .toDF("url", "html")
    // robots only for a.example: /private/* disallowed except the
    // longer, $-anchored allow for /private/ok
    val robots = Seq(("https://a.example/robots.txt",
      "User-agent: *\nDisallow: /private/\nAllow: /private/ok$\n"))
      .toDF("rurl", "rtxt")
    val out = Frontier.fromPages(pages, "url", "html",
        robotsGate = Some(Frontier.RobotsGate(robots, "rurl", "rtxt")))
      .collect().map(_.getString(1)).toSeq.sorted
    assert(out == Seq("https://a.example/private/ok",
      "https://a.example/public/y", "https://b.example/private/z"))
  }

  test("fetchSchedule without a crawl_delay column uses the default for every host") {
    val f = Seq(("a.example", "https://a.example/1", 0.1),
      ("a.example", "https://a.example/2", 0.1),
      ("b.example", "https://b.example/1", 0.2))
      .toDF("host", "url", "rank")
    val out = Frontier.fetchSchedule(f, "s1", defaultDelaySeconds = 3.0)
      .collect().map(r => (r.getAs[String]("host"), r.getAs[Int]("slot"),
        r.getAs[Double]("fetch_offset_s"))).toSeq.sorted
    assert(out == Seq(("a.example", 1, 0.0), ("a.example", 2, 3.0),
      ("b.example", 1, 0.0)))
  }

  test("recrawlCandidates: unparseable lastmod is no claim; never-fetched urls are not recrawl candidates") {
    val entries = Seq(
      ("https://a.example/p1", "2026-06-01"),        // newer than fetch
      ("https://a.example/p2", "not a date"),        // no claim
      ("https://a.example/p3", "2026-06-01"))        // never fetched
      .toDF("u", "lm")
    val log = Seq(("https://a.example/p1", "2026-05-01 00:00:00"),
      ("https://a.example/p2", "2026-05-01 00:00:00"))
      .toDF("lu", "fa")
    val out = Frontier.recrawlCandidates(entries, "u", "lm", log, "lu", "fa")
      .collect().map(_.getString(1)).toSeq
    assert(out == Seq("https://a.example/p1"))
  }

  test("compaction crash recovery: a mid-swap crash never loses cumulative seen state") {
    val table = "frontier_seen_crash"
    val all = Seq("https://a.example/1", "https://b.example/2",
      "https://c.example/3")
    try {
      Frontier.writeSeenStore(all.toDF("url"), "url", table, buckets = 4)
      // crash window 1: between rename-aside and rename-in — live name
      // absent, _retired = old copy, _compacting = complete new copy
      spark.sql(s"ALTER TABLE `$table` RENAME TO `${table}_retired`")
      all.toDF("url")
        .repartition(4, org.apache.spark.sql.functions.col("url"))
        .write.bucketBy(4, "url").sortBy("url")
        .format("parquet").saveAsTable(s"${table}_compacting")
      // the old tableExists-guarded append would re-bootstrap from this
      // one-url batch, silently discarding the 3 cumulative urls
      Frontier.appendSeenStore(Seq("https://d.example/4").toDF("url"),
        "url", table, buckets = 4)
      assert(spark.table(table).collect().map(_.getString(0)).sorted.toSeq ==
        (all :+ "https://d.example/4").sorted)
      assert(!spark.catalog.tableExists(s"${table}_retired"))
      assert(!spark.catalog.tableExists(s"${table}_compacting"))
      // crash window 2: between rename-in and drop-aside — live intact,
      // _retired orphan; recovery just reclaims the orphan
      spark.table(table).limit(1).write.saveAsTable(s"${table}_retired")
      Frontier.appendSeenStore(Seq("https://e.example/5").toDF("url"),
        "url", table, buckets = 4)
      assert(spark.table(table).count() == 5)
      assert(!spark.catalog.tableExists(s"${table}_retired"))
      // and a normal compaction still works end to end after recovery
      Frontier.compactSeenStore(spark, table, buckets = 4)
      assert(spark.table(table).count() == 5)
      // crash window 3: a FIRST write died mid-writeTmp — live absent,
      // tmp present, NO retired (the rename-aside never ran, so there
      // is no proof the tmp is complete). Recovery must NOT trust the
      // possibly-partial tmp: report absent, drop the orphan, and let
      // the caller bootstrap
      val t2 = "frontier_seen_crash2"
      Seq("https://p.example/partial").toDF("url")
        .write.saveAsTable(s"${t2}_compacting")
      assert(!graft.store.Bucketing.recoverCompacted(spark, t2))
      assert(!spark.catalog.tableExists(s"${t2}_compacting"))
      Frontier.appendSeenStore(Seq("https://q.example/1").toDF("url"),
        "url", t2, buckets = 4) // bootstraps cleanly over the dropped orphan
      assert(spark.table(t2).count() == 1)
      spark.sql(s"DROP TABLE IF EXISTS $t2")
    } finally {
      Seq("", "_compacting", "_retired").foreach(s =>
        spark.sql(s"DROP TABLE IF EXISTS $table$s"))
      ()
    }
  }
}
