package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ext.{Frontier, Robots}
import graft.streaming.DocumentIngest

/** The WHOLE crawl cycle, end to end, every stage the real library
  * verb: robots store → seed maintenance (robots/sitemap fetches →
  * gated seeds) → frontier maintenance (cumulative seen/edge stores,
  * robots compliance, rank cadence) → crawl-delay dispatch schedule →
  * lastmod-driven recrawl. Each stage is pinned by its own oracle or
  * spec elsewhere; THIS test pins the composition — the thing an
  * operator actually runs. */
class CrawlLoopSpec extends SparkTestBase {
  import spark.implicits._

  test("crawl cycle: robots -> seeds -> frontier -> schedule -> recrawl, all against the cumulative stores") {
    val robotsTable = "loop_robots"
    val seededTable = "loop_seeded"
    val seenTable = "loop_seen"
    val gprefix = "loop_graph"
    val tables = Seq(robotsTable, seededTable, seenTable,
      s"${gprefix}_edges_src", s"${gprefix}_edges_dst", s"${gprefix}_ranks")
    val ckpt = Files.createTempDirectory("loop-ckpt").toString
    val seedsDir = Files.createTempDirectory("loop-seeds").toString + "/s"
    val targetsDir = Files.createTempDirectory("loop-tgt").toString + "/t"
    val frontierDir = Files.createTempDirectory("loop-fr").toString + "/f"
    try {
      // ── phase 0: robots fetched and folded into the robots store ──
      val t0 = java.sql.Timestamp.valueOf("2026-03-01 00:00:00")
      Robots.appendRobotsStore(Seq(
          ("https://a.example/robots.txt",
            "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n" +
              "Sitemap: https://a.example/sm.xml\n", t0),
          ("https://b.example/robots.txt",
            "User-agent: *\nSitemap: https://b.example/sm.xml\n", t0))
        .toDF("rurl", "rtxt", "fa"), "rurl", "rtxt", "fa", robotsTable, 4)

      // ── phase 1: seed maintenance — batch 0 = the robots bodies ──
      val robotsBatch = graft.ext.Robots.latestRobots(spark, robotsTable)
        .select(concat(lit("https://"), col("host"), lit("/robots.txt")).as("url"),
          col("txt").cast("binary").as("payload"), lit("robots").as("kind"))
      DocumentIngest.seedProcessBatch(robotsBatch, 0L, seedsDir, targetsDir,
        ckpt, seededTable, "url", "payload", "kind", Nil, 4,
        robotsTable = Some(robotsTable))
      val targets = spark.read.parquet(targetsDir).select("url")
        .as[String].collect().toSet
      assert(targets == Set("https://a.example/sm.xml", "https://b.example/sm.xml"))

      // batch 1 = the fetched sitemaps; a's lists a /private/ page that
      // must die at the ROBOTS gate, not reach the seeds
      val smA = ("<urlset><url><loc>https://a.example/page1</loc>" +
        "<lastmod>2026-03-10</lastmod></url>" +
        "<url><loc>https://a.example/private/x</loc></url></urlset>").getBytes(UTF_8)
      val smB = "<urlset><url><loc>https://b.example/page1</loc></url></urlset>"
        .getBytes(UTF_8)
      DocumentIngest.seedProcessBatch(Seq(
          ("https://a.example/sm.xml", smA, "sitemap"),
          ("https://b.example/sm.xml", smB, "sitemap"))
        .toDF("url", "payload", "kind"), 1L, seedsDir, targetsDir,
        ckpt, seededTable, "url", "payload", "kind", Nil, 4,
        robotsTable = Some(robotsTable))
      val seeds = spark.read.parquet(seedsDir).select("url")
        .as[String].collect().toSet
      assert(seeds == Set("https://a.example/page1", "https://b.example/page1"),
        s"robots gate leaked into seeds: $seeds")

      // ── phase 2: the seeded pages are "fetched"; frontier batches ──
      // page1 of each host links onward: a→ a/page2, a/private/y (must
      // die at robots), b/page1 (cross-host edge); b→ b/page2
      def crawlBatch(n: Int): org.apache.spark.sql.DataFrame =
        (if (n == 0) Seq(
          ("https://a.example/page1",
            """<a href="/page2">n</a><a href="/private/y">p</a>
              |<a href="https://b.example/page1">b</a>""".stripMargin),
          ("https://b.example/page1", """<a href="/page2">n</a>"""))
        else Seq(
          ("https://a.example/page2",
            """<a href="https://a.example/page1">back</a>
              |<a href="https://b.example/page3">on</a>""".stripMargin)))
          .toDF("url", "html")
      DocumentIngest.frontierProcessBatch(crawlBatch(0), 0L, frontierDir,
        seenTable, "url", "html", Nil, 100, "graft-frontier-v1", 3, 4,
        graphStorePrefix = Some(gprefix), rankEvery = 2,
        robotsTable = Some(robotsTable))
      val f0 = spark.read.parquet(frontierDir)
        .filter(col("batch_id") === 0).select("url").as[String].collect().toSet
      // page1s die at the seen anti-join of their own batch; /private/y
      // dies at robots; page2s survive
      assert(f0 == Set("https://a.example/page2", "https://b.example/page2"),
        s"batch-0 frontier wrong: $f0")

      DocumentIngest.frontierProcessBatch(crawlBatch(1), 1L, frontierDir,
        seenTable, "url", "html", Nil, 100, "graft-frontier-v1", 3, 4,
        graphStorePrefix = Some(gprefix), rankEvery = 2,
        robotsTable = Some(robotsTable))
      val f1 = spark.read.parquet(frontierDir)
        .filter(col("batch_id") === 1).select("url", "rank")
        .as[(String, Double)].collect().toMap
      // a/page1 was crawled in batch 0 → the CUMULATIVE store kills it;
      // b/page3 is new. Batch 1 is between rank recomputes (1 % 2 != 0)
      // → ranks come from the batch-0 SNAPSHOT
      assert(f1.keySet == Set("https://b.example/page3"), s"$f1")
      val snap = graft.ext.Graph.readRankSnapshot(spark, s"${gprefix}_ranks").get
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(f1("https://b.example/page3") == snap("b.example"),
        "between-recompute frontier must rank from the snapshot")

      // the edge store holds the deduplicated cross-host structure:
      // both batches emit a→b (self-host links drop), folded to ONE row
      assert(spark.table(s"${gprefix}_edges_src")
        .as[(String, String)].collect().toSeq == Seq(("a.example", "b.example")))
      // ── phase 3: dispatch schedule with the store's crawl delays ──
      val latest = Robots.latestRobots(spark, robotsTable)
        .select(concat(lit("https://"), col("host"), lit("/robots.txt")).as("rurl"),
          col("txt").as("rtxt"))
      val sched = Frontier.fetchSchedule(
        Frontier.withCrawlDelay(
          spark.read.parquet(frontierDir).select("host", "url", "rank"),
          latest, "rurl", "rtxt"),
        "graft-frontier-v1")
      val byHost = sched.select("host", "slot", "fetch_offset_s")
        .as[(String, Int, Double)].collect().groupBy(_._1)
      // a.example carries Crawl-delay 2 → slot 1 at 0s, slot 2 at 2s
      assert(byHost("a.example").sortBy(_._2).map(_._3).toSeq == Seq(0.0))
      assert(byHost("b.example").sortBy(_._2).map(_._3).toSeq == Seq(0.0, 1.0))

      // ── phase 4: the sitemap is re-fetched with a NEWER lastmod —
      // recrawl detection against the crawl log ──
      val smA2 = ("<urlset><url><loc>https://a.example/page1</loc>" +
        "<lastmod>2026-05-01</lastmod></url></urlset>").getBytes(UTF_8)
      val entries = Frontier.seedsFromSitemaps(
        Seq(("https://a.example/sm.xml", smA2)).toDF("url", "payload"),
        "url", "payload")
      val log = Seq(
        ("https://a.example/page1", "2026-04-01 00:00:00"),
        ("https://b.example/page1", "2026-04-01 00:00:00")).toDF("lu", "fa")
      val re = Frontier.recrawlCandidates(entries, "url", "lastmod",
        log, "lu", "fa").select("url").as[String].collect().toSeq
      assert(re == Seq("https://a.example/page1"),
        "the newer lastmod claim must re-enqueue exactly the changed page")
    } finally {
      tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      ()
    }
  }
}
