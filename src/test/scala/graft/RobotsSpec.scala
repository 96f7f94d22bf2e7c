package graft

import org.apache.spark.sql.functions._

import graft.ext.Robots

/** robots.txt: RFC 9309 parsing (group selection, line grouping,
  * comments), the Google wildcard/anchor pattern semantics, and the
  * longest-match/allow-ties decision — against hand-derived verdicts
  * including the published RFC examples. */
class RobotsSpec extends SparkTestBase {
  import spark.implicits._

  private val txt =
    """# global rules
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/public/
      |Disallow: /*.json$
      |Disallow: /tmp
      |
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /graft-only/
      |Allow: /
      |
      |User-agent: graftbot-images
      |Disallow: /
      |""".stripMargin

  private def rules(agent: String): Seq[(Boolean, String)] =
    Robots.parseRules(txt, agent).toSeq

  test("group selection: specific agent beats *, longest product-token match, multi-agent groups") {
    assert(rules("UnknownBot") == Seq(
      (false, "/private/"), (true, "/private/public/"),
      (false, "/*.json$"), (false, "/tmp")))
    // graftbot matches its own group, not '*' and not graftbot-images
    assert(rules("graftbot") == Seq((false, "/graft-only/"), (true, "/")))
    assert(rules("otherbot") == rules("graftbot"))
    // longer product token wins
    assert(rules("graftbot-images") == Seq((false, "/")))
    // empty file / no matching group at all
    assert(Robots.parseRules("", "x").isEmpty)
  }

  test("non-group directives (Sitemap:) do not split stacked User-agent groups") {
    val stacked =
      """User-agent: a
        |Sitemap: https://example.org/sitemap.xml
        |User-agent: b
        |Disallow: /x/
        |""".stripMargin
    // Google's parser treats this as ONE group {a, b}: the Sitemap line
    // is not a group member and must not flush agent 'a' rule-less
    assert(Robots.parseRules(stacked, "a").toSeq == Seq((false, "/x/")))
    assert(Robots.parseRules(stacked, "b").toSeq == Seq((false, "/x/")))
    // but a group-member directive (Crawl-delay) still closes the
    // agent list: a User-agent AFTER it starts a NEW group
    val delayed =
      """User-agent: a
        |Crawl-delay: 10
        |User-agent: b
        |Disallow: /y/
        |""".stripMargin
    assert(Robots.parseRules(delayed, "a").toSeq.isEmpty)
    assert(Robots.parseRules(delayed, "b").toSeq == Seq((false, "/y/")))
  }

  test("sitemaps: lexed agent-free in file order; comments stripped; case-insensitive key; kernel + SQL agree") {
    val t =
      """User-agent: *
        |Disallow: /private/
        |Sitemap: https://a.example/sitemap.xml   # index
        |User-agent: b
        |sitemap: https://a.example/news.xml
        |SITEMAP: https://cdn.example/other.xml
        |Sitemap:
        |Crawl-delay: 5
        |""".stripMargin
    val want = Seq("https://a.example/sitemap.xml",
      "https://a.example/news.xml", "https://cdn.example/other.xml")
    assert(Robots.parseSitemaps(t).toSeq == want)
    assert(Robots.parseSitemaps("").isEmpty)
    // the directive is non-group: extraction ignores agent entirely,
    // and the group lexer still keeps b's rules intact around it
    assert(Robots.parseRules(t, "b").toSeq == Nil)
    val viaCol = Seq(t).toDF("txt")
      .select(Robots.sitemaps(col("txt")).as("s"))
      .collect()(0).getSeq[String](0)
    assert(viaCol == want)
  }

  test("crawl-delay: group-scoped, specificity-selected, max-of-merged, junk ignored, override by later line") {
    val t =
      """User-agent: *
        |Crawl-delay: 10
        |Disallow: /x
        |
        |User-agent: graftbot
        |User-agent: otherbot
        |Crawl-delay: nonsense
        |Crawl-delay: -3
        |Crawl-delay: 1
        |Crawl-delay: 2.5
        |
        |User-agent: otherbot
        |Crawl-delay: 4
        |""".stripMargin
    // unknown agent → * group
    assert(Robots.parseCrawlDelay(t, "SomeBot") == Some(10.0))
    // graftbot: its own group; junk/negative ignored, later line wins
    assert(Robots.parseCrawlDelay(t, "graftbot") == Some(2.5))
    // otherbot matches TWO groups at equal specificity → max (politest)
    assert(Robots.parseCrawlDelay(t, "otherbot") == Some(4.0))
    // no delay anywhere → None / null column
    assert(Robots.parseCrawlDelay("User-agent: *\nDisallow: /x", "b").isEmpty)
    // existing rule semantics untouched by the delay lines
    assert(Robots.parseRules(t, "SomeBot").toSeq == Seq((false, "/x")))
    // column kernel: value and null both round-trip
    val rows = Seq(t, "User-agent: *\nDisallow: /y").toDF("txt")
      .select(Robots.crawlDelay(col("txt"), lit("SomeBot")).as("d"))
      .collect()
    assert(rows(0).getDouble(0) == 10.0 && rows(1).isNullAt(0))
  }

  test("pattern semantics: prefix, *, $ anchor") {
    assert(Robots.matches("/private/a", "/private/"))
    assert(!Robots.matches("/privateer", "/private/"))
    assert(Robots.matches("/a/b.json", "/*.json$"))
    assert(!Robots.matches("/a/b.jsonl", "/*.json$"))
    // anchored with wildcard must match at the END, not earliest
    assert(Robots.matches("/a.php.php", "*.php$"))
    assert(Robots.matches("/x/tmp/y", "/*tmp"))
    assert(Robots.matches("/fish", "/fish*"))
    assert(!Robots.matches("/Fish", "/fish")) // case-sensitive paths
    assert(Robots.matches("/anything", "/"))
    assert(Robots.matches("/exact", "/exact$"))
    assert(!Robots.matches("/exactly", "/exact$"))
  }

  test("decision: longest match wins, allow wins ties, no match allows") {
    val rs = rules("UnknownBot")
    def ok(p: String) = Robots.decide(p, rs.iterator)
    assert(!ok("/private/x"))
    assert(ok("/private/public/x")) // longer allow overrides
    assert(!ok("/data/feed.json"))
    assert(ok("/data/feed.jsonl"))
    assert(!ok("/tmp/scratch"))
    assert(ok("/index.html"))
    // allow wins an exact-length tie (RFC 9309 §2.2.2)
    assert(Robots.decide("/page", Iterator((false, "/page"), (true, "/page"))))
  }

  test("empty path matches as '/'; matchTarget includes the query; literal rules fold at plan time") {
    // a full-site disallow must block "https://x.example" (empty path)
    val full = Robots.parseRules("User-agent: *\nDisallow: /\n", "any")
    val df = Seq("").toDF("path")
      .select(Robots.allowed(col("path"),
        Robots.rulesFor(lit("User-agent: *\nDisallow: /\n"), lit("any"))).as("ok"))
    assert(!df.head.getBoolean(0))
    assert(full.nonEmpty)
    // query-targeting rules fire only through matchTarget
    val qRules = Robots.rulesFor(
      lit("User-agent: *\nDisallow: /*?sessionid=\n"), lit("any"))
    val t = Seq(("/page", "sessionid=abc"), ("/page", null))
      .toDF("path", "query")
      .select(Robots.allowed(
        Robots.matchTarget(col("path"), col("query")), qRules).as("ok"))
      .as[Boolean].collect().toSeq
    assert(t == Seq(false, true))
    // literal robots + agent constant-fold: over a non-foldable path
    // the optimized plan carries the folded rule-array literal, not a
    // per-row graft_robots_rules parse
    val plan = spark.range(1)
      .select(Robots.allowed(
        concat(lit("/p/"), col("id").cast("string")), qRules).as("ok"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("graft_robots_rules"), plan)
    assert(plan.contains("graft_robots_allowed"), plan)
  }

  test("SQL surface: robots functions usable from spark.sql") {
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_robots_allowed('/private/x',
        |  graft_robots_rules('User-agent: *
        |Disallow: /private/', '*')) AS ok""".stripMargin).head
    assert(!r.getBoolean(0))
  }

  test("distributed shape: rules per domain join URLs; kernels run in codegen") {
    val domains = Seq(("a.example", txt), ("b.example", "User-agent: *\nDisallow:\n"))
      .toDF("domain", "robots")
      .select(col("domain"), Robots.rulesFor(col("robots"), lit("graftbot")).as("rules"))
    val urls = Seq(
      ("a.example", "/graft-only/secret"), ("a.example", "/private/x"),
      ("b.example", "/anything")).toDF("domain", "path")
    val got = urls.join(broadcast(domains), "domain")
      .select(col("domain"), col("path"), Robots.allowed(col("path"), col("rules")).as("ok"))
      .orderBy("domain", "path")
      .as[(String, String, Boolean)].collect().toSeq
    assert(got == Seq(
      ("a.example", "/graft-only/secret", false),
      ("a.example", "/private/x", true), // graftbot's group allows /
      ("b.example", "/anything", true))) // empty Disallow = allow all
  }
}
