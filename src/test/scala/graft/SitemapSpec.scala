package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.ext.{Frontier, Sitemap}

/** Sitemap parsing + seed-gate composition on handcrafted payloads
  * (the x66 oracle pins the full chain at corpus scale; these pin
  * per-feature behavior on inputs small enough to eyeball). */
class SitemapSpec extends SparkTestBase {
  import spark.implicits._

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  test("urlset: loc+lastmod, CDATA, entity decode, whitespace trim, missing loc skipped") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc> https://a.example/p1 </loc><lastmod>2026-01-05</lastmod></url>
        |  <url><loc><![CDATA[https://a.example/p2]]></loc></url>
        |  <url><loc>https://a.example/q?a=1&amp;b=2&#x41;</loc></url>
        |  <url><lastmod>2026-01-01</lastmod></url>
        |</urlset>""".stripMargin
    val out = Sitemap.parseEntries(xml.getBytes(UTF_8)).toSeq
    assert(out == Seq(
      ("https://a.example/p1", "2026-01-05", "url"),
      ("https://a.example/p2", null, "url"),
      ("https://a.example/q?a=1&b=2A", null, "url")))
  }

  test("sitemapindex: children are kind=sitemap; namespace prefixes tolerated") {
    val xml =
      """<sm:sitemapindex xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sm:sitemap><sm:loc>https://a.example/m1.xml</sm:loc>
        |    <sm:lastmod>2026-02-01</sm:lastmod></sm:sitemap>
        |  <sm:sitemap><sm:loc>https://a.example/m2.xml</sm:loc></sm:sitemap>
        |</sm:sitemapindex>""".stripMargin
    val out = Sitemap.parseEntries(xml.getBytes(UTF_8)).toSeq
    assert(out == Seq(
      ("https://a.example/m1.xml", "2026-02-01", "sitemap"),
      ("https://a.example/m2.xml", null, "sitemap")))
  }

  test("gzipped payload sniffed and inflated; plain-text sitemap = one URL per line") {
    val xml = "<urlset><url><loc>https://g.example/z</loc></url></urlset>"
    assert(Sitemap.parseEntries(gz(xml.getBytes(UTF_8))).toSeq ==
      Seq(("https://g.example/z", null, "url")))
    val txt = "https://t.example/a\r\n\n  https://t.example/b  \n"
    assert(Sitemap.parseEntries(txt.getBytes(UTF_8)).toSeq ==
      Seq(("https://t.example/a", null, "url"),
        ("https://t.example/b", null, "url")))
  }

  test("entity-decode property: escape -> decode round-trips any text; bare '&' and bad refs survive") {
    val rnd = new scala.util.Random(20260815L)
    val alphabet = "ab<>&\"' ;#xA9é中".toCharArray
    def escape(s: String): String = s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case '\'' => "&apos;"
      case c => c.toString
    }
    (1 to 300).foreach { _ =>
      val s = Array.fill(rnd.nextInt(24))(alphabet(rnd.nextInt(alphabet.length)))
        .mkString
      assert(Sitemap.decodeXmlEntities(escape(s)) == s, s"round-trip broke on: $s")
    }
    // lenient leftovers: bare '&', unknown entities, malformed refs
    assert(Sitemap.decodeXmlEntities("a & b &unknown; &#xZZ; &#1114112; c") ==
      "a & b &unknown; &#xZZ; &#1114112; c")
    assert(Sitemap.decodeXmlEntities("&#65;&#x42;") == "AB")
  }

  test("tolerance: truncated tail yields parsed prefix; garbage/empty yield nothing") {
    val xml = "<urlset><url><loc>https://a.example/ok</loc></url><url><loc>https://a.exam"
    assert(Sitemap.parseEntries(xml.getBytes(UTF_8)).toSeq ==
      Seq(("https://a.example/ok", null, "url")))
    assert(Sitemap.parseEntries(Array.emptyByteArray).isEmpty)
    assert(Sitemap.parseEntries("<html><body>404</body></html>".getBytes(UTF_8)).isEmpty)
  }

  test("seedsFromSitemaps robots gate: disallowed page seeds die; index children and no-robots hosts unaffected") {
    val xml =
      """<urlset>
        |  <url><loc>https://a.example/private/p</loc></url>
        |  <url><loc>https://a.example/public/q</loc></url>
        |  <url><loc>https://b.example/private/r</loc></url>
        |</urlset>""".stripMargin
    val idx = "<sitemapindex><sitemap><loc>https://a.example/private/sm.xml</loc></sitemap></sitemapindex>"
    val fetched = Seq(
      ("https://a.example/sitemap.xml", xml.getBytes(UTF_8)),
      ("https://a.example/idx.xml", idx.getBytes(UTF_8))).toDF("url", "payload")
    val robots = Seq(("https://a.example/robots.txt",
      "User-agent: *\nDisallow: /private/\n")).toDF("rurl", "rtxt")
    val out = Frontier.seedsFromSitemaps(fetched, "url", "payload",
        robotsGate = Some(Frontier.RobotsGate(robots, "rurl", "rtxt")))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq.sorted
    // a.example/private page dies; b.example (no robots row) keeps its
    // private page; the index CHILD under /private/ survives — robots
    // page rules do not govern sitemap fetches here
    assert(out == Seq(
      ("https://a.example/private/sm.xml", "sitemap"),
      ("https://a.example/public/q", "url"),
      ("https://b.example/private/r", "url")))
  }

  test("seedsFromSitemaps: seen store kills page candidates only; twins keep max lastmod") {
    val table = "sitemapspec_seen"
    try {
      Frontier.writeSeenStore(Seq("https://a.example/old").toDF("url"),
        "url", table, buckets = 4)
      val xml =
        """<urlset>
          |  <url><loc>https://a.example/old</loc></url>
          |  <url><loc>https://a.example/new</loc><lastmod>2026-01-01</lastmod></url>
          |  <url><loc>https://a.example/new?utm_source=x</loc><lastmod>2026-03-01</lastmod></url>
          |</urlset>""".stripMargin
      val idx =
        """<sitemapindex>
          |  <sitemap><loc>https://a.example/old</loc></sitemap>
          |</sitemapindex>""".stripMargin
      val fetched = Seq(
        ("https://a.example/sitemap.xml", xml.getBytes(UTF_8)),
        ("https://a.example/idx.xml", idx.getBytes(UTF_8))).toDF("url", "payload")
      val out = Frontier.seedsFromSitemaps(fetched, "url", "payload",
          seenTable = Some(table))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          if (r.isNullAt(3)) null else r.getString(3)))
        .toSeq.sortBy(t => (t._3, t._2))
      // /old as a PAGE dies at the store; /old as an index CHILD is a
      // sitemap fetch, not a page crawl — it survives
      assert(out == Seq(
        ("a.example", "https://a.example/old", "sitemap", null),
        ("a.example", "https://a.example/new", "url", "2026-03-01")))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      ()
    }
  }
}
