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
}
