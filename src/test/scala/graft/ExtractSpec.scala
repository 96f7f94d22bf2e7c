package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.Extract

/** HTML → text extraction: parser semantics on adversarial fixtures,
  * boilerplate policy, and the eval/codegen agreement. The oracle gate
  * (x47) covers the closed-form template path; these pin the messy-HTML
  * behaviors the template can't exercise. */
class ExtractSpec extends SparkTestBase {
  import spark.implicits._

  private def blocksOf(html: String): Seq[Row] =
    Seq(html).toDF("html")
      .select(explode(Extract.htmlBlocks(col("html"))).as("b"))
      .select("b.text", "b.chars", "b.link_chars", "b.container")
      .collect().toSeq

  private def mainOf(html: String): String =
    Seq(html).toDF("html").select(Extract.mainText(col("html"))).head.getString(0)

  test("tag stripping, block segmentation, whitespace collapse") {
    val bs = blocksOf(
      "<html><body><p>  Hello   <b>big</b>\n world </p><div>Second   block</div></body></html>")
    assert(bs.map(_.getString(0)) == Seq("Hello big world", "Second block"))
    assert(bs.head.getInt(1) == "Hello big world".length)
    assert(bs.forall(_.getString(3) == "content"))
  }

  test("script/style/comment content is dropped; a </p> inside a JS string does not end the skip") {
    val html = """<head><style>body { color: #fff; }</style>
      |<script>var s = "</p> fake"; if (1 < 2) alert("x");</script></head>
      |<body><p>Real text here</p><!-- hidden --></body>""".stripMargin
    assert(blocksOf(html).map(_.getString(0)) == Seq("Real text here"))
  }

  test("noscript/template/svg/textarea/iframe content never surfaces as page text") {
    val html =
      """<body><noscript>Please enable JavaScript to view this site.</noscript>
        |<template><p>inert row template</p></template>
        |<svg viewBox="0 0 10 10"><text x="1">vector label</text></svg>
        |<p>Real article text survives.</p>
        |<textarea rows="4">draft form contents</textarea>
        |<iframe src="/ad"><p>iframe fallback junk</p></iframe>
        |<svg/> <p>after self-closed svg</p></body>""".stripMargin
    val texts = blocksOf(html).map(_.getString(0))
    assert(texts == Seq("Real article text survives.", "after self-closed svg"))
  }

  test("NESTED svg/template skip to the matching close (icon-sprite shape)") {
    // svg is foreign content with XML nesting: the inner </svg> must not
    // end the skip and leak '42 shares' as a content block
    val html =
      """<body><svg><svg x="1"><path d="M0 0"/></svg><text>42 shares</text></svg>
        |<p>Article text after the sprite.</p>
        |<template><template><p>inner</p></template><p>outer junk</p></template>
        |<svg><svgfoo></svgfoo></svg><p>tag-name boundary respected</p>
        |<svg><svg/><text>after self-closed inner</text></svg><p>end</p></body>"""
        .stripMargin
    val texts = blocksOf(html).map(_.getString(0))
    assert(texts == Seq("Article text after the sprite.",
      "tag-name boundary respected", "end"))
  }

  test("entities: named, decimal, hex, nbsp; unknown and unterminated stay literal") {
    val bs = blocksOf("<p>Tom&nbsp;&amp; Jerry &lt;3 &#8212; &#x41;Z &unknown; A&B</p>")
    assert(bs.map(_.getString(0)) == Seq("Tom & Jerry <3 — AZ &unknown; A&B"))
  }

  test("quoted attribute values may contain '>' without ending the tag") {
    val bs = blocksOf("""<p title="a > b" data-x='1>2'>kept text</p>""")
    assert(bs.map(_.getString(0)) == Seq("kept text"))
  }

  test("uppercase tags, self-closing tags, stray '<' as text, orphan close tags") {
    val bs = blocksOf("<P>One<BR/>Two</P><p>3 < 4 and x</unopened></p>")
    assert(bs.map(_.getString(0)) == Seq("One", "Two", "3 < 4 and x"))
  }

  test("containers: nav/header/footer/aside/title label their blocks; nesting keeps innermost") {
    val bs = blocksOf(
      "<title>T</title><header>H<nav><a href='/'>L1</a></nav></header><p>body</p><footer>F</footer>")
    assert(bs.map(r => (r.getString(0), r.getString(3))) == Seq(
      ("T", "title"), ("H", "header"), ("L1", "nav"), ("body", "content"), ("F", "footer")))
  }

  test("mismatched container close implies inner end tags instead of wedging the stack") {
    // </header> closes the unclosed <nav> too (browser behavior): the
    // article after it must be 'content', not chrome
    val bs = blocksOf(
      "<body><header><nav><a href='/'>Home</a></header><p>Article text here</p></body>")
    assert(bs.map(r => (r.getString(0), r.getString(3))) ==
      Seq(("Home", "nav"), ("Article text here", "content")))
    // an orphan close with no matching open is a no-op
    val bs2 = blocksOf("<p>one</p></nav><p>two</p>")
    assert(bs2.map(r => (r.getString(0), r.getString(3))) ==
      Seq(("one", "content"), ("two", "content")))
  }

  test("link density: chars inside <a> count; spaces follow the next char's link state") {
    val bs = blocksOf("<div><a>Tweet</a> <a>Share</a> tail</div>")
    // 'Tweet Share tail': 'Tweet'(5) + ' '(linked: next char starts <a>)
    // + 'Share'(5) = 11 linked; ' tail' unlinked
    assert(bs.head.getString(0) == "Tweet Share tail")
    assert(bs.head.getInt(2) == 11)
  }

  test("mainText prunes nav/footer chrome, link lists, and short fragments") {
    val html =
      """<body><nav><a>Home</a> <a>About this site</a></nav>
        |<div class="share"><a>Tweet</a> <a>Share this page now</a> <a>Like</a></div>
        |<div>Ad</div>
        |<p>The quick brown fox jumps over the lazy dog repeatedly.</p>
        |<footer>All rights reserved forever</footer></body>""".stripMargin
    assert(mainOf(html) == "The quick brown fox jumps over the lazy dog repeatedly.")
  }

  test("title(), blockStats, and stopword refinement") {
    val html = "<title>Page One</title><body><p>the cat and the dog sat on a mat here</p>" +
      "<p>BREAKING EXCLUSIVE MEGA DEALS TODAY</p></body>"
    val df = Seq(html).toDF("html").withColumn("blocks", Extract.htmlBlocks(col("html")))
    assert(df.select(Extract.titleFromBlocks(col("blocks"))).head.getString(0) == "Page One")
    val stats = Extract.blockStats(col("blocks"))
    val r = df.select(stats.map { case (n, c) => c.as(n) }: _*).head
    assert(r.getAs[Long]("n_blocks") == 3L && r.getAs[Long]("n_kept") == 2L)
    assert(r.getAs[Long]("link_chars") == 0L)
    // stopword gate drops the all-caps headline-ese block
    val sw = Seq("the", "and", "on", "a", "here")
    val refined = df.select(Extract.mainTextStopworded(col("html"), sw)).head.getString(0)
    assert(refined == "the cat and the dog sat on a mat here")
  }

  test("contextual classification: short blocks live or die by their neighbors") {
    val long1 = "This first paragraph is comfortably long enough to be classified good on its own."
    val long2 = "A second paragraph, also long enough that the classifier marks it good directly."
    val html =
      s"""<body><nav><a>Home</a> <a>About</a></nav>
         |<p>$long1</p>
         |<div>Headline</div>
         |<p>$long2</p>
         |<div>A moderate trailing line of text</div>
         |<div class="w"><a>Tweet</a> <a>Share this page</a></div>
         |<div>Orphan</div>
         |<div>Another moderate line near widgets</div>
         |<footer>chrome here</footer></body>""".stripMargin
    val got = Seq(html).toDF("html")
      .select(Extract.contextualMainText(col("html"))).head.getString(0)
    // 'Headline' (short, good on both sides) survives; the trailing
    // near-good rides its good neighbor; 'Orphan' (short, bad/bad) and
    // the widget-adjacent near line die; single-pass mainText would
    // have dropped 'Headline' too
    assert(got == Seq(long1, "Headline", long2,
      "A moderate trailing line of text").mkString("\n"))
    val single = Seq(html).toDF("html")
      .select(Extract.mainText(col("html"))).head.getString(0)
    assert(!single.contains("Headline"))
  }

  test("head signals: meta robots/noindex, canonical link, charset — both attribute orders") {
    val df = Seq(
      """<head><META NAME="ROBOTS" Content="noindex, follow">
        |<link rel="canonical" href="https://e.com/a" />
        |<meta charset="UTF-8"></head>""".stripMargin,
      """<head><meta content="index,none" name=robots>
        |<link href="https://e.com/b" rel=canonical>
        |<meta http-equiv="Content-Type" content="text/html; charset=ISO-8859-1"></head>""".stripMargin,
      "<head><meta name=viewport content=x><p>no signals</p></head>")
      .toDF("html")
      .select(
        Extract.isNoindex(col("html")).as("noidx"),
        Extract.canonicalUrl(col("html")).as("canon"),
        Extract.metaCharset(col("html")).as("cs"))
      .collect()
    assert(df(0).getBoolean(0) && df(0).getString(1) == "https://e.com/a" &&
      df(0).getString(2) == "utf-8")
    assert(df(1).getBoolean(0) && df(1).getString(1) == "https://e.com/b" &&
      df(1).getString(2) == "iso-8859-1")
    assert(!df(2).getBoolean(0) && df(2).isNullAt(1) && df(2).isNullAt(2))
  }

  test("head-scan bound: fail-open signals bounded; the robots exclusion directive scans the full column") {
    val filler = "x" * 70000
    val rows = Seq(
      // signals inside the bound, page body far larger — still found
      s"""<head><meta name=robots content=noindex><link rel=canonical href="https://e.com/in"><meta charset=utf-8></head><body>$filler</body>""",
      // signals declared past 64K chars of markup: canonical/charset
      // read absent (their miss direction is safe — fallback chain),
      // but the robots NOINDEX still fires — absent means KEEP there,
      // so a bounded scan was the compliance-wrong direction
      s"""<body>$filler<meta name=robots content=noindex><link rel=canonical href="https://e.com/out"><meta charset=utf-8></body>""")
      .toDF("html")
      .select(
        Extract.isNoindex(col("html")).as("noidx"),
        Extract.canonicalUrl(col("html")).as("canon"),
        Extract.metaCharset(col("html")).as("cs"))
      .collect()
    assert(rows(0).getBoolean(0) && rows(0).getString(1) == "https://e.com/in" &&
      rows(0).getString(2) == "utf-8")
    assert(rows(1).getBoolean(0), "noindex past the head bound must still fire")
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }

  test("head signals: unquoted values honored; prefixed names/rels rejected; accept-charset ignored") {
    val df = Seq(
      // unquoted content / href — valid HTML, gates must fire
      "<head><meta name=robots content=noindex><link rel=canonical href=https://e.com/u></head>",
      // prefixed name / rel must NOT match; accept-charset is not charset
      """<head><meta name="robots-news" content="noindex">
        |<link rel="canonical-alt" href="http://wrong">
        |<form accept-charset=utf-16></form><meta name=x content=y></head>""".stripMargin)
      .toDF("html")
      .select(
        Extract.isNoindex(col("html")).as("noidx"),
        Extract.canonicalUrl(col("html")).as("canon"),
        Extract.metaCharset(col("html")).as("cs"))
      .collect()
    assert(df(0).getBoolean(0) && df(0).getString(1) == "https://e.com/u")
    assert(!df(1).getBoolean(0) && df(1).isNullAt(1) && df(1).isNullAt(2))
  }

  test("induced stopwords feed the stopword-density refinement end-to-end") {
    val docs = graft.store.Tables.documents(spark, "/root/testdata/sf0.001")
    val sw = Extract.induceStopwords(docs, "doc_id", "text", k = 20)
      .select("term").as[String].collect().toSeq
    assert(sw.nonEmpty && sw.size <= 20)
    // ubiquity contract: every induced stopword really is in >= half
    // the documents
    val n = docs.count()
    sw.foreach { w =>
      val df = docs.filter(array_contains(
        split(trim(lower(col("text"))), "\\s+"), w)).count()
      assert(df * 2 >= n, s"$w df=$df of $n")
    }
    // the induced list drives the jusText refinement: a block made of
    // corpus-typical words survives, headline-ese dies
    val html = s"<body><p>${sw.take(8).mkString(" ")} ${sw.take(4).mkString(" ")}</p>" +
      "<p>BREAKING MEGA EXCLUSIVE DEALS TONIGHT ONLY</p></body>"
    val kept = Seq(html).toDF("html")
      .select(Extract.mainTextStopworded(col("html"), sw)).head.getString(0)
    assert(kept.contains(sw.head) && !kept.contains("BREAKING"))
  }

  test("empty, null, and text-free pages yield empty results, not errors") {
    val df = Seq[Option[String]](Some(""), None, Some("<p></p><div>   </div>"))
      .toDF("html")
    val out = df.select(Extract.mainText(col("html")).as("m"),
      size(Extract.htmlBlocks(col("html"))).as("nb")).collect()
    assert(out(0).getString(0) == "" && out(0).getInt(1) == 0)
    // null html: blocks is null; concat_ws skips null args -> ''
    assert(out(1).getString(0) == "" && out(1).isNullAt(1))
    assert(out(2).getString(0) == "" && out(2).getInt(1) == 0)
  }

  test("interpreted eval path agrees with codegen") {
    val e = graft.functions.HtmlExpressions.HtmlBlocksExpr(
      org.apache.spark.sql.graft.ColumnBridge.expr(lit("<p>a b</p><nav>x y z</nav>")))
    val arr = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(arr.numElements() == 2)
    val r0 = arr.getStruct(0, 4)
    assert(r0.getUTF8String(0).toString == "a b" && r0.getInt(1) == 3)
    assert(arr.getStruct(1, 4).getUTF8String(3).toString == "nav")
  }

  // -- out-link extraction (graft_html_links) ------------------------------

  private def linksOf(html: String): Seq[(String, String)] =
    Seq(html).toDF("html")
      .select(explode(Extract.outLinks(col("html"))).as("l"))
      .select("l.href", "l.anchor")
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))

  test("links: quoted/bare/valueless href, anchors collapsed, document order") {
    assert(linksOf(
      """<p>intro</p><a href="/a/b">First  link</a> mid
        |<a href=bare?x=1>second</a><a href>self</a><a name=skip>no href</a>""".stripMargin) ==
      Seq(("/a/b", "First link"), ("bare?x=1", "second"), ("", "self")))
  }

  test("links: hrefs entity-decode; anchor entities and inner tags handled") {
    assert(linksOf("""<a href="/p?a=1&amp;b=2">x &amp; y</a>""") ==
      Seq(("/p?a=1&b=2", "x & y")))
    // inner tags act as separators; nested markup doesn't leak
    assert(linksOf("""<a href="/q"><b>bold</b><i>ital</i></a>""") ==
      Seq(("/q", "bold ital")))
  }

  test("links inside script/style/comments/noscript are data, not links") {
    assert(linksOf(
      """<script>var s = '<a href="/evil">x</a>';</script>
        |<!-- <a href="/commented">y</a> -->
        |<noscript><a href="/noscript">z</a></noscript>
        |<a href="/real">ok</a>""".stripMargin) == Seq(("/real", "ok")))
  }

  test("links: nested <a> implicitly closes; unclosed trailing <a> still emits") {
    assert(linksOf("""<a href="/one">first <a href="/two">second""") ==
      Seq(("/one", "first"), ("/two", "second")))
  }

  test("links: duplicate href attributes - first wins; quoted '>' stays in value") {
    assert(linksOf("""<a href="/keep" href="/drop" title="a>b">t</a>""") ==
      Seq(("/keep", "t")))
  }

  test("stray '/' + space does not self-close; surrogate refs decode to U+FFFD") {
    // HTML5 honors a stray '/' only DIRECTLY before '>' — with spaces
    // after it the element stays open and the visible text is anchor
    assert(linksOf("""<a href=/x / >anchor text</a>""") ==
      Seq(("/x", "anchor text")))
    // numeric refs in the surrogate range must not emit lone
    // surrogates (ill-formed UTF-16) into anchors or hrefs
    assert(linksOf("<a href=\"/s\">a &#xD800; b</a>") ==
      Seq(("/s", "a � b")))
    assert(linksOf("<a href=\"/p?x=&#55296;\">t</a>") ==
      Seq(("/p?x=�", "t")))
  }

  test("resolvedLinks resolves against the page URL and drops on bad base") {
    val df = Seq(
      ("https://site.example/dir/page.html", """<a href="sub/x">r</a><a href="/abs">a</a>"""),
      ("not a url", """<a href="/x">gone</a>""")).toDF("url", "html")
    val out = df.select(explode(Extract.resolvedLinks(col("html"), col("url"))).as("l"))
      .select("l.url").collect().map(_.getString(0)).toSeq
    assert(out == Seq("https://site.example/dir/sub/x", "https://site.example/abs"))
  }

  test("links kernel: interpreted eval agrees with codegen; SQL surface") {
    val e = graft.functions.HtmlExpressions.HtmlLinksExpr(
      org.apache.spark.sql.graft.ColumnBridge.expr(lit("""<a href="/h">t</a>""")))
    val arr = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(arr.numElements() == 1)
    assert(arr.getStruct(0, 2).getUTF8String(0).toString == "/h")
    graft.functions.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      """SELECT graft_html_links('<a href="/h">t</a>')[0].href AS h""").head.getString(0)
    assert(viaSql == "/h")
  }
}
