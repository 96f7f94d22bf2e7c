package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.HtmlExpressions

/** HTML → main-text extraction policy — the crawl-corpus front door
  * (trafilatura/jusText's role in a CommonCrawl pipeline; reference
  * rearview consumes already-structured metrics, so this whole layer is
  * part of the LLM-pipeline extension surface, like
  * [[TextOps]]/[[Cleaning]]).
  *
  * The parse is ONE codegen kernel per row
  * ([[graft.functions.HtmlExpressions.HtmlBlocksExpr]]); everything
  * here is declarative column algebra over its (text, chars,
  * link_chars, container) block array — `filter`/`transform`/
  * `concat_ws`, no UDF, no shuffle, no explode — so a 100-TB extraction
  * pass is a single narrow map stage whose policy Catalyst can see.
  *
  * Block classification is the boilerpipe/jusText core signal set:
  *  - container pruning: blocks inside nav/header/footer/aside are
  *    chrome, never body copy;
  *  - link density: `link_chars / chars` above ~1/3 marks link lists
  *    (menus, share bars, related-article widgets) — the jusText
  *    `MAX_LINK_DENSITY` default;
  *  - minimum length: fragments under ~10 chars ("Ad", "More…") carry
  *    no trainable signal.
  */
object Extract {

  /** Visible-text blocks: array<struct<text,chars,link_chars,container>>. */
  def htmlBlocks(html: Column): Column = HtmlExpressions.htmlBlocks(html)

  /** jusText-style keep predicate for one block struct. */
  def isMainBlock(b: Column, maxLinkDensity: Double = 1.0 / 3.0,
      minChars: Int = 10): Column =
    b.getField("container") === "content" &&
      b.getField("chars") >= minChars &&
      b.getField("link_chars") <= b.getField("chars") * lit(maxLinkDensity)

  /** Main body text: content-container blocks passing the link-density
    * and length gates, joined by single newlines (document order).
    * When combining with [[title]]/[[blockStats]] in one projection,
    * compute [[htmlBlocks]] once and use [[mainTextFromBlocks]]. */
  def mainText(html: Column, maxLinkDensity: Double = 1.0 / 3.0,
      minChars: Int = 10): Column =
    mainTextFromBlocks(htmlBlocks(html), maxLinkDensity, minChars)

  def mainTextFromBlocks(blocks: Column, maxLinkDensity: Double = 1.0 / 3.0,
      minChars: Int = 10): Column = {
    val kept = filter(blocks, b => isMainBlock(b, maxLinkDensity, minChars))
    concat_ws("\n", transform(kept, _.getField("text")))
  }

  /** Out-links of a page in document order:
    * array<struct<href, anchor>> — href entity-decoded verbatim (no
    * resolution), anchor whitespace-collapsed visible text. One
    * [[graft.functions.HtmlExpressions.HtmlLinksExpr]] kernel pass per
    * row; resolve each href against the page URL with [[resolvedLinks]]
    * or [[UrlOps.resolveUrl]] before normalization/frontier use. */
  def outLinks(html: Column): Column = HtmlExpressions.htmlLinks(html)

  /** [[outLinks]] with each href resolved against `pageUrl` (RFC 3986
    * §5.2): array<struct<url, anchor>>, hrefs whose resolution fails
    * (malformed base) dropped. Ready for [[UrlOps.normalizeUrl]] and
    * the host-graph build in [[Graph]]. */
  def resolvedLinks(html: Column, pageUrl: Column): Column = {
    val withUrl = transform(outLinks(html), l => struct(
      UrlOps.resolveUrl(pageUrl, l.getField("href")).as("url"),
      l.getField("anchor").as("anchor")))
    filter(withUrl, _.getField("url").isNotNull)
  }

  /** The `<title>` element's text ('' when absent). */
  def title(html: Column): Column = titleFromBlocks(htmlBlocks(html))

  def titleFromBlocks(blocks: Column): Column = {
    val titles = filter(blocks, _.getField("container") === "title")
    // get (0-based, null-safe) not element_at: ANSI mode makes
    // element_at THROW on a title-less page's empty array
    coalesce(get(transform(titles, _.getField("text")), lit(0)), lit(""))
  }

  /** Per-page extraction stats over an already-computed blocks column —
    * compute blocks ONCE (`withColumn("blocks", htmlBlocks(...))`) and
    * reuse across these and [[mainText]]-style selections: (name,
    * column) pairs for n_blocks / n_kept / kept_chars / link_chars /
    * boilerplate_chars. */
  def blockStats(blocks: Column, maxLinkDensity: Double = 1.0 / 3.0,
      minChars: Int = 10): Seq[(String, Column)] = {
    val kept = filter(blocks, b => isMainBlock(b, maxLinkDensity, minChars))
    def charSum(arr: Column): Column =
      coalesce(aggregate(arr, lit(0L), (a, b) => a + b.getField("chars")), lit(0L))
    Seq(
      "n_blocks" -> size(blocks).cast("long"),
      "n_kept" -> size(kept).cast("long"),
      "kept_chars" -> charSum(kept),
      "link_chars" -> coalesce(aggregate(blocks, lit(0L),
        (a, b) => a + b.getField("link_chars")), lit(0L)),
      "boilerplate_chars" -> (charSum(blocks) - charSum(kept)))
  }

  /** jusText's TWO-PASS contextual classification (Pomikálek 2011),
    * simplified to the deterministic core: pass 1 classifies each block
    * as good / bad / short / near-good from length and link density
    * (chrome containers force bad); pass 2 resolves the undecided
    * classes from their nearest DECIDED neighbors — a near-good block
    * joins the body when either neighbor is good, a short block only
    * when both are (a missing neighbor counts bad). This is what keeps
    * a short heading sandwiched between two paragraphs and drops the
    * same-length fragment sitting in a widget cluster — the context
    * signal the single-pass [[mainText]] cannot express.
    *
    * Whole pass is array algebra over ONE parse: two `aggregate` scans
    * (forward / backward over the reversed array) materialize the
    * nearest-decided-class arrays, a final indexed `transform` decides
    * — no explode, no window, no shuffle; at 100 TB this stays inside
    * the same narrow map stage as the parse. */
  def contextualMainText(html: Column, lengthLow: Int = 10,
      lengthHigh: Int = 60, maxLinkDensity: Double = 1.0 / 3.0): Column = {
    val blocks = htmlBlocks(html)
    val core = transform(blocks, { b =>
      val chars = b.getField("chars")
      when(b.getField("container") =!= "content", "bad")
        .when(b.getField("link_chars") > chars * lit(maxLinkDensity), "bad")
        .when(chars >= lengthHigh, "good")
        .when(chars < lengthLow, "short")
        .otherwise("near")
    })
    // nearest decided (good|bad) class before/after each index; 'bad'
    // when none exists (document edges resolve conservatively)
    val z = struct(array().cast("array<string>").as("arr"), lit("bad").as("last"))
    def scan(cs: Column): Column = aggregate(cs, z, (st, c) =>
      struct(
        concat(st.getField("arr"), array(st.getField("last"))).as("arr"),
        when(c === "good" || c === "bad", c)
          .otherwise(st.getField("last")).as("last"))).getField("arr")
    val prevD = scan(core)
    val nextD = reverse(scan(reverse(core)))
    // zip the four arrays FIRST: higher-order lambdas get no
    // subexpression elimination, so an element_at(core, i+1) inside the
    // transform would re-evaluate the whole parse+scan tree once per
    // BLOCK — zipped, each array is evaluated once per row and the
    // lambda touches only its element's struct fields
    val zipped = arrays_zip(
      transform(blocks, _.getField("text")).as("text"),
      core.as("c"), prevD.as("p"), nextD.as("n"))
    val kept = transform(zipped, e => {
      val good = when(e.getField("c") === "good", true)
        .when(e.getField("c") === "near",
          e.getField("p") === "good" || e.getField("n") === "good")
        .when(e.getField("c") === "short",
          e.getField("p") === "good" && e.getField("n") === "good")
        .otherwise(false)
      when(good, e.getField("text"))
    })
    concat_ws("\n", kept) // concat_ws drops the null (non-kept) slots
  }

  /** Head-signal scan bound: meta/link/charset declarations live in
    * `<head>`, so their regexes run over the first 65536 CHARS of
    * markup only (≈64 Ki chars — the decoded-string sibling of the
    * 64 KiB byte convention crawlers use; browsers prescan charset in
    * the first 1024 bytes). On a multi-MB page the alternative is
    * several full-column regex passes per signal for tags that can't
    * legally be that deep. A signal first declared beyond the bound
    * reads as ABSENT — acceptable only where absent is the safe
    * direction (canonical falls back to the fetch URL, charset to the
    * fallback chain). The robots meta is the exception: absent ⇒ KEEP,
    * so [[isNoindex]] scans the FULL column — an explicit exclusion
    * directive buried past 64K of inlined head CSS/JS must still fire
    * (compliance beats the scan bound there). */
  private val HeadScanChars = 65536
  private def headPrefix(html: Column): Column =
    substring(html, 1, HeadScanChars)

  /** `<meta name="…" content="…">` value (null when absent) — the head
    * signals curation gates read: `metaValue(html, "robots")` for
    * noindex, `metaValue(html, "charset")` is NOT this (use
    * [[metaCharset]]). Attribute order varies in the wild, so both
    * orders are tried; case-insensitive; first occurrence wins. Regexp
    * over the raw HTML's [[headPrefix]], deliberately NOT the block
    * parser: meta tags carry no text content, so blocks never see
    * them. */
  def metaValue(htmlRaw: Column, name: String): Column =
    metaValue(htmlRaw, name, bounded = true)

  /** [[metaValue]] with the head-scan bound optional: `bounded = false`
    * scans the whole column — required where a MISSED declaration is
    * compliance-wrong rather than merely degraded ([[isNoindex]]). */
  def metaValue(htmlRaw: Column, name: String, bounded: Boolean): Column = {
    val html = if (bounded) headPrefix(htmlRaw) else htmlRaw
    val q = java.util.regex.Pattern.quote(name)
    // the name must END at a delimiter (name="robots-news" is NOT
    // robots), and values may be unquoted (content=noindex is valid
    // HTML — requiring a quote failed the politeness gate open)
    val nameAttr = "name\\s*=\\s*[\"']?" + q + "[\"']?(?=[\\s/>])"
    val quotedVal = "content\\s*=\\s*[\"']([^\"'>]*)"
    val bareVal = "content\\s*=\\s*([^\\s\"'>]+)"
    coalesce(
      nullif(regexp_extract(html,
        s"(?is)<meta\\s[^>]*?$nameAttr[^>]*?$quotedVal", 1), lit("")),
      nullif(regexp_extract(html,
        s"(?is)<meta\\s[^>]*?$nameAttr[^>]*?$bareVal", 1), lit("")),
      nullif(regexp_extract(html,
        s"(?is)<meta\\s[^>]*?$quotedVal[\"'][^>]*?$nameAttr", 1), lit("")),
      nullif(regexp_extract(html,
        s"(?is)<meta\\s[^>]*?$bareVal[^>]*?$nameAttr", 1), lit("")))
  }

  /** TRUE when the page opts out of indexing (`<meta name=robots>`
    * containing `noindex` / `none`) — the politeness gate curation
    * pipelines honor alongside robots.txt. Null-safe: absent ⇒ false.
    * Scans the FULL column, not the head-prefix bound: absent means
    * KEEP here, so a directive pushed past the bound by inlined head
    * CSS/JS would silently fail open — the compliance-wrong direction
    * (the other head signals keep the bound because their miss
    * direction is safe). */
  def isNoindex(html: Column): Column = {
    val v = lower(coalesce(metaValue(html, "robots", bounded = false), lit("")))
    v.contains("noindex") || v.rlike("(^|[,\\s])none([,\\s]|$)")
  }

  /** The canonical URL (`<link rel=canonical href=…>`; null when
    * absent) — the dedup key real pipelines prefer over the fetch URL
    * when present. Both attribute orders, case-insensitive; scans
    * [[headPrefix]]. */
  def canonicalUrl(htmlRaw: Column): Column = {
    val html = headPrefix(htmlRaw)
    // rel value delimiter-anchored (rel="canonical-alt" is NOT
    // canonical); href quoted or bare
    val relAttr = "rel\\s*=\\s*[\"']?canonical[\"']?(?=[\\s/>])"
    val quotedHref = "href\\s*=\\s*[\"']([^\"'>]*)"
    val bareHref = "href\\s*=\\s*([^\\s\"'>]+)"
    coalesce(
      nullif(regexp_extract(html,
        s"(?is)<link\\s[^>]*?$relAttr[^>]*?$quotedHref", 1), lit("")),
      nullif(regexp_extract(html,
        s"(?is)<link\\s[^>]*?$relAttr[^>]*?$bareHref", 1), lit("")),
      nullif(regexp_extract(html,
        s"(?is)<link\\s[^>]*?$quotedHref[\"'][^>]*?$relAttr", 1), lit("")),
      nullif(regexp_extract(html,
        s"(?is)<link\\s[^>]*?$bareHref[^>]*?$relAttr", 1), lit("")))
  }

  /** Declared charset, lowercased (null when absent): `<meta
    * charset=…>` or the http-equiv Content-Type form — one pattern
    * covers both, since `charset=` appears inside the tag either way.
    * `charset` must FOLLOW a delimiter (space/quote/semicolon) so a
    * form's `accept-charset=` attribute never matches. Scans
    * [[headPrefix]] (HTML5 prescan bound, ×64). */
  def metaCharset(html: Column): Column =
    lower(nullif(regexp_extract(headPrefix(html),
      "(?is)<meta(?=[\\s/>])[^>]*?[\\s\"';]charset\\s*=\\s*[\"']?([A-Za-z0-9_.:-]+)", 1),
      lit("")))

  /** Corpus-driven stopword induction — jusText's per-language
    * stopword lists, learned instead of shipped: a stopword is a term
    * that is both UBIQUITOUS (document frequency ≥ `minDocRatio` of
    * the corpus) and FREQUENT (high total count); the top `k` by
    * (count desc, term asc) are the list. Language-agnostic — run per
    * language partition for a multilingual corpus. One explode + two
    * hash aggregations; the result is list-sized (broadcast it into
    * [[mainTextStopworded]]). The classic frequency definition (Luhn's
    * upper cut) — deterministic, so the induced list is an oracle-able
    * corpus artifact. */
  def induceStopwords(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int,
      minDocRatio: Double = 0.5): org.apache.spark.sql.DataFrame = {
    require(k > 0 && minDocRatio > 0 && minDocRatio <= 1, "bad stopword params")
    val nDocs = df.count()
    val terms = df.select(col(idCol).as("_doc"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    terms.groupBy("term")
      .agg(count(lit(1)).as("cnt"), countDistinct(col("_doc")).as("df"))
      .filter(col("df") >= lit(math.ceil(nDocs * minDocRatio).toLong))
      .orderBy(col("cnt").desc, col("term"))
      .limit(k)
      .select(col("term"), col("cnt"), col("df"))
  }

  /** Extraction policy — the crawl front door's configuration seam
    * ([[graft.streaming.DocumentIngest.extractHtml]] /
    * `extractWarc`), so the streaming and batch pipelines run the SAME
    * declared policy instead of drifting:
    *  - [[ExtractPolicy.Simple]] — the single-pass link-density/length
    *    gate ([[mainText]]);
    *  - [[ExtractPolicy.Contextual]] — the two-pass jusText
    *    neighborhood rule ([[contextualMainText]]);
    *  - [[ExtractPolicy.Stopworded]] — density gate plus a stopword
    *    floor ([[mainTextStopworded]]); feed it [[induceStopwords]]'s
    *    induced list for corpus-adaptive behavior (the list is
    *    list-sized — it ships in the policy, and therefore in the plan,
    *    as a literal). */
  sealed trait ExtractPolicy
  object ExtractPolicy {
    final case class Simple(maxLinkDensity: Double = 1.0 / 3.0,
        minChars: Int = 10) extends ExtractPolicy
    final case class Contextual(lengthLow: Int = 10, lengthHigh: Int = 60,
        maxLinkDensity: Double = 1.0 / 3.0) extends ExtractPolicy
    final case class Stopworded(stopwords: Seq[String],
        maxLinkDensity: Double = 1.0 / 3.0, minChars: Int = 10,
        minStopRatio: Double = 0.05) extends ExtractPolicy
  }

  /** [[mainText]] / [[contextualMainText]] / [[mainTextStopworded]]
    * selected by policy — one stateless projection either way. */
  def extract(html: Column, policy: ExtractPolicy): Column = policy match {
    case ExtractPolicy.Simple(ld, mc) => mainText(html, ld, mc)
    case ExtractPolicy.Contextual(lo, hi, ld) => contextualMainText(html, lo, hi, ld)
    case ExtractPolicy.Stopworded(sw, ld, mc, r) => mainTextStopworded(html, sw, ld, mc, r)
  }

  /** Stopword-density refinement (the second jusText signal): keep a
    * content block only if at least `minStopRatio` of its words are in
    * `stopwords` — drops headline-ese and navigation stubs that pass
    * the link/length gates. Word split and membership are higher-order
    * exprs; `stopwords` ships as an array literal (bounded: a stopword
    * list is dozens of words). */
  def mainTextStopworded(html: Column, stopwords: Seq[String],
      maxLinkDensity: Double = 1.0 / 3.0, minChars: Int = 10,
      minStopRatio: Double = 0.05): Column = {
    val sw = array(stopwords.map(w => lit(w.toLowerCase)): _*)
    val kept = filter(htmlBlocks(html), { b =>
      val words = split(lower(b.getField("text")), " ")
      val nStop = size(filter(words, w => array_contains(sw, w)))
      isMainBlock(b, maxLinkDensity, minChars) &&
        nStop >= size(words) * lit(minStopRatio)
    })
    concat_ws("\n", transform(kept, _.getField("text")))
  }
}
