package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text-block extraction — the front door of a crawl-corpus
  * pipeline (a CommonCrawl-derived corpus is HTML pages; every cleaning
  * gate in [[graft.ext.Cleaning]] consumes a `text` column that this
  * step produces). One single-pass, allocation-light kernel per row in
  * the [[TextExpressions]] style: a native Catalyst expression (house
  * preference (b) — no UDF, no driver work, JIT-able method size).
  *
  * [[HtmlBlocksExpr]] parses one HTML string into visible TEXT BLOCKS:
  *
  *  - non-rendered element content (`<script>`, `<style>`,
  *    `<noscript>`, `<template>`, `<svg>`, `<textarea>`, `<iframe>`)
  *    and `<!-- comments -->` are dropped (until the matching close
  *    tag — a `</p>` inside a JS string does not terminate the skip);
  *  - tag attributes are skipped with quote-awareness (a literal `>`
  *    inside a quoted attribute value does not end the tag);
  *  - character references are decoded (named amp/lt/gt/quot/apos/nbsp
  *    + decimal `&#8212;` and hex `&#x41;` forms; an unknown or
  *    unterminated `&…` stays literal, as browsers render it);
  *  - whitespace runs collapse to one space (`&nbsp;` decodes to a
  *    plain space and collapses with its neighbors);
  *  - BLOCK-level tags (p, div, li, h1–h6, td, br, …) split blocks;
  *    inline tags (a, b, span, em, …) do not;
  *  - each block carries `chars` (decoded length), `link_chars` (chars
  *    contributed inside an `<a>` element — the jusText/boilerpipe
  *    link-density signal) and `container`: the innermost enclosing
  *    semantic container (`nav`/`header`/`footer`/`aside`/`title`),
  *    else `content`.
  *
  * Downstream classification (link-density + length pruning, title
  * pick, stopword densities) is plain higher-order column algebra over
  * the struct array — see [[graft.ext.Extract]] — so the policy stays
  * declarative and Catalyst-visible while the parse stays one kernel.
  * Malformed HTML never throws: stray `<`, unclosed tags and orphan
  * close tags degrade to text or no-ops exactly as browsers treat them.
  */
object HtmlExpressions {

  val BlockSchema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("chars", IntegerType, nullable = false),
    StructField("link_chars", IntegerType, nullable = false),
    StructField("container", StringType, nullable = false)))

  /** Tags that terminate the current text block. Everything not listed
    * here (and not a semantic container) is inline. */
  private val BlockTags: Set[String] = Set(
    "p", "div", "br", "hr", "li", "ul", "ol", "dl", "dt", "dd",
    "h1", "h2", "h3", "h4", "h5", "h6", "table", "thead", "tbody", "tr",
    "td", "th", "blockquote", "pre", "form", "section", "article",
    "main", "figure", "figcaption", "body", "html", "head")

  /** Containers whose blocks a boilerplate pruner treats specially. */
  private val ContainerTags: Set[String] = Set(
    "nav", "header", "footer", "aside", "title")

  /** Elements whose CONTENT never renders as page text — skipped raw to
    * the matching close tag. Beyond script/style: `<noscript>` ("enable
    * JavaScript" boilerplate), `<template>` (inert DOM), `<svg>` (vector
    * markup), `<textarea>` (form input, not prose), `<iframe>` (fallback
    * content) — all surface as bogus `content` blocks on real pages
    * when treated as text. */
  private val RawSkipTags: Set[String] = Set(
    "script", "style", "noscript", "template", "svg", "textarea", "iframe")

  /** Raw-skip tags that legally NEST (unlike script/style/textarea,
    * whose content ends at the first matching close per the HTML5
    * raw-text rules): `<svg>` is foreign content with XML nesting
    * (icon sprites routinely wrap `<svg><svg>…</svg>…</svg>`), and
    * template/noscript hold parsed markup that may repeat the tag. For
    * these the close scan is depth-aware — stopping at the first inner
    * `</svg>` leaked the rest of the vector markup as content blocks. */
  private val NestingRawSkipTags: Set[String] = Set("svg", "template", "noscript")

  final case class HtmlBlocksExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(BlockSchema, containsNull = false)
    override def prettyName: String = "graft_html_blocks"

    override def nullSafeEval(input: Any): Any =
      HtmlExpressions.parseBlocks(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, h =>
        s"${ev.value} = graft.functions.HtmlExpressions.parseBlocks($h);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Java-callable parse entry (shared by eval and codegen). */
  def parseBlocks(html: UTF8String): ArrayData = {
    val s = html.toString
    val n = s.length
    val blocks = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    val text = new java.lang.StringBuilder(256)
    val containers = scala.collection.mutable.ArrayBuffer.empty[String]
    var linkDepth = 0
    var linkChars = 0
    var pendingSpace = false
    var i = 0

    def flush(): Unit = {
      // trailing pending space never materialized; leading skipped below
      if (text.length() > 0) {
        val t = text.toString
        // chars in CODEPOINTS (what DuckDB/Spark length() count)
        val chars = t.codePointCount(0, t.length)
        val cont = if (containers.isEmpty) "content" else containers.last
        blocks += new GenericInternalRow(Array[Any](
          UTF8String.fromString(t), chars, math.min(linkChars, chars),
          UTF8String.fromString(cont)))
      }
      text.setLength(0); linkChars = 0; pendingSpace = false
    }

    def appendChar(c: Char): Unit = {
      if (Character.isWhitespace(c) || c == ' ') { pendingSpace = text.length() > 0 }
      else {
        if (pendingSpace) {
          text.append(' '); if (linkDepth > 0) linkChars += 1
          pendingSpace = false
        }
        // link_chars in codepoints too: a surrogate pair counts once
        text.append(c)
        if (linkDepth > 0 && !Character.isLowSurrogate(c)) linkChars += 1
      }
    }

    def lowerName(from: Int): (String, Int) = { // (tag name, index after it)
      var j = from
      val b = new java.lang.StringBuilder(8)
      while (j < n && (Character.isLetterOrDigit(s.charAt(j)))) {
        b.append(Character.toLowerCase(s.charAt(j))); j += 1
      }
      (b.toString, j)
    }

    /** Skip attrs to the tag-closing '>', honoring quoted values. */
    def skipTag(from: Int): Int = {
      var j = from
      var quote: Char = 0
      while (j < n) {
        val c = s.charAt(j)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        else if (c == '>') return j + 1
        j += 1
      }
      n
    }

    /** Case-insensitive search for `</name` at-or-after `from`; returns
      * the index of its '<' or n. */
    def findClose(from: Int, name: String): Int = {
      var j = from
      val m = name.length
      while (j + m + 2 <= n) {
        if (s.charAt(j) == '<' && s.charAt(j + 1) == '/' &&
            s.regionMatches(true, j + 2, name, 0, m)) return j
        j += 1
      }
      n
    }

    /** True when `idx` does not continue a tag name ("</svg>"'s close
      * must not be claimed by "</svgfoo>"). */
    def nameEnds(idx: Int): Boolean =
      idx >= n || !Character.isLetterOrDigit(s.charAt(idx))

    /** Depth-aware [[findClose]] for [[NestingRawSkipTags]]: inner
      * same-tag opens (non-self-closed) push depth, closes pop; returns
      * the '<' of the close matching the CURRENT element, or n. */
    def findCloseNested(from: Int, name: String): Int = {
      var j = from
      val m = name.length
      var depth = 0
      while (j + m + 2 <= n) {
        if (s.charAt(j) == '<') {
          if (s.charAt(j + 1) == '/' &&
              s.regionMatches(true, j + 2, name, 0, m) && nameEnds(j + 2 + m)) {
            if (depth == 0) return j
            depth -= 1
            j += 2 + m
          } else if (s.regionMatches(true, j + 1, name, 0, m) && nameEnds(j + 1 + m)) {
            val end = skipTag(j + 1 + m)
            val prev = if (end - 2 >= j + 1 + m) s.charAt(end - 2) else ' '
            if (prev != '/') depth += 1 // <svg/> never opened a level
            j = end
          } else j += 1
        } else j += 1
      }
      n
    }

    def decodeEntity(from: Int): (Int, Int) = entityAt(s, from)

    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = s.charAt(i + 1)
        if (c1 == '!') {
          if (s.startsWith("<!--", i)) {
            val end = s.indexOf("-->", i + 4)
            i = if (end < 0) n else end + 3
          } else i = skipTag(i + 2) // <!DOCTYPE …>
        } else if (c1 == '?') {
          i = skipTag(i + 2) // <?xml …?>
        } else if (c1 == '/' || Character.isLetter(c1)) {
          val closing = c1 == '/'
          val (name, afterName) = lowerName(if (closing) i + 2 else i + 1)
          if (name.isEmpty) { appendChar(c); i += 1 } // stray '<' / '</'
          else {
            val selfClosed = {
              val end = skipTag(afterName)
              val prev = if (end - 2 >= afterName) s.charAt(end - 2) else ' '
              i = end
              prev == '/'
            }
            name match {
              case t if RawSkipTags.contains(t) && !closing && !selfClosed =>
                flush()
                val close =
                  if (NestingRawSkipTags.contains(t)) findCloseNested(i, name)
                  else findClose(i, name)
                i = if (close >= n) n else skipTag(close + 2 + name.length)
              case t if RawSkipTags.contains(t) => flush()
              case "a" =>
                if (closing) { if (linkDepth > 0) linkDepth -= 1 }
                else if (!selfClosed) linkDepth += 1
              case t if ContainerTags.contains(t) =>
                flush()
                if (closing) {
                  // pop up to the MATCHING open container (implied end
                  // tags, as browsers close them): </header> around an
                  // unclosed <nav> must not wedge "nav" on the stack
                  // and label the rest of the page as chrome. A close
                  // with no matching open is a no-op.
                  val at = containers.lastIndexOf(t)
                  if (at >= 0) containers.remove(at, containers.length - at)
                } else if (!selfClosed) containers += t
              case t if BlockTags.contains(t) => flush()
              case _ => () // inline tag: no block split
            }
          }
        } else { appendChar(c); i += 1 } // '<' not starting a tag
      } else if (c == '&') {
        val (cp, next) = decodeEntity(i + 1)
        if (cp >= 0) {
          Character.toChars(cp).foreach(appendChar)
          i = next
        } else { appendChar('&'); i += 1 }
      } else { appendChar(c); i += 1 }
    }
    flush()
    new GenericArrayData(blocks.toArray[Any])
  }

  /** Character-reference decode at `from` (just past an '&') in `s`:
    * (codePoint, next index), or (-1, from) when not a valid reference
    * (the '&' then renders literally, as browsers do). Named
    * amp/lt/gt/quot/apos/nbsp + decimal and hex numeric forms. */
  private def entityAt(s: String, from: Int): (Int, Int) = {
    val n = s.length
    if (from < n && s.charAt(from) == '#') {
      var j = from + 1
      var cp = 0
      var any = false
      if (j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) {
        j += 1
        while (j < n && Character.digit(s.charAt(j), 16) >= 0 && cp <= 0x10ffff) {
          cp = cp * 16 + Character.digit(s.charAt(j), 16); any = true; j += 1
        }
      } else {
        while (j < n && s.charAt(j) >= '0' && s.charAt(j) <= '9' && cp <= 0x10ffff) {
          cp = cp * 10 + (s.charAt(j) - '0'); any = true; j += 1
        }
      }
      if (any && j < n && s.charAt(j) == ';' && cp > 0 && cp <= 0x10ffff)
        // HTML5 maps surrogate references to U+FFFD — toChars on a lone
        // surrogate would emit ill-formed UTF-16 into hrefs/anchors
        ((if (cp >= 0xd800 && cp <= 0xdfff) 0xfffd else cp), j + 1)
      else (-1, from)
    } else {
      val semi = {
        var j = from
        while (j < n && j - from <= 8 && s.charAt(j) != ';') j += 1
        if (j < n && s.charAt(j) == ';') j else -1
      }
      if (semi < 0) (-1, from)
      else s.substring(from, semi).toLowerCase match {
        case "amp" => ('&'.toInt, semi + 1)
        case "lt" => ('<'.toInt, semi + 1)
        case "gt" => ('>'.toInt, semi + 1)
        case "quot" => ('"'.toInt, semi + 1)
        case "apos" => ('\''.toInt, semi + 1)
        case "nbsp" => (' '.toInt, semi + 1)
        case _ => (-1, from)
      }
    }
  }

  /** Full entity decode of an attribute value (`&amp;` in an `href` is
    * the serialized form of a literal `&` — a URL string must get the
    * decoded character before resolution or dedup). */
  private def decodeEntities(raw: String): String = {
    var amp = raw.indexOf('&')
    if (amp < 0) return raw
    val b = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '&') {
        val (cp, next) = entityAt(raw, i + 1)
        if (cp >= 0) { b.appendCodePoint(cp); i = next }
        else { b.append('&'); i += 1 }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  // -- out-link extraction ------------------------------------------------

  val LinkSchema: StructType = StructType(Seq(
    StructField("href", StringType, nullable = false),
    StructField("anchor", StringType, nullable = false)))

  /** [[parseLinks]] as a native expression: `<a href>` out-links in
    * document order, `array<struct<href, anchor>>`. Same parse discipline
    * as [[HtmlBlocksExpr]] (one pass, quote-aware attributes, comment and
    * raw-content skips — an `<a>` inside `<script>` is string data, not
    * a link), so link extraction shares the blocks kernel's robustness
    * contract instead of a regex's. `href` is entity-decoded verbatim
    * (no resolution — that is [[UrlExpressions.UrlResolveExpr]]'s job);
    * `anchor` is the element's visible text, entity-decoded and
    * whitespace-collapsed, with interior tags acting as separators.
    * Browser-shaped edge rules: a nested `<a>` implicitly closes the
    * open one; an unclosed trailing `<a>` still emits; an anchor with
    * no `href` attribute emits nothing. */
  final case class HtmlLinksExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(LinkSchema, containsNull = false)
    override def prettyName: String = "graft_html_links"

    override def nullSafeEval(input: Any): Any =
      HtmlExpressions.parseLinks(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, h =>
        s"${ev.value} = graft.functions.HtmlExpressions.parseLinks($h);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Java-callable parse entry (shared by eval and codegen). */
  def parseLinks(html: UTF8String): ArrayData = {
    val s = html.toString
    val n = s.length
    val links = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    val anchor = new java.lang.StringBuilder(64)
    var href: String = null // null = no open link
    var pendingSpace = false
    var i = 0

    def emit(): Unit = {
      if (href != null)
        links += new GenericInternalRow(Array[Any](
          UTF8String.fromString(href), UTF8String.fromString(anchor.toString)))
      href = null; anchor.setLength(0); pendingSpace = false
    }

    def appendChar(c: Char): Unit = {
      if (href == null) () // anchor text only accumulates inside a link
      else if (Character.isWhitespace(c)) { pendingSpace = anchor.length() > 0 }
      else {
        if (pendingSpace) { anchor.append(' '); pendingSpace = false }
        anchor.append(c)
      }
    }

    def lowerName(from: Int): (String, Int) = {
      var j = from
      val b = new java.lang.StringBuilder(8)
      while (j < n && Character.isLetterOrDigit(s.charAt(j))) {
        b.append(Character.toLowerCase(s.charAt(j))); j += 1
      }
      (b.toString, j)
    }

    /** Walk attributes to the tag's '>': (index after '>', selfClosed,
      * href value or null). First `href` wins (browser duplicate-attr
      * rule); a valueless `href` reads as the empty string (a
      * self-reference once resolved). */
    def tagAttrs(from: Int): (Int, Boolean, String) = {
      var j = from
      var hrefVal: String = null
      var lastNonWs: Char = ' '
      while (j < n) {
        var c = s.charAt(j)
        if (c == '>') return (j + 1, lastNonWs == '/', hrefVal)
        // whitespace RESETS lastNonWs: HTML5 honors a stray '/' only
        // when it directly precedes '>' — `<a href=x / >` stays open
        if (Character.isWhitespace(c) || c == '/') {
          lastNonWs = if (c == '/') '/' else ' '; j += 1
        }
        else {
          // attribute name
          val nameStart = j
          while (j < n && !Character.isWhitespace(s.charAt(j)) &&
            s.charAt(j) != '=' && s.charAt(j) != '>' && s.charAt(j) != '/') j += 1
          val name = s.substring(nameStart, j).toLowerCase
          // optional whitespace, '=', value
          var k = j
          while (k < n && Character.isWhitespace(s.charAt(k))) k += 1
          var value: String = null
          if (k < n && s.charAt(k) == '=') {
            k += 1
            while (k < n && Character.isWhitespace(s.charAt(k))) k += 1
            if (k < n && (s.charAt(k) == '"' || s.charAt(k) == '\'')) {
              val quote = s.charAt(k)
              val end = s.indexOf(quote, k + 1)
              if (end < 0) { value = s.substring(k + 1); k = n }
              else { value = s.substring(k + 1, end); k = end + 1 }
            } else {
              val valStart = k
              while (k < n && !Character.isWhitespace(s.charAt(k)) && s.charAt(k) != '>') k += 1
              value = s.substring(valStart, k)
            }
            j = k
          }
          if (name == "href" && hrefVal == null)
            hrefVal = decodeEntities(if (value == null) "" else value)
          // neutral after an attribute: HTML5 reads `href=foo/` as the
          // VALUE "foo/", never as a self-closing slash
          lastNonWs = ' '
          c = if (j < n) s.charAt(j) else ' '
          if (c == '>') return (j + 1, false, hrefVal)
        }
      }
      (n, false, hrefVal)
    }

    def skipTag(from: Int): Int = {
      var j = from
      var quote: Char = 0
      while (j < n) {
        val c = s.charAt(j)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        else if (c == '>') return j + 1
        j += 1
      }
      n
    }

    def nameEnds(idx: Int): Boolean =
      idx >= n || !Character.isLetterOrDigit(s.charAt(idx))

    def findClose(from: Int, name: String, nested: Boolean): Int = {
      var j = from
      val m = name.length
      var depth = 0
      while (j + m + 2 <= n) {
        if (s.charAt(j) == '<') {
          if (s.charAt(j + 1) == '/' &&
              s.regionMatches(true, j + 2, name, 0, m) && nameEnds(j + 2 + m)) {
            if (depth == 0) return j
            depth -= 1
            j += 2 + m
          } else if (nested && s.regionMatches(true, j + 1, name, 0, m) &&
              nameEnds(j + 1 + m)) {
            val end = skipTag(j + 1 + m)
            val prev = if (end - 2 >= j + 1 + m) s.charAt(end - 2) else ' '
            if (prev != '/') depth += 1
            j = end
          } else j += 1
        } else j += 1
      }
      n
    }

    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = s.charAt(i + 1)
        if (c1 == '!') {
          if (s.startsWith("<!--", i)) {
            val end = s.indexOf("-->", i + 4)
            i = if (end < 0) n else end + 3
          } else i = skipTag(i + 2)
        } else if (c1 == '?') {
          i = skipTag(i + 2)
        } else if (c1 == '/' || Character.isLetter(c1)) {
          val closing = c1 == '/'
          val (name, afterName) = lowerName(if (closing) i + 2 else i + 1)
          if (name.isEmpty) { appendChar(c); i += 1 }
          else if (name == "a" && !closing) {
            val (end, selfClosed, h) = tagAttrs(afterName)
            i = end
            emit() // nested <a> implicitly closes the open one
            if (!selfClosed) href = h
            else if (h != null) { href = h; emit() } // <a href=… /> empty anchor
          } else {
            val selfClosed = {
              val end = skipTag(afterName)
              val prev = if (end - 2 >= afterName) s.charAt(end - 2) else ' '
              i = end
              prev == '/'
            }
            if (name == "a") emit() // </a>
            else if (RawSkipTags.contains(name) && !closing && !selfClosed) {
              val close = findClose(i, name, NestingRawSkipTags.contains(name))
              i = if (close >= n) n else skipTag(close + 2 + name.length)
              pendingSpace = anchor.length() > 0
            } else pendingSpace = anchor.length() > 0 // tags separate words
          }
        } else { appendChar(c); i += 1 }
      } else if (c == '&') {
        val (cp, next) = entityAt(s, i + 1)
        if (cp >= 0) {
          Character.toChars(cp).foreach(appendChar)
          i = next
        } else { appendChar('&'); i += 1 }
      } else { appendChar(c); i += 1 }
    }
    emit() // unclosed trailing <a>
    new GenericArrayData(links.toArray[Any])
  }

  // -- Column-level API ---------------------------------------------------

  /** Array of (text, chars, link_chars, container) visible-text blocks. */
  def htmlBlocks(html: Column): Column =
    ColumnBridge.column(HtmlBlocksExpr(ColumnBridge.expr(html)))

  /** Array of (href, anchor) out-links in document order. */
  def htmlLinks(html: Column): Column =
    ColumnBridge.column(HtmlLinksExpr(ColumnBridge.expr(html)))
}
