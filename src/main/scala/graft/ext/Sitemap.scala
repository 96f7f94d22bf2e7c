package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Sitemap parsing (sitemaps.org protocol) — the step that closes the
  * crawl's seed loop: [[Robots.sitemaps]] surfaces the `Sitemap:` URLs
  * and [[Frontier.seedsFromRobots]] schedules their FETCH, and this
  * layer parses the fetched payloads into page URLs
  * ([[Frontier.seedsFromSitemaps]] feeds them through the same gate
  * chain as every other frontier candidate). Reference
  * livingsocial/rearview has no crawl surface (README.md:6 — metric
  * math is delegated to Graphite); this is extension surface for the
  * crawl-corpus mandate.
  *
  * Format essentials handled, first-principles and JDK-pure (the
  * [[Warc]]/[[Robots]] kernel discipline):
  *
  *  - `<urlset>` files: each `<url>` child's `<loc>` (required) and
  *    `<lastmod>` (optional) — kind `"url"`;
  *  - `<sitemapindex>` files: each `<sitemap>` child's `<loc>`/
  *    `<lastmod>` — kind `"sitemap"`, the RECURSION marker (an index
  *    points at more sitemaps to fetch, not at pages);
  *  - gzipped payloads (`.xml.gz` — the protocol's standard large-file
  *    form): sniffed by magic bytes, inflated through the same
  *    multi-member-tolerant gunzip as the WARC layer;
  *  - plain-TEXT sitemaps (the protocol's third form): one URL per
  *    line, no XML at all — kind `"url"`, no lastmod;
  *  - XML entity escapes in `<loc>` decoded (`&amp;` is MANDATORY
  *    escaping for `&` in sitemap URLs, so skipping this corrupts
  *    every query-string URL), numeric references included;
  *  - lenient to real-world noise: namespace prefixes/attributes on
  *    the elements, CDATA-wrapped locs, whitespace padding inside
  *    tags, truncated tails (parsed prefix returned).
  *
  * One kernel call per FETCHED SITEMAP row — per-host input, so corpus
  * cost scales with sitemap count, never page count; the 50k-URL
  * protocol cap keeps each row's output bounded. */
object Sitemap {

  /** One parsed entry: `loc` (entity-decoded, trimmed), `lastmod`
    * (verbatim text or null), `kind` ("url" | "sitemap"). */
  val EntrySchema: StructType = StructType(Seq(
    StructField("loc", StringType, nullable = false),
    StructField("lastmod", StringType, nullable = true),
    StructField("kind", StringType, nullable = false)))

  /** Decode the five XML named entities + numeric (dec/hex) character
    * references. Unknown entities pass through verbatim (lenient). */
  private[graft] def decodeXmlEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        // entity names/refs are short; a far-away ';' means bare '&'
        if (semi > i && semi - i <= 10) {
          val name = s.substring(i + 1, semi)
          val rep: String = name match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case _ if name.startsWith("#") =>
              val cp =
                try {
                  if (name.length > 1 && (name.charAt(1) == 'x' || name.charAt(1) == 'X'))
                    Integer.parseInt(name.substring(2), 16)
                  else Integer.parseInt(name.substring(1), 10)
                } catch { case _: NumberFormatException => -1 }
              if (cp >= 0 && cp <= 0x10FFFF &&
                  !(cp >= 0xD800 && cp <= 0xDFFF))
                new String(Character.toChars(cp))
              else null
            case _ => null
          }
          if (rep != null) { out.append(rep); i = semi + 1 }
          else { out.append(c); i += 1 }
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Extract the text of the FIRST `name` child element inside `block`
    * (namespace-prefix tolerant, CDATA unwrapped, trimmed); null when
    * absent. */
  private def childText(block: String, name: String): String = {
    val m = java.util.regex.Pattern.compile(
      "(?is)<(?:[A-Za-z0-9_.-]+:)?" + name + "(?:\\s[^>]*)?>(.*?)</(?:[A-Za-z0-9_.-]+:)?" + name + "\\s*>")
      .matcher(block)
    if (!m.find()) return null
    var t = m.group(1).trim
    if (t.startsWith("<![CDATA[")) {
      val end = t.indexOf("]]>")
      t = (if (end >= 0) t.substring(9, end) else t.substring(9)).trim
    }
    val d = decodeXmlEntities(t).trim
    if (d.isEmpty) null else d
  }

  /** Parse one fetched sitemap payload. Gzip is sniffed and inflated;
    * bytes decode as UTF-8 (the protocol requires UTF-8), BOM
    * stripped. Root `<sitemapindex>` yields kind "sitemap" entries,
    * `<urlset>` (or any other XML carrying `<url>`/`<loc>` blocks —
    * lenient) yields kind "url"; non-XML content is treated as a
    * plain-text sitemap, one URL per line. Malformed/truncated input
    * yields the parsed prefix — a parse must never kill a crawl pass
    * (the [[Warc.HttpDecode]] tolerance contract). */
  def parseEntries(raw: Array[Byte]): Array[(String, String, String)] = {
    if (raw == null || raw.length == 0) return Array.empty
    val bytes =
      if (raw.length >= 2 && raw(0) == 0x1f.toByte && raw(1) == 0x8b.toByte)
        Warc.HttpDecode.gunzip(raw)
      else raw
    var text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    if (text.nonEmpty && text.charAt(0) == '\uFEFF') text = text.substring(1)
    val trimmed = text.trim
    if (trimmed.isEmpty) return Array.empty
    if (!trimmed.startsWith("<")) {
      // plain-text sitemap: one URL per line (same 50k protocol cap)
      return trimmed.split("\r?\n").iterator
        .map(_.trim).filter(_.nonEmpty).take(50000)
        .map(u => (u, null: String, "url")).toArray
    }
    val isIndex = java.util.regex.Pattern.compile(
      "(?is)<(?:[A-Za-z0-9_.-]+:)?sitemapindex[\\s>]").matcher(trimmed).find()
    val (blockTag, kind) = if (isIndex) ("sitemap", "sitemap") else ("url", "url")
    val bm = java.util.regex.Pattern.compile(
      "(?is)<(?:[A-Za-z0-9_.-]+:)?" + blockTag + "(?:\\s[^>]*)?>(.*?)</(?:[A-Za-z0-9_.-]+:)?" + blockTag + "\\s*>")
      .matcher(trimmed)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    // sitemaps.org caps a file at 50,000 entries — honor it as a
    // memory bound too (a broken/hostile multi-GB sitemap must not
    // materialize an unbounded per-row array)
    while (bm.find() && out.length < 50000) {
      val block = bm.group(1)
      val loc = childText(block, "loc")
      if (loc != null) out += ((loc, childText(block, "lastmod"), kind))
    }
    out.toArray
  }

  final case class SitemapEntriesExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(BinaryType)
    override def dataType: DataType = ArrayType(EntrySchema, containsNull = false)
    override def foldable: Boolean = child.foldable
    override def prettyName: String = "graft_sitemap_entries"

    def parseRow(bytes: Array[Byte]): ArrayData =
      new GenericArrayData(parseEntries(bytes).map { case (loc, lastmod, kind) =>
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(loc),
          if (lastmod == null) null else UTF8String.fromString(lastmod),
          UTF8String.fromString(kind))): Any
      })

    override def nullSafeEval(input: Any): Any =
      parseRow(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, b => {
        val ref = ctx.addReferenceObj("sitemap", this, classOf[SitemapEntriesExpr].getName)
        s"${ev.value} = $ref.parseRow($b);"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** array<struct<loc, lastmod, kind>> of a fetched sitemap payload
    * (BINARY — gzip handled transparently). Feed
    * [[Frontier.seedsFromSitemaps]]. */
  def entries(payload: Column): Column =
    ColumnBridge.column(SitemapEntriesExpr(ColumnBridge.expr(payload)))
}
