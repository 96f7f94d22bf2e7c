package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Non-HTML document extraction — the seam a 100-TB corpus needs for
  * the long tail of fetched media types (PDF above all: a large
  * fraction of high-quality crawl text — papers, manuals, reports —
  * arrives as `application/pdf`). Reference livingsocial/rearview has
  * no document surface (README.md:6); this is extension surface for
  * the training-data mandate, shaped exactly like
  * [[Warc.ContentDecoder]]: the BUILT-IN types (plain text, HTML) run
  * on the codegen kernels this library already ships, anything else
  * goes through a pluggable [[TextExtractor]], and rows NO extractor
  * claims are EXCLUDED with exact telemetry rather than silently
  * polluting the corpus with binary garbage.
  *
  * PDF deployment recipe (this container ships no PDF library, so the
  * in-repo proof is DocExtractSpec's stub extractor + exact exclusion
  * counts — the [[Warc.ContentDecoder]] brotli precedent):
  *  1. ship the public `org.apache.pdfbox:pdfbox` jar via `--jars`;
  *  2. `object PdfExtractor extends DocExtract.TextExtractor {
  *       def contentTypes = Set("application/pdf")
  *       def extract(b: Array[Byte]): String = {
  *         val doc = org.apache.pdfbox.Loader.loadPDF(b)
  *         try new org.apache.pdfbox.text.PDFTextStripper().getText(doc)
  *         finally doc.close()
  *       } }`;
  *  3. pass it to [[texts]] — PDF rows now yield text instead of being
  *     excluded, and the `graft_doc_extract` counter shift is the
  *     measured yield gain.
  *
  * 100-TB shape: one narrow map stage — per-row media-type dispatch,
  * built-in types on codegen kernels, extractor types paying one
  * closure call on exactly their rows; no shuffle, no collect. */
object DocExtract {

  /** A pluggable extractor for one or more media types. Must be
    * `Serializable` (instances ride the plan to executors; hold
    * config, not native handles — the [[Multimodal.Codec]]
    * discipline). `extract` must never throw on malformed bytes —
    * return "" (the empty-text filter then drops the row); an
    * extraction must never kill a corpus pass. */
  trait TextExtractor extends Serializable {
    /** Lowercase media types handled, e.g. `Set("application/pdf")`. */
    def contentTypes: Set[String]
    /** Extract plain text from the document bytes. */
    def extract(bytes: Array[Byte]): String
  }

  /** The media type of a Content-Type value: parameters stripped
    * (`; charset=...`), trimmed, lowercased; null-safe (absent ⇒ ""). */
  def mediaType(contentType: Column): Column =
    trim(lower(element_at(split(coalesce(contentType, lit("")), ";"), 1)))

  /** The `charset=` parameter of a Content-Type value, lowercased;
    * null when absent — the value [[mediaType]] strips. The text/plain
    * branch of [[texts]] decodes under it (`text/plain;
    * charset=windows-1252` must not mojibake), mirroring the HTML
    * branch's charset chain. */
  def charsetParam(contentType: Column): Column =
    lower(nullif(regexp_extract(coalesce(contentType, lit("")),
      "(?i)charset=\"?([A-Za-z0-9_.:-]+)", 1), lit("")))

  private val HtmlTypes = Seq("text/html", "application/xhtml+xml")
  val ObservationPrefix = "graft_doc_extract"
  private val obsCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Extract `textCol` from (content-type, bytes) rows: built-in
    * `text/plain` (charset decode — BOM override, UTF-8 fallback) and
    * HTML (charset sniff + the declared [[Extract.ExtractPolicy]])
    * run as kernels; other types dispatch to `extractors`; unclaimed
    * types are EXCLUDED, counted on the `graft_doc_extract_<n>`
    * observation (`n_docs`, `n_excluded_type`) surfaced through
    * [[graft.engine.Telemetry]] — "PDFs cost us N documents" is a
    * number, not a silent loss. Rows whose extraction is empty are
    * dropped (the [[graft.streaming.DocumentIngest.extractHtml]]
    * convention). */
  def texts(df: DataFrame, contentTypeCol: String, bytesCol: String,
      textCol: String, extractors: Seq[TextExtractor] = Nil,
      policy: Extract.ExtractPolicy = Extract.ExtractPolicy.Simple()): DataFrame = {
    val extMap: Map[String, TextExtractor] =
      extractors.flatMap(e => e.contentTypes.map(_.toLowerCase -> e)).toMap
    val mt = mediaType(col(contentTypeCol))
    val extraHandled =
      if (extMap.isEmpty) lit(false) else mt.isin(extMap.keys.toSeq: _*)
    val builtinHandled = mt.isin("text/plain" +: HtmlTypes: _*)
    val handled = builtinHandled || extraHandled
    val observed = df.observe(
      s"${ObservationPrefix}_${obsCounter.incrementAndGet()}",
      count(lit(1)).as("n_docs"),
      sum(when(handled, 0L).otherwise(1L)).as("n_excluded_type"))
    val bytes = col(bytesCol)
    // HTML: meta-charset sniff over a UTF-8 provisional view, then the
    // declared extraction policy (the Warc.htmlResponses chain minus
    // the HTTP layer — document bytes carry no transport headers)
    val htmlText = Extract.extract(
      Warc.decodeCharset(bytes,
        coalesce(Extract.metaCharset(bytes.cast("string")), lit("utf-8"))),
      policy)
    // text/plain decodes under the Content-Type's own charset
    // parameter (fallback utf-8; BOM still overrides inside
    // decodeCharset) — the same declared-charset-wins chain the HTML
    // branch runs, minus the meta sniff plain text cannot carry
    val plainText = Warc.decodeCharset(bytes,
      coalesce(charsetParam(col(contentTypeCol)), lit("utf-8")))
    val base = when(mt === "text/plain", plainText)
      .when(mt.isin(HtmlTypes: _*), htmlText)
    val text =
      if (extMap.isEmpty) base
      else {
        val ex = udf((b: Array[Byte], m: String) =>
          extMap.get(m).fold("")(_.extract(b)))
        base.otherwise(when(extraHandled, ex(bytes, mt)))
      }
    observed.filter(handled)
      .withColumn(textCol, coalesce(text, lit("")))
      .filter(col(textCol) =!= "")
      .drop(bytesCol)
  }
}
