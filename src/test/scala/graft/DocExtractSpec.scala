package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.ext.DocExtract

/** Document-extraction seam: built-in plain/HTML kernels, pluggable
  * extractor dispatch, exclusion telemetry — the ContentDecoder
  * discipline applied to media types (PDF is the deployment case; the
  * container ships no PDF library, so a stub extractor pins the seam
  * contract). */
class DocExtractSpec extends SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    ("text/plain; charset=utf-8", "plain text body".getBytes(UTF_8)),
    ("text/html",
      """<html><head><meta charset=utf-8></head><body><div class="c">
        |<p>The real html body text, long enough to keep.</p></div>
        |</body></html>""".stripMargin.getBytes(UTF_8)),
    ("application/pdf", "%PDF-1.7 fake binary".getBytes(UTF_8)),
    ("image/png", Array[Byte](0x50, 0x4E)),
    ("text/plain", Array.emptyByteArray)) // empty text: dropped

  private def metric(): Map[String, Any] = {
    var m = Map.empty[String, Any]
    var tries = 0
    while (m.isEmpty && tries < 50) {
      m = graft.engine.Telemetry.drain()
        .flatMap(_.metrics.collect {
          case (k, v) if k.startsWith(DocExtract.ObservationPrefix) => v
        }).headOption.getOrElse(Map.empty)
      if (m.isEmpty) { Thread.sleep(100); tries += 1 }
    }
    m
  }

  test("built-ins extract, unclaimed types excluded with exact telemetry") {
    graft.engine.Telemetry.install(spark)
    graft.engine.Telemetry.drain()
    val out = DocExtract.texts(rows.toDF("ct", "bytes"), "ct", "bytes", "text")
      .select("ct", "text").as[(String, String)].collect().toMap
    // plain passthrough + html through the extraction policy; pdf and
    // png excluded (no extractor); empty plain dropped post-extraction
    assert(out.keySet == Set("text/plain; charset=utf-8", "text/html"))
    assert(out("text/plain; charset=utf-8") == "plain text body")
    assert(out("text/html").contains("The real html body text"))
    val m = metric()
    assert(m("n_docs") == 5L && m("n_excluded_type") == 2L, s"$m")
  }

  test("a supplied extractor reclaims its media type; others stay excluded; throwing is not required for malformed bytes") {
    object StubPdf extends DocExtract.TextExtractor {
      def contentTypes = Set("application/pdf")
      def extract(b: Array[Byte]): String =
        if (b.length >= 5 && new String(b, 0, 5, UTF_8) == "%PDF-")
          s"pdf text (${b.length} bytes)"
        else "" // malformed: empty, never throw
    }
    graft.engine.Telemetry.install(spark)
    graft.engine.Telemetry.drain()
    val out = DocExtract.texts(rows.toDF("ct", "bytes"), "ct", "bytes", "text",
        extractors = Seq(StubPdf))
      .select("ct", "text").as[(String, String)].collect().toMap
    assert(out.keySet == Set("text/plain; charset=utf-8", "text/html",
      "application/pdf"))
    assert(out("application/pdf") == "pdf text (20 bytes)")
    val m = metric()
    assert(m("n_docs") == 5L && m("n_excluded_type") == 1L, s"$m") // png only
    // malformed pdf bytes: extractor returns "", row silently dropped
    val bad = DocExtract.texts(
      Seq(("application/pdf", "not a pdf".getBytes(UTF_8))).toDF("ct", "bytes"),
      "ct", "bytes", "text", extractors = Seq(StubPdf))
    assert(bad.count() == 0)
  }

  test("mediaType strips parameters and case; composing two texts() reads in one plan is legal") {
    val df = Seq(("Text/HTML; charset=ISO-8859-1", 1)).toDF("ct", "x")
    assert(df.select(DocExtract.mediaType(col("ct"))).head.getString(0) == "text/html")
    // unique observation names: a union of two texts() outputs must
    // analyze (the fixed-name formulation threw at analysis time)
    val a = DocExtract.texts(rows.toDF("ct", "bytes"), "ct", "bytes", "text")
    val b = DocExtract.texts(rows.toDF("ct", "bytes"), "ct", "bytes", "text")
    assert(a.unionByName(b).count() == 4)
  }

  test("text/plain decodes under its Content-Type charset parameter; BOM still overrides; absent -> utf-8") {
    // 'café' in windows-1252: é = 0xE9 — decoded as UTF-8 this
    // mojibakes to U+FFFD; the charset param must reach the decoder
    val cp1252 = "caf".getBytes(UTF_8) ++ Array(0xE9.toByte)
    val bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "café".getBytes(UTF_8)
    val df = Seq(
      ("text/plain; charset=windows-1252", cp1252),
      ("text/plain; charset=WINDOWS-1252", cp1252), // case-insensitive
      // stale latin-1 declaration, UTF-8 BOM: BOM wins (WHATWG rule)
      ("text/plain; charset=iso-8859-1", bom),
      ("text/plain", "plain utf-8 café".getBytes(UTF_8)),
      ("text/plain; charset=no-such-cs", "ascii safe".getBytes(UTF_8)))
      .toDF("ct", "bytes")
    val out = DocExtract.texts(df, "ct", "bytes", "text")
      .select("ct", "text").as[(String, String)].collect().toMap
    assert(out("text/plain; charset=windows-1252") == "café")
    assert(out("text/plain; charset=WINDOWS-1252") == "café")
    assert(out("text/plain; charset=iso-8859-1") == "café")
    assert(out("text/plain") == "plain utf-8 café")
    assert(out("text/plain; charset=no-such-cs") == "ascii safe")
  }
}
