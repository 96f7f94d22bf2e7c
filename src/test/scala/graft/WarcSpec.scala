package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.ext.{Extract, Warc}

/** WARC container parsing: record framing, gzip members, truncation
  * tolerance, HTTP splitting, the file reader, and the crawl-front-door
  * composition into the HTML extractor. */
class WarcSpec extends SparkTestBase {
  import spark.implicits._

  private def record(typ: String, uri: String, payload: String,
      version: String = "1.0", extra: Seq[(String, String)] = Nil): Array[Byte] = {
    val pb = payload.getBytes(UTF_8)
    val headers = Seq(
      "WARC-Type" -> typ, "WARC-Target-URI" -> uri,
      "WARC-Date" -> "2026-08-14T00:00:00Z",
      "Content-Type" -> "application/http; msgtype=response") ++ extra ++
      Seq("Content-Length" -> pb.length.toString)
    val head = (s"WARC/$version" +: headers.map { case (k, v) => s"$k: $v" })
      .mkString("", "\r\n", "\r\n\r\n")
    head.getBytes(UTF_8) ++ pb ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private def http(body: String, status: Int = 200): String =
    s"HTTP/1.1 $status OK\r\nContent-Type: text/html\r\n\r\n$body"

  private def gzipMembers(parts: Array[Byte]*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    parts.foreach { p =>
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(p); gz.finish()
    }
    bos.toByteArray
  }

  test("record framing round-trips; LF-only endings tolerated; truncated tail dropped") {
    val r1 = record("response", "https://a.example/1", http("<p>one</p>"))
    val r2 = record("request", "https://a.example/1", "GET / HTTP/1.1\r\n\r\n", version = "1.1")
    val lfOnly = new String(record("metadata", "https://a.example/2", "x"), UTF_8)
      .replace("\r\n", "\n").getBytes(UTF_8)
    val truncated = record("response", "https://a.example/3", http("<p>cut</p>"))
      .dropRight(12) // cut inside the payload
    val all = Warc.parseBytes(r1 ++ r2 ++ lfOnly ++ truncated).toSeq
    assert(all.map(_.header("WARC-Type").get) == Seq("response", "request", "metadata"))
    assert(all.map(_.version) == Seq("1.0", "1.1", "1.0"))
    assert(new String(all(2).payload, UTF_8) == "x")
    assert(new String(all.head.payload, UTF_8) == http("<p>one</p>"))
  }

  test("multi-member gzip (the .warc.gz layout) parses transparently") {
    val r1 = record("response", "https://b.example/1", http("<p>alpha</p>"))
    val r2 = record("response", "https://b.example/2", http("<p>beta</p>"))
    val got = Warc.parseBytes(gzipMembers(r1, r2)).toSeq
    assert(got.map(_.header("WARC-Target-URI").get) ==
      Seq("https://b.example/1", "https://b.example/2"))
    assert(got.map(r => new String(r.payload, UTF_8)) ==
      Seq(http("<p>alpha</p>"), http("<p>beta</p>")))
  }

  test("file reader: plain + gzipped files, record order, payload fidelity") {
    val dir = java.nio.file.Files.createTempDirectory("warcspec").toFile
    try {
      val plain = record("response", "https://c.example/p", http("<p>plain file</p>"))
      val gz = gzipMembers(
        record("response", "https://c.example/g1", http("<p>gz one</p>")),
        record("warcinfo", "", "software: graft\r\n"))
      java.nio.file.Files.write(new java.io.File(dir, "a.warc").toPath, plain)
      java.nio.file.Files.write(new java.io.File(dir, "b.warc.gz").toPath, gz)
      val rows = Warc.read(spark, dir.getAbsolutePath + "/*").collect()
        .sortBy(r => (r.path, r.idx))
      assert(rows.length == 3)
      assert(rows.map(_.warc_type).toSeq == Seq("response", "response", "warcinfo"))
      assert(new String(rows(0).payload, UTF_8).contains("plain file"))
      assert(rows(1).target_uri == "https://c.example/g1")
      assert(rows(2).content_length == "software: graft\r\n".getBytes(UTF_8).length)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete(): Unit
    }
  }

  test("column expression + HTTP splitting + HTML extractor compose (the crawl front door)") {
    val blob = record("response", "https://d.example/x",
      http("<html><body><nav><a>Home</a> <a>All about us</a></nav>" +
        "<p>Actual article text, long enough to keep.</p></body></html>"))
    val df = Seq((1L, blob)).toDF("id", "warc")
      .select(col("id"), explode(Warc.records(col("warc"))).as("r"))
      .select(col("id"),
        element_at(col("r.headers"), "WARC-Target-URI").as("uri"),
        Warc.httpStatus(col("r.payload")).as("status"),
        Extract.mainText(Warc.httpBody(col("r.payload"))).as("text"))
    val row = df.head
    assert(row.getString(1) == "https://d.example/x")
    assert(row.getInt(2) == 200)
    assert(row.getString(3) == "Actual article text, long enough to keep.")
  }

  test("UTF-8 header values decode (non-ASCII WARC-Target-URI)") {
    val r = record("response", "https://e.example/café", http("<p>x</p>"))
    val got = Warc.parseBytes(r).toSeq.head
    assert(got.header("WARC-Target-URI").get == "https://e.example/café")
  }

  test("charset-aware body decoding: HTTP header wins, meta sniff falls back, unknown -> UTF-8") {
    val dir = java.nio.file.Files.createTempDirectory("warcspec3").toFile
    try {
      def rawRecord(uri: String, payload: Array[Byte]): Array[Byte] = {
        (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
          "Content-Type: application/http; msgtype=response\r\n" +
          s"Content-Length: ${payload.length}\r\n\r\n").getBytes(UTF_8) ++
          payload ++ "\r\n\r\n".getBytes(UTF_8)
      }
      // ISO-8859-1 body: 'café' with é as single byte 0xE9, declared in
      // the HTTP header
      val latinBody = "<p>caf".getBytes(UTF_8) ++ Array(0xE9.toByte) ++ "</p>".getBytes(UTF_8)
      val r1 = rawRecord("https://cs.example/h",
        "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1\r\n\r\n"
          .getBytes(UTF_8) ++ latinBody)
      // same bytes, charset only in a meta tag (UTF-8 provisional sniff)
      val metaBody = "<html><head><meta charset=\"windows-1252\"></head><body><p>caf"
        .getBytes(UTF_8) ++ Array(0xE9.toByte) ++ "</p></body></html>".getBytes(UTF_8)
      val r2 = rawRecord("https://cs.example/m",
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n".getBytes(UTF_8) ++ metaBody)
      // unknown charset name: falls back to UTF-8, never throws
      val r3 = rawRecord("https://cs.example/u",
        "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=no-such-cs\r\n\r\n<p>plain ascii</p>"
          .getBytes(UTF_8))
      // UTF-8 BOM overrides a stale iso-8859-1 header (WHATWG rule),
      // and the BOM is stripped from the decoded text
      val bomBody = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
        "<p>café</p>".getBytes(UTF_8)
      val r4 = rawRecord("https://cs.example/b",
        "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=iso-8859-1\r\n\r\n"
          .getBytes(UTF_8) ++ bomBody)
      java.nio.file.Files.write(new java.io.File(dir, "cs.warc").toPath,
        r1 ++ r2 ++ r3 ++ r4)
      val got = Warc.htmlResponses(Warc.read(spark, dir.getAbsolutePath + "/*"))
        .orderBy("target_uri")
        .select("target_uri", "html").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      assert(got("https://cs.example/h") == "<p>café</p>")
      assert(got("https://cs.example/m").contains("<p>café</p>"))
      assert(got("https://cs.example/u") == "<p>plain ascii</p>")
      assert(got("https://cs.example/b") == "<p>café</p>")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete(): Unit
    }
  }

  private def chunked(body: Array[Byte], sizes: Seq[Int]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    var off = 0
    sizes.foreach { s =>
      val n = math.min(s, body.length - off)
      bos.write(s"${n.toHexString}\r\n".getBytes(UTF_8))
      bos.write(body, off, n); off += n
      bos.write("\r\n".getBytes(UTF_8))
    }
    bos.write("0\r\n\r\n".getBytes(UTF_8))
    bos.toByteArray
  }

  private def rawResponse(uri: String, headers: String, body: Array[Byte]): Array[Byte] = {
    val payload = s"HTTP/1.1 200 OK\r\n$headers\r\n\r\n".getBytes(UTF_8) ++ body
    (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes(UTF_8) ++
      payload ++ "\r\n\r\n".getBytes(UTF_8)
  }

  test("chunked / gzip / deflate / chunked+gzip HTTP bodies decode; malformed chunk tolerated") {
    val dir = java.nio.file.Files.createTempDirectory("warcspec4").toFile
    try {
      val html = "<p>The real body text, behind transfer and content codings.</p>"
      val hb = html.getBytes(UTF_8)
      // Transfer-Encoding: chunked — hex framing lines must NOT leak
      val r1 = rawResponse("https://te.example/chunked",
        "Content-Type: text/html\r\nTransfer-Encoding: chunked",
        chunked(hb, Seq(7, 16, hb.length)))
      // Content-Encoding: gzip
      val r2 = rawResponse("https://te.example/gzip",
        "Content-Type: text/html\r\nContent-Encoding: gzip", gzipMembers(hb))
      // zlib-wrapped deflate AND raw deflate under the same label
      val zlib = {
        val d = new java.util.zip.Deflater()
        d.setInput(hb); d.finish()
        val out = new Array[Byte](hb.length * 2 + 64)
        val n = d.deflate(out); d.end()
        java.util.Arrays.copyOf(out, n)
      }
      val raw = {
        val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
        d.setInput(hb); d.finish()
        val out = new Array[Byte](hb.length * 2 + 64)
        val n = d.deflate(out); d.end()
        java.util.Arrays.copyOf(out, n)
      }
      val r3 = rawResponse("https://te.example/deflate",
        "Content-Type: text/html\r\nContent-Encoding: deflate", zlib)
      val r3b = rawResponse("https://te.example/deflate-raw",
        "Content-Type: text/html\r\nContent-Encoding: deflate", raw)
      // the CommonCrawl norm: chunked AND gzipped (de-chunk first)
      val r4 = rawResponse("https://te.example/both",
        "Content-Type: text/html\r\nTransfer-Encoding: chunked\r\nContent-Encoding: gzip",
        chunked(gzipMembers(hb), Seq(11, 1 << 20)))
      // header lies (claims chunked, body is plain): body passes through
      val r5 = rawResponse("https://te.example/lied",
        "Content-Type: text/html\r\nTransfer-Encoding: chunked", hb)
      // truncated mid-chunk: decoded prefix survives, no throw
      val r6 = rawResponse("https://te.example/truncated",
        "Content-Type: text/html\r\nTransfer-Encoding: chunked",
        chunked(hb, Seq(hb.length)).dropRight(20))
      // brotli: undecodable here — filtered OUT, not passed as mojibake
      val r7 = rawResponse("https://te.example/brotli",
        "Content-Type: text/html\r\nContent-Encoding: br", Array[Byte](1, 2, 3))
      java.nio.file.Files.write(new java.io.File(dir, "te.warc").toPath,
        r1 ++ r2 ++ r3 ++ r3b ++ r4 ++ r5 ++ r6 ++ r7)
      val got = Warc.htmlResponses(Warc.read(spark, dir.getAbsolutePath + "/*"))
        .select("target_uri", "html").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      assert(!got.contains("https://te.example/brotli"))
      assert(got("https://te.example/chunked") == html)
      assert(got("https://te.example/gzip") == html)
      assert(got("https://te.example/deflate") == html)
      assert(got("https://te.example/deflate-raw") == html)
      assert(got("https://te.example/both") == html)
      assert(got("https://te.example/lied") == html)
      // 20 raw bytes cut = 5 (0-chunk terminator) + 2 (chunk CRLF) + 13
      // body bytes — the decoded prefix is the body minus those 13
      assert(got("https://te.example/truncated") == html.dropRight(13) &&
        got("https://te.example/truncated").nonEmpty)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete(): Unit
    }
  }

  test("extractWarc (streaming front door) decodes chunked+gzipped bodies too") {
    val html = "<html><body><p>Chunked gzipped article body, long enough to keep.</p>" +
      "</body></html>"
    val blob = rawResponse("https://te.example/fd",
      "Content-Type: text/html\r\nTransfer-Encoding: chunked\r\nContent-Encoding: gzip",
      chunked(gzipMembers(html.getBytes(UTF_8)), Seq(1 << 20)))
    val out = graft.streaming.DocumentIngest.extractWarc(
      Seq((1L, blob)).toDF("id", "warc"), "warc", "text")
    val rows = out.select("target_uri", "text").collect()
    assert(rows.length == 1 && rows(0).getString(0) == "https://te.example/fd")
    assert(rows(0).getString(1) == "Chunked gzipped article body, long enough to keep.")
  }

  test("decode robustness: lying near-MaxInt chunk size clamps; empty gzip/deflate bodies decode to empty") {
    def payload(coding: String, body: Array[Byte]): Array[Byte] =
      s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n$coding\r\n\r\n"
        .getBytes(UTF_8) ++ body
    def decoded(p: Array[Byte]): String =
      Seq(Tuple1(p)).toDF("p")
        .select(Warc.httpDecodedBodyBytes(col("p")).cast("string"))
        .as[String].head
    // a real first chunk, then a size line claiming 0x7fffffff bytes:
    // i + size must clamp in Long (an Int wrap sent a negative length
    // into the write and killed the task)
    val html = "<p>Prefix body text long enough to be a real paragraph.</p>"
    val hb = html.getBytes(UTF_8)
    val lying = (hb.length.toHexString + "\r\n").getBytes(UTF_8) ++ hb ++
      "\r\n7fffffff\r\nX\r\n0\r\n\r\n".getBytes(UTF_8)
    val out = decoded(payload("Transfer-Encoding: chunked", lying))
    assert(out.startsWith(html)) // prefix survives, no throw
    // a VALID gzip member of a zero-byte body is an empty body — not
    // the ~20 compressed framing bytes ("nothing decodable" conflation)
    assert(decoded(payload("Content-Encoding: gzip",
      gzipMembers(Array.empty[Byte]))) == "")
    val emptyZlib = {
      val d = new java.util.zip.Deflater()
      d.setInput(Array.empty[Byte]); d.finish()
      val buf = new Array[Byte](64)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    assert(decoded(payload("Content-Encoding: deflate", emptyZlib)) == "")
    // garbage under a gzip label still falls through as raw bytes
    assert(decoded(payload("Content-Encoding: gzip",
      "plainly not gzip".getBytes(UTF_8))) == "plainly not gzip")
  }

  test("htmlResponses filters to 200 HTML responses; non-HTML 200s excluded") {
    val dir = java.nio.file.Files.createTempDirectory("warcspec2").toFile
    try {
      val f = record("response", "https://e.example/ok", http("<p>good page body</p>")) ++
        record("response", "https://e.example/404", http("<p>gone</p>", status = 404)) ++
        record("response", "https://e.example/data",
          "HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n\r\n{\"not\": \"html\"}") ++
        record("request", "https://e.example/ok", "GET / HTTP/1.1\r\n\r\n")
      java.nio.file.Files.write(new java.io.File(dir, "c.warc").toPath, f)
      val got = Warc.htmlResponses(Warc.read(spark, dir.getAbsolutePath + "/*"))
      val rows = got.collect()
      assert(rows.length == 1 && rows(0).getAs[String]("target_uri") == "https://e.example/ok")
      assert(rows(0).getAs[String]("html") == "<p>good page body</p>")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete(): Unit
    }
  }

  test("content-decoder seam: undecodable encodings excluded with exact telemetry; a supplied decoder reclaims them") {
    // stand-in "br" codec: byte-reversal (the container has no brotli
    // jar — the seam contract is what's pinned: exclusion without a
    // decoder, exact counts, reclaim with one)
    object ReverseBr extends Warc.ContentDecoder {
      def encodings = Set("br")
      def decode(body: Array[Byte]): Array[Byte] = body.reverse
    }
    val html = "<p>brotli page body</p>"
    val dir = java.nio.file.Files.createTempDirectory("warcspec5").toFile
    try {
      val f = rawResponse("https://e.example/br",
          "Content-Type: text/html\r\nContent-Encoding: br",
          html.getBytes(UTF_8).reverse) ++
        record("response", "https://e.example/plain", http("<p>plain</p>"))
      java.nio.file.Files.write(new java.io.File(dir, "d.warc").toPath, f)
      graft.engine.Telemetry.install(spark)
      graft.engine.Telemetry.drain()
      def metric(): Map[String, Any] = {
        var m = Map.empty[String, Any]
        var tries = 0
        while (m.isEmpty && tries < 50) {
          m = graft.engine.Telemetry.drain()
            .flatMap(_.metrics.collect {
              case (k, v) if k.startsWith(Warc.HtmlObservationPrefix) => v
            }).headOption
            .getOrElse(Map.empty)
          if (m.isEmpty) { Thread.sleep(100); tries += 1 }
        }
        m
      }
      // no decoder: the br record is EXCLUDED, and the observation
      // reports it — governance, not silent corpus loss
      val without = Warc.htmlResponses(Warc.read(spark, dir.getAbsolutePath + "/*"))
        .collect().map(_.getAs[String]("target_uri")).toSet
      assert(without == Set("https://e.example/plain"))
      val m1 = metric()
      assert(m1("n_html200") == 2L && m1("n_excluded_encoding") == 1L, s"$m1")
      // with the decoder: same plumbing, record reclaimed, zero excluded
      val withDec = Warc.htmlResponses(
        Warc.read(spark, dir.getAbsolutePath + "/*"), Seq(ReverseBr))
        .collect().map(r => r.getAs[String]("target_uri") -> r.getAs[String]("html")).toMap
      assert(withDec == Map("https://e.example/br" -> html,
        "https://e.example/plain" -> "<p>plain</p>"))
      val m2 = metric()
      assert(m2("n_html200") == 2L && m2("n_excluded_encoding") == 0L, s"$m2")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete(): Unit
    }
  }

  test("zstd decodes BY DEFAULT (library ships with Spark); br still excluded; truncated zstd keeps prefix") {
    val html = "<p>zstd page body with enough text to survive.</p>"
    val zst = com.github.luben.zstd.Zstd.compress(html.getBytes(UTF_8), 3)
    val dir = java.nio.file.Files.createTempDirectory("warcspec6").toFile
    try {
      val f = rawResponse("https://e.example/zstd",
          "Content-Type: text/html\r\nContent-Encoding: zstd", zst) ++
        rawResponse("https://e.example/br",
          "Content-Type: text/html\r\nContent-Encoding: br",
          html.getBytes(UTF_8).reverse) ++
        record("response", "https://e.example/plain", http("<p>plain</p>"))
      java.nio.file.Files.write(new java.io.File(dir, "d.warc").toPath, f)
      graft.engine.Telemetry.install(spark)
      graft.engine.Telemetry.drain()
      // single-arg htmlResponses — the DEFAULT decoder set must reclaim
      // zstd while br (genuinely undecodable here) stays excluded
      val out = Warc.htmlResponses(Warc.read(spark, dir.getAbsolutePath + "/*"))
        .collect().map(r => r.getAs[String]("target_uri") -> r.getAs[String]("html"))
        .toMap
      assert(out == Map("https://e.example/zstd" -> html,
        "https://e.example/plain" -> "<p>plain</p>"))
      var m = Map.empty[String, Any]
      var tries = 0
      while (m.isEmpty && tries < 50) {
        m = graft.engine.Telemetry.drain()
          .flatMap(_.metrics.collect {
            case (k, v) if k.startsWith(Warc.HtmlObservationPrefix) => v
          }).headOption.getOrElse(Map.empty)
        if (m.isEmpty) { Thread.sleep(100); tries += 1 }
      }
      assert(m("n_html200") == 3L && m("n_excluded_encoding") == 1L, s"$m")
      // tolerance: a truncated zstd stream yields the decoded prefix,
      // and non-zstd bytes pass through untouched
      val truncated = java.util.Arrays.copyOfRange(zst, 0, zst.length - 4)
      val prefix = Warc.ZstdDecoder.decode(truncated)
      assert(prefix.length < html.length &&
        html.startsWith(new String(prefix, UTF_8)))
      val notZstd = "just plain bytes".getBytes(UTF_8)
      assert(Warc.ZstdDecoder.decode(notZstd).sameElements(notZstd))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete(): Unit
    }
  }

  test("MemberGzipWriter: ONE deflater writes many members, parse-back exact; end() idempotent, out stays open") {
    // the member-close protocol of the archiving sink: a partition
    // writing N records must not allocate N native Deflaters — one
    // writer instance (one Deflater by construction) emits every
    // member, reset between them, end()ed once in the finally
    val bos = new java.io.ByteArrayOutputStream()
    val w = new Warc.MemberGzipWriter(bos)
    val n = 10000
    val recs = (0 until n).map(i =>
      record("response", s"https://m.example/$i", http(s"<p>$i</p>")))
    recs.foreach(r => w.writeMember(r))
    assert(w.membersWritten == n)
    w.end(); w.end() // idempotent; does NOT close the caller's stream
    bos.write('!') // stream still writable after end()
    val bytes = java.util.Arrays.copyOf(bos.toByteArray, bos.size() - 1)
    // multi-member gzip parses back through the reader's own gunzip path
    val got = Warc.parseBytes(bytes).toSeq
    assert(got.size == n)
    assert(got.head.header("WARC-Target-URI").get == "https://m.example/0")
    assert(new String(got(n - 1).payload, UTF_8) == http(s"<p>${n - 1}</p>"))
    // a member boundary sits between every record: JDK GZIPInputStream
    // also reads the concatenation (interchange check)
    val gis = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val total = Iterator.continually(gis.read(new Array[Byte](65536)))
      .takeWhile(_ >= 0).sum
    assert(total == recs.map(_.length).sum)
    // deterministic bytes: same input, same archive (MTIME pinned to 0)
    val bos2 = new java.io.ByteArrayOutputStream()
    val w2 = new Warc.MemberGzipWriter(bos2)
    recs.foreach(w2.writeMember); w2.end()
    assert(java.util.Arrays.equals(bytes, bos2.toByteArray))
    // after end(), further writes are refused (no zombie deflater use)
    intercept[IllegalArgumentException](w.writeMember(Array[Byte](1)))
  }

  test("writeRecordsIndexed + readIndexed: CDX sidecar covers every byte; random access fetches exactly the named records") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cdx").toString
    val idxDir = java.nio.file.Files.createTempDirectory("graft-cdx-idx").toString
    val df = (0 until 40).map(i =>
      (s"https://cdx.example/doc/$i", "2026-08-15T00:00:00Z",
        s"HTTP/1.1 200 OK\r\n\r\nbody text $i " + ("z" * (i * 7))))
      .toDF("uri", "ts", "payload")
    // the archive writes AS the index materializes
    Warc.writeRecordsIndexed(df.repartition(3), "uri", "ts", "payload", dir)
      .write.mode("overwrite").parquet(idxDir)
    val idx = spark.read.parquet(idxDir)
    assert(idx.count() == 40)
    // the index tiles each archive file exactly: per-path sum(length)
    // == file size, offsets contiguous from 0
    val byPath = idx.groupBy("path")
      .agg(sum(col("length")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(byPath.length == 3)
    byPath.foreach { case (p, s, _) =>
      assert(new java.io.File(new java.net.URI(p).getPath).length == s ||
        new java.io.File(p.stripPrefix("file:")).length == s, p)
    }
    // full indexed read == the streaming file reader, record for record
    val viaIndex = Warc.readIndexed(idx).collect()
      .map(r => (r.target_uri, new String(r.payload, UTF_8))).sorted.toSeq
    val viaScan = Warc.read(spark, dir + "/*.warc.gz").collect()
      .map(r => (r.target_uri, new String(r.payload, UTF_8))).sorted.toSeq
    assert(viaIndex == viaScan && viaIndex.size == 40)
    // random access: a 3-record subset fetches exactly those, idx
    // carries the byte offset
    val want = Set("https://cdx.example/doc/3", "https://cdx.example/doc/17",
      "https://cdx.example/doc/39")
    val sub = Warc.readIndexed(idx.filter(col("target_uri").isin(want.toSeq: _*)))
      .collect()
    assert(sub.map(_.target_uri).toSet == want)
    sub.foreach { r =>
      val row = idx.filter(col("target_uri") === r.target_uri).head
      assert(r.idx == row.getAs[Long]("offset"))
      assert(new String(r.payload, UTF_8).contains(
        "body text " + r.target_uri.split('/').last))
    }
  }

  test("writeWet round-trips through wetTexts; latestCaptures merges normalization twins, newest date wins") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-wet").toString
    val docs = Seq(
      ("https://w.example/a", "2026-08-15T00:00:00Z", "extracted text alpha"),
      ("https://w.example/b", "2026-08-15T00:00:00Z", "café — UTF-8 survives"),
      ("https://w.example/c", "2026-08-15T00:00:00Z", null: String))
      .toDF("uri", "ts", "text")
    Warc.writeWet(docs.repartition(1), "uri", "ts", "text", dir)
    val back = Warc.wetTexts(Warc.read(spark, dir + "/*.warc.gz"))
      .select("target_uri", "text").as[(String, String)].collect().toMap
    assert(back == Map("https://w.example/a" -> "extracted text alpha",
      "https://w.example/b" -> "café — UTF-8 survives",
      "https://w.example/c" -> ""))
    // conversion records carry no HTTP layer and declare text/plain
    val recs = Warc.read(spark, dir + "/*.warc.gz").collect()
    assert(recs.forall(_.warc_type == "conversion"))
    assert(recs.forall(_.content_type == "text/plain"))

    // latestCaptures: a tracking-param twin of the SAME page captured
    // later must win under normalization and lose without it
    val idx = Seq(
      ("f1", 0L, 10L, "https://t.example/p?a=1", "2026-08-14T00:00:00Z"),
      ("f2", 0L, 10L, "https://T.EXAMPLE/p?utm_source=x&a=1", "2026-08-15T00:00:00Z"),
      ("f3", 0L, 10L, "https://t.example/other", "2026-08-13T00:00:00Z"))
      .toDF("path", "offset", "length", "target_uri", "warc_date")
    val merged = Warc.latestCaptures(idx)
      .select("url", "path", "warc_date")
      .as[(String, String, String)].collect().toSet
    assert(merged == Set(
      ("https://t.example/p?a=1", "f2", "2026-08-15T00:00:00Z"),
      ("https://t.example/other", "f3", "2026-08-13T00:00:00Z")), s"$merged")
    val raw = Warc.latestCaptures(idx, normalize = false)
    assert(raw.count() == 3) // no merge without normalization
    // exact-duplicate rows: deterministic winner by (path, offset)
    val dup = idx.union(idx.limit(1).withColumn("path", lit("f0")))
    val winner = Warc.latestCaptures(dup)
      .filter(col("url") === "https://t.example/p?a=1")
      .select("path").as[String].collect().toSeq
    assert(winner == Seq("f2"))
  }

  test("revisit records: unchanged recaptures store payload-free, archive shrinks, resolution fills digest-exact bytes") {
    import spark.implicits._
    val dd = java.nio.file.Files.createTempDirectory("graft-rv-d").toString
    val plain = java.nio.file.Files.createTempDirectory("graft-rv-p").toString
    // INCOMPRESSIBLE filler (seeded) — a compressible one would let the
    // per-member gzip erase the duplicate bytes and mask the dedup win
    val rnd = new scala.util.Random(42)
    val big = Array.fill(4000)((33 + rnd.nextInt(94)).toChar).mkString
    val rows = Seq(
      ("https://rv.example/a", "2026-08-14T00:00:00Z", s"body-a $big"),
      ("https://rv.example/a", "2026-08-15T00:00:00Z", s"body-a $big"), // unchanged recrawl
      ("https://rv.example/a", "2026-08-16T00:00:00Z", "body-a CHANGED"), // real change
      ("https://rv.example/b", "2026-08-14T00:00:00Z", s"body-b $big"),
      // cross-URI duplicate (a mirror): also a legal revisit target
      ("https://rv.example/b-mirror", "2026-08-15T00:00:00Z", s"body-b $big"))
      .toDF("uri", "ts", "payload")
    Warc.writeRecordsDeduped(rows.repartition(1), "uri", "ts", "payload", dd)
    Warc.writeRecords(rows.repartition(1), "uri", "ts", "payload", plain)
    def bytes(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).map(_.length()).sum
    assert(bytes(dd) < bytes(plain) * 3 / 4,
      s"dedup ${bytes(dd)} vs plain ${bytes(plain)}: recaptures must not re-store payloads")
    val all = Warc.readDeduped(spark, dd + "/*.warc.gz")
    val byKey = all.collect().map(r =>
      (r.getAs[String]("target_uri"), r.getAs[String]("warc_date")) -> r).toMap
    // winners (earliest (date, uri) per digest) are responses; their
    // digest header is present
    assert(byKey(("https://rv.example/a", "2026-08-14T00:00:00Z"))
      .getAs[String]("warc_type") == "response")
    val rev = byKey(("https://rv.example/a", "2026-08-15T00:00:00Z"))
    assert(rev.getAs[String]("warc_type") == "revisit")
    assert(rev.getAs[Array[Byte]]("payload").isEmpty)
    assert(rev.getAs[String]("payload_digest").startsWith("sha1:"))
    assert(rev.getAs[String]("refers_to_uri") == "https://rv.example/a")
    assert(rev.getAs[String]("refers_to_date") == "2026-08-14T00:00:00Z")
    // the changed capture is a full response again
    assert(byKey(("https://rv.example/a", "2026-08-16T00:00:00Z"))
      .getAs[String]("warc_type") == "response")
    // the cross-URI mirror revisits b's capture
    assert(byKey(("https://rv.example/b-mirror", "2026-08-15T00:00:00Z"))
      .getAs[String]("refers_to_uri") == "https://rv.example/b")
    // resolution: the logical view equals the input, revisits flagged
    val resolved = Warc.resolveRevisits(all)
      .select(col("target_uri"), col("warc_date"),
        col("payload").cast("string"), col("was_revisit"))
      .as[(String, String, String, Boolean)].collect().toSet
    val expected = rows.as[(String, String, String)].collect().toSet.map {
      t: (String, String, String) =>
        (t._1, t._2, t._3,
          t._2 != "2026-08-14T00:00:00Z" && t._3 != "body-a CHANGED")
    }
    assert(resolved == expected, s"$resolved")
    // digest gate: a revisit naming a record whose bytes do not match
    // its claimed digest must DROP, not serve wrong bytes
    val torn = all.withColumn("payload",
      when(col("warc_type") === "response" &&
        col("target_uri") === "https://rv.example/b",
        lit("corrupted".getBytes(UTF_8))).otherwise(col("payload")))
    val tornResolved = Warc.resolveRevisits(torn)
      .filter(col("was_revisit")).select("target_uri")
      .as[String].collect().toSeq
    assert(!tornResolved.contains("https://rv.example/b-mirror"))
  }

  test("WAT sidecar: envelopes for every response; links/title only on decodable HTML; JSON round-trips; tolerant reader") {
    import spark.implicits._
    val arc = java.nio.file.Files.createTempDirectory("graft-wat-a").toString
    val wat = java.nio.file.Files.createTempDirectory("graft-wat-w").toString
    def http(status: String, headers: String, body: String) =
      s"HTTP/1.1 $status\r\n$headers\r\n\r\n$body"
    val rows = Seq(
      ("https://wat.example/a", http("200 OK", "Content-Type: text/html",
        "<html><head><title>Alpha Page</title></head><body>" +
          "<a href=\"/rel\">r</a><a href=\"https://x.example/abs\">x</a></body></html>")),
      // non-HTML 200: envelope present, no links, no title
      ("https://wat.example/b", http("200 OK", "Content-Type: application/json",
        "{\"k\":1}")),
      // 404 HTML: envelope carries the status; links still extracted
      ("https://wat.example/c", http("404 Not Found", "Content-Type: text/html",
        "<a href=\"https://y.example/gone\">g</a>")),
      // undecodable encoding: envelope present, empty links (the
      // htmlResponses exclusion discipline)
      ("https://wat.example/d", http("200 OK",
        "Content-Type: text/html\r\nContent-Encoding: br", "xxxx")))
      .toDF("uri", "payload")
      .withColumn("ts", lit("2026-08-15T00:00:00Z"))
    Warc.writeRecords(rows.repartition(1), "uri", "ts", "payload", arc)
    Warc.writeWatRecords(Warc.read(spark, arc + "/*.warc.gz"), wat)
    val back = Warc.read(spark, wat + "/*.warc.gz")
    // metadata records, json payloads, one per response
    assert(back.collect().forall(r =>
      r.warc_type == "metadata" && r.content_type.startsWith("application/json")))
    val env = Warc.watEnvelopes(back)
      .select("target_uri", "status", "mime", "title", "links")
      .as[(String, Int, String, String, Seq[String])]
      .collect().map(t => t._1 -> t).toMap
    assert(env.size == 4)
    assert(env("https://wat.example/a")._2 == 200)
    assert(env("https://wat.example/a")._4 == "Alpha Page")
    assert(env("https://wat.example/a")._5 ==
      Seq("https://wat.example/rel", "https://x.example/abs"))
    assert(env("https://wat.example/b")._3 == "application/json" &&
      env("https://wat.example/b")._5.isEmpty &&
      env("https://wat.example/b")._4 == "")
    assert(env("https://wat.example/c")._2 == 404 &&
      env("https://wat.example/c")._5 == Seq("https://y.example/gone"))
    assert(env("https://wat.example/d")._5.isEmpty)
    // a WET/response record in the same scan is ignored by the reader
    assert(Warc.watEnvelopes(Warc.read(spark, arc + "/*.warc.gz")).count() == 0)
  }

  test("Record-IDs: duplicate (uri, date) captures get DISTINCT ids; RFC 4122 version/variant bits set") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-recid").toString
    // three byte-identical captures of the same page at the same second
    // — the replay case: ISO 28500 still requires globally unique ids
    val df = Seq.fill(3)(("https://r.example/p", "2026-08-15T00:00:00Z", "same"))
      .toDF("uri", "ts", "payload")
    Warc.writeRecords(df.repartition(1), "uri", "ts", "payload", dir)
    val ids = Warc.parseStream(new java.io.FileInputStream(
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc.gz")).head))
      .map(_.header("WARC-Record-ID").get).toSeq
    assert(ids.size == 3 && ids.distinct.size == 3, s"$ids")
    // well-formed UUID: version nibble 3 (name-based MD5), variant 10xx
    ids.foreach { id =>
      val u = id.stripPrefix("<urn:uuid:").stripSuffix(">")
      assert(u.matches("[0-9a-f]{8}-[0-9a-f]{4}-3[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}"), u)
    }
  }

  test("sink commit protocol: only final files land (no .inprogress litter), archives complete and parseable") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-commit").toString
    val idxDir = java.nio.file.Files.createTempDirectory("graft-commit-idx").toString
    val df = (0 until 20).map(i =>
      (s"https://c.example/$i", "2026-08-15T00:00:00Z", s"payload $i"))
      .toDF("uri", "ts", "payload")
    Warc.writeRecords(df.repartition(2), "uri", "ts", "payload", dir)
    Warc.writeRecordsIndexed(df.repartition(2), "uri", "ts", "payload", dir + "-idx")
      .write.mode("overwrite").parquet(idxDir)
    Seq(dir, dir + "-idx").foreach { d =>
      // (.crc files are the Hadoop local FS's own checksum siblings)
      val names = new java.io.File(d).listFiles().map(_.getName)
        .filterNot(_.endsWith(".crc")).sorted.toSeq
      assert(names == Seq("part-00000.warc.gz", "part-00001.warc.gz"), s"$d: $names")
    }
    assert(Warc.read(spark, dir + "/*.warc.gz").count() == 20)
    assert(Warc.readIndexed(spark.read.parquet(idxDir)).count() == 20)
  }

  test("readLatestCaptures: fused fetch == decide+join form, with strictly fewer exchanges in the executed plan") {
    import spark.implicits._
    val arcDir = java.nio.file.Files.createTempDirectory("graft-fuse").toString
    val idxDir = java.nio.file.Files.createTempDirectory("graft-fuse-idx").toString
    def epoch(tag: String, day: String, n: Int) =
      Warc.writeRecordsIndexed(
        (0 until n).map(i => (s"https://f.example/doc/$i", day,
          s"HTTP/1.1 200 OK\r\n\r\n$tag body $i")).toDF("uri", "ts", "payload")
          .repartition(2),
        "uri", "ts", "payload",
        java.nio.file.Files.createTempDirectory(s"graft-fuse-$tag").toString).toDF()
    epoch("v1", "2026-08-14T00:00:00Z", 30)
      .union(epoch("v2", "2026-08-15T00:00:00Z", 15)) // docs 0..14 re-captured
      .write.mode("overwrite").parquet(idxDir)
    val idx = spark.read.parquet(idxDir)
    val fused = Warc.readLatestCaptures(idx)
      .select(col("url"), col("warc_date"),
        Warc.httpBody(col("payload")).as("body"))
    val fusedRows = fused.as[(String, String, String)].collect().toSet
    // the unfused decide -> re-shuffle-by-path -> fetch -> join form
    val latest = Warc.latestCaptures(idx)
    val unfused = Warc.readIndexed(latest).toDF()
      .join(latest.select(col("target_uri"), col("url")), Seq("target_uri"))
      .select(col("url"), col("warc_date"),
        Warc.httpBody(col("payload")).as("body"))
    assert(fusedRows == unfused.as[(String, String, String)].collect().toSet)
    assert(fusedRows.size == 30)
    // winners: v2 body for 0..14, v1 otherwise
    assert(fusedRows.forall { case (url, _, body) =>
      val id = url.split('/').last.toInt
      body == (if (id < 15) s"v2 body $id" else s"v1 body $id")
    })
    // the fusion's point: at least one exchange (the path re-shuffle)
    // and one join gone from the executed plan
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size
    unfused.collect()
    assert(exchanges(fused) < exchanges(unfused),
      s"fused=${exchanges(fused)} unfused=${exchanges(unfused)}")
  }

  test("writeRecords: mandatory WARC-Record-ID (deterministic urn:uuid), CRLF stripped from header values") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sinkspec").toString
    val df = Seq(
      ("https://s.example/a", "2026-08-15T00:00:00Z", "body-a"),
      // hostile values: CR/LF embedded in uri and date must not
      // corrupt record framing
      ("https://s.example/b\r\nWARC-Type: injected", "2026-08-15T00:00:01Z\n", "body-b"))
      .toDF("uri", "ts", "payload")
    Warc.writeRecords(df.repartition(1), "uri", "ts", "payload", dir)
    val rows = Warc.read(spark, dir + "/*.warc.gz").collect()
      .sortBy(_.target_uri)
    assert(rows.length == 2) // the injected CRLF did NOT split a record
    assert(rows.map(_.target_uri).toSeq ==
      Seq("https://s.example/a", "https://s.example/bWARC-Type: injected"))
    val back = Warc.parseStream(new java.io.FileInputStream(
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc.gz")).head))
      .toSeq
    // ISO 28500 mandatory fields present on every record
    back.foreach { r =>
      val id = r.header("WARC-Record-ID").get
      assert(id.matches("<urn:uuid:[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}>"), id)
      assert(r.header("Content-Length").isDefined && r.header("WARC-Date").isDefined)
    }
    // deterministic: the id derives from (uri, date) — re-archiving
    // the same capture keeps its identity
    val dir2 = java.nio.file.Files.createTempDirectory("graft-sinkspec2").toString
    Warc.writeRecords(df.repartition(1), "uri", "ts", "payload", dir2)
    val back2 = Warc.parseStream(new java.io.FileInputStream(
      new java.io.File(dir2).listFiles().filter(_.getName.endsWith(".warc.gz")).head))
      .toSeq
    assert(back.map(_.header("WARC-Record-ID").get).sorted ==
      back2.map(_.header("WARC-Record-ID").get).sorted)
  }

  test("revisit-aware serving: revisit winners fill digest-exact bytes; cross-URI mirror resolves; torn digest drops") {
    import spark.implicits._
    val arc = java.nio.file.Files.createTempDirectory("graft-rsv").toString
    // day 1: three pages; day 2: /a recaptured UNCHANGED (revisit of
    // itself), /mirror captures the SAME bytes as /b (cross-URI
    // revisit); /c never recaptured
    val rows = Seq(
      ("https://rv.example/a", "2026-08-14T00:00:00Z", "HTTP/1.1 200 OK\r\n\r\nbody a"),
      ("https://rv.example/b", "2026-08-14T00:00:00Z", "HTTP/1.1 200 OK\r\n\r\nbody b"),
      ("https://rv.example/c", "2026-08-14T00:00:00Z", "HTTP/1.1 200 OK\r\n\r\nbody c"),
      ("https://rv.example/a", "2026-08-15T00:00:00Z", "HTTP/1.1 200 OK\r\n\r\nbody a"),
      ("https://rv.example/mirror", "2026-08-15T00:00:00Z", "HTTP/1.1 200 OK\r\n\r\nbody b"))
      .toDF("uri", "ts", "payload")
    val idx = Warc.writeRecordsDedupedIndexed(rows.repartition(2),
      "uri", "ts", "payload", arc).toDF()
    val idxDir = java.nio.file.Files.createTempDirectory("graft-rsv-ix").toString
    idx.write.mode("overwrite").parquet(idxDir)
    val stored = spark.read.parquet(idxDir)
    // the front door detects the linkage columns and resolves
    val got = Warc.readLatestCaptures(stored)
      .select(col("url"), col("warc_date"),
        Warc.httpBody(col("payload")).as("body"), col("was_revisit"))
      .as[(String, String, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.size == 4)
    // /a's winner is the day-2 REVISIT — served with day-1's exact bytes
    assert(got("https://rv.example/a") ==
      (("2026-08-15T00:00:00Z", "body a", true)))
    // /mirror's only capture is a cross-URI revisit of /b's bytes
    assert(got("https://rv.example/mirror") ==
      (("2026-08-15T00:00:00Z", "body b", true)))
    assert(got("https://rv.example/b") ==
      (("2026-08-14T00:00:00Z", "body b", false)))
    assert(got("https://rv.example/c") ==
      (("2026-08-14T00:00:00Z", "body c", false)))
    // torn data: corrupt the digest a revisit claims — that winner
    // DROPS rather than serving mismatched bytes
    val torn = stored.withColumn("payload_digest",
      when(col("warc_type") === "revisit" &&
          col("target_uri") === "https://rv.example/mirror",
        lit("sha1:0000000000000000000000000000000000000000"))
        .otherwise(col("payload_digest")))
    val tornGot = Warc.readLatestCapturesDeduped(torn)
      .select("url").as[String].collect().toSet
    assert(tornGot == Set("https://rv.example/a", "https://rv.example/b",
      "https://rv.example/c"))
    // index offsets stay valid: every range fetches and parses
    assert(Warc.readIndexed(stored).count() == 5)
  }

  test("incremental dedup archiving: cross-BATCH revisits refer to stored originals; replay folds nothing; serving exact") {
    import spark.implicits._
    val t = "graft_digests_" + Integer.toHexString(
      java.util.UUID.randomUUID().hashCode())
    graft.store.Bucketing.dropWithLocation(spark, t)
    def dirFor(n: Int) =
      java.nio.file.Files.createTempDirectory(s"graft-incdd$n").toString
    def rows(day: String, pages: (String, String)*) =
      pages.map { case (u, b) =>
        (u, day, s"HTTP/1.1 200 OK\r\n\r\n$b") }.toDF("uri", "ts", "payload")
    // batch 1: three pages, day 1
    val d1 = dirFor(1)
    val i1 = Warc.writeRecordsDedupedIncremental(
      rows("2026-08-14T00:00:00Z",
        "https://i.example/a" -> "body a",
        "https://i.example/b" -> "body b",
        "https://i.example/c" -> "body c").repartition(2),
      "uri", "ts", "payload", d1, t, batchId = 1L, buckets = 4)
    assert(i1.collect().forall(_.warc_type == "response"))
    // batch 2, day 2: /a and /b UNCHANGED (cross-batch revisits of the
    // STORED day-1 originals), /d new
    val d2 = dirFor(2)
    val i2 = Warc.writeRecordsDedupedIncremental(
      rows("2026-08-15T00:00:00Z",
        "https://i.example/a" -> "body a",
        "https://i.example/b" -> "body b",
        "https://i.example/d" -> "body d").repartition(2),
      "uri", "ts", "payload", d2, t, batchId = 2L, buckets = 4)
    val byUri = i2.collect().map(r => r.target_uri -> r).toMap
    assert(byUri("https://i.example/a").warc_type == "revisit")
    assert(byUri("https://i.example/a").refers_to_uri == "https://i.example/a")
    assert(byUri("https://i.example/a").refers_to_date == "2026-08-14T00:00:00Z")
    assert(byUri("https://i.example/d").warc_type == "response")
    // the batch-2 archive carries NO payload bytes for the revisits
    val arch2 = Warc.readDeduped(spark, d2 + "/*.warc.gz").collect()
    assert(arch2.filter(_.getAs[String]("warc_type") == "revisit")
      .forall(_.getAs[Array[Byte]]("payload").isEmpty))
    // REPLAY batch 2 into its own fresh dir: byte-identical archive,
    // store unchanged (fold is a no-op)
    val storeRows = spark.table(t).count()
    val d2r = dirFor(3)
    Warc.writeRecordsDedupedIncremental(
      rows("2026-08-15T00:00:00Z",
        "https://i.example/a" -> "body a",
        "https://i.example/b" -> "body b",
        "https://i.example/d" -> "body d").repartition(2),
      "uri", "ts", "payload", d2r, t, batchId = 2L, buckets = 4).collect()
    assert(spark.table(t).count() == storeRows)
    def bytes(dir: String) = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).sortBy(_.getName)
      .map(f => java.nio.file.Files.readAllBytes(f.toPath))
    bytes(d2).zip(bytes(d2r)).foreach { case (x, y) =>
      assert(java.util.Arrays.equals(x, y))
    }
    // serving over the ACCUMULATED index: day-2 winners for a/b with
    // day-1 bytes, digest-exact
    val all = i1.toDF().unionByName(i2.toDF())
    val got = Warc.readLatestCapturesDeduped(all)
      .select(col("url"), col("warc_date"),
        Warc.httpBody(col("payload")).as("body"), col("was_revisit"))
      .as[(String, String, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("https://i.example/a") ==
      (("2026-08-15T00:00:00Z", "body a", true)))
    assert(got("https://i.example/c") ==
      (("2026-08-14T00:00:00Z", "body c", false)))
    assert(got("https://i.example/d") ==
      (("2026-08-15T00:00:00Z", "body d", false)))
    // compaction keeps everything
    Warc.compactDigestStore(spark, t, buckets = 4)
    assert(spark.table(t).count() == storeRows)
    graft.store.Bucketing.dropWithLocation(spark, t)
  }

  test("digest-store GC: aged-out digests leave the store; a post-GC recrawl re-stores content as a fresh RESPONSE, never a dangling revisit; within-batch duplicate rows fold ONE digest row") {
    import spark.implicits._
    val t = "graft_digests_gc_" + Integer.toHexString(
      java.util.UUID.randomUUID().hashCode())
    graft.store.Bucketing.dropWithLocation(spark, t)
    def dirFor(n: Int) =
      java.nio.file.Files.createTempDirectory(s"graft-gcdd$n").toString
    def rows(day: String, pages: (String, String)*) =
      pages.map { case (u, b) =>
        (u, day, s"HTTP/1.1 200 OK\r\n\r\n$b") }.toDF("uri", "ts", "payload")
    // batch 1, day 1: /a twice (EXACT duplicate rows — the advised
    // hazard: each copy satisfies __isw) and /b once
    Warc.writeRecordsDedupedIncremental(
      rows("2026-08-10T00:00:00Z",
        "https://gc.example/a" -> "body a",
        "https://gc.example/a" -> "body a",
        "https://gc.example/b" -> "body b").repartition(2),
      "uri", "ts", "payload", dirFor(1), t, batchId = 1L, buckets = 4).collect()
    // ONE store row per digest despite the duplicate input rows
    assert(spark.table(t).count() == 2)
    assert(spark.table(t).groupBy("__digest").count()
      .filter(col("count") > 1).isEmpty)
    // batch 2, day 11: /a unchanged → cross-batch revisit of day-10
    val i2 = Warc.writeRecordsDedupedIncremental(
      rows("2026-08-11T00:00:00Z", "https://gc.example/a" -> "body a")
        .repartition(2),
      "uri", "ts", "payload", dirFor(2), t, batchId = 2L, buckets = 4)
    assert(i2.collect().forall(r => r.warc_type == "revisit" &&
      r.refers_to_date == "2026-08-10T00:00:00Z"))
    // archive retention deletes pre-day-12 segments → GC their digests
    Warc.gcDigestStore(spark, t, olderThan = "2026-08-12T00:00:00Z", buckets = 4)
    assert(spark.table(t).count() == 0) // both originals predate the cut
    // batch 3, day 13: /a recrawled UNCHANGED — but its old original is
    // gone; it MUST re-store as a fresh response (a revisit here would
    // refer to deleted bytes = silent data loss)
    val i3 = Warc.writeRecordsDedupedIncremental(
      rows("2026-08-13T00:00:00Z", "https://gc.example/a" -> "body a")
        .repartition(2),
      "uri", "ts", "payload", dirFor(3), t, batchId = 3L, buckets = 4)
    val r3 = i3.collect()
    assert(r3.forall(_.warc_type == "response"), r3.map(_.warc_type).toSeq)
    assert(spark.table(t).count() == 1)
    // batch 4, day 14: the next recapture refers to the NEW original
    val i4 = Warc.writeRecordsDedupedIncremental(
      rows("2026-08-14T00:00:00Z", "https://gc.example/a" -> "body a")
        .repartition(2),
      "uri", "ts", "payload", dirFor(4), t, batchId = 4L, buckets = 4)
    val r4 = i4.collect()
    assert(r4.forall(r => r.warc_type == "revisit" &&
      r.refers_to_date == "2026-08-13T00:00:00Z"), r4.toSeq)
    // serving over the SURVIVING archive (batches 3+4 — exactly what
    // retention kept) is complete and digest-exact: no dangling refs
    val got = Warc.readLatestCapturesDeduped(i3.toDF().unionByName(i4.toDF()))
      .select(col("url"), col("warc_date"),
        Warc.httpBody(col("payload")).as("body"), col("was_revisit"))
      .as[(String, String, String, Boolean)].collect().toSeq
    assert(got == Seq(("https://gc.example/a", "2026-08-14T00:00:00Z",
      "body a", true)), got)
    graft.store.Bucketing.dropWithLocation(spark, t)
  }

  test("retry determinism: archives are byte-identical regardless of input row order (the AtomicSink double-commit premise)") {
    import spark.implicits._
    // a task retry/speculative duplicate re-reads its shuffle input in
    // a DIFFERENT arrival order; the sink's content-keyed partition
    // sort must erase that — modeled here by writing the same rows
    // from a forward and a reversed source under the same hash
    // partitioning
    val rows = (0 until 24).map(i =>
      (s"https://det.example/$i", f"2026-08-15T00:00:${i % 60}%02dZ", s"payload $i"))
    def files(dir: String): Seq[(String, Array[Byte])] =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc.gz"))
        .sortBy(_.getName)
        .map(f => (f.getName, java.nio.file.Files.readAllBytes(f.toPath))).toSeq
    val d1 = java.nio.file.Files.createTempDirectory("graft-det1").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft-det2").toString
    Warc.writeRecords(rows.toDF("uri", "ts", "payload")
      .repartition(3, col("uri")), "uri", "ts", "payload", d1)
    Warc.writeRecords(rows.reverse.toDF("uri", "ts", "payload")
      .repartition(3, col("uri")), "uri", "ts", "payload", d2)
    val (f1, f2) = (files(d1), files(d2))
    assert(f1.map(_._1) == f2.map(_._1))
    f1.zip(f2).foreach { case ((n, b1), (_, b2)) =>
      assert(java.util.Arrays.equals(b1, b2), s"$n differs between runs")
    }
    // the indexed twin too: identical bytes AND identical index rows
    val i1 = java.nio.file.Files.createTempDirectory("graft-det3").toString
    val i2 = java.nio.file.Files.createTempDirectory("graft-det4").toString
    val x1 = Warc.writeRecordsIndexed(rows.toDF("uri", "ts", "payload")
      .repartition(3, col("uri")), "uri", "ts", "payload", i1).collect().toSet
    val x2 = Warc.writeRecordsIndexed(rows.reverse.toDF("uri", "ts", "payload")
      .repartition(3, col("uri")), "uri", "ts", "payload", i2).collect().toSet
    assert(x1.map(r => (r.offset, r.length, r.target_uri, r.warc_date)) ==
      x2.map(r => (r.offset, r.length, r.target_uri, r.warc_date)))
    files(i1).zip(files(i2)).foreach { case ((n, b1), (_, b2)) =>
      assert(java.util.Arrays.equals(b1, b2), s"$n differs between runs")
    }
  }

  test("readIndexed: a trailing unparseable index entry is skipped, not a NoSuchElementException") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-corrupt").toString
    val df = (0 until 5).map(i =>
      (s"https://k.example/$i", "2026-08-15T00:00:00Z", s"body $i"))
      .toDF("uri", "ts", "payload")
    val idx = Warc.writeRecordsIndexed(df.repartition(1), "uri", "ts", "payload", dir)
      .collect().toSeq
    val arc = idx.head.path
    // a second "file" whose only index entry names a corrupt range:
    // mid-member bytes are gzip garbage, parseBytes yields nothing —
    // that partition's iterator holds ONLY unparseable entries (the
    // old hasNext lied true and next() threw)
    val corrupt = Warc.WarcIndexRow(arc, idx.head.offset + 5,
      math.max(idx.head.length - 8, 4), "https://k.example/corrupt", "x")
    val all = idx.map(r => r.copy()) :+ corrupt
    // coLocate=false + per-row partitions: the corrupt entry sits alone
    val frame = spark.createDataset(all).toDF().repartition(6)
    val got = Warc.readIndexed(frame, coLocate = false, maxGapBytes = 0)
      .collect()
    assert(got.length == 5, got.mkString(","))
    assert(got.map(_.target_uri).sorted.toSeq ==
      (0 until 5).map(i => s"https://k.example/$i"))
  }

  test("AtomicSink.commit: atomic replace over an existing dest; racer-committed tmp-gone succeeds; tmp-and-dest-gone fails loudly") {
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(
      java.nio.file.Files.createTempDirectory("graft-atomic").toString)
    def write(p: org.apache.hadoop.fs.Path, s: String): Unit = {
      val o = fs.create(p, true); o.write(s.getBytes(UTF_8)); o.close()
    }
    def readBack(p: org.apache.hadoop.fs.Path): String = {
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](64)
        val n = in.read(buf)
        new String(buf, 0, math.max(n, 0), UTF_8)
      } finally in.close()
    }
    val dest = new org.apache.hadoop.fs.Path(dir, "out.bin")
    // 1) replace an existing dest — new bytes win, dest present after
    write(dest, "stale")
    val t1 = graft.ext.AtomicSink.tempFor(dest, 1L)
    write(t1, "fresh")
    graft.ext.AtomicSink.commit(fs, t1, dest)
    assert(readBack(dest) == "fresh" && !fs.exists(t1))
    // 2) racer already committed and moved OUR tmp is gone, dest
    //    complete: commit is a benign no-op, dest untouched
    val t2 = graft.ext.AtomicSink.tempFor(dest, 2L)
    graft.ext.AtomicSink.commit(fs, t2, dest) // t2 never existed
    assert(readBack(dest) == "fresh")
    // 3) tmp gone AND dest gone: data loss must be LOUD, not silent
    val lone = new org.apache.hadoop.fs.Path(dir, "never.bin")
    val t3 = graft.ext.AtomicSink.tempFor(lone, 3L)
    intercept[java.io.IOException] {
      graft.ext.AtomicSink.commit(fs, t3, lone)
    }
  }
}
