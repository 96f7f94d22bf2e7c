package graft.ext

import java.io.{BufferedInputStream, ByteArrayInputStream, DataInputStream, EOFException, InputStream}

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, MapType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** WARC (Web ARChive, ISO 28500) container parsing — with
  * [[Extract]], the complete crawl front door: a CommonCrawl-style
  * corpus arrives as WARC files of HTTP response records, and this
  * layer turns them into the (uri, date, html) rows the HTML extractor
  * and every downstream cleaning gate consume.
  *
  * First-principles JDK-pure parser (the RIFF/[[Multimodal]]
  * precedent), one streaming core shared by both entry points:
  *
  *  - [[records]] — a column expression over a BINARY record-blob
  *    column (derived-input oracles, small captures);
  *  - [[read]] — the production file reader: Hadoop-FS listing →
  *    parallelized paths → ONE pass per file over an InputStream
  *    (constant memory per record, never whole-file buffering), with
  *    transparent multi-member gzip (the standard `.warc.gz` layout
  *    compresses each record as its own member; JDK GZIPInputStream
  *    reads concatenated members natively).
  *
  * Format essentials handled: `WARC/1.0`/`1.1` version line, header
  * block terminated by an empty line, `Content-Length`-delimited
  * payload, the two CRLFs closing each record; tolerant of bare-LF
  * line endings and a truncated final record (parsed prefix returned,
  * tail dropped — crawl files are routinely cut mid-record). HTTP
  * response payloads split with plain column algebra
  * ([[httpStatus]]/[[httpBody]]) — no second kernel.
  *
  * 100-TB shape: one narrow map stage per file list; records never
  * shuffle until the caller aggregates. Parallelism = file count (the
  * CommonCrawl layout: ~1 GB per .warc.gz, tens of thousands of files
  * per crawl), which is the same unit every production WARC pipeline
  * parallelizes on — gzip members make byte-range splits of one file
  * impossible anyway. */
object Warc {

  final case class WarcRecord(
      version: String,
      headers: Map[String, String],
      payload: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
    /** The DECLARED payload length — correct even when the payload was
      * skipped (payload-pruned scans); equals `payload.length` when
      * kept (the parser reads exactly Content-Length bytes). */
    def contentLength: Long =
      header("Content-Length")
        .flatMap(v => scala.util.Try(v.toLong).toOption)
        .getOrElse(payload.length.toLong)
  }

  final case class WarcRow(
      path: String,
      idx: Long,
      warc_type: String,
      target_uri: String,
      warc_date: String,
      content_type: String,
      content_length: Long,
      payload: Array[Byte])

  // -- streaming parser core ----------------------------------------------

  /** Read one CRLF- (or LF-) terminated header line; None at EOF.
    * Bytes decode as UTF-8 (ISO 28500 allows UTF-8 header values —
    * byte-to-char would mojibake a non-ASCII WARC-Target-URI). */
  private def readLine(in: InputStream): Option[String] = {
    val buf = new java.io.ByteArrayOutputStream(64)
    var c = in.read()
    if (c < 0) return None
    while (c >= 0 && c != '\n') {
      if (c != '\r') buf.write(c)
      c = in.read()
    }
    Some(new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Payload bytes ALLOCATED by the parser since JVM start — the
    * observable WarcSourceSpec pins the pruned/pushed-filter scan
    * contract on ("a response-only read allocates zero non-response
    * payloads" is a measurement, not a claim). One atomic add per
    * record; negligible next to the payload IO itself. Meaningful in
    * local mode (executors share the JVM). */
  private[graft] val payloadBytesAllocated = new java.util.concurrent.atomic.AtomicLong

  private def readFully(in: InputStream, n: Long): Option[Array[Byte]] = {
    if (n > Int.MaxValue) return None // malformed length; treat as truncation
    val buf = new Array[Byte](n.toInt)
    payloadBytesAllocated.addAndGet(n)
    try { new DataInputStream(in).readFully(buf); Some(buf) }
    catch { case _: EOFException => None }
  }

  /** Consume exactly `n` payload bytes WITHOUT allocating them — the
    * payload-pruned scan path ([[graft.sources.WarcDataSource]]): a
    * metadata query over ~1 GB files must not materialize gigabytes of
    * bodies it never reads. False = truncated (the readFully twin). */
  private def skipFully(in: InputStream, n: Long): Boolean = {
    var left = n
    while (left > 0) {
      val s = in.skip(left)
      if (s > 0) left -= s
      else if (in.read() >= 0) left -= 1 // skip() can stall; read advances
      else return false // EOF mid-payload: truncated
    }
    true
  }

  /** Parse the next record off the stream; None on EOF or a truncated/
    * malformed tail (parsing stops — the iterator contract). */
  def nextRecord(in: InputStream): Option[WarcRecord] =
    nextRecord(in, keepPayload = true)

  /** [[nextRecord]] with the payload optionally SKIPPED instead of
    * read (empty array in the record; [[WarcRecord.contentLength]]
    * still reports the declared length). */
  def nextRecord(in: InputStream, keepPayload: Boolean): Option[WarcRecord] =
    nextRecord(in, (_, _) => keepPayload)

  /** [[nextRecord]] with a PER-RECORD payload decision, taken on
    * (version, headers) BEFORE the payload is touched — the pushed-
    * filter scan path: a `warc_type = 'response'` read of a mixed
    * request/response/metadata file consumes the non-matching records'
    * declared Content-Length bytes via [[skipFully]] without ever
    * allocating them, even when the query needs `payload`. Every
    * record is still EMITTED (payload-less when declined) so callers
    * keep global record indexes; dropping rows is the caller's job. */
  def nextRecord(in: InputStream,
      keepPayloadFor: (String, scala.collection.Map[String, String]) => Boolean): Option[WarcRecord] = {
    // skip inter-record blank lines, find the version line
    var line: Option[String] = readLine(in)
    while (line.exists(_.isEmpty)) line = readLine(in)
    line match {
      case Some(v) if v.startsWith("WARC/") =>
        val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
        var h = readLine(in)
        while (h.exists(_.nonEmpty)) {
          val s = h.get
          val colon = s.indexOf(':')
          if (colon > 0)
            headers(s.substring(0, colon).trim) = s.substring(colon + 1).trim
          h = readLine(in)
        }
        if (h.isEmpty) None // EOF inside headers: truncated
        else {
          val len = headers.collectFirst {
            case (k, value) if k.equalsIgnoreCase("Content-Length") => value
          }.flatMap(v => scala.util.Try(v.toLong).toOption)
          val version = v.stripPrefix("WARC/")
          len match {
            case Some(n) if n >= 0 && keepPayloadFor(version, headers) =>
              readFully(in, n).map(WarcRecord(version, headers.toMap, _))
            case Some(n) if n >= 0 =>
              if (skipFully(in, n))
                Some(WarcRecord(version, headers.toMap, Array.emptyByteArray))
              else None // truncated mid-payload
            case _ => None // Content-Length is mandatory; stop on violation
          }
        }
      case _ => None
    }
  }

  /** All records of one WARC byte stream — plain, multi-member gzip
    * (`.warc.gz`), or multi-frame zstd (`.warc.zst` — CommonCrawl's
    * newer transport; zstd-jni ships with Spark, and continuous mode
    * reads concatenated frames the way GZIPInputStream reads members;
    * skippable frames — the dictionary convention — are skipped by the
    * decoder per RFC 8878). `keepPayload = false` consumes payloads
    * without allocating them (payload-pruned scans). */
  def parseStream(raw: InputStream,
      keepPayload: Boolean = true): Iterator[WarcRecord] =
    parseStream(raw, (_: String, _: scala.collection.Map[String, String]) => keepPayload)

  /** [[parseStream]] with a PER-RECORD payload decision on (version,
    * headers) — see [[nextRecord]]'s function overload: declined
    * payloads are consumed, never allocated; every record is still
    * emitted so record indexes stay global. */
  def parseStream(raw: InputStream,
      keepPayloadFor: (String, scala.collection.Map[String, String]) => Boolean): Iterator[WarcRecord] = {
    val buf = new BufferedInputStream(raw, 1 << 16)
    buf.mark(4)
    val b0 = buf.read(); val b1 = buf.read()
    val b2 = buf.read(); val b3 = buf.read()
    buf.reset()
    val in: InputStream =
      if (b0 == 0x1f && b1 == 0x8b)
        new java.util.zip.GZIPInputStream(buf, 1 << 16)
      else if (b0 == 0x28 && b1 == 0xB5 && b2 == 0x2F && b3 == 0xFD) {
        val z = new com.github.luben.zstd.ZstdInputStream(buf)
        z.setContinuous(true) // read across frame boundaries
        z
      } else buf
    new Iterator[WarcRecord] {
      private var nextRec: Option[WarcRecord] = nextRecord(in, keepPayloadFor)
      override def hasNext: Boolean = nextRec.isDefined
      override def next(): WarcRecord = {
        val r = nextRec.get
        nextRec = nextRecord(in, keepPayloadFor)
        r
      }
    }
  }

  def parseBytes(bytes: Array[Byte]): Iterator[WarcRecord] =
    parseStream(new ByteArrayInputStream(bytes))

  // -- production file reader ---------------------------------------------

  /** Parse every WARC file matching `glob` into records. One streaming
    * pass per file (constant memory), file-count parallelism. */
  def read(spark: SparkSession, glob: String,
      parallelism: Int = 0): Dataset[WarcRow] = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val pat = new org.apache.hadoop.fs.Path(glob)
    val fs = pat.getFileSystem(conf.value)
    val paths = Option(fs.globStatus(pat)).getOrElse(Array.empty)
      .filter(_.isFile).map(_.getPath.toString).sorted.toSeq
    val slices = if (parallelism > 0) parallelism else math.max(paths.size, 1)
    spark.createDataset(paths).repartition(slices).mapPartitions { it =>
      it.flatMap { p =>
        val path = new org.apache.hadoop.fs.Path(p)
        val in = path.getFileSystem(conf.value).open(path)
        // close on exhaustion AND on task end (a downstream limit() can
        // abandon the iterator mid-file; on HDFS/S3A a leaked stream
        // pins a pooled connection until finalization)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => in.close()))
        val base = parseStream(in).zipWithIndex.map { case (r, i) =>
          WarcRow(p, i.toLong,
            r.header("WARC-Type").getOrElse(""),
            r.header("WARC-Target-URI").getOrElse(""),
            r.header("WARC-Date").getOrElse(""),
            r.header("Content-Type").getOrElse(""),
            r.payload.length.toLong, r.payload)
        }
        new Iterator[WarcRow] {
          override def hasNext: Boolean = {
            val h = base.hasNext
            if (!h) in.close() // eager close per exhausted file
            h
          }
          override def next(): WarcRow = base.next()
        }
      }
    }
  }

  // -- archiving sink -------------------------------------------------------

  /** Per-partition gzip MEMBER writer with ONE reusable native
    * [[java.util.zip.Deflater]]: each `writeMember` emits a complete
    * gzip member (10-byte header with zero mtime — deterministic
    * output — raw-deflate body, CRC32 + ISIZE trailer), `reset()`
    * between members. The naive per-member `new GZIPOutputStream`
    * allocates a fresh Deflater (~hundreds of KB of NATIVE zlib
    * buffers) per record and `finish()` without `close()` leaves it
    * un-`end()`ed until GC finalization — a task archiving millions of
    * records exhausts executor native memory. Here the native buffers
    * are allocated once per partition and released by `end()` in the
    * task's finally block. */
  final class MemberGzipWriter(out: java.io.OutputStream) {
    private val deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    private val crc = new java.util.zip.CRC32
    private val buf = new Array[Byte](64 * 1024)
    private var ended = false
    /** Members emitted so far — the reuse witness WarcSpec asserts. */
    var membersWritten: Long = 0L
    /** Compressed bytes emitted so far == the NEXT member's byte
      * offset in the stream — the CDX-index hook ([[writeRecordsIndexed]]). */
    var bytesWritten: Long = 0L
    private def intLE(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
      bytesWritten += 4
    }
    /** Write one complete gzip member; returns its COMPRESSED length
      * in bytes (offset = [[bytesWritten]] before the call — together
      * the byte range a seeking reader fetches). */
    def writeMember(bytes: Array[Byte]): Long = {
      require(!ended, "writer already ended")
      val start = bytesWritten
      out.write(MemberGzipWriter.Header)
      bytesWritten += MemberGzipWriter.Header.length
      deflater.reset(); crc.reset()
      deflater.setInput(bytes); deflater.finish()
      while (!deflater.finished()) {
        val n = deflater.deflate(buf)
        if (n > 0) { out.write(buf, 0, n); bytesWritten += n }
      }
      crc.update(bytes)
      intLE(crc.getValue.toInt); intLE(bytes.length)
      membersWritten += 1
      bytesWritten - start
    }
    /** Release the one native Deflater. Idempotent; does NOT close
      * `out` (the caller owns the file stream). */
    def end(): Unit = if (!ended) { ended = true; deflater.end() }
  }
  object MemberGzipWriter {
    /** RFC 1952 member header: magic, CM=deflate, no flags, MTIME=0
      * (determinism — archive bytes hash stably), XFL=0, OS=255. */
    private[ext] val Header: Array[Byte] = Array(
      0x1f, 0x8b, 0x08, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0xff)
      .map(_.toByte)
  }

  /** Archive (uri, date, payload) rows as `.warc.gz` RESPONSE records —
    * the interchange sink (a fetcher that archives through this writes
    * captures any WARC consumer, this library's own
    * [[graft.sources.WarcDataSource]] included, can split and read):
    * one file per partition, each record its OWN gzip member (the
    * CommonCrawl layout — members are the split unit), framing the
    * writer-twin of [[nextRecord]]: version line, typed headers
    * including the ISO-28500-mandatory `WARC-Record-ID` (a
    * deterministic RFC 4122 version-3-shaped `urn:uuid` derived from
    * md5(uri, date, record ordinal) — globally unique even across
    * duplicate captures, and reproducible re-archives hash stably),
    * Content-Length in BYTES,
    * double-CRLF close. CR/LF are stripped from the uri and date
    * values before they enter the header block — a stray newline in a
    * crawled URI must not corrupt record framing. Record bytes build
    * in codegen column expressions; only the file IO runs in the
    * executor-side sink (Hadoop FS — remote outDirs work; no driver
    * collect; 100-TB shape = one narrow write pass, file count =
    * partition count), through ONE [[MemberGzipWriter]] Deflater per
    * partition. `warcDate` rows should carry ISO-8601 (the spec's
    * format) — written verbatim. */
  /** The sanitized header values + full record bytes as codegen
    * columns — shared by [[writeRecords]] and [[writeRecordsIndexed]]. */
  private def recordColumns(uriCol: String, dateCol: String,
      payloadCol: String, warcType: String,
      httpContentType: String): (Column, Column, Column) =
    recordColumns(uriCol, dateCol, payloadCol, lit(warcType),
      lit(httpContentType), lit(""))

  /** Per-ROW record framing — `warcType`/`httpContentType` columns and
    * a pre-formatted `extraHeaders` block ("Name: value\r\n" lines,
    * caller-sanitized) inserted after WARC-Date: one archive can mix
    * response and revisit records ([[writeRecordsDeduped]]). With
    * empty extras the byte layout is exactly the fixed-header form. */
  private def recordColumns(uriCol: String, dateCol: String,
      payloadCol: String, warcType: Column,
      httpContentType: Column, extraHeaders: Column)
      : (Column, Column, Column) = {
    val payload = col(payloadCol).cast("binary")
    def headerSafe(c: Column): Column =
      regexp_replace(c.cast("string"), "[\\r\\n]", "")
    val uri = headerSafe(col(uriCol))
    val date = headerSafe(col(dateCol))
    // deterministic urn:uuid from md5(uri \n date \n ordinal): the
    // per-record discriminator (partition id << 33 | row ordinal)
    // makes duplicate (uri, date) rows emit DISTINCT Record-IDs, the
    // ISO 28500 global-uniqueness requirement. The ordinal is only
    // reproducible if intra-partition row ORDER is — which a shuffle
    // feeding the sink does not guarantee across task retries or
    // speculative duplicates — so every sink path sorts its partitions
    // by a content digest first ([[determinismKey]]): order becomes a
    // pure function of partition CONTENT, ties are byte-identical rows
    // (any tie permutation emits the same bytes), and a retried
    // attempt re-produces the identical file — the property
    // [[AtomicSink]]'s benign-double-commit argument and
    // [[writeRecordsIndexed]]'s index validity rest on. The version
    // nibble is pinned to 3 (name-based MD5) and the variant to
    // RFC 4122 (10xx) so external consumers see a well-formed UUID,
    // formatted 8-4-4-4-12
    val h = md5(concat(uri, lit("\n"), date, lit("\n"),
      monotonically_increasing_id().cast("string")).cast("binary"))
    val variantNibble = lower(hex(conv(substring(h, 17, 1), 16, 10)
      .cast("int").bitwiseAND(3).bitwiseOR(8)))
    val recordId = concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4),
      concat(lit("3"), substring(h, 14, 3)),
      concat(variantNibble, substring(h, 18, 3)),
      substring(h, 21, 12))
    val rec = concat(
      concat(lit("WARC/1.0\r\nWARC-Type: "), warcType,
        lit("\r\nWARC-Record-ID: <urn:uuid:"), recordId,
        lit(">\r\nWARC-Target-URI: "), uri,
        lit("\r\nWARC-Date: "), date, lit("\r\n"), extraHeaders,
        lit("Content-Type: "), httpContentType,
        lit("\r\nContent-Length: "),
        octet_length(payload).cast("string"),
        lit("\r\n\r\n")).cast("binary"),
      payload, lit("\r\n\r\n").cast("binary"))
    (rec, uri, date)
  }

  /** The sink-side intra-partition sort key: sha1 over every column
    * that reaches the record bytes. Sorting partitions by it before
    * framing makes row order a pure function of partition CONTENT —
    * the determinism task retries and speculative duplicates need
    * (ties under the full-content key are byte-identical rows, so any
    * tie order emits the same bytes). Null parts fold to empty so a
    * null in one column cannot null the whole key and create
    * non-identical ties. Each part hashes separately before the outer
    * hash — bare concatenation would alias ("ab","c")/("a","bc") into
    * a non-identical tie. */
  private def determinismKey(parts: Column*): Column =
    sha1(concat_ws("|", parts.map(c =>
      sha1(coalesce(c.cast("binary"), lit(Array.empty[Byte])))): _*))

  def writeRecords(df: org.apache.spark.sql.DataFrame, uriCol: String,
      dateCol: String, payloadCol: String, outDir: String,
      warcType: String = "response",
      httpContentType: String = "application/http; msgtype=response"): Unit =
    writeRecordsWith(df, uriCol, dateCol, payloadCol, outDir,
      lit(warcType), lit(httpContentType), lit(""))

  /** [[writeRecords]] with PER-ROW type/content-type/extra headers —
    * the mixed-record writer behind [[writeRecordsDeduped]]. */
  private def writeRecordsWith(df: org.apache.spark.sql.DataFrame,
      uriCol: String, dateCol: String, payloadCol: String, outDir: String,
      warcType: Column, httpContentType: Column, extraHeaders: Column): Unit = {
    val (rec, _, _) = recordColumns(uriCol, dateCol, payloadCol, warcType,
      httpContentType, extraHeaders)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    // deterministic intra-partition order under retries/speculation:
    // see [[determinismKey]] — the ordinal inside each Record-ID binds
    // to content, not to nondeterministic shuffle arrival order
    df.sortWithinPartitions(determinismKey(col(uriCol), col(dateCol),
        warcType, httpContentType, extraHeaders, col(payloadCol)))
      .select(rec.as("r")).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val ctx = org.apache.spark.TaskContext.get()
          val dest = new org.apache.hadoop.fs.Path(outDir,
            f"part-${ctx.partitionId()}%05d.warc.gz")
          val fs = dest.getFileSystem(conf.value)
          // temp + rename-on-commit: a speculative duplicate attempt
          // can never interleave with a winner ([[AtomicSink]])
          AtomicSink.writeCommitted(fs, dest, ctx.taskAttemptId()) { tmp =>
            val out = fs.create(tmp, true)
            val w = new MemberGzipWriter(out)
            try it.foreach { row => w.writeMember(row.getAs[Array[Byte]](0)) }
            finally { w.end(); out.close() }
          }
        }
    }
  }

  /** One row per archived record: where its gzip member lives. The
    * CDX-index shape (CommonCrawl publishes exactly this next to every
    * crawl): (path, offset, length) is a byte range any filesystem can
    * serve positioned reads for, so a consumer fetches ONE record from
    * a ~1 GB archive without streaming the file ([[readIndexed]]). */
  final case class WarcIndexRow(path: String, offset: Long, length: Long,
      target_uri: String, warc_date: String)

  /** [[writeRecords]] that ALSO returns the record-level index — the
    * archive and its CDX sidecar from one pass. LAZY like every
    * distributed transform: the `.warc.gz` files are written as the
    * returned index materializes, so persist it immediately
    * (`writeRecordsIndexed(...).write.parquet(idxDir)`); re-evaluation
    * overwrites the same per-partition files deterministically. Member
    * offsets/lengths come from the writer's own byte counter — no
    * second pass over the archive. */
  def writeRecordsIndexed(df: org.apache.spark.sql.DataFrame, uriCol: String,
      dateCol: String, payloadCol: String, outDir: String,
      warcType: String = "response",
      httpContentType: String = "application/http; msgtype=response")
      : Dataset[WarcIndexRow] = {
    val (rec, uri, date) =
      recordColumns(uriCol, dateCol, payloadCol, warcType, httpContentType)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val spark = df.sparkSession
    import spark.implicits._
    // the determinism sort matters doubly here: a speculative loser's
    // commit can replace the winner's file AFTER Spark kept the
    // winner's index rows — byte-identical output keeps those offsets
    // valid ([[determinismKey]])
    df.sortWithinPartitions(determinismKey(col(uriCol), col(dateCol),
        col(payloadCol)))
      .select(rec.as("r"), uri.as("u"), date.as("d"))
      .as[(Array[Byte], String, String)]
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val ctx = org.apache.spark.TaskContext.get()
          val pathStr = new org.apache.hadoop.fs.Path(outDir,
            f"part-${ctx.partitionId()}%05d.warc.gz").toString
          val path = new org.apache.hadoop.fs.Path(pathStr)
          val fs = path.getFileSystem(conf.value)
          // temp + rename: the index names the FINAL path, but bytes
          // land there only via the success-path rename — a failed or
          // speculative-loser attempt never touches it ([[AtomicSink]];
          // failure listeners run before completion listeners)
          val tmp = AtomicSink.tempFor(path, ctx.taskAttemptId())
          val out = fs.create(tmp, true)
          val w = new MemberGzipWriter(out)
          @volatile var failed = false
          ctx.addTaskFailureListener((_, _) => { failed = true })
          ctx.addTaskCompletionListener[Unit] { _ =>
            w.end(); out.close()
            if (failed) AtomicSink.abort(fs, tmp)
            else AtomicSink.commit(fs, tmp, path)
          }
          it.map { case (bytes, u, d) =>
            val off = w.bytesWritten
            val len = w.writeMember(bytes)
            WarcIndexRow(pathStr, off, len, u, d)
          }
        }
      }
  }

  /** URL-level dedup over a CDX index: ONE capture per (normalized)
    * target URI — the NEWEST by WARC-Date (ISO-8601 sorts
    * chronologically as a string), ties broken by (path, offset) so
    * exact-duplicate replays pick deterministically. Metadata-only:
    * the decision runs on the index (one hash aggregation over index
    * rows), and only the winners' byte ranges are ever fetched
    * ([[readIndexed]]) — re-crawled pages cost index rows, not archive
    * IO. `normalize=true` merges tracking-param/case twins through
    * [[UrlOps.normalizeUrl]] (unparseable URIs keep their raw form). */
  def latestCaptures(index: DataFrame, normalize: Boolean = true): DataFrame = {
    val key =
      if (normalize)
        coalesce(UrlOps.normalizeUrl(col("target_uri")), col("target_uri"))
      else col("target_uri")
    index
      .groupBy(key.as("url"))
      .agg(max(struct(col("warc_date"), col("path"), col("offset"),
        col("length"), col("target_uri"))).as("m"))
      .select(col("url"), col("m.path").as("path"),
        col("m.offset").as("offset"), col("m.length").as("length"),
        col("m.target_uri").as("target_uri"),
        col("m.warc_date").as("warc_date"))
  }

  /** Fetch EXACTLY the records an index frame names — positioned reads
    * of each (path, offset, length) byte range, one gzip member each
    * (the CommonCrawl CDX access pattern; works on any Hadoop FS that
    * serves `seek`, which local/HDFS/S3A all do). Rows co-locate per
    * file and sort by offset first, so a partition's reads walk each
    * file forward (sequential-friendly seeks, one open stream per
    * file). Returns the [[WarcRow]] shape with `idx` carrying the BYTE
    * OFFSET (the global record ordinal is a property of a full scan;
    * the offset is the stable identity a random-access consumer has).
    * Cost: ∝ requested records, never archive size — the point. */
  def readIndexed(index: DataFrame): Dataset[WarcRow] =
    readIndexed(index, coLocate = true)

  /** [[readIndexed]] with the path co-location exchange OPTIONAL:
    * `coLocate = false` fetches inside the INPUT's own distribution —
    * only a sort-within-partitions, NO shuffle — for callers whose
    * index frame already sits on a post-aggregation exchange (e.g.
    * [[latestCaptures]]' groupBy output). Each partition still walks
    * every file it touches forward in offset order with one open
    * stream per path-run; the trade is that a file touched from k
    * partitions opens k streams (exactly what split reads do) instead
    * of paying a full extra shuffle of the index rows.
    *
    * COALESCED RANGE READS (the parquet-reader IO shape): within a
    * partition's sorted walk, requested ranges whose gaps are at most
    * `maxGapBytes` merge into ONE positioned read, and the members
    * slice out of the span buffer — a DENSE fetch (most of a file
    * requested, the [[latestCaptures]] case) degenerates to a few big
    * sequential reads instead of one pread + checksum round-trip per
    * record, while a SPARSE fetch (1-in-1000 records of a 100-TB
    * archive) sees gaps far above the tolerance and keeps the
    * cost-∝-requested-records contract: wasted gap bytes per read are
    * bounded by `maxGapBytes`, and spans cap at 64 MiB so a dense run
    * never materializes unbounded memory. */
  def readIndexed(index: DataFrame, coLocate: Boolean,
      maxGapBytes: Long = 256L * 1024): Dataset[WarcRow] = {
    val spark = index.sparkSession
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val maxSpan = 64L * 1024 * 1024
    val sel = index.select(col("path"), col("offset").cast("long"),
      col("length").cast("long"))
    (if (coLocate) sel.repartition(col("path")) else sel)
      .sortWithinPartitions("path", "offset")
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        var curPath: String = null
        var in: org.apache.hadoop.fs.FSDataInputStream = null
        val ctx = org.apache.spark.TaskContext.get()
        ctx.addTaskCompletionListener[Unit] { _ =>
          if (in != null) in.close()
        }
        val rows = it.buffered
        new Iterator[WarcRow] {
          private var pending: Iterator[WarcRow] = Iterator.empty
          // Iterator-contract discipline: hasNext pre-builds the next
          // non-empty batch, so a trailing run of unparseable index
          // entries (corrupt/truncated ranges — parseBytes yields
          // nothing) reports exhaustion instead of a true hasNext
          // followed by a NoSuchElementException from next()
          private def advance(): Unit =
            while (!pending.hasNext && rows.hasNext) {
              // build the next coalesced span: same file, gaps within
              // tolerance, span bounded
              val (p, off0, len0) = rows.next()
              var end = off0 + len0
              val reqs = scala.collection.mutable.ArrayBuffer((off0, len0))
              while (rows.hasNext && rows.head._1 == p &&
                  rows.head._2 <= end + maxGapBytes &&
                  math.max(end, rows.head._2 + rows.head._3) - off0 <= maxSpan) {
                val (_, o, l) = rows.next()
                reqs += ((o, l))
                end = math.max(end, o + l)
              }
              if (p != curPath) {
                if (in != null) in.close()
                val hp = new org.apache.hadoop.fs.Path(p)
                in = hp.getFileSystem(conf.value).open(hp)
                curPath = p
              }
              val span = new Array[Byte]((end - off0).toInt)
              in.readFully(off0, span) // ONE positioned read per span
              pending = reqs.iterator.flatMap { case (o, l) =>
                val buf = java.util.Arrays.copyOfRange(span,
                  (o - off0).toInt, (o - off0 + l).toInt)
                parseBytes(buf).map { r =>
                  WarcRow(p, o, r.header("WARC-Type").getOrElse(""),
                    r.header("WARC-Target-URI").getOrElse(""),
                    r.header("WARC-Date").getOrElse(""),
                    r.header("Content-Type").getOrElse(""),
                    r.contentLength, r.payload)
                }
              }
            }
          override def hasNext: Boolean = { advance(); pending.hasNext }
          override def next(): WarcRow = { advance(); pending.next() }
        }
      }
  }

  /** [[latestCaptures]] + FUSED fetch: decide winners on the index
    * (one metadata aggregation), then fetch their byte ranges INSIDE
    * the decision's own exchange — `readIndexed(coLocate = false)`
    * adds only a sort-within-partitions on top of the groupBy output,
    * one exchange and one job fewer than decide → re-shuffle-by-path →
    * fetch. The dedup key (`url`) is re-derived from each fetched
    * record's own Target-URI through the SAME normalization the
    * decision used (a pure function — no join back to the index).
    * Returns the [[WarcRow]] columns plus `url`. */
  def readLatestCaptures(index: DataFrame, normalize: Boolean = true)
      : DataFrame = {
    // a DEDUPED archive's index (the linkage columns are the witness)
    // routes through revisit resolution — without this, the newest
    // capture of an unchanged page is a payload-FREE revisit record
    // and the "latest capture" served would be an empty body
    if (Seq("payload_digest", "refers_to_uri", "warc_type")
        .forall(index.columns.contains(_)))
      return readLatestCapturesDeduped(index, normalize)
    val winners = latestCaptures(index, normalize)
    val url =
      if (normalize)
        coalesce(UrlOps.normalizeUrl(col("target_uri")), col("target_uri"))
      else col("target_uri")
    readIndexed(winners, coLocate = false).toDF()
      .withColumn("url", url)
  }

  /** Latest-capture serving over a DEDUPED archive
    * ([[writeRecordsDedupedIndexed]]'s index): the newest capture per
    * (normalized) URL wins regardless of record type, and a REVISIT
    * winner serves the bytes of the original it Refers-To — fetched by
    * positioned read and DIGEST-GATED (a fetched original whose sha1
    * does not match the revisit's claimed digest is torn data and
    * DROPS rather than serving wrong bytes — the [[resolveRevisits]]
    * discipline). Returns (url, target_uri, warc_date, payload,
    * was_revisit) where target_uri/warc_date are the WINNER's identity
    * (the "when was this page last seen" answer) and payload is the
    * resolved content.
    *
    * Cost shape: one metadata aggregation for winners + one join ∝
    * revisit-winner count to find originals' ranges + ONE deduplicated
    * positioned-read fetch pass (coalesced ranges) + one (path,
    * offset)-keyed join to re-attach identities. Archive IO ∝ DISTINCT
    * winner payloads — the whole point of the revisit format at a
    * weekly-recrawl cadence. */
  def readLatestCapturesDeduped(index: DataFrame, normalize: Boolean = true)
      : DataFrame =
    readLatestCapturesDeduped(index, index, normalize)

  /** [[readLatestCapturesDeduped]] with the ORIGINALS searched in a
    * (possibly wider) frame than the winner decision: a SITE-scoped
    * slice of a deduped index can hold revisits whose Refers-To names
    * a capture OUTSIDE the slice (cross-site mirrors) — the caller
    * supplies the slice plus the targeted extra rows
    * ([[CdxStore.serveLatestCaptures]] does exactly this). */
  def readLatestCapturesDeduped(index: DataFrame, originalsIndex: DataFrame,
      normalize: Boolean): DataFrame = {
    val key =
      if (normalize)
        coalesce(UrlOps.normalizeUrl(col("target_uri")), col("target_uri"))
      else col("target_uri")
    val winners = index
      .groupBy(key.as("url"))
      .agg(max(struct(col("warc_date"), col("path"), col("offset"),
        col("length"), col("target_uri"), col("warc_type"),
        col("payload_digest"), col("refers_to_uri"), col("refers_to_date")))
        .as("m"))
      .select(col("url"), col("m.*"))
    // originals: response rows keyed by their (uri, date) identity —
    // what a revisit's Refers-To names. Duplicate identities are a
    // data defect; min(range) picks deterministically.
    val originals = originalsIndex.filter(col("warc_type") === "response")
      .groupBy(col("target_uri").as("refers_to_uri"),
        col("warc_date").as("refers_to_date"))
      .agg(min(struct(col("path"), col("offset"), col("length"))).as("o"))
    val respTargets = winners.filter(col("warc_type") === "response")
      .select(col("url"), col("target_uri"), col("warc_date"),
        col("path"), col("offset"), col("length"),
        col("payload_digest").as("__digest"), lit(false).as("was_revisit"))
    val revTargets = winners.filter(col("warc_type") === "revisit")
      .join(originals, Seq("refers_to_uri", "refers_to_date"))
      .select(col("url"), col("target_uri"), col("warc_date"),
        col("o.path").as("path"), col("o.offset").as("offset"),
        col("o.length").as("length"),
        col("payload_digest").as("__digest"), lit(true).as("was_revisit"))
    val targets = respTargets.unionByName(revTargets)
    // fetch each DISTINCT range once (N revisit winners of one
    // original cost one read), identities re-attach by (path, offset)
    val fetched = readIndexed(
        targets.select(col("path"), col("offset"), col("length")).distinct(),
        coLocate = false).toDF()
      .select(col("path"), col("idx").as("offset"), col("payload"))
    targets.join(fetched, Seq("path", "offset"))
      .filter(concat(lit("sha1:"), sha1(col("payload"))) <=> col("__digest"))
      .select(col("url"), col("target_uri"), col("warc_date"),
        col("payload"), col("was_revisit"))
  }

  // -- column-level record parsing (derived-input oracles, captures) ------

  val RecordSchema: StructType = StructType(Seq(
    StructField("version", StringType, nullable = false),
    StructField("headers", MapType(StringType, StringType), nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  final case class WarcRecordsExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(BinaryType)
    override def dataType: DataType = ArrayType(RecordSchema, containsNull = false)
    override def prettyName: String = "graft_warc_records"

    def parseRow(bytes: Array[Byte]): ArrayData =
      new GenericArrayData(parseBytes(bytes).map { r =>
        val ks = r.headers.keys.toArray[Any].map(k => UTF8String.fromString(k.toString): Any)
        val vs = r.headers.values.toArray[Any].map(v => UTF8String.fromString(v.toString): Any)
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(r.version),
          new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs)),
          r.payload)): Any
      }.toArray)

    override def nullSafeEval(input: Any): Any =
      parseRow(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, b => {
        val ref = ctx.addReferenceObj("warc", this, classOf[WarcRecordsExpr].getName)
        s"${ev.value} = $ref.parseRow($b);"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** array<struct<version, headers, payload>> of the blob's records. */
  def records(blob: Column): Column =
    ColumnBridge.column(WarcRecordsExpr(ColumnBridge.expr(blob)))

  // -- HTTP payload splitting (column algebra, no kernel) -----------------

  /** Status code of an HTTP response payload (0 when not HTTP). */
  def httpStatus(payload: Column): Column =
    coalesce(nullif(regexp_extract(
      substring(payload.cast("string"), 1, 64),
      "^HTTP/[0-9.]+ ([0-9]{3})", 1), lit("")).cast("int"), lit(0))

  /** Body of an HTTP response payload: everything after the first blank
    * line (CRLF or LF framing). The whole payload when no header
    * separator exists. */
  def httpBody(payload: Column): Column = {
    val s = payload.cast("string")
    val parts = split(s, "\\r?\\n\\r?\\n", 2)
    coalesce(element_at(parts, 2), s)
  }

  /** Value of one HTTP response header (case-insensitive name; null
    * when absent). Scans only the header section. */
  def httpHeader(payload: Column, name: String): Column = {
    val head = element_at(split(payload.cast("string"), "\\r?\\n\\r?\\n", 2), 1)
    nullif(regexp_extract(head,
      "(?im)^" + java.util.regex.Pattern.quote(name) + "\\s*:\\s*(.*?)\\s*$", 1),
      lit(""))
  }

  /** TRUE when the HTTP response declares an HTML body. The WARC-level
    * `content_type` is `application/http` for EVERY captured response —
    * the media type that matters lives in the HTTP headers, and a 200
    * image/JSON/CSS response must NOT flow into the text extractor. */
  def isHtmlResponse(payload: Column): Column = {
    val ct = lower(coalesce(httpHeader(payload, "Content-Type"), lit("")))
    ct.startsWith("text/html") || ct.startsWith("application/xhtml+xml")
  }

  /** Charset declared by the HTTP response headers (null when absent):
    * the `charset=` parameter of Content-Type, lowercased. Prefer this
    * over the meta tag when both exist (HTTP wins per the HTML spec). */
  def httpCharset(payload: Column): Column =
    lower(nullif(regexp_extract(
      coalesce(httpHeader(payload, "Content-Type"), lit("")),
      "(?i)charset=\"?([A-Za-z0-9_.:-]+)", 1), lit("")))

  /** (path, idx, target_uri, warc_date, html) for the 200 HTML response
    * records of [[read]]'s output — the rows [[Extract.mainText]]
    * consumes. The body decodes under its DECLARED charset (HTTP
    * header, then `<meta charset>` sniffed from a UTF-8 provisional
    * decode, then UTF-8): a Latin-1/Windows-1252 page — still a large
    * crawl fraction — cast blindly as UTF-8 turns every non-ASCII char
    * into U+FFFD before the extractor ever runs. */
  def htmlResponses(records: Dataset[WarcRow]): DataFrame =
    htmlResponses(records, defaultDecoders)

  /** Optional-dependency seam for content codings beyond the JDK-pure
    * set (gzip/deflate): a deployment ships a brotli or zstd library
    * to the executors and wraps it in one of these — the reader
    * plumbing (record gating, de-chunking, charset decode, the
    * exclusion telemetry) is untouched. Must be `Serializable`
    * (instances ride the plan to executors; hold config, not native
    * handles — the [[Multimodal.Codec]] discipline). Deployment recipe
    * (this container has no brotli jar, so the in-repo proof is
    * WarcSpec's stub decoder + exact exclusion counts):
    *  1. ship e.g. the `org.brotli:dec` jar via `--jars`;
    *  2. `object BrotliDecoder extends ContentDecoder {
    *       def encodings = Set("br")
    *       def decode(b) = readAll(new BrotliInputStream(stream(b))) }`;
    *  3. pass it to [[htmlResponses]] — records whose
    *     `Content-Encoding` it claims now decode instead of being
    *     excluded, and the `graft_warc_html` counter shift is the
    *     yield gain, measured not guessed. */
  trait ContentDecoder extends Serializable {
    /** Lowercase content-coding tokens handled, e.g. `Set("br")`. */
    def encodings: Set[String]
    /** Content-decode the (already transfer-decoded) entity bytes. */
    def decode(body: Array[Byte]): Array[Byte]
  }

  /** REAL decoder for `Content-Encoding: zstd` (RFC 8878) through the
    * [[ContentDecoder]] seam — zstd-jni (`com.github.luben:zstd-jni`)
    * is a runtime dependency of Spark itself (shuffle/broadcast
    * codecs), so every executor already carries it: no extra jar to
    * ship, unlike brotli (which stays a documented seam — no pure-Java
    * brotli decoder ships with Spark). Wired as a DEFAULT decoder
    * ([[defaultDecoders]]): zstd-encoded HTML responses decode instead
    * of being excluded. Tolerance follows the [[HttpDecode.gunzip]]
    * contract — truncated stream ⇒ decoded prefix; not zstd at all ⇒
    * original bytes (gate telemetry still counts genuinely
    * undecodable encodings like `br`). */
  object ZstdDecoder extends ContentDecoder {
    def encodings: Set[String] = Set("zstd")
    def decode(body: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(math.max(body.length * 4, 64))
      try {
        val in = new com.github.luben.zstd.ZstdInputStream(
          new ByteArrayInputStream(body))
        try {
          val buf = new Array[Byte](1 << 16)
          var n = in.read(buf)
          while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        } finally in.close()
        out.toByteArray
      } catch {
        // bad magic ⇒ not zstd: pass through; corrupt mid-stream ⇒
        // keep the decoded prefix (a decode must never kill the pass)
        case _: java.io.IOException =>
          if (out.size() > 0) out.toByteArray else body
      }
    }
  }

  /** The decoders every reader applies unless told otherwise: the ones
    * whose libraries are GUARANTEED on a Spark executor's classpath. */
  val defaultDecoders: Seq[ContentDecoder] = Seq(ZstdDecoder)

  /** [[htmlResponses]] with pluggable extra content decoders, and a
    * corpus-governance observation named `graft_warc_html_<n>`
    * attached (UNIQUE per call — Spark rejects duplicate observed-
    * metric names at analysis time, so a fixed name broke any plan
    * composing two reads, e.g. a union over two WARC sources; consumers
    * match on the stable `graft_warc_html` prefix): any action over
    * the result also reports `n_html200` (HTML 200 responses seen) and
    * `n_excluded_encoding` (of those, records DROPPED because no
    * decoder — built-in or supplied — handles their
    * `Content-Encoding`). Surfaced through
    * [[graft.engine.Telemetry]]'s listener, so a 100-TB pass sees
    * "br/zstd cost us N documents" as a number, not a silent corpus
    * loss. Extra-decoder rows pay one closure call on the RARE branch
    * only; the built-in encodings keep the codegen kernel path. */
  val HtmlObservationPrefix = "graft_warc_html"
  private val obsCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  def htmlResponses(records: Dataset[WarcRow],
      decoders: Seq[ContentDecoder]): DataFrame = {
    val decMap: Map[String, ContentDecoder] =
      decoders.flatMap(d => d.encodings.map(_.toLowerCase -> d)).toMap
    val enc = trim(lower(coalesce(
      httpHeader(col("payload"), "Content-Encoding"), lit("identity"))))
    val extraHandled =
      if (decMap.isEmpty) lit(false)
      else enc.isin(decMap.keys.toSeq: _*)
    val handled = isDecodableEncoding(col("payload")) || extraHandled
    val html200 = records.toDF()
      .filter(col("warc_type") === "response" &&
        httpStatus(col("payload")) === 200 &&
        col("content_type").startsWith("application/http") &&
        isHtmlResponse(col("payload")))
      .observe(s"${HtmlObservationPrefix}_${obsCounter.incrementAndGet()}",
        count(lit(1)).as("n_html200"),
        sum(when(handled, 0L).otherwise(1L)).as("n_excluded_encoding"))
    // ONE fused decode kernel per row — de-chunk, inflate, supplied
    // decoders, charset pick, decode ([[httpBodyText]])
    html200.filter(handled)
      .withColumn("html", httpBodyText(col("payload"), decoders))
      .select("path", "idx", "target_uri", "warc_date", "html")
  }

  /** The WET (extracted-text) sibling of [[htmlResponses]]: CommonCrawl
    * ships each crawl three ways, and the `*.warc.wet.gz` files carry
    * `WARC-Type: conversion` records whose payload is the ALREADY
    * extracted plain text, UTF-8 by the WET convention (ISO 28500
    * conversion records; no HTTP envelope, so there is no transfer/
    * content coding or charset negotiation layer here). A pipeline that
    * starts from WET skips [[Extract]] entirely — this is the cheap
    * on-ramp when fidelity to the original markup does not matter.
    * Returns (path, idx, target_uri, warc_date, text); warcinfo and
    * metadata records are filtered out. */
  def wetTexts(records: Dataset[WarcRow]): DataFrame =
    records.toDF()
      .filter(col("warc_type") === "conversion" &&
        col("content_type").startsWith("text/plain"))
      .select(col("path"), col("idx"), col("target_uri"), col("warc_date"),
        decodeCharset(col("payload"), lit("utf-8")).as("text"))

  /** Archive (uri, date, text) rows as `.warc.gz` CONVERSION records —
    * the WET writer, [[wetTexts]]' sink twin (CommonCrawl distributes
    * extracted text exactly so: WARC-Type `conversion`, `text/plain`
    * payload, one gzip member per record). UTF-8 payload bytes; same
    * framing, Record-ID, and one-Deflater-per-partition discipline as
    * [[writeRecords]]. A pipeline that extracts text at crawl time and
    * ships WET relieves every downstream consumer of the HTML parse. */
  def writeWet(df: org.apache.spark.sql.DataFrame, uriCol: String,
      dateCol: String, textCol: String, outDir: String): Unit =
    writeRecords(
      df.withColumn("__wet_payload",
        coalesce(col(textCol), lit("")).cast("string").cast("binary")),
      uriCol, dateCol, "__wet_payload", outDir,
      warcType = "conversion", httpContentType = "text/plain")

  // -- revisit records (ISO 28500 identical-payload-digest dedup) ----------

  /** [[writeRecords]] with PAYLOAD-DIGEST DEDUP — the ISO 28500
    * `revisit` mechanism every production crawler (Heritrix,
    * Browsertrix) uses to keep recrawls of unchanged content from
    * multiplying archive bytes: one capture per distinct payload
    * digest stores the full `response` record (winner = smallest
    * (date, uri) — the earliest capture); every other capture stores a
    * payload-FREE `revisit` record carrying `WARC-Profile:
    * …/revisit/identical-payload-digest`, the `WARC-Payload-Digest`
    * (sha1 hex), and `WARC-Refers-To-Target-URI`/`-Date` naming its
    * original. At a weekly-recrawl cadence where most of the web does
    * not change, the archive grows with the CHANGE RATE instead of the
    * crawl rate. Scale shape: ONE hash aggregation keyed by digest
    * (map-side partials over 20-byte digests) + one digest-keyed join
    * to mark winners — the same exchange bill as exact dedup (x1);
    * record bytes still build in codegen and land through the
    * committed sink. Read back with [[readDeduped]] +
    * [[resolveRevisits]]. */
  /** The digest-dedup decision frame shared by [[writeRecordsDeduped]]
    * and [[writeRecordsDedupedIndexed]]: rows marked with winner-ship
    * (`__isw`), the winner's identity (`__wu`/`__wd` — what revisits
    * Refer-To), the payload-or-empty column, and the per-row
    * (warcType, contentType, extraHeaders) framing columns. */
  private def dedupMarked(df: org.apache.spark.sql.DataFrame, uriCol: String,
      dateCol: String, payloadCol: String, httpContentType: String)
      : (org.apache.spark.sql.DataFrame, Column, Column, Column) = {
    def hs(c: Column): Column = regexp_replace(c, "[\\r\\n]", "")
    val w = df.select(col(uriCol).cast("string").as("__u"),
        col(dateCol).cast("string").as("__d"),
        col(payloadCol).cast("binary").as("__p"))
      .withColumn("__digest", concat(lit("sha1:"), sha1(col("__p"))))
    val winners = w.groupBy("__digest")
      .agg(min(struct(col("__d"), col("__u"))).as("__w"))
      .select(col("__digest"), col("__w.__d").as("__wd"),
        col("__w.__u").as("__wu"))
    val marked = w.join(winners, Seq("__digest"))
      .withColumn("__isw",
        col("__d") === col("__wd") && col("__u") === col("__wu"))
      .withColumn("__pay", when(col("__isw"), col("__p"))
        .otherwise(lit(Array.empty[Byte])))
    val extras = when(col("__isw"),
        concat(lit("WARC-Payload-Digest: "), col("__digest"), lit("\r\n")))
      .otherwise(concat(
        lit("WARC-Profile: http://netpreserve.org/warc/1.0/revisit/identical-payload-digest\r\n" +
          "WARC-Payload-Digest: "), col("__digest"),
        lit("\r\nWARC-Refers-To-Target-URI: "), hs(col("__wu")),
        lit("\r\nWARC-Refers-To-Date: "), hs(col("__wd")), lit("\r\n")))
    (marked,
      when(col("__isw"), lit("response")).otherwise(lit("revisit")),
      when(col("__isw"), lit(httpContentType)).otherwise(lit("warc/revisit")),
      extras)
  }

  def writeRecordsDeduped(df: org.apache.spark.sql.DataFrame, uriCol: String,
      dateCol: String, payloadCol: String, outDir: String,
      httpContentType: String = "application/http; msgtype=response"): Unit = {
    val (marked, warcType, cType, extras) =
      dedupMarked(df, uriCol, dateCol, payloadCol, httpContentType)
    writeRecordsWith(marked, "__u", "__d", "__pay", outDir,
      warcType, cType, extras)
  }

  /** One row per record of a DEDUPED archive: the byte range PLUS the
    * revisit linkage — what [[readLatestCapturesDeduped]] resolves
    * winners through without touching the archive. `payload_digest`
    * is set on every row (response and revisit); `refers_to_*` only on
    * revisits (empty otherwise). */
  final case class WarcDedupIndexRow(path: String, offset: Long, length: Long,
      target_uri: String, warc_date: String, warc_type: String,
      payload_digest: String, refers_to_uri: String, refers_to_date: String)

  /** [[writeRecordsDeduped]] + the CDX sidecar from one pass — the
    * [[writeRecordsIndexed]] twin over the revisit mechanism (same
    * member-byte-counter offsets, same lazy contract: persist the
    * returned index immediately). The index carries the LINKAGE
    * columns, so latest-capture serving over the deduped archive is a
    * metadata decision + positioned reads ([[readLatestCapturesDeduped]])
    * — without it, the two r15/r16 features did not compose: a plain
    * [[latestCaptures]] over a deduped archive's index picks a
    * payload-FREE revisit as the winner and serves an empty body. */
  def writeRecordsDedupedIndexed(df: org.apache.spark.sql.DataFrame,
      uriCol: String, dateCol: String, payloadCol: String, outDir: String,
      httpContentType: String = "application/http; msgtype=response")
      : Dataset[WarcDedupIndexRow] = {
    val (marked, warcType, cType, extras) =
      dedupMarked(df, uriCol, dateCol, payloadCol, httpContentType)
    val (rec, uri, date) =
      recordColumns("__u", "__d", "__pay", warcType, cType, extras)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val spark = df.sparkSession
    import spark.implicits._
    marked.sortWithinPartitions(determinismKey(col("__u"), col("__d"),
        warcType, cType, extras, col("__pay")))
      .select(rec.as("r"), uri.as("u"), date.as("d"), warcType.as("t"),
        col("__digest").as("g"),
        when(col("__isw"), lit("")).otherwise(col("__wu")).as("ru"),
        when(col("__isw"), lit("")).otherwise(col("__wd")).as("rd"))
      .as[(Array[Byte], String, String, String, String, String, String)]
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val ctx = org.apache.spark.TaskContext.get()
          val pathStr = new org.apache.hadoop.fs.Path(outDir,
            f"part-${ctx.partitionId()}%05d.warc.gz").toString
          val path = new org.apache.hadoop.fs.Path(pathStr)
          val fs = path.getFileSystem(conf.value)
          val tmp = AtomicSink.tempFor(path, ctx.taskAttemptId())
          val out = fs.create(tmp, true)
          val w = new MemberGzipWriter(out)
          @volatile var failed = false
          ctx.addTaskFailureListener((_, _) => { failed = true })
          ctx.addTaskCompletionListener[Unit] { _ =>
            w.end(); out.close()
            if (failed) AtomicSink.abort(fs, tmp)
            else AtomicSink.commit(fs, tmp, path)
          }
          it.map { case (bytes, u, d, t, g, ru, rd) =>
            val off = w.bytesWritten
            val len = w.writeMember(bytes)
            WarcDedupIndexRow(pathStr, off, len, u, d, t, g, ru, rd)
          }
        }
      }
  }

  /** INCREMENTAL digest-dedup archiving — the cross-BATCH form of
    * [[writeRecordsDedupedIndexed]]: a weekly recrawl arrives as a
    * stream of batches, and content unchanged since ANY earlier batch
    * must store as a payload-free revisit of the ORIGINAL capture, not
    * as a fresh response per batch. The memory between batches is a
    * bucketed DIGEST STORE (digest → the original's (uri, date) —
    * ~60 bytes/distinct payload; the seen-store machinery: crash-safe
    * compaction, recovery-aware guards, anti-joined appends so replay
    * is a no-op):
    *
    *  1. batch rows join the store on digest (store side scans in
    *     bucket layout — only the batch shuffles): a HIT becomes a
    *     revisit referring to the STORED original;
    *  2. misses elect a within-batch winner per digest (the
    *     [[dedupMarked]] decision) — the winner stores full bytes,
    *     its batch-mates revisit it;
    *  3. the new (digest, winner) pairs fold into the store
    *     (anti-joined append — a replayed batch folds nothing).
    *
    * Returns the batch's linkage index ([[WarcDedupIndexRow]] — feed
    * it to a [[CdxStore]] with a urlkey column and the whole archive
    * serves through [[readLatestCapturesDeduped]]). EAGER, unlike the
    * lazy single-shot writer: the store fold must happen exactly once
    * per batch, so the index materializes (localCheckpoint) before
    * this returns — persist it from the returned frame. `outDir` must
    * be BATCH-UNIQUE (`…/batch_id=N` — the sidecar convention): file
    * names are per-partition, so two batches sharing a directory would
    * overwrite each other. `batchId` identifies the batch ACROSS
    * RETRIES: the store records which batch folded each digest, and
    * the join excludes the current batch's own fold — so a REPLAY
    * sees exactly the pre-batch view and re-produces byte-identical
    * files (without this, a replayed batch's own digests would turn
    * its new content into self-referential revisits whose full bytes
    * exist nowhere — WarcSpec pins the replay byte-identity).
    *
    * 100-TB shape: one digest hash-agg + one digest-keyed join per
    * batch (both ∝ batch), one store-side bucket-layout scan, archive
    * bytes ∝ NEW content — the archive grows with the change rate
    * across the whole crawl history, not per batch. */
  def writeRecordsDedupedIncremental(df: org.apache.spark.sql.DataFrame,
      uriCol: String, dateCol: String, payloadCol: String, outDir: String,
      digestTable: String, batchId: Long, buckets: Int = 32,
      httpContentType: String = "application/http; msgtype=response")
      : Dataset[WarcDedupIndexRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    def hs(c: Column): Column = regexp_replace(c, "[\\r\\n]", "")
    val w = df.select(col(uriCol).cast("string").as("__u"),
        col(dateCol).cast("string").as("__d"),
        col(payloadCol).cast("binary").as("__p"))
      .withColumn("__digest", concat(lit("sha1:"), sha1(col("__p"))))
    val storeExists = graft.store.Bucketing.recoverCompacted(spark, digestTable)
    // stored originals: digest → the capture every future revisit
    // names. Bare-attribute equi key == the bucket column, so the
    // store scans Exchange-free and only the batch shuffles.
    // the store view EXCLUDES this batch's own fold: a REPLAYED batch
    // must see exactly what the first attempt saw — otherwise its own
    // previously-folded digests turn its new content into
    // self-referential revisits whose full bytes exist nowhere (data
    // loss under an overwrite-style retry)
    val known =
      if (storeExists)
        spark.table(digestTable)
          .filter(col("batch_id") =!= batchId)
          .select(col("__digest"), col("orig_uri").as("__su"),
            col("orig_date").as("__sd"))
      else w.limit(0).select(col("__digest"),
        col("__u").as("__su"), col("__d").as("__sd"))
    val joined = w.join(known, Seq("__digest"), "left")
    // within-batch winners among store MISSES only
    val newWinners = joined.filter(col("__su").isNull)
      .groupBy("__digest")
      .agg(min(struct(col("__d"), col("__u"))).as("__w"))
      .select(col("__digest"), col("__w.__d").as("__nd"),
        col("__w.__u").as("__nu"))
    val marked = joined.join(newWinners, Seq("__digest"), "left")
      .withColumn("__wu", coalesce(col("__su"), col("__nu")))
      .withColumn("__wd", coalesce(col("__sd"), col("__nd")))
      .withColumn("__isw", col("__su").isNull &&
        col("__d") === col("__wd") && col("__u") === col("__wu"))
      .withColumn("__pay", when(col("__isw"), col("__p"))
        .otherwise(lit(Array.empty[Byte])))
    val warcType = when(col("__isw"), lit("response")).otherwise(lit("revisit"))
    val cType = when(col("__isw"), lit(httpContentType))
      .otherwise(lit("warc/revisit"))
    val extras = when(col("__isw"),
        concat(lit("WARC-Payload-Digest: "), col("__digest"), lit("\r\n")))
      .otherwise(concat(
        lit("WARC-Profile: http://netpreserve.org/warc/1.0/revisit/identical-payload-digest\r\n" +
          "WARC-Payload-Digest: "), col("__digest"),
        lit("\r\nWARC-Refers-To-Target-URI: "), hs(col("__wu")),
        lit("\r\nWARC-Refers-To-Date: "), hs(col("__wd")), lit("\r\n")))
    val (rec, uri, date) =
      recordColumns("__u", "__d", "__pay", warcType, cType, extras)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val index = marked.sortWithinPartitions(determinismKey(col("__u"),
        col("__d"), warcType, cType, extras, col("__pay")))
      .select(rec.as("r"), uri.as("u"), date.as("d"), warcType.as("t"),
        col("__digest").as("g"),
        when(col("__isw"), lit("")).otherwise(col("__wu")).as("ru"),
        when(col("__isw"), lit("")).otherwise(col("__wd")).as("rd"))
      .as[(Array[Byte], String, String, String, String, String, String)]
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val ctx = org.apache.spark.TaskContext.get()
          val pathStr = new org.apache.hadoop.fs.Path(outDir,
            f"part-${ctx.partitionId()}%05d.warc.gz").toString
          val path = new org.apache.hadoop.fs.Path(pathStr)
          val fs = path.getFileSystem(conf.value)
          val tmp = AtomicSink.tempFor(path, ctx.taskAttemptId())
          val out = fs.create(tmp, true)
          val wz = new MemberGzipWriter(out)
          @volatile var failed = false
          ctx.addTaskFailureListener((_, _) => { failed = true })
          ctx.addTaskCompletionListener[Unit] { _ =>
            wz.end(); out.close()
            if (failed) AtomicSink.abort(fs, tmp)
            else AtomicSink.commit(fs, tmp, path)
          }
          it.map { case (bytes, u, d, t, g, ru, rd) =>
            val off = wz.bytesWritten
            val len = wz.writeMember(bytes)
            WarcDedupIndexRow(pathStr, off, len, u, d, t, g, ru, rd)
          }
        }
      }
      .localCheckpoint(true) // archive written NOW; fold exactly once
    // fold the NEW digests into the store (anti-joined — replay no-op).
    // dropDuplicates: EXACT duplicate (uri, date, payload) input rows
    // each satisfy __isw, so without it the same digest would enter the
    // store once per copy and every later batch's left join on __digest
    // would multiply matching rows (duplicated revisits in the archive
    // until compaction's distinct ran). The copies are identical in
    // every column, so keeping one is deterministic.
    val newDigests = index.toDF().filter(col("warc_type") === "response")
      .select(col("payload_digest").as("__digest"),
        col("target_uri").as("orig_uri"), col("warc_date").as("orig_date"),
        lit(batchId).as("batch_id"))
      .dropDuplicates("__digest")
    if (!storeExists) {
      graft.store.Bucketing.dropWithLocation(spark, digestTable)
      newDigests.repartition(buckets, col("__digest"))
        .write.mode("overwrite")
        .bucketBy(buckets, "__digest").sortBy("__digest")
        .format("parquet").saveAsTable(digestTable)
    } else {
      val fresh = newDigests.join(spark.table(digestTable)
        .select("__digest"), Seq("__digest"), "left_anti")
      if (!fresh.isEmpty)
        fresh.repartition(buckets, col("__digest"))
          .write.mode("append")
          .bucketBy(buckets, "__digest").sortBy("__digest")
          .format("parquet").saveAsTable(digestTable)
    }
    index
  }

  /** Fold the digest store's per-batch append files back to one per
    * bucket (the seen-store cadence; crash-safe swap). */
  def compactDigestStore(spark: SparkSession, digestTable: String,
      buckets: Int = 32): Unit =
    graft.store.Bucketing.compactSwap(spark, digestTable) { tmp =>
      spark.table(digestTable).distinct()
        .repartition(buckets, col("__digest"))
        .write.mode("overwrite")
        .bucketBy(buckets, "__digest").sortBy("__digest")
        .format("parquet").saveAsTable(tmp)
    }

  /** RETENTION GC for the digest store — the archival-integrity twin
    * of `Dedup.deleteFromBandStore`: when archive segments age out
    * (originals captured before `olderThan` deleted by the archive's
    * own retention), their digests MUST leave the store too, or the
    * next recrawl of that content would emit a revisit whose
    * Refers-To names bytes that no longer exist anywhere (a dangling
    * revisit = silent data loss). Post-GC, recrawled content re-enters
    * as a fresh RESPONSE and later recaptures refer to THAT original.
    *
    * `olderThan` is an ISO-8601 instant (chronological as a string) —
    * compared against each digest's `orig_date`, i.e. the capture date
    * of the ORIGINAL a revisit would name, exactly the row the archive
    * retention deleted. Crash-safe compactSwap rewrite; one
    * bucket-preserving pass, cost ∝ store. */
  def gcDigestStore(spark: SparkSession, digestTable: String,
      olderThan: String, buckets: Int = 32): Unit =
    graft.store.Bucketing.compactSwap(spark, digestTable) { tmp =>
      spark.table(digestTable).distinct()
        .filter(col("orig_date") >= lit(olderThan))
        .repartition(buckets, col("__digest"))
        .write.mode("overwrite")
        .bucketBy(buckets, "__digest").sortBy("__digest")
        .format("parquet").saveAsTable(tmp)
    }

  /** A deduped archive's rows WITH the revisit linkage headers:
    * [[WarcRow]]'s columns plus (payload_digest, refers_to_uri,
    * refers_to_date) — what [[resolveRevisits]] joins on. Same
    * per-file streaming pass as [[read]]. */
  final case class WarcDedupRow(path: String, idx: Long, warc_type: String,
      target_uri: String, warc_date: String, content_type: String,
      payload: Array[Byte], payload_digest: String,
      refers_to_uri: String, refers_to_date: String)

  def readDeduped(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val pat = new org.apache.hadoop.fs.Path(glob)
    val fs = pat.getFileSystem(conf.value)
    val paths = Option(fs.globStatus(pat)).getOrElse(Array.empty)
      .filter(_.isFile).map(_.getPath.toString).sorted.toSeq
    spark.createDataset(paths).repartition(math.max(paths.size, 1))
      .mapPartitions { it =>
        it.flatMap { p =>
          val path = new org.apache.hadoop.fs.Path(p)
          val in = path.getFileSystem(conf.value).open(path)
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => in.close()))
          parseStream(in).zipWithIndex.map { case (r, i) =>
            WarcDedupRow(p, i.toLong,
              r.header("WARC-Type").getOrElse(""),
              r.header("WARC-Target-URI").getOrElse(""),
              r.header("WARC-Date").getOrElse(""),
              r.header("Content-Type").getOrElse(""),
              r.payload,
              r.header("WARC-Payload-Digest").getOrElse(""),
              r.header("WARC-Refers-To-Target-URI").getOrElse(""),
              r.header("WARC-Refers-To-Date").getOrElse(""))
          }
        }
      }.toDF()
  }

  /** The LOGICAL capture view of a deduped archive: every response as
    * itself, every revisit with its payload FILLED from the original
    * it names — gated by a digest check (a revisit whose referenced
    * record's sha1 does not match its claimed digest is torn data and
    * DROPS rather than serving wrong bytes). Returns (target_uri,
    * warc_date, payload, was_revisit). One join keyed by the
    * (refers-to-uri, refers-to-date) identity — cost ∝ revisit count,
    * the point of the format. */
  def resolveRevisits(rows: DataFrame): DataFrame = {
    val resp = rows.filter(col("warc_type") === "response")
    // duplicate (uri, date) originals are a data defect but must not
    // duplicate revisits through the join: deterministic max(payload)
    val originals = resp.groupBy(
        col("target_uri").as("refers_to_uri"),
        col("warc_date").as("refers_to_date"))
      .agg(max(col("payload")).as("__orig"))
    val revisits = rows.filter(col("warc_type") === "revisit")
      .join(originals, Seq("refers_to_uri", "refers_to_date"))
      .filter(concat(lit("sha1:"), sha1(col("__orig"))) === col("payload_digest"))
      .select(col("target_uri"), col("warc_date"),
        col("__orig").as("payload"), lit(true).as("was_revisit"))
    resp.select(col("target_uri"), col("warc_date"), col("payload"),
        lit(false).as("was_revisit"))
      .unionByName(revisits)
  }

  // -- WAT metadata sidecar (the CommonCrawl trio's third artifact) --------

  /** WAT envelope rows derived from RESPONSE records: one row per
    * response carrying (target_uri, warc_date, status, mime, title,
    * links) — HTTP status and Content-Type from the header section,
    * and for decodable HTML bodies the `<title>` plus the
    * RFC-3986-resolved out-link urls in document order (non-HTML and
    * undecodable-encoding rows keep an empty title/links — every
    * response still gets its envelope, the WAT contract). All column
    * algebra over the SHARED kernels — the fused body-decode
    * ([[httpBodyText]]) runs once per HTML row, the link kernel
    * ([[Extract.resolvedLinks]]) once, no UDFs. */
  def watMetadata(records: Dataset[WarcRow],
      decoders: Seq[ContentDecoder] = defaultDecoders): DataFrame = {
    val decMap = decoders.flatMap(d => d.encodings.map(_.toLowerCase)).distinct
    val enc = trim(lower(coalesce(
      httpHeader(col("payload"), "Content-Encoding"), lit("identity"))))
    val handled = isDecodableEncoding(col("payload")) ||
      (if (decMap.isEmpty) lit(false) else enc.isin(decMap: _*))
    records.toDF()
      .filter(col("warc_type") === "response" &&
        col("content_type").startsWith("application/http"))
      .withColumn("__html",
        when(isHtmlResponse(col("payload")) && handled,
          httpBodyText(col("payload"), decoders)))
      .select(col("target_uri"), col("warc_date"),
        httpStatus(col("payload")).as("status"),
        coalesce(httpHeader(col("payload"), "Content-Type"), lit(""))
          .as("mime"),
        coalesce(when(col("__html").isNotNull, Extract.title(col("__html"))),
          lit("")).as("title"),
        coalesce(
          when(col("__html").isNotNull, transform(
            Extract.resolvedLinks(col("__html"), col("target_uri")),
            _.getField("url"))),
          array().cast("array<string>")).as("links"))
  }

  /** Archive [[watMetadata]] envelopes as `.warc.gz` METADATA records —
    * the WAT writer (CommonCrawl publishes exactly this next to every
    * crawl: WARC-Type `metadata`, JSON payload, ~1/5 the bytes of the
    * response archive — what link-graph builds and seed mining read
    * instead of the full capture). The envelope JSON follows the
    * public WAT convention (Envelope → WARC-Header-Metadata +
    * Payload-Metadata → HTTP-Response-Metadata → HTML-Metadata →
    * Links), trimmed to the consumed fields, built by ONE codegen
    * `to_json`; framing/Record-ID/commit discipline is
    * [[writeRecords]]'. */
  def writeWatRecords(records: Dataset[WarcRow], outDir: String,
      decoders: Seq[ContentDecoder] = defaultDecoders): Unit = {
    val payload = to_json(struct(struct(
      struct(col("target_uri").as("WARC-Target-URI"),
        col("warc_date").as("WARC-Date")).as("WARC-Header-Metadata"),
      struct(struct(
        struct(col("status").as("Status")).as("Response-Message"),
        struct(col("mime").as("Content-Type")).as("Headers"),
        struct(struct(col("title").as("Title")).as("Head"),
          transform(col("links"), u => struct(u.as("url"))).as("Links"))
          .as("HTML-Metadata")).as("HTTP-Response-Metadata"))
        .as("Payload-Metadata")).as("Envelope")))
    writeRecords(
      watMetadata(records, decoders).withColumn("__wat", payload.cast("binary")),
      "target_uri", "warc_date", "__wat", outDir,
      warcType = "metadata", httpContentType = "application/json")
  }

  /** The trimmed WAT envelope schema [[watEnvelopes]] parses. */
  val WatSchema: StructType = {
    def st(fs: (String, DataType)*): StructType =
      StructType(fs.map { case (n, t) => StructField(n, t) })
    st("Envelope" -> st(
      "WARC-Header-Metadata" -> st(
        "WARC-Target-URI" -> StringType, "WARC-Date" -> StringType),
      "Payload-Metadata" -> st(
        "HTTP-Response-Metadata" -> st(
          "Response-Message" -> st("Status" -> org.apache.spark.sql.types.IntegerType),
          "Headers" -> st("Content-Type" -> StringType),
          "HTML-Metadata" -> st(
            "Head" -> st("Title" -> StringType),
            "Links" -> ArrayType(st("url" -> StringType)))))))
  }

  /** Read WAT archives back to envelope rows — the inverse of
    * [[writeWatRecords]]: (path, idx, target_uri, warc_date, status,
    * mime, title, links). One `from_json` over the metadata records;
    * foreign WAT files parse too (missing envelope fields land null). */
  def watEnvelopes(records: Dataset[WarcRow]): DataFrame = {
    val w = from_json(col("payload").cast("string"), WatSchema)
      .getField("Envelope")
    val hm = w.getField("WARC-Header-Metadata")
    val rm = w.getField("Payload-Metadata").getField("HTTP-Response-Metadata")
    records.toDF()
      .filter(col("warc_type") === "metadata" &&
        col("content_type").startsWith("application/json"))
      .select(col("path"), col("idx"),
        hm.getField("WARC-Target-URI").as("target_uri"),
        hm.getField("WARC-Date").as("warc_date"),
        rm.getField("Response-Message").getField("Status").as("status"),
        rm.getField("Headers").getField("Content-Type").as("mime"),
        rm.getField("HTML-Metadata").getField("Head").getField("Title")
          .as("title"),
        coalesce(transform(rm.getField("HTML-Metadata").getField("Links"),
            _.getField("url")),
          array().cast("array<string>")).as("links"))
  }

  /** TRUE when the response's Content-Encoding (if any) is one this
    * layer can decode — identity, gzip/x-gzip, deflate. A brotli/zstd
    * body would flow downstream as compressed bytes and mojibake the
    * extractor, so [[htmlResponses]] filters such records OUT rather
    * than silently polluting the corpus. */
  def isDecodableEncoding(payload: Column): Column =
    trim(lower(coalesce(httpHeader(payload, "Content-Encoding"), lit("identity"))))
      .isin("identity", "none", "gzip", "x-gzip", "deflate")

  /** HTTP body as BYTES (everything after the first blank line): the
    * charset-correct twin of [[httpBody]] — splitting after a string
    * cast would already have corrupted non-UTF-8 bytes. */
  def httpBodyBytes(payload: Column): Column =
    ColumnBridge.column(HttpBodyBytesExpr(ColumnBridge.expr(payload)))

  /** HTTP body bytes with TRANSFER and CONTENT decoding applied —
    * what a real CommonCrawl capture needs before charset decode:
    * response records preserve on-the-wire bytes, and a meaningful
    * fraction of captures is `Transfer-Encoding: chunked` (hex
    * chunk-size framing lines interleave the entity) and/or
    * `Content-Encoding: gzip|deflate` (the entity is a compressed
    * stream). Order per RFC 9112: de-chunk first (transfer framing
    * wraps the content-coded entity), then inflate. JDK-pure
    * (`GZIPInputStream`/`Inflater` — the multi-member gzip plumbing of
    * [[parseStream]] is the precedent); zlib-wrapped AND raw deflate
    * both accepted (real servers ship both under the same label).
    *
    * Tolerance contract (a decode must never kill a 100-TB pass): a
    * body whose first chunk-size line does not parse is returned
    * UNDECODED (the header lied — the body was never chunked); a
    * truncated chunk or compressed stream yields the decoded PREFIX;
    * an encoding this layer cannot decode (br, zstd) passes through
    * as-is — gate those records out with [[isDecodableEncoding]]. */
  def httpDecodedBodyBytes(payload: Column): Column =
    ColumnBridge.column(HttpBodyBytesExpr(ColumnBridge.expr(payload), decode = true))

  final case class HttpBodyBytesExpr(child: Expression, decode: Boolean = false)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(BinaryType)
    override def dataType: DataType = BinaryType
    override def prettyName: String =
      if (decode) "graft_http_decoded_body_bytes" else "graft_http_body_bytes"

    def bodyOf(bytes: Array[Byte]): Array[Byte] = {
      // first CRLFCRLF or LFLF — scanning bytes, charset-agnostic for
      // the ASCII-compatible encodings HTTP headers are written in
      var i = 0
      val n = bytes.length
      while (i < n) {
        if (bytes(i) == '\n') {
          var j = i + 1
          if (j < n && bytes(j) == '\r') j += 1
          if (j < n && bytes(j) == '\n') {
            val body = java.util.Arrays.copyOfRange(bytes, j + 1, n)
            return if (decode) HttpDecode.decodeBody(bytes, i, body) else body
          }
        }
        i += 1
      }
      bytes
    }

    override def nullSafeEval(input: Any): Any =
      bodyOf(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, b => {
        val ref = ctx.addReferenceObj("httpbody", this, classOf[HttpBodyBytesExpr].getName)
        s"${ev.value} = $ref.bodyOf($b);"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Byte-level HTTP transfer/content decoding (shared by the column
    * kernel and any direct caller). Header names scan as ISO-8859-1 —
    * HTTP headers are ASCII-compatible by spec. */
  private[ext] object HttpDecode {

    /** `body` is the raw bytes after the header separator whose final
      * LF sits at `sepLf` (inside `payload`). Applies Transfer-Encoding
      * de-chunking then Content-Encoding inflation per the tolerance
      * contract of [[httpDecodedBodyBytes]]. */
    def decodeBody(payload: Array[Byte], sepLf: Int, body: Array[Byte]): Array[Byte] = {
      val head = new String(payload, 0, math.max(sepLf, 0),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val te = headerValue(head, "Transfer-Encoding").toLowerCase
      var b = body
      if (te.contains("chunked")) b = dechunk(b)
      // a rare-but-legal `Transfer-Encoding: gzip, chunked` compresses
      // at the transfer layer too — same codecs, applied after de-chunk
      if (te.contains("gzip")) b = gunzip(b)
      else if (te.contains("deflate")) b = inflate(b)
      headerValue(head, "Content-Encoding").trim.toLowerCase match {
        case "gzip" | "x-gzip" => gunzip(b)
        case "deflate" => inflate(b)
        case _ => b // identity / absent / undecodable: pass through
      }
    }

    private def headerValue(head: String, name: String): String = {
      val m = java.util.regex.Pattern
        .compile("(?im)^" + java.util.regex.Pattern.quote(name) + "\\s*:\\s*(.*?)\\s*$")
        .matcher(head)
      if (m.find()) m.group(1) else ""
    }

    /** RFC 9112 §7.1 chunked framing: `hex-size[;ext]CRLF data CRLF`
      * repeated, terminated by a zero-size chunk (trailers ignored).
      * Malformed first size line ⇒ the body was never chunked — return
      * it untouched; truncation mid-chunk ⇒ decoded prefix. */
    def dechunk(b: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(b.length)
      var i = 0
      var any = false
      var done = false
      while (!done && i < b.length) {
        // read the size line (up to LF; tolerate bare-LF framing)
        val lineStart = i
        while (i < b.length && b(i) != '\n') i += 1
        val lineEnd = if (i > lineStart && b(i - 1) == '\r') i - 1 else i
        val line = new String(b, lineStart, lineEnd - lineStart,
          java.nio.charset.StandardCharsets.ISO_8859_1)
        i += 1 // past the LF (or EOF)
        val semi = line.indexOf(';')
        val hexStr = (if (semi >= 0) line.substring(0, semi) else line).trim
        val size =
          try java.lang.Long.parseLong(hexStr, 16)
          catch { case _: NumberFormatException => -1L }
        if (size < 0 || size > Int.MaxValue) {
          done = true
          if (!any) return b // header lied: body was never chunked
        } else if (size == 0L) done = true
        else {
          // bound arithmetic in Long: a lying size near Int.MaxValue
          // must clamp to the buffer, not wrap i+size negative and
          // blow up the write (a decode must never kill the pass)
          val end = math.min(i.toLong + size, b.length.toLong).toInt
          out.write(b, i, end - i)
          any = true
          if (end.toLong < i.toLong + size) done = true // truncated final chunk
          i = end
          // the CRLF closing the chunk data
          if (i < b.length && b(i) == '\r') i += 1
          if (i < b.length && b(i) == '\n') i += 1
        }
      }
      out.toByteArray
    }

    /** Multi-member gzip (JDK GZIPInputStream reads concatenated
      * members natively — the [[parseStream]] precedent). Not gzip at
      * all (header rejected) ⇒ original bytes; corrupt past the header
      * ⇒ decoded prefix; a VALID gzip of an empty body ⇒ empty body
      * (success and nothing-decodable are distinct — conflating them
      * returned the ~20 compressed framing bytes as the "body"). */
    def gunzip(b: Array[Byte]): Array[Byte] = {
      val in =
        try new java.util.zip.GZIPInputStream(new ByteArrayInputStream(b), 1 << 16)
        catch { case _: java.io.IOException => return b } // header invalid: not gzip
      val out = new java.io.ByteArrayOutputStream(math.max(b.length * 4, 64))
      try {
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      } catch { case _: java.io.IOException => () }
      out.toByteArray
    }

    /** `deflate` bodies ship BOTH zlib-wrapped (RFC-correct) and raw
      * (common server bug) — try zlib first, fall back to raw. */
    def inflate(b: Array[Byte]): Array[Byte] = {
      def run(raw: Boolean): Option[Array[Byte]] = {
        val inf = new java.util.zip.Inflater(raw)
        inf.setInput(b)
        val out = new java.io.ByteArrayOutputStream(math.max(b.length * 4, 64))
        val buf = new Array[Byte](1 << 16)
        try {
          var stalled = false
          while (!inf.finished() && !stalled) {
            val n = inf.inflate(buf)
            if (n > 0) out.write(buf, 0, n)
            else stalled = true // truncated input: keep the prefix
          }
          // success = a COMPLETE stream (even an empty one) or real
          // output; an immediately-stalled empty decode is a miss, not
          // "decoded to empty" — the distinction keeps a valid deflate
          // of a zero-byte body from falling through to raw bytes
          if (inf.finished() || out.size() > 0) Some(out.toByteArray) else None
        } catch {
          case _: java.util.zip.DataFormatException =>
            if (out.size() > 0) Some(out.toByteArray) else None
        } finally inf.end()
      }
      run(raw = false).orElse(run(raw = true)).getOrElse(b)
    }
  }

  /** HTTP body as decoded TEXT, one fused kernel: header/body split →
    * transfer de-chunk → content inflate ([[HttpDecode]]) → charset
    * pick (HTTP `Content-Type` charset param wins, then a `<meta
    * charset>` sniff over a UTF-8 provisional view of the first 64K
    * chars, then UTF-8) → charset decode with BOM override. Semantics
    * identical to composing [[httpDecodedBodyBytes]] + [[httpCharset]]
    * + [[graft.ext.Extract.metaCharset]] + [[decodeCharset]] — but ONE
    * evaluation per row: the composed column form re-expands the
    * de-chunk+inflate subtree at every `_body` reference (charset
    * sniff, decode, extract — Catalyst collapses projections and
    * codegen's subexpression elimination does not cross operators), so
    * the production WARC reader paid ~3 inflates per record. At 100 TB
    * that triple decompress IS the scan's CPU bill. */
  def httpBodyText(payload: Column): Column =
    ColumnBridge.column(HttpBodyTextExpr(ColumnBridge.expr(payload)))

  /** [[httpBodyText]] with extra [[ContentDecoder]]s applied INSIDE the
    * kernel (after the built-in transfer/content decode, before the
    * charset decode) — one evaluation per row even on decoder rows; a
    * udf-branch formulation re-ran the decoder per reference. */
  def httpBodyText(payload: Column, decoders: Seq[ContentDecoder]): Column =
    ColumnBridge.column(HttpBodyTextExpr(ColumnBridge.expr(payload), decoders))

  private val MetaCharsetPattern = java.util.regex.Pattern.compile(
    "(?is)<meta(?=[\\s/>])[^>]*?[\\s\"';]charset\\s*=\\s*[\"']?([A-Za-z0-9_.:-]+)")
  private val HttpCharsetPattern = java.util.regex.Pattern.compile(
    "(?i)charset=\"?([A-Za-z0-9_.:-]+)")

  final case class HttpBodyTextExpr(child: Expression,
      decoders: Seq[ContentDecoder] = Nil)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(BinaryType)
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_http_body_text"

    @transient private lazy val decMap: Map[String, ContentDecoder] =
      decoders.flatMap(d => d.encodings.map(_.toLowerCase -> d)).toMap

    def textOf(payload: Array[Byte]): UTF8String = {
      // header/body split (the HttpBodyBytesExpr scan, charset-agnostic)
      var i = 0
      val n = payload.length
      var sepLf = -1
      var bodyStart = n
      while (i < n && sepLf < 0) {
        if (payload(i) == '\n') {
          var j = i + 1
          if (j < n && payload(j) == '\r') j += 1
          if (j < n && payload(j) == '\n') { sepLf = i; bodyStart = j + 1 }
        }
        i += 1
      }
      val raw =
        if (sepLf < 0) payload
        else java.util.Arrays.copyOfRange(payload, bodyStart, n)
      var body =
        if (sepLf < 0) raw else HttpDecode.decodeBody(payload, sepLf, raw)
      val head = new String(payload, 0, math.max(sepLf, 0),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      // extra content decoders (zstd by default at the call sites):
      // the built-in decode passed unknown codings through de-chunked
      // but still content-coded — a supplied decoder finishes the job
      if (decMap.nonEmpty) {
        val em = java.util.regex.Pattern
          .compile("(?im)^Content-Encoding\\s*:\\s*(.*?)\\s*$").matcher(head)
        if (em.find()) {
          decMap.get(em.group(1).trim.toLowerCase)
            .foreach(d => body = d.decode(body))
        }
      }
      // charset pick: HTTP header wins, meta sniff over a UTF-8
      // provisional view (first 65536 chars) falls back, then UTF-8
      val ctm = java.util.regex.Pattern
        .compile("(?im)^Content-Type\\s*:\\s*(.*?)\\s*$").matcher(head)
      var cs: String = null
      if (ctm.find()) {
        val m = HttpCharsetPattern.matcher(ctm.group(1))
        if (m.find()) cs = m.group(1).toLowerCase
      }
      if (cs == null) {
        val provisional = new String(body,
          java.nio.charset.StandardCharsets.UTF_8)
        val bounded =
          if (provisional.length > 65536) provisional.substring(0, 65536)
          else provisional
        val m = MetaCharsetPattern.matcher(bounded)
        if (m.find()) cs = m.group(1).toLowerCase
      }
      if (cs == null) cs = "utf-8"
      Warc.charsetDecode(body, cs)
    }

    override def nullSafeEval(input: Any): Any =
      textOf(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, b => {
        val ref = ctx.addReferenceObj("httptext", this, classOf[HttpBodyTextExpr].getName)
        s"${ev.value} = $ref.textOf($b);"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Deterministic gzip bytes of a BINARY column (the JDK writes a
    * fixed header — zero MTIME/XFL/OS — so output is a pure function of
    * input) — derived-input support for oracles that need a compressed
    * payload both engines agree on, and a sink-side compressor. */
  def gzipBytes(data: Column): Column =
    ColumnBridge.column(GzipBytesExpr(ColumnBridge.expr(data)))

  final case class GzipBytesExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(BinaryType)
    override def dataType: DataType = BinaryType
    override def prettyName: String = "graft_gzip"

    def compress(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream(math.max(b.length / 2, 32))
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(b); gz.close()
      bos.toByteArray
    }

    override def nullSafeEval(input: Any): Any =
      compress(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, b => {
        val ref = ctx.addReferenceObj("gz", this, classOf[GzipBytesExpr].getName)
        s"${ev.value} = $ref.compress($b);"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Deterministic zstd bytes of a BINARY column (fixed level 3; zstd
    * output is a pure function of input for a fixed level and library
    * version — one JVM, one version) — the [[gzipBytes]] sibling for
    * derived-input oracles exercising the [[ZstdDecoder]] path, and a
    * sink-side compressor. */
  def zstdBytes(data: Column): Column =
    ColumnBridge.column(ZstdBytesExpr(ColumnBridge.expr(data)))

  final case class ZstdBytesExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(BinaryType)
    override def dataType: DataType = BinaryType
    override def prettyName: String = "graft_zstd"

    def compress(b: Array[Byte]): Array[Byte] =
      com.github.luben.zstd.Zstd.compress(b, 3)

    override def nullSafeEval(input: Any): Any =
      compress(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, b => {
        val ref = ctx.addReferenceObj("zstd", this, classOf[ZstdBytesExpr].getName)
        s"${ev.value} = $ref.compress($b);"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** The shared charset-decode core (BOM override per WHATWG Encoding
    * — a UTF-8 page behind a stale `charset=iso-8859-1` header must
    * not mojibake; the BOM itself is stripped; malformed input
    * replaced; unknown charset falls back to UTF-8 — a decode must
    * never kill a 100-TB pass). */
  private[ext] def charsetDecode(b: Array[Byte], cs: String): UTF8String = {
    val (bytes, bomCharset) =
      if (b.length >= 3 && b(0) == 0xEF.toByte && b(1) == 0xBB.toByte &&
          b(2) == 0xBF.toByte)
        (java.util.Arrays.copyOfRange(b, 3, b.length),
          java.nio.charset.StandardCharsets.UTF_8)
      else if (b.length >= 2 && b(0) == 0xFF.toByte && b(1) == 0xFE.toByte)
        (java.util.Arrays.copyOfRange(b, 2, b.length),
          java.nio.charset.StandardCharsets.UTF_16LE)
      else if (b.length >= 2 && b(0) == 0xFE.toByte && b(1) == 0xFF.toByte)
        (java.util.Arrays.copyOfRange(b, 2, b.length),
          java.nio.charset.StandardCharsets.UTF_16BE)
      else (b, null)
    val charset =
      if (bomCharset != null) bomCharset
      else try java.nio.charset.Charset.forName(cs)
      catch { case _: Exception => java.nio.charset.StandardCharsets.UTF_8 }
    val dec = charset.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    UTF8String.fromString(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
  }

  /** Decode bytes under a PER-ROW charset name (JDK charsets;
    * malformed input replaced, unknown charset falls back to UTF-8 —
    * a decode must never kill a 100-TB pass). */
  def decodeCharset(bytes: Column, charsetName: Column): Column =
    ColumnBridge.column(DecodeCharsetExpr(
      ColumnBridge.expr(bytes), ColumnBridge.expr(charsetName)))

  final case class DecodeCharsetExpr(bytesExpr: Expression, csExpr: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with ExpectsInputTypes {
    override def left: Expression = bytesExpr
    override def right: Expression = csExpr
    override def inputTypes = Seq(BinaryType, StringType)
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_decode_charset"

    def decode(b: Array[Byte], cs: UTF8String): UTF8String =
      Warc.charsetDecode(b, cs.toString)

    override def nullSafeEval(b: Any, cs: Any): Any =
      decode(b.asInstanceOf[Array[Byte]], cs.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (b, cs) => {
        val ref = ctx.addReferenceObj("csdec", this, classOf[DecodeCharsetExpr].getName)
        s"${ev.value} = $ref.decode($b, $cs);"
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(bytesExpr = newLeft, csExpr = newRight)
  }
}
