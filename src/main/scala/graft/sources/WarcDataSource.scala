package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.ext.Warc

/** WARC as a FIRST-CLASS Spark data source (DataSource V2):
  * `spark.read.format("warc").load("s3a://…/segments/∗/∗.warc.gz")`
  * lands the same rows as [[graft.ext.Warc.read]] — but through the
  * connector API, so the source composes like any built-in format:
  * short-name registration (META-INF/services), catalog-visible
  * schema, and COLUMN PRUNING pushed into the reader
  * ([[SupportsPushDownRequiredColumns]]). Pruning matters at crawl
  * scale: a metadata pass (`select(target_uri, content_length)`) still
  * streams every gzip byte (members are not seekable) but never
  * MATERIALIZES payloads — the reader skips the Content-Length bytes
  * instead of allocating them, which at ~1 GB/file keeps a
  * listing-shaped query allocation-free.
  *
  * Split model: one partition per FILE, the unit every production WARC
  * pipeline parallelizes on (per-record gzip members defeat byte-range
  * splits; CommonCrawl ships tens of thousands of ~1 GB files per
  * crawl, far above any cluster's core count). Batch AND micro-batch:
  * `readStream.format("warc")` consumes new `.warc.gz` drops per
  * trigger with file-position checkpointing
  * ([[WarcMicroBatchStream]]) — the streaming front door no longer
  * needs a landed-parquet copy of the corpus.
  *
  * Reference: livingsocial/rearview reads Graphite JSON over HTTP
  * (README.md:6); a connector for a crawl container is extension
  * surface for the corpus mandate, expressed the Spark-native way. */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcDataSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val props = properties.asScala.toMap
    new WarcTable(WarcDataSource.pathsOf(props),
      WarcDataSource.maxFilesPerTriggerOf(props),
      WarcDataSource.maxBytesPerTriggerOf(props),
      WarcDataSource.logCompactIntervalOf(props),
      WarcDataSource.maxFileAgeOf(props))
  }
}

object WarcDataSource {
  /** The [[graft.ext.Warc.WarcRow]] shape, connector-side. */
  val Schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("idx", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = false),
    StructField("warc_date", StringType, nullable = false),
    StructField("content_type", StringType, nullable = false),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** `load(p)` lands as `path`; `load(p1, p2, …)` as a JSON `paths`
    * array (the DSv2 convention built-in file sources follow). */
  private[graft] def pathsOf(props: Map[String, String]): Seq[String] = {
    val multi = props.get("paths").toSeq.flatMap { js =>
      // the value is a JSON string array — parse it as one (Jackson
      // ships on Spark's classpath; built-in file sources do the
      // same): a hand-split on ',' would shred paths containing
      // commas (legal in URIs and in glob alternation like {a,b})
      new com.fasterxml.jackson.databind.ObjectMapper()
        .readValue(js, classOf[Array[String]]).toSeq.filter(_.nonEmpty)
    }
    val single = props.get("path").toSeq
    val all = multi ++ single
    require(all.nonEmpty, "warc source needs a path: .load(\"…/*.warc.gz\")")
    all
  }

  /** Streaming admission control knobs (the FileStreamSource options
    * of the same names): at most N new files / B new bytes per
    * micro-batch. Both may be set — the tighter bound wins per
    * trigger. */
  private[graft] def maxFilesPerTriggerOf(props: Map[String, String]): Option[Int] =
    props.collectFirst {
      case (k, v) if k.equalsIgnoreCase("maxFilesPerTrigger") => v
    }.map { v =>
      val n = try v.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"maxFilesPerTrigger must be a positive integer, got '$v'")
      }
      require(n > 0, s"maxFilesPerTrigger must be positive, got $n")
      n
    }

  private[graft] def maxBytesPerTriggerOf(props: Map[String, String]): Option[Long] =
    props.collectFirst {
      case (k, v) if k.equalsIgnoreCase("maxBytesPerTrigger") => v
    }.map { v =>
      val n = try v.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"maxBytesPerTrigger must be a positive long, got '$v'")
      }
      require(n > 0, s"maxBytesPerTrigger must be positive, got $n")
      n
    }

  /** `logCompactInterval` (streaming): every Nth batch the source's
    * file log folds into ONE snapshot file and older per-batch deltas
    * are deleted, so a restart's recovery reads O(1 snapshot +
    * interval) log files instead of one per batch ever committed (the
    * CompactibleFileStreamLog discipline Spark's own file source
    * uses). Default 10. */
  private[graft] def logCompactIntervalOf(props: Map[String, String]): Option[Int] =
    props.collectFirst {
      case (k, v) if k.equalsIgnoreCase("logCompactInterval") => v
    }.map { v =>
      val n = try v.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"logCompactInterval must be an integer >= 2, got '$v'")
      }
      require(n >= 2, s"logCompactInterval must be >= 2, got $n")
      n
    }

  /** `maxFileAge` (streaming): files whose modification time is older
    * than this relative to the NEWEST file in the listing are ignored
    * — never admitted — and their seen-set entries are evicted, so an
    * always-on crawl's driver heap stops growing with crawl lifetime
    * (the FileStreamSource option of the same name). Because the age
    * gate runs BEFORE the seen-set check, an evicted file can never be
    * re-admitted: anything old enough to evict is old enough to
    * ignore. Accepts `<n>[ms|s|m|h|d]` (bare number = ms). */
  private[graft] def maxFileAgeOf(props: Map[String, String]): Option[Long] =
    props.collectFirst {
      case (k, v) if k.equalsIgnoreCase("maxFileAge") => v
    }.map(parseDurationMs)

  private[graft] def parseDurationMs(v: String): Long = {
    val Dur = """(?i)\s*(\d+)\s*(ms|s|m|h|d)?\s*""".r
    v match {
      case Dur(n, unit) =>
        val mult = Option(unit).map(_.toLowerCase(java.util.Locale.ROOT)) match {
          case None | Some("ms") => 1L
          case Some("s") => 1000L
          case Some("m") => 60L * 1000L
          case Some("h") => 3600L * 1000L
          case Some("d") => 86400L * 1000L
          case other => throw new IllegalArgumentException(s"bad unit $other")
        }
        val out = n.toLong * mult
        require(out > 0, s"maxFileAge must be positive, got '$v'")
        out
      case _ => throw new IllegalArgumentException(
        s"maxFileAge must be <n>[ms|s|m|h|d], got '$v'")
    }
  }

  /** Driver-side glob expansion (the Warc.read listing), one entry per
    * FILE, deterministic order — file COUNT is the parallelism unit. */
  private[sources] def expandGlobs(paths: Seq[String]): Seq[String] =
    expandGlobsWithMeta(paths).map(_._1)

  /** [[expandGlobs]] with each file's LENGTH (byte-based admission
    * control input) and MODIFICATION TIME (the `maxFileAge` clock) —
    * both free, the same globStatus carries them. */
  private[sources] def expandGlobsWithMeta(paths: Seq[String]): Seq[(String, Long, Long)] = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    paths.flatMap { g =>
      val pat = new org.apache.hadoop.fs.Path(g)
      val fs = pat.getFileSystem(conf)
      Option(fs.globStatus(pat)).getOrElse(Array.empty)
        .filter(_.isFile)
        .map(s => (s.getPath.toString, s.getLen, s.getModificationTime))
    }.distinct.sortBy(_._1)
  }
}

final class WarcTable(paths: Seq[String], maxFilesPerTrigger: Option[Int],
    maxBytesPerTrigger: Option[Long],
    logCompactInterval: Option[Int] = None,
    maxFileAge: Option[Long] = None)
    extends Table with SupportsRead {
  override def name(): String = s"warc(${paths.mkString(",")})"
  override def schema(): StructType = WarcDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // the read-time option wins over the table property (both arrive
    // here for a spark.readStream.option(...) query)
    val o = options.asScala.toMap
    new WarcScanBuilder(paths,
      WarcDataSource.maxFilesPerTriggerOf(o).orElse(maxFilesPerTrigger),
      WarcDataSource.maxBytesPerTriggerOf(o).orElse(maxBytesPerTrigger),
      WarcDataSource.logCompactIntervalOf(o).orElse(logCompactInterval),
      WarcDataSource.maxFileAgeOf(o).orElse(maxFileAge))
  }
}

/** Exact, reader-side evaluation of pushed V1 filters over the
  * metadata columns (everything but `payload` and `idx`) — the
  * record-level decision runs on the PARSED HEADERS, before the
  * payload is touched, so a `warc_type = 'response'` read of a mixed
  * request/response/metadata file skips the non-matching records'
  * Content-Length bytes without allocating them even when the query
  * projects `payload`. Filters accepted here are claimed FULLY
  * handled (not returned as residual): every accepted shape below
  * evaluates with exactly Spark's semantics on these never-null
  * string/long columns, so Spark need not re-check. */
private[sources] object WarcFilters {
  import org.apache.spark.sql.sources._

  /** Columns known BEFORE payload materialization. `idx` is excluded:
    * it exists only after enumeration and a pushed filter on it could
    * not change what the reader must parse anyway. */
  private val MetaCols = Set(
    "path", "warc_type", "target_uri", "warc_date", "content_type",
    "content_length")

  def supported(f: Filter): Boolean = f.references.forall(MetaCols) && (f match {
    case EqualTo(_, v) => scalarOk(v)
    case EqualNullSafe(_, v) => scalarOk(v)
    case In(_, vs) => vs.forall(scalarOk)
    case StringStartsWith(_, _) | StringContains(_, _) | StringEndsWith(_, _) => true
    case IsNotNull(_) | IsNull(_) => true
    case GreaterThan(_, v) => numOk(v)
    case GreaterThanOrEqual(_, v) => numOk(v)
    case LessThan(_, v) => numOk(v)
    case LessThanOrEqual(_, v) => numOk(v)
    case And(l, r) => supported(l) && supported(r)
    case Or(l, r) => supported(l) && supported(r)
    case Not(c) => supported(c)
    case _ => false
  })
  private def scalarOk(v: Any): Boolean =
    v.isInstanceOf[String] || numOk(v)
  private def numOk(v: Any): Boolean =
    v.isInstanceOf[Long] || v.isInstanceOf[Int] || v.isInstanceOf[Short] ||
      v.isInstanceOf[Byte]
  private def toLong(v: Any): Long = v match {
    case l: Long => l; case i: Int => i.toLong
    case s: Short => s.toLong; case b: Byte => b.toLong
  }

  /** Evaluate one accepted filter against a field lookup. The columns
    * are never null (absent headers land as ""), so IsNotNull is
    * constant-true and IsNull constant-false. */
  def eval(f: Filter, get: String => Any): Boolean = f match {
    case EqualTo(a, v: String) => get(a) == v
    case EqualTo(a, v) => get(a).asInstanceOf[Long] == toLong(v)
    case EqualNullSafe(a, v: String) => get(a) == v
    case EqualNullSafe(a, v) => get(a).asInstanceOf[Long] == toLong(v)
    case In(a, vs) =>
      val x = get(a)
      x match {
        case l: Long => vs.exists(v => numOk(v) && toLong(v) == l)
        case s => vs.contains(s)
      }
    case StringStartsWith(a, p) => get(a).asInstanceOf[String].startsWith(p)
    case StringContains(a, p) => get(a).asInstanceOf[String].contains(p)
    case StringEndsWith(a, p) => get(a).asInstanceOf[String].endsWith(p)
    case IsNotNull(_) => true
    case IsNull(_) => false
    case GreaterThan(a, v) => get(a).asInstanceOf[Long] > toLong(v)
    case GreaterThanOrEqual(a, v) => get(a).asInstanceOf[Long] >= toLong(v)
    case LessThan(a, v) => get(a).asInstanceOf[Long] < toLong(v)
    case LessThanOrEqual(a, v) => get(a).asInstanceOf[Long] <= toLong(v)
    case And(l, r) => eval(l, get) && eval(r, get)
    case Or(l, r) => eval(l, get) || eval(r, get)
    case Not(c) => !eval(c, get)
    case other => throw new IllegalStateException(s"unaccepted filter $other")
  }
}

final class WarcScanBuilder(paths: Seq[String], maxFilesPerTrigger: Option[Int],
    maxBytesPerTrigger: Option[Long],
    logCompactInterval: Option[Int] = None,
    maxFileAge: Option[Long] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = WarcDataSource.Schema
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition(WarcFilters.supported)
    pushed = ok
    residual // accepted filters are exact — Spark need not re-evaluate
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan =
    new WarcScan(paths, required, pushed, maxFilesPerTrigger,
      maxBytesPerTrigger, logCompactInterval, maxFileAge)
}

final class WarcScan(paths: Seq[String], required: StructType,
    filters: Array[Filter], maxFilesPerTrigger: Option[Int] = None,
    maxBytesPerTrigger: Option[Long] = None,
    logCompactInterval: Option[Int] = None,
    maxFileAge: Option[Long] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new WarcMicroBatchStream(paths, required, filters, checkpointLocation,
      maxFilesPerTrigger, maxBytesPerTrigger,
      logCompactInterval.getOrElse(WarcFileLog.DefaultCompactInterval),
      maxFileAge)
  override def description(): String =
    s"WarcScan(${paths.mkString(",")}, columns=${required.fieldNames.mkString(",")}" +
      (if (filters.isEmpty) ")"
       else s", PushedFilters: [${filters.mkString(", ")}])")

  override def planInputPartitions(): Array[InputPartition] =
    WarcDataSource.expandGlobs(paths)
      .map(p => WarcInputPartition(p): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    WarcReaderFactory(conf, required, filters)
  }
}

final case class WarcInputPartition(path: String) extends InputPartition

final case class WarcReaderFactory(conf: SerializableConfiguration,
    required: StructType, filters: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(
      partition.asInstanceOf[WarcInputPartition].path, conf, required, filters)
}

/** One streaming pass over one (possibly multi-member-gzip) WARC file,
  * constant memory per record; only the REQUIRED columns materialize —
  * when `payload` is pruned, OR a record fails the pushed filters, its
  * Content-Length bytes are consumed but never allocated. `idx` stays
  * the GLOBAL record index of the file: the enumeration counts every
  * record and filtering drops rows after the count, so a pushed filter
  * returns the same rows a post-scan filter would. */
final class WarcPartitionReader(path: String, conf: SerializableConfiguration,
    required: StructType, filters: Array[Filter]) extends PartitionReader[InternalRow] {

  private val needPayload = required.fieldNames.contains("payload")
  private val hPath = new org.apache.hadoop.fs.Path(path)
  private val in = hPath.getFileSystem(conf.value).open(hPath)

  private def headerGet(headers: scala.collection.Map[String, String])(field: String): Any = {
    def h(name: String): String = headers.collectFirst {
      case (k, v) if k.equalsIgnoreCase(name) => v
    }.getOrElse("")
    field match {
      case "path" => path
      case "warc_type" => h("WARC-Type")
      case "target_uri" => h("WARC-Target-URI")
      case "warc_date" => h("WARC-Date")
      case "content_type" => h("Content-Type")
      case "content_length" =>
        scala.util.Try(h("Content-Length").toLong).getOrElse(0L)
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
  }
  private def matches(headers: scala.collection.Map[String, String]): Boolean = {
    val get = headerGet(headers) _
    filters.forall(WarcFilters.eval(_, get))
  }
  // payload materializes only when the query needs it AND the pushed
  // filters keep the record — the header-level decision runs before
  // the payload bytes are touched
  private val records = Warc.parseStream(in,
    (_: String, hs: scala.collection.Map[String, String]) =>
      needPayload && matches(hs))
  private val pathU8 = UTF8String.fromString(path)
  private var idx = -1L
  private var rec: Warc.WarcRecord = _

  override def next(): Boolean = {
    while (records.hasNext) {
      rec = records.next(); idx += 1
      if (filters.isEmpty || matches(rec.headers)) return true
    }
    false
  }

  override def get(): InternalRow = {
    def h(name: String): UTF8String =
      UTF8String.fromString(rec.header(name).getOrElse(""))
    val values: Array[Any] = required.fieldNames.map {
      case "path" => pathU8
      case "idx" => idx
      case "warc_type" => h("WARC-Type")
      case "target_uri" => h("WARC-Target-URI")
      case "warc_date" => h("WARC-Date")
      case "content_type" => h("Content-Type")
      case "content_length" => rec.contentLength
      case "payload" => rec.payload
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
  }

  override def close(): Unit = in.close()
}

/** Offset of the streaming `warc` source: a BATCH ID into the
  * source's own compacted metadata log (the FileStreamSource shape).
  * The offset JSON Spark rewrites into the checkpoint every trigger is
  * O(1) — `{"batch":N}` — regardless of corpus size; the per-batch
  * FILE LISTS live in the source's log directory under the
  * checkpoint (`<checkpointLocation>/warc-file-log/<batchId>`, one
  * JSON array per batch, written atomically via [[graft.ext
  * .AtomicSink]]), so a long-running crawl at 10^5+ files per query
  * no longer grows its offset with the corpus. A restart replays
  * batch (start, end] from the persisted log files alone; a log
  * written but never committed to Spark's WAL (crash between the two)
  * is simply included in the next planned range — nothing is lost or
  * double-read. `batch = -1` is the empty initial offset. */
final case class WarcOffset(batch: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = s"""{"batch":$batch}"""
}
object WarcOffset {
  def fromJson(json: String): WarcOffset = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    require(node.has("batch"), s"not a warc offset: $json")
    WarcOffset(node.get("batch").asLong())
  }
}

/** The PRE-COMPACTION offset form (a JSON array of every file seen so
  * far), still deserialized so a checkpoint written by the old source
  * restarts instead of hard-crashing: [[WarcMicroBatchStream]] folds a
  * legacy start offset's files into its seen set and replans an
  * uncommitted legacy batch as (end.files − start.files). The first
  * fresh batch the restarted query plans commits a compact
  * `{"batch":N}` offset, completing the upgrade — this class never
  * serializes back into a NEW checkpoint entry beyond the replay. */
final case class LegacyWarcOffset(files: Seq[String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(files.toArray)
}

/** The per-batch file log behind [[WarcOffset]], COMPACTED (the
  * CompactibleFileStreamLog shape Spark's own FileStreamSource uses):
  *
  *  - delta file `<batchId>` — JSON array of `[path, modTime]` pairs,
  *    the files NEW in that batch (bare-string elements from
  *    pre-compaction checkpoints still parse, with modTime = -1 =
  *    "unknown, treat as fresh");
  *  - snapshot file `<batchId>.compact` — written INSTEAD of a delta
  *    every `compactInterval`-th batch: JSON array of
  *    `[path, modTime, batchId]` triples covering EVERY live file up
  *    to and including that batch. Once the snapshot commits, all
  *    older log files are deleted.
  *
  * So the directory holds ≤ 1 snapshot + (compactInterval − 1) deltas
  * and [[recover]] reads O(snapshot + tail) files, not one per batch
  * ever committed — the bookkeeping term that used to grow with crawl
  * lifetime (an always-on crawl at 10⁵–10⁶ batches paid O(batches)
  * driver reads per restart). */
private[graft] final class WarcFileLog(logDir: org.apache.hadoop.fs.Path,
    conf: org.apache.hadoop.conf.Configuration,
    compactInterval: Int = WarcFileLog.DefaultCompactInterval) {
  require(compactInterval >= 2, s"compactInterval must be >= 2, got $compactInterval")
  private val fs = logDir.getFileSystem(conf)
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  /** Log files read by the last [[recover]] — the boundedness the
    * compaction exists for, asserted by WarcSourceSpec. */
  @volatile private[graft] var recoverLogReads: Int = 0

  /** (delta batch ids, snapshot batch ids), each sorted. */
  private def listIds(): (Seq[Long], Seq[Long]) =
    if (!fs.exists(logDir)) (Nil, Nil)
    else {
      val names = fs.listStatus(logDir).toSeq.map(_.getPath.getName)
      (names.flatMap(n => scala.util.Try(n.toLong).toOption).sorted,
        names.filter(_.endsWith(".compact"))
          .flatMap(n => scala.util.Try(n.stripSuffix(".compact").toLong).toOption)
          .sorted)
    }

  private def parseFile(p: org.apache.hadoop.fs.Path): com.fasterxml.jackson.databind.JsonNode = {
    val in = fs.open(p)
    try mapper.readTree(in: java.io.InputStream) finally in.close()
  }

  /** (path, modTime) of a delta; tolerates the pre-compaction
    * bare-string element form (modTime = -1 = unknown/fresh). */
  private def readDelta(batch: Long): Seq[(String, Long)] = {
    val node = parseFile(new org.apache.hadoop.fs.Path(logDir, batch.toString))
    (0 until node.size).map { i =>
      val e = node.get(i)
      if (e.isTextual) (e.asText(), -1L)
      else (e.get(0).asText(), e.get(1).asLong())
    }
  }

  /** (path, modTime, batchId) triples of a snapshot. */
  private def readCompact(id: Long): Seq[(String, Long, Long)] = {
    val node = parseFile(new org.apache.hadoop.fs.Path(logDir, s"$id.compact"))
    (0 until node.size).map { i =>
      val e = node.get(i)
      (e.get(0).asText(), e.get(1).asLong(), e.get(2).asLong())
    }
  }

  def isCompactBatch(batch: Long): Boolean =
    batch >= 0 && (batch + 1) % compactInterval == 0

  /** Persist batch `batch`. `delta` is the batch's new files;
    * `snapshot` (evaluated only on compaction batches) must yield
    * every live file INCLUDING this batch's, with its admitting batch
    * id. Snapshot first, delete old files after — a crash between the
    * two leaves harmless stragglers that the next compaction sweeps. */
  def write(batch: Long, delta: Seq[(String, Long)],
      snapshot: () => Iterator[(String, Long, Long)]): Unit = {
    fs.mkdirs(logDir)
    if (isCompactBatch(batch)) {
      val dest = new org.apache.hadoop.fs.Path(logDir, s"$batch.compact")
      graft.ext.AtomicSink.writeCommitted(fs, dest, attemptId = batch) { tmp =>
        val out = fs.create(tmp, true)
        try {
          val arr = mapper.createArrayNode()
          snapshot().foreach { case (p, t, b) =>
            val e = mapper.createArrayNode(); e.add(p); e.add(t); e.add(b)
            arr.add(e)
          }
          out.write(mapper.writeValueAsBytes(arr))
        } finally out.close()
      }
      val (dIds, cIds) = listIds()
      dIds.filter(_ <= batch).foreach(b =>
        fs.delete(new org.apache.hadoop.fs.Path(logDir, b.toString), false))
      cIds.filter(_ < batch).foreach(c =>
        fs.delete(new org.apache.hadoop.fs.Path(logDir, s"$c.compact"), false))
    } else {
      val dest = new org.apache.hadoop.fs.Path(logDir, batch.toString)
      graft.ext.AtomicSink.writeCommitted(fs, dest, attemptId = batch) { tmp =>
        val out = fs.create(tmp, true)
        try {
          val arr = mapper.createArrayNode()
          delta.foreach { case (p, t) =>
            val e = mapper.createArrayNode(); e.add(p); e.add(t)
            arr.add(e)
          }
          out.write(mapper.writeValueAsBytes(arr))
        } finally out.close()
      }
    }
  }

  /** Files of batches in [from, to]: tail deltas read directly,
    * batches folded into the latest snapshot served from it (filtered
    * by their recorded batch id). Batch replay after a restart and the
    * legacy-offset upgrade both go through here. */
  def readRange(from: Long, to: Long): Seq[String] = {
    if (to < from) return Nil
    val (dIds, cIds) = listIds()
    val latestCompact = cIds.lastOption.filter(_ >= from)
    val fromCompact = latestCompact.toSeq.flatMap(c =>
      readCompact(c).collect { case (p, _, b) if b >= from && b <= to => p })
    val floor = latestCompact.getOrElse(from - 1)
    val fromDeltas = dIds.filter(b => b > floor && b >= from && b <= to)
      .flatMap(b => readDelta(b).map(_._1))
    fromCompact ++ fromDeltas
  }

  /** Recovery: (max batch id, path → (modTime, admitting batch)).
    * O(1 snapshot + tail deltas) reads, NOT one per batch ever. */
  def recover(): (Long, scala.collection.mutable.Map[String, (Long, Long)]) = {
    val (dIds, cIds) = listIds()
    val seen = scala.collection.mutable.Map.empty[String, (Long, Long)]
    var reads = 0
    val latest = cIds.lastOption
    latest.foreach { id =>
      readCompact(id).foreach { case (p, t, b) => seen(p) = (t, b) }
      reads += 1
    }
    val floor = latest.getOrElse(-1L)
    dIds.filter(_ > floor).foreach { b =>
      readDelta(b).foreach { case (p, t) => seen(p) = (t, b) }
      reads += 1
    }
    recoverLogReads = reads
    ((dIds ++ cIds).foldLeft(-1L)(_ max _), seen)
  }
}

private[graft] object WarcFileLog {
  val DefaultCompactInterval = 10
}

/** Streaming front door for `.warc.gz` drops: new files matching the
  * glob since the last committed offset form each micro-batch, read by
  * the SAME partition reader as the batch scan — column pruning and
  * pushed filters included, so a streaming metadata/response-only pass
  * keeps the payload-skip economics. Removes the landed-parquet copy
  * from the ingest path: `readStream.format("warc")` →
  * [[graft.streaming.DocumentIngest.extractWarcRecords]] → sink,
  * instead of fetch → land parquet → stream the parquet.
  *
  * Trigger.AvailableNow is first-class ([[SupportsTriggerAvailableNow]]):
  * the listing is captured once at query start and drained, the
  * deterministic-batch contract every store-maintenance loop in this
  * repo runs on. */
final class WarcMicroBatchStream(paths: Seq[String], required: StructType,
    filters: Array[Filter], checkpointLocation: String,
    maxFilesPerTrigger: Option[Int] = None,
    maxBytesPerTrigger: Option[Long] = None,
    logCompactInterval: Int = WarcFileLog.DefaultCompactInterval,
    maxFileAge: Option[Long] = None)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, Offset, ReadAllAvailable, ReadLimit, ReadMaxBytes, ReadMaxFiles}

  private val conf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
  private val log = new WarcFileLog(
    new org.apache.hadoop.fs.Path(checkpointLocation, "warc-file-log"),
    conf.value, logCompactInterval)
  // recovered once per query start: the compacted log replaces the
  // file list the offset itself used to carry. seen: path →
  // (modTime, admitting batch id); modTime −1 = unknown (legacy log
  // entry), treated as fresh until the listing backfills it.
  private lazy val state: (Long, scala.collection.mutable.Map[String, (Long, Long)]) =
    log.recover()
  private def seen = state._2
  @volatile private var maxBatch: Long = Long.MinValue
  // monotonic newest-file clock: maxFileAge eviction cuts relative to
  // this, never wall time, so a stalled upstream can't evict anything
  @volatile private var latestTime: Long = Long.MinValue
  // committed watermark: age eviction (memory AND persisted snapshot)
  // applies only to entries whose admitting batch is ≤ this, so a
  // replayed UNCOMMITTED batch can never lose aged files — the log
  // stays replayable for every batch a restart can re-plan, at any
  // maxFileAge (the r18 replay-horizon edge). Microbatch execution has
  // at most ONE outstanding uncommitted batch, so at recovery every
  // batch below the last logged one is committed; commit() raises the
  // watermark live from there.
  @volatile private var committedBatch: Long = Long.MinValue
  // AvailableNow: the listing captured at query start; every
  // latestOffset until stop() drains exactly this snapshot — with a
  // file/byte cap, in as many batches as the caps require
  @volatile private var captured: Option[Seq[(String, Long, Long)]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    captured = Some(WarcDataSource.expandGlobsWithMeta(paths))

  /** ADMISSION CONTROL (the `maxFilesPerTrigger`/`maxBytesPerTrigger`
    * source options): the default limit Spark hands back to
    * [[latestOffset(start,limit)*]] each trigger. Without it a cold
    * start over an EXISTING archive — or a restart after downtime —
    * planned every fresh file in ONE corpus-sized micro-batch:
    * correct, but unbounded memory/wall-clock per trigger and no
    * incremental checkpoint progress. Both knobs together compose
    * (tighter bound wins per trigger). */
  override def getDefaultReadLimit(): ReadLimit = {
    val limits = maxFilesPerTrigger.map(ReadLimit.maxFiles).toSeq ++
      maxBytesPerTrigger.map(ReadLimit.maxBytes).toSeq
    limits match {
      case Seq() => ReadLimit.allAvailable()
      case Seq(one) => one
      case many => ReadLimit.compositeLimit(many.toArray)
    }
  }

  /** (files, bytes) caps of a ReadLimit. Only the shapes this source
    * can HONOR are accepted — a row-based limit cannot be enforced by a
    * file source without reading the files, so claiming to accept one
    * would silently not limit (the API-contract wart this replaces). */
  private def capsOf(limit: ReadLimit): (Option[Int], Option[Long]) = limit match {
    case _: ReadAllAvailable => (None, None)
    case m: ReadMaxFiles => (Some(m.maxFiles()), None)
    case b: ReadMaxBytes => (None, Some(b.maxBytes()))
    case c: CompositeReadLimit =>
      c.getReadLimits.toSeq.map(capsOf).foldLeft(
        (Option.empty[Int], Option.empty[Long])) { case ((f1, b1), (f2, b2)) =>
        ((f1.toSeq ++ f2.toSeq).reduceOption(_ min _),
          (b1.toSeq ++ b2.toSeq).reduceOption(_ min _))
      }
    case other => throw new UnsupportedOperationException(
      s"warc source cannot honor ReadLimit $other (file/byte limits only)")
  }

  /** Admit a prefix of `fresh` under the caps: stop BEFORE the file
    * that would cross the byte budget — but always admit at least one
    * (an over-budget single file must flow, not stall the stream
    * forever; the FileStreamSource convention). */
  private def admit(fresh: Seq[(String, Long, Long)], fileCap: Option[Int],
      byteCap: Option[Long]): Seq[(String, Long, Long)] = {
    val limited = fileCap.fold(fresh)(fresh.take)
    byteCap match {
      case None => limited
      case Some(budget) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
        var used = 0L
        var i = 0
        while (i < limited.length &&
            (out.isEmpty || used + limited(i)._2 <= budget)) {
          used += limited(i)._2
          out += limited(i)
          i += 1
        }
        out.toSeq
    }
  }

  private def advance(startSeen: Seq[String], fileCap: Option[Int],
      byteCap: Option[Long]): Offset =
    synchronized {
      if (maxBatch == Long.MinValue) maxBatch = state._1
      committedBatch = math.max(committedBatch, state._1 - 1)
      // legacy-offset files: processed pre-upgrade (no time/batch known)
      startSeen.foreach(p => if (!seen.contains(p)) seen(p) = (-1L, -1L))
      val listing = captured.getOrElse(WarcDataSource.expandGlobsWithMeta(paths))
      if (listing.nonEmpty)
        latestTime = math.max(latestTime, listing.iterator.map(_._3).max)
      val cutoff = maxFileAge.collect {
        case age if latestTime != Long.MinValue => latestTime - age
      }
      // AGE GATE first, seen-check second: a file old enough to have
      // been evicted from `seen` is by construction old enough to be
      // ignored here, so eviction can never cause a re-read
      val candidates = cutoff.fold(listing)(c => listing.filter(_._3 >= c))
      if (maxFileAge.isDefined)
        // backfill unknown (legacy-log) timestamps from the live
        // listing so those entries age out instead of pinning forever
        listing.foreach { case (p, _, t) =>
          seen.get(p) match {
            case Some((-1L, b)) => seen(p) = (t, b)
            case _ => ()
          }
        }
      val fresh0 = candidates.filterNot(f => seen.contains(f._1))
      val fresh = admit(fresh0, fileCap, byteCap)
      if (fresh.nonEmpty) {
        val next = maxBatch + 1
        // snapshot (compaction batches only): live = not aged out OR
        // not yet past the committed watermark — eviction happens in
        // the PERSISTED log exactly when it happens in memory, so the
        // log never re-grows the heap, and an uncommitted batch's
        // entries survive regardless of age so its replay can always
        // be served ([[committedBatch]]). Legacy entries (b = −1) are
        // pre-upgrade committed by construction.
        def snapshot(): Iterator[(String, Long, Long)] = {
          val kept = cutoff.fold(seen.iterator)(c =>
            seen.iterator.filter { case (_, (t, b)) =>
              t < 0 || t >= c || b > committedBatch })
          kept.map { case (p, (t, b)) => (p, t, b) } ++
            fresh.iterator.map(f => (f._1, f._3, next))
        }
        // persisted BEFORE the id is ever returned
        log.write(next, fresh.map(f => (f._1, f._3)), snapshot _)
        fresh.foreach(f => seen(f._1) = (f._3, next))
        // memory eviction mirrors the snapshot rule: dropping an
        // uncommitted-batch entry here would silently drop it from the
        // NEXT snapshot too (seen is the snapshot's source)
        cutoff.foreach(c =>
          seen.filterInPlace { case (_, (t, b)) =>
            t < 0 || t >= c || b > committedBatch })
        maxBatch = next
      }
      WarcOffset(maxBatch max -1L)
    }

  override def initialOffset(): Offset = WarcOffset(-1L)
  override def latestOffset(): Offset =
    advance(Nil, maxFilesPerTrigger, maxBytesPerTrigger)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val legacy = start match {
      case LegacyWarcOffset(files) => files
      case _ => Nil
    }
    val (f, b) = capsOf(limit)
    advance(legacy, f, b)
  }
  override def deserializeOffset(json: String): Offset = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    if (node.isArray) {
      // pre-compaction checkpoint entry: the full seen-file list
      val files = (0 until node.size).map(i => node.get(i).asText())
      LegacyWarcOffset(files)
    } else WarcOffset.fromJson(json)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val files = (start, end) match {
      case (LegacyWarcOffset(s), LegacyWarcOffset(e)) =>
        // replay of a batch planned ENTIRELY pre-upgrade
        val done = s.toSet
        e.filterNot(done)
      case (LegacyWarcOffset(_), WarcOffset(e)) =>
        // start is pre-upgrade (its files are NOT in the log; they are
        // excluded via `seen` in advance()), end is post-upgrade: every
        // logged batch up to `e` is new work
        log.readRange(0L, e)
      case (WarcOffset(s), WarcOffset(e)) =>
        // re-read from the persisted log (not memory): a restart
        // replans an uncommitted batch from the files its log recorded
        log.readRange(s + 1, e)
      case (s, e) => throw new IllegalStateException(
        s"unexpected warc offset pair ($s, $e)")
    }
    files.map(p => WarcInputPartition(p): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    WarcReaderFactory(conf, required, filters)

  override def commit(end: Offset): Unit = end match {
    // raises the age-eviction watermark: only committed batches'
    // entries may age out of the log (replayability guard)
    case WarcOffset(b) => committedBatch = math.max(committedBatch, b)
    case _ => () // legacy offsets carry no batch id; recovery floor covers them
  }
  override def stop(): Unit = ()
}
