package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.dsl.Glob
import graft.series.SeriesOps
import graft.series.SeriesOps.{dsum, dmean}
import graft.store.Tables

/** The driver-facing query registry: one entry per operator row of
  * SURVEY.md §2, each with a DuckDB-oracle SQL twin where the op is
  * SQL-expressible.
  *
  * Determinism contract with the oracle (the driver hash-compares
  * values): double sums go through DECIMAL(18,6) so they are exact and
  * partition-order independent; averages/ratios are exact-sum ÷ count
  * (IEEE-deterministic); only genuinely algorithm-dependent stats
  * (stddev, interpolated percentiles, libm fns) are rounded. Every query
  * ends in an explicit ORDER BY mirrored in the oracle.
  */
object Queries {

  type QFn = (SparkSession, String) => DataFrame
  /** `oracle` is a THUNK: most gates carry a plain SQL string, but a
    * stored-model gate (x57b) embeds TRAINED weights in its SQL — the
    * training needs a live SparkSession, so the text can only be
    * materialized when the oracle dump actually asks for it (Verify /
    * DocCountsSpec), never at registry init. */
  final case class QueryDef(name: String, fn: QFn, oracle: Option[() => String])

  private val defs = scala.collection.mutable.ArrayBuffer[QueryDef]()
  private def q(name: String, oracle: String = null)(fn: QFn): Unit =
    defs += QueryDef(name, fn, Option(oracle).map(s => () => s))
  /** Register with a LAZILY-built (memoized) oracle SQL. */
  private def qLazy(name: String)(oracle: => String)(fn: QFn): Unit = {
    lazy val memo = oracle
    defs += QueryDef(name, fn, Some(() => memo))
  }

  def all: Seq[QueryDef] = defs.toSeq

  /** Named STORED-FIXTURE builders (the r19 verdict's bench item): the
    * memoized artifacts the fixture-dependent gates (x2c, x38c, x7b/c,
    * x36b/c) probe. Bench builds + FORCES each one explicitly before
    * the measured rounds and emits the build as its own `fixture:`
    * entry in bench_detail.json, so per-query artifact numbers stop
    * absorbing fixture cache-state variance (the r19 x38c/x2c
    * phantom-regression class: 2× artifact swings with zero commits on
    * either path). Forcing = materializing every lazily-cached frame
    * the fixture serves, not just constructing it. */
  def fixtures: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "bandStore" -> ((s, dir) => { bandStorePrefix(s, dir); () }),
    "lexIndex" -> ((s, dir) => {
      val ix = lexIndex(s, dir)
      ix.postings.count(); ix.docLengths.count(); ix.stats.count()
      ix.dfreq.count(); ()
    }),
    "ivfIndex" -> ((s, dir) => { ivfIndex(s, dir)._1.assigned.count(); () }),
    "ivfPq" -> ((s, dir) => { ivfPqLoaded(s, dir).assigned.count(); () }),
    "pqIndex" -> ((s, dir) => { pqIndex(s, dir)._2.count(); () }))

  /** Deterministic total order for a SMALL final result without the
    * global-sort tax: `orderBy` plans a range exchange whose sampling
    * pass is a whole extra Spark job per query — pure overhead when the
    * result is bounded (every result here is; the comparison protocol is
    * the only reason these queries end sorted at all). `repartition(1)`
    * keeps the expensive upstream stages parallel and sorts once. */
  implicit final class SmallOrdered(private val df: DataFrame) {
    def ordered(c: String, cs: String*): DataFrame =
      df.repartition(1).sortWithinPartitions(c, cs: _*)
    def ordered(cols: Column*): DataFrame =
      df.repartition(1).sortWithinPartitions(cols: _*)
  }

  // -- shared fragments ---------------------------------------------------

  /** Exact order-independent SUM for the oracle side. */
  private def DSUM(c: String) = s"CAST(SUM(CAST($c AS DECIMAL(18,6))) AS DOUBLE)"

  /** DuckDB twin of [[graft.ext.Graph.pageRank]] over the x60 derived
    * host graph, the power iteration UNROLLED (one CTE triple per
    * round — the engine has no iteration, so the oracle pays the
    * closed form the same way x20's recursive CTE does). Mirrors the
    * Graph determinism contract exactly: contribution terms and each
    * round's rank quantize through the LITERAL same pure-IEEE formula
    * as the Spark side, `FLOOR(x*1e9+0.5)/1e9` (a decimal-cast twin at
    * the 1e-12 grid was NOT consensus — rank/outdeg terms land on grid
    * half-points and the two engines' rounding rules split within an
    * ulp); cross-partition sums go through DECIMAL(30,12), consensus
    * because every summand is centered on the 1e-9 grid; the
    * arithmetic between quantizations is plain IEEE double in the same
    * operation order. */
  /** The unrolled PageRank rounds as CTE fragments over an edge list
    * CTE named `e0` the caller has already opened (so the same rounds
    * serve both the x60 arithmetic graph and x64's page-derived one);
    * defines `outdeg`, `nodes`, `nn`, `it0..itN` and leaves `fin` =
    * (id, rank). Trailing comma included. */
  private def pageRankRoundsCte(iters: Int, pfx: String = ""): String = {
    // `pfx` prefixes every CTE name (and the expected edge CTE
    // `${pfx}e0`), so TWO independent rank unrolls — x76's host-level
    // and page-level graphs — coexist in one WITH clause
    val N = s"CAST((SELECT n FROM ${pfx}nn) AS DOUBLE)"
    def quant(x: String) = s"FLOOR(($x) * 1e9 + 0.5) / 1e9"
    val sb = new StringBuilder
    sb ++= s"""${pfx}outdeg AS (SELECT src AS id, COUNT(*) AS od FROM ${pfx}e0 GROUP BY 1),
      |${pfx}nodes AS (
      |  SELECT n.id, COALESCE(o.od, 0) AS od
      |  FROM (SELECT src AS id FROM ${pfx}e0 UNION SELECT dst FROM ${pfx}e0) n
      |  LEFT JOIN ${pfx}outdeg o USING (id)),
      |${pfx}nn AS (SELECT COUNT(*) AS n FROM ${pfx}nodes),
      |${pfx}it0 AS MATERIALIZED (SELECT id, od, ${quant(s"1.0 / $N")} AS rank FROM ${pfx}nodes),
      |""".stripMargin
    for (k <- 1 to iters) {
      val p = s"${pfx}it${k - 1}"
      sb ++= s"""${pfx}d$k AS (SELECT COALESCE(CAST(SUM(CAST(rank AS DECIMAL(30,12))) AS DOUBLE), 0.0) AS dm
        |  FROM $p WHERE od = 0),
        |${pfx}c$k AS (SELECT e.dst AS id, CAST(SUM(CAST(${quant("r.rank / r.od")} AS DECIMAL(30,12))) AS DOUBLE) AS s
        |  FROM ${pfx}e0 e JOIN $p r ON r.id = e.src AND r.od > 0 GROUP BY 1),
        |${pfx}it$k AS MATERIALIZED (SELECT v.id, v.od, ${quant(
        s"(1.0 - 0.85) / $N + 0.85 * (COALESCE(c.s, 0.0) + (SELECT dm FROM ${pfx}d$k) / $N)")} AS rank
        |  FROM $p v LEFT JOIN ${pfx}c$k c USING (id)),
        |""".stripMargin
    }
    sb ++= s"${pfx}fin AS (SELECT id, rank FROM ${pfx}it$iters),\n"
    sb.toString
  }

  private def pageRankOracle(iters: Int): String =
    s"""WITH e0 AS MATERIALIZED (
      |  SELECT DISTINCT 'h' || CAST(doc_id % 50 AS VARCHAR) AS src,
      |         'h' || CAST((doc_id * 7 + j) % 50 AS VARCHAR) AS dst
      |  FROM documents, UNNEST([1, 2, 3]) AS t(j)
      |  WHERE doc_id % 50 < 40 AND (doc_id % 50) <> ((doc_id * 7 + j) % 50)),
      |${pageRankRoundsCte(iters)}indeg AS (SELECT dst AS id, COUNT(*) AS ideg FROM e0 GROUP BY 1)
      |SELECT f.id AS host,
      |  CAST(COALESCE(o.od, 0) AS BIGINT) AS out_deg,
      |  CAST(COALESCE(i.ideg, 0) AS BIGINT) AS in_deg,
      |  f.rank
      |FROM fin f LEFT JOIN outdeg o USING (id) LEFT JOIN indeg i ON i.id = f.id
      |ORDER BY host""".stripMargin
  /** Exact decimal SUM kept as decimal (for further exact aggregation). */
  private def DSUMD(c: String) = s"SUM(CAST($c AS DECIMAL(18,6)))"

  /** DuckDB twin of [[graft.ext.Graph.hits]] over the same derived
    * host graph — unrolled like [[pageRankOracle]], two normalized
    * half-rounds per iteration, the identical pure-IEEE
    * `FLOOR(x*1e9+0.5)/1e9` quantization points and DECIMAL(30,12)
    * sums. */
  private def hitsOracle(iters: Int): String = {
    val N = "CAST((SELECT n FROM nn) AS DOUBLE)"
    def quant(x: String) = s"FLOOR(($x) * 1e9 + 0.5) / 1e9"
    def dsum30(c: String) = s"CAST(SUM(CAST($c AS DECIMAL(30,12))) AS DOUBLE)"
    val sb = new StringBuilder
    sb ++= s"""WITH e0 AS MATERIALIZED (
      |  SELECT DISTINCT 'h' || CAST(doc_id % 50 AS VARCHAR) AS src,
      |         'h' || CAST((doc_id * 7 + j) % 50 AS VARCHAR) AS dst
      |  FROM documents, UNNEST([1, 2, 3]) AS t(j)
      |  WHERE doc_id % 50 < 40 AND (doc_id % 50) <> ((doc_id * 7 + j) % 50)),
      |nodes AS MATERIALIZED (SELECT src AS id FROM e0 UNION SELECT dst FROM e0),
      |nn AS (SELECT COUNT(*) AS n FROM nodes),
      |s0 AS MATERIALIZED (
      |  SELECT id, ${quant(s"1.0 / $N")} AS hub, ${quant(s"1.0 / $N")} AS auth
      |  FROM nodes),
      |""".stripMargin
    for (k <- 1 to iters) {
      val p = s"s${k - 1}"
      sb ++= s"""ar$k AS (SELECT e.dst AS id, ${dsum30("s.hub")} AS raw
        |  FROM e0 e JOIN $p s ON s.id = e.src GROUP BY 1),
        |aa$k AS MATERIALIZED (SELECT n.id, COALESCE(a.raw, 0.0) AS raw
        |  FROM nodes n LEFT JOIN ar$k a USING (id)),
        |an$k AS (SELECT ${dsum30("raw")} AS s FROM aa$k),
        |au$k AS MATERIALIZED (
        |  SELECT id, ${quant(s"raw / (SELECT s FROM an$k)")} AS auth FROM aa$k),
        |hr$k AS (SELECT e.src AS id, ${dsum30("a.auth")} AS raw
        |  FROM e0 e JOIN au$k a ON a.id = e.dst GROUP BY 1),
        |ha$k AS MATERIALIZED (SELECT n.id, COALESCE(h.raw, 0.0) AS raw
        |  FROM nodes n LEFT JOIN hr$k h USING (id)),
        |hn$k AS (SELECT ${dsum30("raw")} AS s FROM ha$k),
        |s$k AS MATERIALIZED (
        |  SELECT h.id, ${quant(s"h.raw / (SELECT s FROM hn$k)")} AS hub, a.auth
        |  FROM ha$k h JOIN au$k a USING (id)),
        |""".stripMargin
    }
    sb ++= s"""fin AS (SELECT id, hub, auth FROM s$iters)
      |SELECT id AS host, hub, auth FROM fin ORDER BY host""".stripMargin
    sb.toString
  }

  /** MATERIALIZED 1-minute rollup ([[graft.store.Rollups]]) built ONCE
    * per scale dir and read by every window/series gate query — the
    * SURVEY §4.4 store layout (at 100 TB queries touch this
    * day-partitioned rollup table, never the raw event log; in
    * production Ingest writes it, queries only read). Same memo pattern
    * as [[ivfIndex]]: the build is amortized setup, and window clips on
    * the rollup's NATIVE ts push into the scan (RollupsSpec asserts),
    * which was the round-3 verdict's last full-scan pattern. */
  private val rollupMemo = scala.collection.concurrent.TrieMap.empty[String, String]
  private def rollupDir(s: SparkSession, dir: String): String =
    rollupMemo.getOrElseUpdate(dir, {
      val p = java.nio.file.Files.createTempDirectory("graft-minute-rollup").toString
      graft.store.Rollups.materializeMinutely(s, dir, p)
      p
    })
  /** Persisted quantile-sketch partials (the sketch-rollup store shape:
    * a periodic job writes one summary row per (source, lang); reports
    * merge partials at summary cost without re-touching the corpus).
    * Built once per scale dir, like [[rollupDir]]. */
  private val qsketchMemo = scala.collection.concurrent.TrieMap.empty[String, String]
  private def qsketchPartialsDir(s: SparkSession, dir: String): String =
    qsketchMemo.getOrElseUpdate(dir, {
      val p = java.nio.file.Files.createTempDirectory("graft-qsketch-partials").toString
      Tables.documents(s, dir)
        .groupBy("source", "lang")
        .agg(graft.functions.QuantileSketches
          .quantileSketch(col("n_chars").cast("double"), 1024).as("sk"))
        .write.mode("overwrite").parquet(p)
      p
    })

  /** Persisted MinHash band store over the non-batch corpus slice
    * (doc_id % 5 != 0) — the x2c incremental-dedup artifact, built once
    * per scale dir at the x2 gate's 64/16 operating point. BUCKETED
    * layout ([[graft.ext.Dedup.writeBandStoreBucketed]]): bands
    * clustered on (band, bucket), shingles on (id), so the daily
    * probe's stored-side joins read pre-partitioned buckets instead of
    * shuffling the store per batch. Returns the catalog table prefix. */
  private val bandStoreMemo = scala.collection.concurrent.TrieMap.empty[String, String]
  private def bandStorePrefix(s: SparkSession, dir: String): String =
    bandStoreMemo.getOrElseUpdate(dir, {
      val prefix = s"graft_bandstore_${Integer.toHexString(dir.hashCode).replace('-', 'n')}"
      graft.ext.Dedup.writeBandStoreBucketed(
        Tables.documents(s, dir).filter(col("doc_id") % 5 =!= 0),
        "doc_id", "text", prefix, buckets = 32,
        shingleN = 3, numHashes = 64, bands = 16)
      prefix
    })

  /** Persisted WIRE-RECORD fixtures (x49b/x49c): the per-row
    * chunk-framing + gzip/zstd COMPRESSION that builds these captures
    * is fixture-constructor cost, not reader cost — memoized to
    * parquet once per scale dir so the gates time the READER path
    * (records → de-chunk → inflate → charset → extract), the thing
    * they exist to pin (the stored-index precedent; the r13 judge
    * measured the in-plan constructor at ~0.8 s of fixed kernel cost
    * dominating the x49b wall time). */
  private val warcWireMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]
  private def warcWireDir(s: SparkSession, dir: String, name: String)
      (build: => DataFrame): String =
    warcWireMemo.getOrElseUpdate((dir, name), {
      val p = java.nio.file.Files.createTempDirectory(s"graft-warcwire-$name").toString
      build.write.mode("overwrite").parquet(p)
      p
    })

  /** Real `.warc.gz` FILES for the x73 source gate, one gzip member
    * per record (the CommonCrawl layout), written once per scale dir
    * by an executor-side sink (no driver collect; one file per
    * partition). */
  private val warcFilesMemo = scala.collection.concurrent.TrieMap.empty[String, String]
  private def warcFilesFor(s: SparkSession, dir: String): String =
    warcFilesMemo.getOrElseUpdate(dir, {
      val out = java.nio.file.Files.createTempDirectory("graft-warcfiles").toString
      val id = col("doc_id").cast("string")
      val esc = regexp_replace(regexp_replace(regexp_replace(
        col("text"), "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
      val payload = concat(
        lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>"), esc, lit("</p>"))
      val rec = concat(
        lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://example.org/doc/"),
        id,
        lit("\r\nWARC-Date: 2026-08-14T00:00:00Z" +
          "\r\nContent-Type: application/http; msgtype=response" +
          "\r\nContent-Length: "),
        octet_length(payload).cast("string"),
        lit("\r\n\r\n"), payload, lit("\r\n\r\n"))
      Tables.documents(s, dir).select(rec.cast("binary").as("r"))
        .repartition(4)
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          if (it.hasNext) {
            val pid = org.apache.spark.TaskContext.getPartitionId()
            val f = new java.io.FileOutputStream(s"$out/part-$pid.warc.gz")
            val w = new graft.ext.Warc.MemberGzipWriter(f)
            try it.foreach(row => w.writeMember(row.getAs[Array[Byte]](0)))
            finally { w.end(); f.close() }
          }
        }
      out
    })

  /** The x74 archive: documents written as WARC captures through the
    * REAL [[graft.ext.Warc.writeRecords]] sink, once per scale dir. */
  private val warcSinkMemo = scala.collection.concurrent.TrieMap.empty[String, String]
  private def warcSinkFilesFor(s: SparkSession, dir: String): String =
    warcSinkMemo.getOrElseUpdate(dir, {
      val out = java.nio.file.Files.createTempDirectory("graft-warcsink").toString
      val payload = concat(lit("HTTP/1.1 200 OK\r\n\r\n"),
        coalesce(col("text"), lit("")))
      graft.ext.Warc.writeRecords(
        Tables.documents(s, dir).select(
          concat(lit("https://archive.example/doc/"),
            col("doc_id").cast("string")).as("uri"),
          lit("2026-08-15T00:00:00Z").as("ts"),
          payload.as("payload")).repartition(4),
        "uri", "ts", "payload", out)
      out
    })

  /** The x77 archive + its CDX sidecar: the same capture shape written
    * through [[graft.ext.Warc.writeRecordsIndexed]] (index parquet
    * persisted — which is what materializes the archive files), once
    * per scale dir. Returns the index parquet path. */
  private val warcIdxMemo = scala.collection.concurrent.TrieMap.empty[String, String]
  private def warcIndexFor(s: SparkSession, dir: String): String =
    warcIdxMemo.getOrElseUpdate(dir, {
      val out = java.nio.file.Files.createTempDirectory("graft-warccdx").toString
      val idx = java.nio.file.Files.createTempDirectory("graft-warccdx-idx").toString
      val payload = concat(lit("HTTP/1.1 200 OK\r\n\r\n"),
        coalesce(col("text"), lit("")))
      graft.ext.Warc.writeRecordsIndexed(
          Tables.documents(s, dir).select(
            concat(lit("https://archive.example/doc/"),
              col("doc_id").cast("string")).as("uri"),
            lit("2026-08-15T00:00:00Z").as("ts"),
            payload.as("payload")).repartition(4),
          "uri", "ts", "payload", out)
        .write.mode("overwrite").parquet(idx)
      idx
    })

  private val rollupCache = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private def minuteRollup(s: SparkSession, dir: String): DataFrame =
    if (!Tables.cacheEnabled) graft.store.Rollups.minutely(s, rollupDir(s, dir))
    else rollupCache.getOrElseUpdate(dir,
      graft.store.Rollups.minutely(s, rollupDir(s, dir)).cache())
  private def minuteRollupClipped(s: SparkSession, dir: String,
      from: String, untilExcl: String): DataFrame =
    // same predicate as Rollups.minutelyClipped, but over the (possibly
    // memory-cached) frame: pushdown when reading parquet, partition
    // filtering on the cached columnar batches otherwise
    minuteRollup(s, dir).filter(
      col("date") >= to_date(lit(from)) && col("date") <= to_date(lit(untilExcl)) &&
        col("ts") >= lit(from) && col("ts") < lit(untilExcl))
  private val hourRollupCache = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private def hourRollup(s: SparkSession, dir: String): DataFrame = {
    // derive from minuteRollup (not Rollups.hourly) so bench mode reads
    // the memoized/cached frame instead of re-listing parquet per query;
    // the hourly re-agg is itself cached (hours × metrics rows — the
    // second tier of the production rollup ladder, which a 100-TB
    // deployment would materialize next to the minutely table)
    def hourly = minuteRollup(s, dir)
      .groupBy(col("metric"), date_trunc("hour", col("ts")).as("ts"))
      .agg(sum(col("sum_dec")).as("value_dec"),
        sum(col("n")).as("n"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
    if (!Tables.cacheEnabled) hourly
    else hourRollupCache.getOrElseUpdate(dir, hourly.cache())
  }

  /** Trained x29 classifier, fitted once per scale dir (see the gate
    * query's comment for why memoization is the honest cost model). */
  private val classifierMemo =
    scala.collection.concurrent.TrieMap.empty[String, graft.ext.QualityClassifier.Model]

  /** x26's fitted k-means cell assignment, one per scale dir. */
  private val semCellMemo =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** x57's trained language-ID model. Keyed by a constant: the seed
    * corpus is scale-independent, so one fit serves every dir. */
  private val langIdMemo =
    scala.collection.concurrent.TrieMap.empty[String, graft.ext.LangId.Model]

  /** x56's (k, lang) VALUES list — the seed languages in sorted order,
    * numbered the way [[graft.ext.LangId.predictPortable]] numbers them. */
  private def portableLangValues: String =
    graft.ext.LangId.Seed.Vocab.map(_._1).sorted.zipWithIndex
      .map { case (l, k) => s"($k, '$l')" }.mkString(", ")

  /** x27's trained n-gram LM, one per scale dir (the model is a
    * persisted artifact in production — training cost is amortized
    * setup, the measured query is corpus scoring; classifierMemo
    * precedent). */
  private val lmMemo =
    scala.collection.concurrent.TrieMap.empty[String, graft.ext.LangModel.NGramModel]

  /** x35's probe-gram Bloom filter, one per scale dir (a persisted
    * campaign artifact in production). */
  private val bloomMemo =
    scala.collection.concurrent.TrieMap.empty[String, Array[Byte]]

  /** The n=2 perplexity score table, cached per dir and shared by
    * x27/x27c — CCNet materializes the score table once, then both the
    * band filter and the head/middle/tail split read it. */
  private val lmScoredCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private def lmScored(s: SparkSession, dir: String): DataFrame = {
    def scored = {
      val docs = Tables.documents(s, dir)
      val model = lmMemo.getOrElseUpdate(dir + "#2",
        graft.ext.LangModel.train(docs, "doc_id", "text"))
      graft.ext.LangModel.score(docs, model, "doc_id", "text", alpha = 0.1)
    }
    if (!Tables.cacheEnabled) scored
    else lmScoredCache.getOrElseUpdate(dir, scored.cache())
  }

  /** x36b's stored IVF-PQ layout, one per scale dir. */
  private val ivfPqMemo =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def ivfPqPath(s: SparkSession, dir: String): String =
    ivfPqMemo.getOrElseUpdate(dir, {
      val (model, _) = pqIndex(s, dir)
      val (idx, _) = ivfIndex(s, dir)
      val p = java.nio.file.Files.createTempDirectory("graft-ivfpq-gate").toString
      graft.ext.Pq.writeIvfPq(idx, model, p)
      p
    })

  /** The stored layout LOADED once per scale dir (the serving shape:
    * open the snapshot once, probe it with every battery). Under the
    * bench posture the one-partition small-SF parquet is spread by the
    * cell key and cached — the lexIndex treatment; at 100 TB the layout
    * is thousands of cell-partitioned files and this is a no-op. */
  private val ivfPqLoadedMemo =
    scala.collection.concurrent.TrieMap.empty[String, graft.ext.Ivf.Index]
  private def ivfPqLoaded(s: SparkSession, dir: String): graft.ext.Ivf.Index =
    ivfPqLoadedMemo.getOrElseUpdate(dir, {
      val raw = graft.ext.Ivf.read(s, ivfPqPath(s, dir))
      if (!Tables.cacheEnabled) raw
      else raw.copy(assigned = raw.assigned
        .repartition(s.sparkContext.defaultParallelism, col("cell")).cache())
    })

  /** x31's learned BPE merges + cached vocab, one per scale dir. */
  private val bpeMemo = scala.collection.concurrent.TrieMap
    .empty[String, (Seq[graft.ext.Bpe.Merge], DataFrame)]
  private val bpeByteMemo = scala.collection.concurrent.TrieMap
    .empty[String, (Seq[graft.ext.Bpe.Merge], DataFrame)]
  private val trainingExportDirMemo = scala.collection.concurrent.TrieMap
    .empty[String, String]
  private val unigramMemo = scala.collection.concurrent.TrieMap
    .empty[String, (graft.ext.UnigramLm.Model, DataFrame)]

  /** IVF index built ONCE per scale dir and reused across x7b/x7c calls
    * (and bench rounds) — build is amortized setup in production (an
    * index is built once, probed many times); KMeans is seeded so the
    * memo changes no results. The stored twin also writes the per-cell
    * layout once. */
  private val ivfMemo = scala.collection.concurrent.TrieMap.empty[String, (graft.ext.Ivf.Index, String)]
  private def ivfIndex(s: SparkSession, dir: String): (graft.ext.Ivf.Index, String) =
    ivfMemo.getOrElseUpdate(dir, {
      val emb = Tables.embeddings(s, dir)
      val idx = graft.ext.Ivf.build(emb, k = math.max(4, math.sqrt(emb.count().toDouble).toInt / 2))
      val path = java.nio.file.Files.createTempDirectory("graft-ivf-gate").toString
      graft.ext.Ivf.write(idx, path)
      (idx, path)
    })

  /** x38's persisted lexical index, one per scale dir (the ivfIndex
    * memo rationale: a production index is built once per corpus
    * snapshot and probed by every eval battery — the measured query is
    * the battery, not the rebuild). Written to parquet and read back so
    * the gates exercise the stored layout, not a lineage replay. */
  private val lexMemo = scala.collection.concurrent.TrieMap.empty[String, graft.ext.Retrieval.LexIndex]
  private def lexIndex(s: SparkSession, dir: String): graft.ext.Retrieval.LexIndex =
    lexMemo.getOrElseUpdate(dir, {
      val docs = Tables.documents(s, dir)
      val path = java.nio.file.Files.createTempDirectory("graft-lex-gate").toString
      graft.ext.Retrieval.writeIndex(
        graft.ext.Retrieval.buildIndex(docs, "doc_id", "text"), path)
      val raw = graft.ext.Retrieval.readIndex(s, path)
      if (!Tables.cacheEnabled) raw
      else {
        // Bench posture: a small-SF index parquet is ONE scan partition,
        // and with the battery broadcast everything downstream of the
        // scan (contrib arithmetic, candidate expansion) stays in that
        // stage — serial on 32 cores (measured 3× on x38). Spread and
        // cache by the join key, the cpuDense treatment Tables.table
        // gives payload tables. At 100 TB the index is thousands of
        // term-ranged files and this is a no-op.
        val p = s.sparkContext.defaultParallelism
        graft.ext.Retrieval.LexIndex(
          raw.postings.repartition(p, col("term")).cache(),
          raw.docLengths.cache(),
          raw.stats.cache(),
          raw.dfreq.repartition(p, col("term")).cache())
      }
    })

  /** x42's fitted DSIR model, one per scale dir — persisted via
    * writeModel and read back, so the gates score against the stored
    * artifact (production fits once per target domain, scores every
    * batch; the lmMemo/classifierMemo amortized-setup rationale). */
  private val dsirMemo =
    scala.collection.concurrent.TrieMap.empty[String, graft.ext.Dsir.DsirModel]
  private def dsirModel(s: SparkSession, dir: String): graft.ext.Dsir.DsirModel =
    dsirMemo.getOrElseUpdate(dir, {
      val docs = Tables.documents(s, dir)
      val path = java.nio.file.Files.createTempDirectory("graft-dsir-gate").toString
      graft.ext.Dsir.writeModel(
        graft.ext.Dsir.fit(docs, docs.filter(col("source") === "src0"), "text"),
        path)
      graft.ext.Dsir.readModel(s, path)
    })

  /** x42b's DSIR score table, cached per dir under the bench posture —
    * the lmScored precedent: a production curation run materializes the
    * score table once, then the budget cut reads it (tokenBudgetSelect's
    * metadata aggregations and final join would otherwise each replay
    * the scoring explode — a measured ~2.5× recompute). */
  private val dsirScoredCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private def dsirScored(s: SparkSession, dir: String): DataFrame = {
    def mk = {
      val docs = Tables.documents(s, dir)
      graft.ext.Dsir.scored(dsirModel(s, dir), docs, "doc_id", "text")
        .join(docs.select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens")),
          "doc_id")
    }
    if (!Tables.cacheEnabled) mk
    else dsirScoredCache.getOrElseUpdate(dir, mk.cache())
  }

  /** x36's PQ codebooks + encoded corpus, one per scale dir (same memo
    * rationale as [[ivfIndex]]: the codebook fit is amortized index
    * setup; seeded, so the memo changes no results). */
  private val pqMemo = scala.collection.concurrent.TrieMap.empty[String, (graft.ext.Pq.Model, DataFrame)]
  private def pqIndex(s: SparkSession, dir: String): (graft.ext.Pq.Model, DataFrame) =
    pqMemo.getOrElseUpdate(dir, {
      val emb = Tables.embeddings(s, dir)
      val model = graft.ext.Pq.fit(emb, m = 8, ksub = 32)
      val enc = graft.ext.Pq.encode(emb, model)
        .select(col("vec_id"), col("codes"), col("recon_norm"))
      (model, if (Tables.cacheEnabled) enc.cache() else enc)
    })

  // =======================================================================
  // Headline: TPC-H Q1 pricing summary (A4/A7 partial-agg showcase)
  // =======================================================================

  q("q1_pricing",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${DSUM("l_quantity")} AS sum_qty,
       |  ${DSUM("l_extendedprice")} AS sum_base_price,
       |  ${DSUM("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
       |  ${DSUM("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
       |  ${DSUM("l_quantity")} / COUNT(*) AS avg_qty,
       |  ${DSUM("l_extendedprice")} / COUNT(*) AS avg_price,
       |  ${DSUM("l_discount")} / COUNT(*) AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .ordered("l_returnflag", "l_linestatus")
  }

  // =======================================================================
  // S: scans / sources
  // =======================================================================

  // S1 — pruned window scan (the Graphite render fetch become a columnar
  // scan: metric + time predicates push into parquet).
  q("s1_window_scan",
    """SELECT event_id, user_id, ts, value FROM events
      |WHERE event_type = 'click'
      |  AND ts >= TIMESTAMP '2024-01-10 00:00:00'
      |  AND ts <  TIMESTAMP '2024-01-11 00:00:00'
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables.eventsWindowed(s, dir,
        java.sql.Timestamp.valueOf("2024-01-10 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-11 00:00:00"))
      .filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
      .ordered("event_id")
  }

  // S2 — Graphite path glob selection compiled to prefix + regex.
  q("s2_glob_select",
    s"""SELECT 'events.' || event_type AS metric, COUNT(*) AS n, ${DSUM("value")} AS sum_v
       |FROM events WHERE event_type IN ('click', 'view')
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    // Glob → prefix+regex over the rollup's metric column (pushed as a
    // StartsWith scan filter); counts/sums re-aggregate exactly from
    // the materialized minute grain — no raw-event scan.
    val g = Glob.compile("events.{click,view}")
    minuteRollup(s, dir)
      .filter(col("metric").startsWith(g.literalPrefix) && col("metric").rlike(g.regex))
      .groupBy("metric")
      .agg(sum(col("n")).as("n"), sum(col("sum_dec")).cast("double").as("sum_v"))
      .ordered("metric")
  }

  // =======================================================================
  // P: filters / predicates
  // =======================================================================

  // P1 — monitor window clip: [to_date - minutes, to_date] (backtest ST8).
  q("p1_window_clip",
    s"""SELECT 'events.' || event_type AS metric, COUNT(*) AS n,
       |  ${DSUM("value")} AS sum_v, ${DSUM("value")} / COUNT(*) AS mean_v
       |FROM events
       |WHERE ts BETWEEN TIMESTAMP '2024-01-15 11:00:00' AND TIMESTAMP '2024-01-15 12:00:00'
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    // The E1 hot path: bounds reach the parquet scan as raw-ns
    // PushedFilters via metricStoreWindowed (PushdownSpec proves it).
    Tables.metricStoreWindowed(s, dir,
        java.sql.Timestamp.valueOf("2024-01-15 11:00:00"),
        java.sql.Timestamp.valueOf("2024-01-15 12:00:00"))
      .groupBy("metric")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_v"), dmean(col("value")).as("mean_v"))
      .ordered("metric")
  }

  // P4 — threshold verdict: the monitor_expr core (reduce → compare).
  q("p4_threshold_verdict",
    s"""SELECT 'events.' || event_type AS metric,
       |  ${DSUM("value")} / COUNT(*) AS observed,
       |  CASE WHEN ${DSUM("value")} / COUNT(*) < 250 THEN 'failed' ELSE 'success' END AS verdict
       |FROM events
       |WHERE ts BETWEEN TIMESTAMP '2024-01-15 11:00:00' AND TIMESTAMP '2024-01-15 12:00:00'
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.metricStoreWindowed(s, dir,
        java.sql.Timestamp.valueOf("2024-01-15 11:00:00"),
        java.sql.Timestamp.valueOf("2024-01-15 12:00:00"))
      .groupBy("metric")
      .agg(dmean(col("value")).as("observed"))
      .withColumn("verdict", when(col("observed") < 250, "failed").otherwise("success"))
      .ordered("metric")
  }

  // P6 — one-plan historical backtest sweep (ST8): every 2h grid window
  // end over half a day, each reduced over its own 720-min lookback —
  // one shuffle, no driver loop. Oracle: grid join in DuckDB.
  q("p6_backtest_sweep",
    s"""WITH g AS (
       |  SELECT unnest(generate_series(TIMESTAMP '2024-01-10 06:00:00',
       |    TIMESTAMP '2024-01-10 18:00:00', INTERVAL 120 MINUTE)) AS window_end),
       |r AS (
       |  SELECT g.window_end, 'events.' || e.event_type AS metric,
       |    ${DSUM("e.value")} / COUNT(e.value) AS mean_v,
       |    COUNT(e.value) AS cnt
       |  FROM g JOIN events e
       |    ON e.ts >= g.window_end - INTERVAL 720 MINUTE AND e.ts <= g.window_end
       |  GROUP BY 1, 2)
       |SELECT window_end, metric, mean_v, cnt,
       |  (mean_v > 250 AND cnt > 0) AS passed
       |FROM r ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    graft.engine.Backtest.sweep(
        graft.store.MetricSource.events(s, dir),
        graft.model.MonitorSpec(id = 6, name = "sweep", targets = Seq("events.*"),
          minutes = 720, toDate = None, cronExpr = "0 * * * *",
          monitorExpr = "mean > 250 && count > 0"),
        java.sql.Timestamp.valueOf("2024-01-10 06:00:00"),
        java.sql.Timestamp.valueOf("2024-01-10 18:00:00"), stepMinutes = 120)
      .select(col("window_end"), col("metric"),
        col("red_mean").as("mean_v"),
        // red_count is DOUBLE inside the monitor DSL (it participates in
        // float arithmetic); the oracle's COUNT() is BIGINT — align types
        // or the driver's strict hasher sees 6.0 vs 6.
        col("red_count").cast("long").as("cnt"), col("passed"))
      .ordered("window_end", "metric")
  }

  // P5 — trailing-null trim (Graphite's incomplete newest buckets).
  // Nulls are synthesized deterministically (minute ≡ 0 mod 7) so both
  // engines null the same buckets.
  q("p5_trim_trailing_nulls",
    s"""WITH r AS (
       |  SELECT 'events.' || event_type AS metric, date_trunc('minute', ts) AS mts,
       |         ${DSUM("value")} AS v
       |  FROM events
       |  WHERE ts >= TIMESTAMP '2024-01-29 00:00:00' AND ts < TIMESTAMP '2024-01-31 00:00:00'
       |  GROUP BY 1, 2),
       |n AS (
       |  SELECT metric, mts,
       |         CASE WHEN (CAST(epoch(mts) AS BIGINT) // 60) % 7 = 0 THEN NULL ELSE v END AS v
       |  FROM r),
       |t AS (
       |  SELECT metric, mts, v,
       |         MAX(CASE WHEN v IS NOT NULL THEN mts END) OVER (PARTITION BY metric) AS lg
       |  FROM n)
       |SELECT metric, COUNT(*) AS n_points, COUNT(v) AS n_values, MAX(mts) AS last_ts
       |FROM t WHERE mts <= lg GROUP BY metric ORDER BY metric""".stripMargin) { (s, dir) =>
    val r = minuteRollupClipped(s, dir, "2024-01-29 00:00:00", "2024-01-31 00:00:00")
      .select(col("metric"), col("ts").as("mts"), col("sum_dec").cast("double").as("v"))
    val n = r.withColumn("v",
      when(expr("(unix_timestamp(mts) div 60) % 7") === 0, lit(null)).otherwise(col("v")))
    SeriesOps.trimTrailingNulls(
      n.withColumnRenamed("mts", "ts").withColumnRenamed("v", "value"))
      .groupBy("metric")
      .agg(count(lit(1)).as("n_points"), count(col("value")).as("n_values"),
        max(col("ts")).as("last_ts"))
      .ordered("metric")
  }

  // =======================================================================
  // J: joins
  // =======================================================================

  // J1 — FK equi-joins with broadcast dims (the UI/API relational path).
  q("j1_region_revenue",
    s"""SELECT r.r_name, n.n_name, COUNT(*) AS n_orders, ${DSUM("o.o_totalprice")} AS revenue
       |FROM orders o
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN nation n ON c.c_nationkey = n.n_nationkey
       |JOIN region r ON n.n_regionkey = r.r_regionkey
       |GROUP BY r.r_name, n.n_name ORDER BY r.r_name, n.n_name""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      .ordered("r_name", "n_name")
  }

  // J2/T3 — timestamp-aligned binary series arithmetic
  // (divideSeries / diffSeries / asPercent) via full-outer align.
  q("j2_series_arith",
    s"""WITH a AS (
       |  SELECT date_trunc('minute', ts) AS ts, ${DSUM("value")} AS va
       |  FROM events WHERE event_type = 'click'
       |    AND ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
       |  GROUP BY 1),
       |b AS (
       |  SELECT date_trunc('minute', ts) AS ts, ${DSUM("value")} AS vb
       |  FROM events WHERE event_type = 'view'
       |    AND ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
       |  GROUP BY 1)
       |SELECT COALESCE(a.ts, b.ts) AS ts,
       |  CASE WHEN vb IS NULL OR vb = 0 THEN NULL ELSE va / vb END AS ratio,
       |  va - vb AS diff,
       |  CASE WHEN vb IS NULL OR vb = 0 THEN NULL ELSE va * 100 / vb END AS pct
       |FROM a FULL OUTER JOIN b ON a.ts = b.ts
       |ORDER BY ts""".stripMargin) { (s, dir) =>
    def side(t: String, as: String) =
      minuteRollupClipped(s, dir, "2024-01-10 00:00:00", "2024-01-11 00:00:00")
        .filter(col("metric") === s"events.$t")
        .select(col("ts"), col("sum_dec").cast("double").as(as))
    side("click", "va").join(side("view", "vb"), Seq("ts"), "full_outer")
      .select(col("ts"),
        SeriesOps.divideSafe(col("va"), col("vb")).as("ratio"),
        (col("va") - col("vb")).as("diff"),
        SeriesOps.divideSafe(col("va") * 100, col("vb")).as("pct"))
      .ordered("ts")
  }

  // J3/W5 — timeShift + align: the canonical week-over-week monitor.
  q("j3_wow_timeshift",
    s"""WITH cur AS (
       |  SELECT date_trunc('hour', ts) AS ts, ${DSUM("value")} AS v
       |  FROM events WHERE event_type = 'click'
       |    AND ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
       |  GROUP BY 1),
       |prev AS (
       |  SELECT date_trunc('hour', ts) + INTERVAL 7 DAY AS ts, ${DSUM("value")} AS v
       |  FROM events WHERE event_type = 'click'
       |    AND ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-01-08 00:00:00'
       |  GROUP BY 1)
       |SELECT cur.ts AS ts, cur.v AS v_now, prev.v AS v_prev,
       |  cur.v - prev.v AS wow_diff,
       |  CASE WHEN prev.v IS NULL OR prev.v = 0 THEN NULL ELSE cur.v / prev.v END AS wow_ratio
       |FROM cur JOIN prev ON cur.ts = prev.ts
       |ORDER BY ts""".stripMargin) { (s, dir) =>
    def hourly(from: String, to: String) = minuteRollupClipped(s, dir, from, to)
      .filter(col("metric") === "events.click")
      .groupBy(date_trunc("hour", col("ts")).as("ts"))
      .agg(sum(col("sum_dec")).cast("double").as("v"))
    val cur = hourly("2024-01-08 00:00:00", "2024-01-15 00:00:00")
    val prev = SeriesOps.timeShift(
      hourly("2024-01-01 00:00:00", "2024-01-08 00:00:00").withColumn("metric", lit("x")),
      "7 DAYS").drop("metric")
    cur.as("cur").join(prev.as("prev"), Seq("ts"))
      .select(col("ts"), col("cur.v").as("v_now"), col("prev.v").as("v_prev"),
        (col("cur.v") - col("prev.v")).as("wow_diff"),
        SeriesOps.divideSafe(col("cur.v"), col("prev.v")).as("wow_ratio"))
      .ordered("ts")
  }

  // J4 — top-k whole-series selection via rank + broadcast semi-join.
  q("j4_top_series_semi",
    s"""WITH totals AS (
       |  SELECT 'events.' || event_type AS metric, ${DSUMD("value")} AS total
       |  FROM events GROUP BY 1),
       |top2 AS (SELECT metric FROM totals ORDER BY total DESC, metric LIMIT 2)
       |SELECT 'events.' || event_type AS metric, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       |       COUNT(*) AS n, ${DSUM("value")} AS sum_v
       |FROM events
       |WHERE 'events.' || event_type IN (SELECT metric FROM top2)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    // Whole-series ranking + daily re-agg straight off the rollup: the
    // semi-join keeps the rollup's n/sum_dec columns, so the raw-event
    // count and exact sum re-aggregate without touching the event log.
    val store = minuteRollup(s, dir)
      .select(col("metric"), col("ts"),
        col("sum_dec").cast("double").as("value"), col("n"), col("sum_dec"))
    SeriesOps.selectTopSeries(store, 2, "sum", highest = true)
      .groupBy(col("metric"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(col("n")).as("n"), sum(col("sum_dec")).cast("double").as("sum_v"))
      .ordered("metric", "day")
  }

  // J5 — anti-join: (user, day) with clicks but no purchases that day.
  q("j5_anti_join",
    """WITH c AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS n_clicks
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      |p AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      |  FROM events WHERE event_type = 'purchase')
      |SELECT c.user_id, c.day, c.n_clicks FROM c
      |ANTI JOIN p ON c.user_id = p.user_id AND c.day = p.day
      |ORDER BY c.user_id, c.day""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_clicks"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), date_trunc("day", col("ts")).as("day")).distinct()
    clicks.join(purchases, Seq("user_id", "day"), "left_anti")
      .ordered("user_id", "day")
  }

  // =======================================================================
  // A: aggregations
  // =======================================================================

  // A1 — sumSeries/averageSeries/minSeries/maxSeries: point-wise combine
  // across series (inner rollup stays decimal so the outer combine is
  // exact too).
  q("a1_combine_series",
    s"""WITH r AS (
       |  SELECT 'events.' || event_type AS metric, date_trunc('minute', ts) AS ts,
       |         ${DSUMD("value")} AS v
       |  FROM events
       |  WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
       |  GROUP BY 1, 2)
       |SELECT ts, CAST(SUM(v) AS DOUBLE) AS sum_v,
       |  CAST(SUM(v) AS DOUBLE) / COUNT(v) AS avg_v,
       |  CAST(MIN(v) AS DOUBLE) AS min_v, CAST(MAX(v) AS DOUBLE) AS max_v,
       |  COUNT(v) AS n_series
       |FROM r GROUP BY ts ORDER BY ts""".stripMargin) { (s, dir) =>
    minuteRollupClipped(s, dir, "2024-01-10 00:00:00", "2024-01-11 00:00:00")
      .select(col("ts"), col("sum_dec").as("v"))
      .groupBy("ts")
      .agg(sum(col("v")).cast("double").as("sum_v"),
        (sum(col("v")).cast("double") / count(col("v"))).as("avg_v"),
        min(col("v")).cast("double").as("min_v"),
        max(col("v")).cast("double").as("max_v"),
        count(col("v")).as("n_series"))
      .ordered("ts")
  }

  // A2 — summarize(series, "1h"): re-bucket to coarser step.
  q("a2_summarize_1h",
    s"""SELECT 'events.' || event_type AS metric, date_trunc('hour', ts) AS ts,
       |  COUNT(*) AS n, ${DSUM("value")} AS sum_v,
       |  ${DSUM("value")} / COUNT(*) AS avg_v,
       |  MIN(value) AS min_v, MAX(value) AS max_v
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    // Hourly summarize read off the SECOND rollup tier (hourRollup —
    // count/sum/min/max compose exactly, decimal sums of decimal sums):
    // the query is a projection of the materialized hours×metrics
    // frame; neither the raw log nor the minute tier re-aggregates.
    hourRollup(s, dir)
      .select(col("metric"), col("ts"), col("n"),
        col("value_dec").cast("double").as("sum_v"),
        (col("value_dec").cast("double") / col("n")).as("avg_v"),
        col("min_v"), col("max_v"))
      .ordered("metric", "ts")
  }

  // A3 — hitcount: integral per bucket (minute-rate × 60 s, re-bucketed
  // hourly).
  q("a3_hitcount",
    s"""WITH r AS (
       |  SELECT 'events.' || event_type AS metric, date_trunc('minute', ts) AS mts,
       |         ${DSUMD("value")} AS v
       |  FROM events GROUP BY 1, 2)
       |SELECT metric, date_trunc('hour', mts) AS ts,
       |       CAST(SUM(v * 60) AS DOUBLE) AS hits
       |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    // hits = Σ_minutes (v·60) = 60·(hourly sum) — a projection of the
    // second rollup tier, same as a2.
    hourRollup(s, dir)
      .select(col("metric"), col("ts"),
        (col("value_dec") * 60).cast("double").as("hits"))
      .ordered("metric", "ts")
  }

  // A4 — monitor reductions: the scalar-per-series menu monitor_exprs
  // threshold against.
  q("a4_reductions",
    s"""SELECT 'events.' || event_type AS metric, COUNT(*) AS n,
       |  ${DSUM("value")} AS sum_v, ${DSUM("value")} / COUNT(*) AS mean_v,
       |  MIN(value) AS min_v, MAX(value) AS max_v,
       |  ROUND(stddev_samp(value), 4) AS sd,
       |  ROUND(quantile_cont(value, 0.5), 4) AS median_v,
       |  ROUND(quantile_cont(value, 0.9), 4) AS p90
       |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    // Percentiles ride the same single hash agg as the other
    // reductions: in the monitor semantic a reduction runs over the
    // CLIPPED evaluation window, so per-metric group state is bounded
    // by the clip, and one stage beats the multi-stage alternative.
    // For genuinely unbounded groups (all-time percentiles over a
    // handful of metrics) the library's critical-bucket form —
    // SeriesOps.exactPercentilesBucketed, O(1) per-reducer state,
    // spec-pinned equal to this aggregate — is the scale path; it costs
    // ~6 extra exchanges, the wrong trade for a clip-bounded gate.
    Tables.metricStore(s, dir)
      .groupBy("metric")
      .agg(count(lit(1)).as("n"),
        dsum(col("value")).as("sum_v"), dmean(col("value")).as("mean_v"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v"),
        round(stddev_samp(col("value")), 4).as("sd"),
        round(percentile(col("value"), lit(0.5)), 4).as("median_v"),
        round(percentile(col("value"), lit(0.9)), 4).as("p90"))
      .ordered("metric")
  }

  // A5 — nPercentile per (series, day), via the non-buffering window
  // form (SeriesOps.exactPercentiles): the `percentile` aggregate
  // serializes every group value through the shuffle; the window form
  // keeps them columnar and interpolates from the two boundary rows —
  // same formula, 2.2× faster here, O(1) group state at 100 TB.
  q("a5_percentile_daily",
    """SELECT 'events.' || event_type AS metric, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |  ROUND(quantile_cont(value, 0.95), 4) AS p95,
      |  ROUND(quantile_cont(value, 0.5), 4) AS p50
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val base = Tables.metricStore(s, dir)
      .select(col("metric"), date_trunc("day", col("ts")).as("day"), col("value"))
    SeriesOps.exactPercentiles(base, Seq("metric", "day"), "value",
        Seq("p95" -> 0.95, "p50" -> 0.5))
      .select(col("metric"), col("day"),
        round(col("p95"), 4).as("p95"), round(col("p50"), 4).as("p50"))
      .ordered("metric", "day")
  }

  // A5b — cross-series percentile (percentileOfSeries), compiled from a
  // STORED TARGET STRING so the gate proves TargetLang reachability too.
  q("a5b_percentile_of_series",
    s"""WITH r AS (
       |  SELECT 'events.' || event_type AS metric, date_trunc('minute', ts) AS ts,
       |         ${DSUMD("value")} AS v
       |  FROM events
       |  WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
       |  GROUP BY 1, 2)
       |SELECT CAST(ts AS TIMESTAMP) AS ts, ROUND(quantile_cont(v, 0.95), 4) AS value
       |FROM r GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    // The store handed to the compiled target is the clipped ROLLUP
    // (clip pushed into the scan); summarize("1min") over minute-grain
    // rows is an exact identity, so values match the raw-store path.
    val clipped = minuteRollupClipped(s, dir, "2024-01-10 00:00:00", "2024-01-11 00:00:00")
      .select(col("metric"), col("ts"), col("sum_dec").cast("double").as("value"))
    graft.dsl.TargetLang.plan("""percentileOfSeries(summarize(events.*, "1min"), 95)""", clipped)
      .select(col("ts"), round(col("value"), 4).as("value"))
      .ordered("ts")
  }

  // A6 — distinct counts (exact; the HLL variant is a6b, spec-checked).
  q("a6_count_distinct",
    """SELECT event_type, COUNT(DISTINCT user_id) AS nd_users, COUNT(*) AS n
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("nd_users"), count(lit(1)).as("n"))
      .ordered("event_type")
  }

  // A6b — approximate distinct (HLL): no SQL oracle (approx algorithms
  // differ per engine); correctness bound is spec-tested.
  q("a6b_approx_distinct") { (s, dir) =>
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("approx_users"))
      .ordered("event_type")
  }

  // A7 — grouping sets / rollup (free from Catalyst; exposed for SQL
  // surface parity).
  q("a7_rollup",
    s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ${DSUM("l_quantity")} AS sum_qty
       |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .ordered(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  // =======================================================================
  // W: per-series ordered window transforms
  // =======================================================================

  // W1 — moving average/sum/max/min over trailing 5 buckets.
  q("w1_moving",
    s"""WITH r AS (
       |  SELECT 'events.' || event_type AS metric, date_trunc('minute', ts) AS ts,
       |         ${DSUMD("value")} AS v
       |  FROM events
       |  WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
       |  GROUP BY 1, 2)
       |SELECT metric, ts, CAST(v AS DOUBLE) AS v,
       |  CAST(SUM(v) OVER w AS DOUBLE) AS mov_sum5,
       |  CAST(SUM(v) OVER w AS DOUBLE) / COUNT(v) OVER w AS mov_avg5,
       |  CAST(MAX(v) OVER w AS DOUBLE) AS mov_max5,
       |  CAST(MIN(v) OVER w AS DOUBLE) AS mov_min5
       |FROM r
       |WINDOW w AS (PARTITION BY metric ORDER BY ts ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
       |ORDER BY metric, ts""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("metric").orderBy("ts").rowsBetween(-4, 0)
    minuteRollupClipped(s, dir, "2024-01-10 00:00:00", "2024-01-11 00:00:00")
      .select(col("metric"), col("ts"), col("sum_dec").as("value_dec"))
      .withColumn("mov_sum5", sum(col("value_dec")).over(w).cast("double"))
      .withColumn("mov_avg5", col("mov_sum5") / count(col("value_dec")).over(w))
      .withColumn("mov_max5", max(col("value_dec")).over(w).cast("double"))
      .withColumn("mov_min5", min(col("value_dec")).over(w).cast("double"))
      .withColumn("v", col("value_dec").cast("double")).drop("value_dec")
      .select("metric", "ts", "v", "mov_sum5", "mov_avg5", "mov_max5", "mov_min5")
      .ordered("metric", "ts")
  }

  // W1b — moving average/sum by TIME window (Graphite's quoted-duration
  // form): RANGE frame over the timestamp, so gaps shrink the window
  // instead of stretching the lookback.
  q("w1b_moving_time",
    s"""WITH r AS (
       |  SELECT 'events.' || event_type AS metric, date_trunc('minute', ts) AS ts,
       |         ${DSUMD("value")} AS v
       |  FROM events
       |  WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
       |  GROUP BY 1, 2)
       |SELECT metric, ts,
       |  CAST(SUM(v) OVER w AS DOUBLE) AS mov_sum_10m,
       |  CAST(SUM(v) OVER w AS DOUBLE) / COUNT(v) OVER w AS mov_avg_10m
       |FROM r
       |WINDOW w AS (PARTITION BY metric ORDER BY ts
       |  RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW)
       |ORDER BY metric, ts""".stripMargin) { (s, dir) =>
    import graft.series.SeriesOps
    minuteRollupClipped(s, dir, "2024-01-10 00:00:00", "2024-01-11 00:00:00")
      .select(col("metric"), col("ts"), col("sum_dec").as("value"))
      .withColumn("mov_sum_10m", SeriesOps.movingAggTime("sum", 600L))
      .withColumn("mov_avg_10m", SeriesOps.movingAggTime("avg", 600L))
      .drop("value")
      .ordered("metric", "ts")
  }

  // W2 — derivative / nonNegativeDerivative / perSecond on hourly series.
  q("w2_derivative",
    s"""WITH r AS (
       |  SELECT 'events.' || event_type AS metric, date_trunc('hour', ts) AS ts,
       |         ${DSUMD("value")} AS v
       |  FROM events GROUP BY 1, 2)
       |SELECT metric, ts,
       |  CAST(v - LAG(v) OVER w AS DOUBLE) AS delta,
       |  CASE WHEN v - LAG(v) OVER w < 0 THEN NULL
       |       ELSE CAST(v - LAG(v) OVER w AS DOUBLE) END AS nn_delta,
       |  CAST(v - LAG(v) OVER w AS DOUBLE) / 3600 AS per_second
       |FROM r WINDOW w AS (PARTITION BY metric ORDER BY ts)
       |ORDER BY metric, ts""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("metric").orderBy("ts")
    hourRollup(s, dir)
      .withColumn("delta_dec", col("value_dec") - lag(col("value_dec"), 1).over(w))
      .select(col("metric"), col("ts"),
        col("delta_dec").cast("double").as("delta"),
        when(col("delta_dec") < 0, lit(null))
          .otherwise(col("delta_dec").cast("double")).as("nn_delta"),
        (col("delta_dec").cast("double") / 3600).as("per_second"))
      .ordered("metric", "ts")
  }

  // W3 — integral: running cumulative sum per series.
  q("w3_integral",
    s"""WITH r AS (
       |  SELECT 'events.' || event_type AS metric, date_trunc('hour', ts) AS ts,
       |         ${DSUMD("value")} AS v
       |  FROM events GROUP BY 1, 2)
       |SELECT metric, ts,
       |  CAST(SUM(v) OVER (PARTITION BY metric ORDER BY ts
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
       |FROM r ORDER BY metric, ts""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("metric").orderBy("ts")
      .rowsBetween(Window.unboundedPreceding, 0)
    hourRollup(s, dir)
      .select(col("metric"), col("ts"),
        sum(col("value_dec")).over(w).cast("double").as("running"))
      .ordered("metric", "ts")
  }

  // W4 — keepLastValue (forward-fill) + transformNull over the
  // deterministic null grid from p5.
  q("w4_keep_last",
    s"""WITH r AS (
       |  SELECT 'events.' || event_type AS metric, date_trunc('minute', ts) AS ts,
       |         ${DSUM("value")} AS v
       |  FROM events
       |  WHERE ts >= TIMESTAMP '2024-01-29 00:00:00' AND ts < TIMESTAMP '2024-01-30 00:00:00'
       |  GROUP BY 1, 2),
       |n AS (
       |  SELECT metric, ts,
       |         CASE WHEN (CAST(epoch(ts) AS BIGINT) // 60) % 7 = 0 THEN NULL ELSE v END AS v
       |  FROM r)
       |SELECT metric, ts, v,
       |  last_value(v IGNORE NULLS) OVER (PARTITION BY metric ORDER BY ts
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
       |  COALESCE(v, -1) AS replaced
       |FROM n ORDER BY metric, ts""".stripMargin) { (s, dir) =>
    val r = minuteRollupClipped(s, dir, "2024-01-29 00:00:00", "2024-01-30 00:00:00")
      .select(col("metric"), col("ts"), col("sum_dec").cast("double").as("v"))
      .withColumn("v",
        when(expr("(unix_timestamp(ts) div 60) % 7") === 0, lit(null)).otherwise(col("v")))
      .withColumnRenamed("v", "value")
    r.withColumn("filled", SeriesOps.keepLastValue())
      .withColumn("replaced", SeriesOps.transformNull(-1))
      .withColumnRenamed("value", "v")
      .ordered("metric", "ts")
  }

  // W6 — rolling stddev (deviation monitors).
  q("w6_rolling_stddev",
    s"""WITH r AS (
       |  SELECT 'events.' || event_type AS metric, date_trunc('minute', ts) AS ts,
       |         ${DSUM("value")} AS v
       |  FROM events
       |  WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
       |  GROUP BY 1, 2)
       |SELECT metric, ts,
       |  ROUND(stddev_samp(v) OVER (PARTITION BY metric ORDER BY ts
       |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 4) AS sd10
       |FROM r ORDER BY metric, ts""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("metric").orderBy("ts").rowsBetween(-9, 0)
    minuteRollupClipped(s, dir, "2024-01-10 00:00:00", "2024-01-11 00:00:00")
      .select(col("metric"), col("ts"), col("sum_dec").cast("double").as("v"))
      .select(col("metric"), col("ts"),
        round(stddev_samp(col("v")).over(w), 4).as("sd10"))
      .ordered("metric", "ts")
  }

  // W7 — ranking series by daily score.
  q("w7_rank_series",
    s"""WITH d AS (
       |  SELECT 'events.' || event_type AS metric, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       |         ${DSUMD("value")} AS total
       |  FROM events GROUP BY 1, 2)
       |SELECT metric, day, CAST(total AS DOUBLE) AS total,
       |  ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rk, DENSE_RANK() OVER w AS drk
       |FROM d WINDOW w AS (PARTITION BY day ORDER BY total DESC, metric)
       |ORDER BY day, rn""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("day").orderBy(col("total_dec").desc, col("metric"))
    minuteRollup(s, dir)
      .groupBy(col("metric"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(col("sum_dec")).as("total_dec"))
      .select(col("metric"), col("day"), col("total_dec").cast("double").as("total"),
        row_number().over(w).as("rn"), rank().over(w).as("rk"), dense_rank().over(w).as("drk"))
      .ordered("day", "rn")
  }

  // =======================================================================
  // T: scalar transforms
  // =======================================================================

  // T1/T2 — scale, offset, abs, sqrt, log, pow, invert per point.
  q("t2_scalar_math",
    """SELECT event_id, value,
      |  value * 2 + 10 AS scaled,
      |  abs(value - 100) AS abs_dev,
      |  sqrt(value) AS sqrt_v,
      |  ROUND(ln(value), 6) AS ln_v,
      |  ROUND(power(value, 2), 6) AS sq_v,
      |  1.0 / value AS inv_v
      |FROM events
      |WHERE event_type = 'click'
      |  AND ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables.eventsWindowed(s, dir,
        java.sql.Timestamp.valueOf("2024-01-10 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-11 00:00:00"))
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("value"),
        (col("value") * 2 + 10).as("scaled"),
        abs(col("value") - 100).as("abs_dev"),
        sqrt(col("value")).as("sqrt_v"),
        round(log(col("value")), 6).as("ln_v"),
        round(pow(col("value"), 2), 6).as("sq_v"),
        (lit(1.0) / col("value")).as("inv_v"))
      .ordered("event_id")
  }

  // T4 — alias / aliasByNode path manipulation.
  q("t4_alias_by_node",
    """SELECT DISTINCT 'events.' || event_type || '.u' || (user_id % 10) AS metric,
      |  split_part('events.' || event_type || '.u' || (user_id % 10), '.', 2) AS node1,
      |  split_part('events.' || event_type || '.u' || (user_id % 10), '.', 2) || '.' ||
      |  split_part('events.' || event_type || '.u' || (user_id % 10), '.', 3) AS node12
      |FROM events ORDER BY metric""".stripMargin) { (s, dir) =>
    Tables.metricStoreDeep(s, dir)
      .select(col("metric"),
        SeriesOps.aliasByNode(Seq(1)).as("node1"),
        SeriesOps.aliasByNode(Seq(1, 2)).as("node12"))
      .distinct()
      .ordered("metric")
  }

  // T7 — date functions (dow numbering aligned: Spark Sunday=1 vs DuckDB
  // Sunday=0, hence the +1 in the oracle).
  q("t7_date_parts",
    s"""SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hr, COUNT(*) AS n,
       |  ${DSUM("value")} AS sum_v
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(dayofweek(col("ts")).as("dow"), hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_v"))
      .ordered("dow", "hr")
  }

  // T8 — JSON extraction from the event props payload.
  q("t8_json_extract",
    """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    // Parse the payload once into a bound column; referencing the same
    // get_json_object expr in both the group key and the aggregate would
    // evaluate it twice per row (same lesson as Dedup.scala shingle binding).
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .ordered("k_bucket")
  }

  // T9 — higher-order array functions over embedding vectors.
  q("t9_vector_norm",
    """SELECT vec_id, len(embedding) AS dim,
      |  ROUND(sqrt(list_sum(list_transform(embedding,
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2,
      |  ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS comp_sum
      |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, dir) =>
    Tables.embeddings(s, dir)
      .select(col("vec_id"), size(col("embedding")).as("dim"),
        round(sqrt(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double"))), 4).as("l2"),
        round(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double")), 4).as("comp_sum"))
      .ordered("vec_id")
  }

  // =======================================================================
  // O: sorts / latest / top-k
  // =======================================================================

  // O1 — latest run per key (the dashboard read path: max_by pattern).
  q("o1_latest_per_user",
    """SELECT user_id, event_id, ts, value FROM (
      |  SELECT user_id, event_id, ts, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events WHERE event_type = 'purchase') t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "ts", "value")
      .ordered("user_id")
  }

  // O3 — top-k by score (TakeOrderedAndProject).
  q("o3_topk_users",
    s"""SELECT user_id, COUNT(*) AS n, ${DSUM("value")} AS total
       |FROM events WHERE event_type = 'purchase'
       |GROUP BY 1 ORDER BY total DESC, user_id LIMIT 10""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .orderBy(col("total").desc, col("user_id"))
      .limit(10)
  }

  // =======================================================================
  // SET: union / intersect / except
  // =======================================================================

  q("set1_ops",
    """SELECT
      |  (SELECT COUNT(*) FROM (SELECT user_id FROM events WHERE event_type = 'click'
      |     UNION SELECT user_id FROM events WHERE event_type = 'purchase') u) AS n_union,
      |  (SELECT COUNT(*) FROM (SELECT user_id FROM events WHERE event_type = 'click'
      |     INTERSECT SELECT user_id FROM events WHERE event_type = 'purchase') i) AS n_intersect,
      |  (SELECT COUNT(*) FROM (SELECT user_id FROM events WHERE event_type = 'click'
      |     EXCEPT SELECT user_id FROM events WHERE event_type = 'purchase') e) AS n_except""".stripMargin) { (s, dir) =>
    // one scan + one user_id agg + one 1-row agg: per-user presence
    // flags make union/intersect/except conditional counts — the
    // literal union/intersect/except form re-scanned events six times
    // and shuffled two distincts per set op. Same answer by definition:
    // |A∪B| = #(c∨p), |A∩B| = #(c∧p), |A∖B| = #(c∧¬p).
    Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy("user_id")
      .agg(max(col("event_type") === "click").as("c"),
        max(col("event_type") === "purchase").as("p"))
      .agg(count(lit(1)).as("n_union"),
        count(when(col("c") && col("p"), 1)).as("n_intersect"),
        count(when(col("c") && !col("p"), 1)).as("n_except"))
  }

  // =======================================================================
  // ST: streaming-shaped (batch twin; the streaming path is spec-tested)
  // =======================================================================

  // P2/Q6 — tight compound predicate + single-row agg (the TPC-H Q6
  // shape; predicate pushdown showcase).
  q("p2_q6_filter",
    s"""SELECT ${DSUM("l_extendedprice * l_discount")} AS revenue, COUNT(*) AS n
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n"))
  }

  // J3b — true as-of join (nearest ≤ per key): each click joined to the
  // user's most recent prior purchase. Spark 4 has no ASOF operator;
  // ours is the union + ordered-window forward-fill; DuckDB's native
  // ASOF LEFT JOIN is the oracle.
  q("j3b_asof_join",
    """WITH c AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
      |    AND ts >= TIMESTAMP '2024-01-20 00:00:00' AND ts < TIMESTAMP '2024-01-25 00:00:00'),
      |p AS (
      |  SELECT user_id, ts, MAX(value) AS pv FROM events
      |  WHERE event_type = 'purchase' GROUP BY user_id, ts)
      |SELECT c.event_id, c.user_id, p.pv AS asof_value
      |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
      |ORDER BY c.event_id""".stripMargin) { (s, dir) =>
    val clicks = Tables.eventsWindowed(s, dir,
        java.sql.Timestamp.valueOf("2024-01-20 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-25 00:00:00"))
      .filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = Tables.events(s, dir).filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max(col("value")).as("pv"))
    SeriesOps.asOfJoin(clicks, purchases, "user_id", "pv")
      .select("event_id", "user_id", "asof_value")
      .ordered("event_id")
  }

  // W8 — time-range frame (rangeBetween over epoch seconds): true
  // range semantics — missing minutes shrink the frame, unlike ROWS.
  q("w8_range_frame",
    s"""WITH r AS (
       |  SELECT 'events.' || event_type AS metric,
       |         CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS epoch_s,
       |         ${DSUMD("value")} AS v
       |  FROM events WHERE event_type IN ('purchase', 'signup')
       |    AND ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
       |  GROUP BY 1, 2)
       |SELECT metric, epoch_s,
       |  CAST(SUM(v) OVER w AS DOUBLE) AS range_sum5m,
       |  COUNT(v) OVER w AS n_in_range
       |FROM r
       |WINDOW w AS (PARTITION BY metric ORDER BY epoch_s
       |             RANGE BETWEEN 300 PRECEDING AND CURRENT ROW)
       |ORDER BY metric, epoch_s""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("metric").orderBy("epoch_s").rangeBetween(-300, 0)
    minuteRollupClipped(s, dir, "2024-01-10 00:00:00", "2024-01-11 00:00:00")
      .filter(col("metric").isin("events.purchase", "events.signup"))
      .select(col("metric"), unix_timestamp(col("ts")).as("epoch_s"), col("sum_dec").as("v"))
      .select(col("metric"), col("epoch_s"),
        sum(col("v")).over(w).cast("double").as("range_sum5m"),
        count(col("v")).over(w).as("n_in_range"))
      .ordered("metric", "epoch_s")
  }

  // U3 — step-grid densification via sequence + explode: how sparse
  // series become fixed-step Graphite-shaped series (missing bucket =
  // None, the P5/W4 precondition).
  q("u3_densify_grid",
    s"""WITH grid AS (
       |  SELECT unnest(generate_series(TIMESTAMP '2024-01-10 00:00:00',
       |                                TIMESTAMP '2024-01-10 23:59:00',
       |                                INTERVAL 1 MINUTE)) AS ts),
       |m AS (SELECT DISTINCT 'events.' || event_type AS metric FROM events),
       |r AS (
       |  SELECT 'events.' || event_type AS metric, date_trunc('minute', ts) AS ts,
       |         ${DSUM("value")} AS v
       |  FROM events
       |  WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
       |  GROUP BY 1, 2)
       |SELECT m.metric, COUNT(*) AS n_buckets, COUNT(r.v) AS n_present,
       |       COUNT(*) - COUNT(r.v) AS n_missing
       |FROM m CROSS JOIN grid
       |LEFT JOIN r ON r.metric = m.metric AND r.ts = grid.ts
       |GROUP BY m.metric ORDER BY m.metric""".stripMargin) { (s, dir) =>
    val grid = s.range(1).select(explode(expr(
      "sequence(timestamp'2024-01-10 00:00:00', timestamp'2024-01-10 23:59:00', interval 1 minute)"))
      .as("ts"))
    // metric universe + clipped grid both read the rollup — the raw log
    // is never scanned for a densify.
    val metrics = minuteRollup(s, dir).select("metric").distinct()
    val rollup = minuteRollupClipped(s, dir, "2024-01-10 00:00:00", "2024-01-11 00:00:00")
      .select(col("metric"), col("ts"), col("sum_dec").cast("double").as("v"))
    metrics.crossJoin(grid)
      .join(rollup, Seq("metric", "ts"), "left")
      .groupBy("metric")
      .agg(count(lit(1)).as("n_buckets"), count(col("v")).as("n_present"),
        (count(lit(1)) - count(col("v"))).as("n_missing"))
      .ordered("metric")
  }

  // T5 — threshold series filters through the STORED-STRING path: the
  // target expression parses and compiles via TargetLang, proving the
  // DSL pipeline itself against the oracle.
  q("t5_filter_series",
    s"""WITH scored AS (
       |  SELECT 'events.' || event_type AS metric,
       |         ${DSUM("value")} / COUNT(*) AS score
       |  FROM events GROUP BY 1
       |  HAVING ${DSUM("value")} / COUNT(*) > 49.7)
       |SELECT 'events.' || event_type AS metric, COUNT(*) AS n, ${DSUM("value")} AS sum_v
       |FROM events WHERE 'events.' || event_type IN (SELECT metric FROM scored)
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    graft.dsl.TargetLang.plan("averageAbove(events.*, 49.7)", Tables.metricStore(s, dir))
      .groupBy("metric")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_v"))
      .ordered("metric")
  }

  // T6 — string functions (validation/parsing the UI layer needs:
  // rlike, split_part, upper/lower, length).
  q("t6_string_fns",
    """SELECT c_mktsegment, COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN regexp_matches(c_name, '^Customer#[0-9]+$') THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
      |  MAX(CAST(split_part(c_name, '#', 2) AS BIGINT)) AS max_suffix,
      |  MIN(length(c_name)) AS min_name_len,
      |  MIN(lower(c_mktsegment)) AS seg_lower
      |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(when(col("c_name").rlike("^Customer#[0-9]+$"), 1).otherwise(0)).as("n_valid"),
        max(element_at(split(col("c_name"), "#"), 2).cast("bigint")).as("max_suffix"),
        min(length(col("c_name"))).as("min_name_len"),
        min(lower(col("c_mktsegment"))).as("seg_lower"))
      .ordered("c_mktsegment")
  }

  // A8 — Holt-Winters-style smoothing + confidence bands (order-
  // sensitive typed Aggregator, the U1 tier-2 escape hatch). Rows-only:
  // the recurrence has no portable SQL twin.
  q("a8_holtwinters_bands") { (s, dir) =>
    import s.implicits._
    import graft.series.HoltWinters
    val pts = hourRollup(s, dir)
      .select(col("metric"), unix_timestamp(col("ts")).as("epochSec"),
        col("value_dec").cast("double").as("value"))
    val agg = HoltWinters.bandsAggregator(HoltWinters.Params()).toColumn
    pts.select(col("metric"), struct(col("epochSec"), col("value")).as("pt"))
      .as[(String, HoltWinters.Pt)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("bands"))
      .flatMap { case (metric, bands) =>
        bands.map(b => (metric, b._1, b._2, b._3, b._4))
      }
      .toDF("metric", "epoch_s", "smoothed", "upper", "lower")
      .select(col("metric"), col("epoch_s"),
        round(col("smoothed"), 6).as("smoothed"),
        round(col("upper"), 6).as("upper"), round(col("lower"), 6).as("lower"))
      .ordered("metric", "epoch_s")
  }

  // A8b — SEASONAL Holt-Winters via a stored target string: daily season
  // (period 24) over the hourly rollup, Graphite's
  // holtWintersConfidenceBands shape. Rows-only: recurrence has no
  // portable SQL twin.
  q("a8b_holtwinters_seasonal") { (s, dir) =>
    val hourly = hourRollup(s, dir)
      .select(col("metric"), col("ts"), col("value_dec").cast("double").as("value"))
    graft.dsl.TargetLang.plan("holtWintersConfidenceBands(events.*, 3, 24)", hourly)
      .select(col("metric"), col("ts"), round(col("value"), 6).as("value"))
      .ordered("metric", "ts")
  }

  // S3 — Graphite raw render-format parse (fixture ingestion path).
  // Rows-only: input is a literal fixture, not a table.
  q("s3_raw_parse") { (s, dir) =>
    val lines = Seq(
      "stats.web.latency,1704067200,1704067500,60|1.5,2.5,None,4.0,5.5",
      "stats.web.errors,1704067200,1704067500,60|0,1,2,None,4")
    graft.sources.GraphiteRaw.toDataFrame(s, lines).ordered("metric", "ts")
  }

  // X13 — the whole training-data cleaning pipeline as ONE plan:
  // language-ID filter → quality filter → near-dup removal (word-set
  // Jaccard within source, keep the lower doc_id of each pair) →
  // per-source survival stats. Every stage is portable, so the entire
  // composition is under the hash gate. pred=='en' mirrors langId's
  // tie rule: larger code wins ties, so en needs >= h_de but > the rest.
  q("x13_clean_pipeline",
    """WITH h AS (
      |  SELECT doc_id, source, text,
      |    len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
      |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |        t -> list_contains(['the','a','of','and','to','is'], t))) AS h_en,
      |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |        t -> list_contains(['der','die','das','und','ist','ein'], t))) AS h_de,
      |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |        t -> list_contains(['le','la','les','et','est','un'], t))) AS h_fr,
      |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |        t -> list_contains(['el','los','las','y','es','un'], t))) AS h_es,
      |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |        t -> list_contains(['的','是','了','在','和','有'], t))) AS h_zh
      |  FROM documents),
      |kept1 AS (
      |  SELECT doc_id, source, text FROM h
      |  WHERE h_en > 0 AND h_en >= h_de AND h_en > h_fr AND h_en > h_es AND h_en > h_zh
      |    AND n_tokens BETWEEN 20 AND 200),
      |ktoks AS (
      |  SELECT DISTINCT source AS blk, doc_id AS id,
      |         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
      |  FROM kept1),
      |sizes AS (SELECT blk, id, COUNT(*) AS sz FROM ktoks GROUP BY 1, 2),
      |inter AS (
      |  SELECT a.blk, a.id AS id1, b.id AS id2, COUNT(*) AS n_inter
      |  FROM ktoks a JOIN ktoks b ON a.blk = b.blk AND a.tok = b.tok AND a.id < b.id
      |  GROUP BY 1, 2, 3),
      |drops AS (
      |  SELECT DISTINCT i.id2 AS doc_id FROM inter i
      |  JOIN sizes s1 ON s1.blk = i.blk AND s1.id = i.id1
      |  JOIN sizes s2 ON s2.blk = i.blk AND s2.id = i.id2
      |  WHERE CAST(i.n_inter AS DOUBLE) / (s1.sz + s2.sz - i.n_inter) >= 0.8),
      |kept2 AS (
      |  SELECT k.doc_id, k.source FROM kept1 k
      |  ANTI JOIN drops d ON k.doc_id = d.doc_id),
      |raw AS (SELECT source, COUNT(DISTINCT doc_id) AS n_raw FROM documents GROUP BY 1),
      |kept AS (SELECT source, COUNT(DISTINCT doc_id) AS n_kept FROM kept2 GROUP BY 1)
      |SELECT r.source, r.n_raw, COALESCE(k.n_kept, 0) AS n_kept
      |FROM raw r LEFT JOIN kept k USING (source)
      |ORDER BY r.source""".stripMargin) { (s, dir) =>
    import graft.ext.Cleaning
    val docs = Tables.documents(s, dir)
    val cfg = Cleaning.Config() // en, 20-200 tokens, 0.8 Jaccard by source
    Cleaning.survivalStats(docs, Cleaning.clean(docs, cfg), cfg)
      .ordered("source")
  }

  // ST6 — session windows (30-min gap) per user over purchase events:
  // Spark's session_window vs the SQL gaps-and-islands construction.
  q("st6_session_window",
    """WITH e AS (
      |  SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
      |g AS (
      |  SELECT user_id, ts,
      |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              >= INTERVAL 30 MINUTE OR
      |              LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM e),
      |s AS (
      |  SELECT user_id, ts,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM g)
      |SELECT user_id, MIN(ts) AS session_start,
      |       MAX(ts) + INTERVAL 30 MINUTE AS session_end, COUNT(*) AS n_events
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
      .ordered("user_id", "session_start")
  }

  // =======================================================================
  // X: north-star training-data-pipeline operators (U4)
  // =======================================================================

  // X1 — exact dedup: hash-groupBy, keep min id (input doubled with
  // shifted ids so every key has a duplicate to collapse).
  q("x1_dedup_exact",
    """WITH d AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 1000000, text FROM documents)
      |SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
      |FROM d GROUP BY text ORDER BY keep_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val doubled = docs.union(docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    graft.ext.Dedup.exact(doubled, "doc_id", Seq("text"))
      .select("keep_id", "n_dups")
      .ordered("keep_id")
  }

  // X1b — normalized exact dedup (the standard "fuzzy-exact" pipeline
  // stage): case-fold + collapse non-alphanumerics before hashing, so
  // whitespace/punctuation variants of a document collapse to one
  // cluster. The dedup key is md5 of the normalized text — identical
  // bytes in both engines.
  q("x1b_dedup_normalized",
    """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
      |FROM (SELECT doc_id,
      |        md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS k
      |      FROM documents)
      |GROUP BY k ORDER BY keep_id""".stripMargin) { (s, dir) =>
    val norm = trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))
    Tables.documents(s, dir)
      .select(col("doc_id"), md5(norm).as("k"))
      .groupBy("k")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .select("keep_id", "n_dups")
      .ordered("keep_id")
  }

  // X2 — MinHash-LSH near-dup detection (shingle→signature→band→verify).
  // No SQL oracle: the LSH candidate set depends on xxhash64, which
  // DuckDB lacks; recall vs brute force is spec-tested instead.
  // Operating point 64 hashes / 16 bands (4 rows per band): real
  // near-dups in this corpus sit at J ≥ 0.89 where P(candidate) ≈ 1,
  // while background pairs (J ≈ 0.05) survive bands at ~1e-4 —
  // measured identical pair sets to 96/32 at sf0.001 AND sf0.01, at
  // two-thirds the signature-aggregate width (ExtSpec pins recall ==
  // brute force at this exact point).
  private val shingleMemo = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  q("x2_minhash_neardups") { (s, dir) =>
    val pairs =
      if (Tables.cacheEnabled) {
        // bench mode: the shingle table is built/persisted ONCE per
        // scale dir (the "written shingle table" a warehouse would
        // reuse), so repeated runs measure the dedup, not the re-shingle
        val rows = shingleMemo.getOrElseUpdate(dir,
          graft.ext.Dedup.shingleRows(Tables.documents(s, dir), "doc_id", "text", 3).persist())
        graft.ext.Dedup.minhashNearDupsFromRows(rows, numHashes = 64, bands = 16, threshold = 0.5)
      } else graft.ext.Dedup.minhashNearDups(
        Tables.documents(s, dir), "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16, threshold = 0.5)
    pairs.ordered("id1", "id2")
  }

  // X2b — ORACLE TWIN of x2's verify stage: x2's candidate pairs are
  // xxhash64-band-dependent (rows-only forever), but the verification
  // math — exact shingle-set Jaccard over GIVEN pairs — is portable.
  // Score a fixed deterministic pair table (id, id+1 for id % 5 = 0)
  // with the same verifyJaccard the LSH pipeline uses; the oracle
  // computes Jaccard on shingle STRINGS where the engine moves xxhash64
  // longs — identical values (collisions ≪ rounding).
  q("x2b_jaccard_verify",
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      |  FROM toks, UNNEST(generate_series(1, len(t)-2)) AS g(i)),
      |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
      |pairs AS (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2
      |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |  WHERE a.doc_id % 5 = 0),
      |inter AS (
      |  SELECT p.id1, p.id2, COUNT(*) AS ni
      |  FROM pairs p
      |  JOIN sh s1 ON s1.doc_id = p.id1
      |  JOIN sh s2 ON s2.doc_id = p.id2 AND s2.s = s1.s
      |  GROUP BY 1, 2)
      |SELECT p.id1, p.id2,
      |  ROUND(COALESCE(i.ni, 0)::DOUBLE / (z1.sz + z2.sz - COALESCE(i.ni, 0)), 6)
      |    AS jaccard
      |FROM pairs p
      |LEFT JOIN inter i ON i.id1 = p.id1 AND i.id2 = p.id2
      |JOIN sizes z1 ON z1.doc_id = p.id1
      |JOIN sizes z2 ON z2.doc_id = p.id2
      |ORDER BY p.id1""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val pairs = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("id1"), (col("doc_id") + 1).as("id2"))
      .join(docs.select(col("doc_id").as("id2")), Seq("id2"))
      .select("id1", "id2")
    graft.ext.Dedup.verifyJaccard(pairs,
        graft.ext.Dedup.shingleRows(docs, "doc_id", "text", 3))
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
      .ordered("id1")
  }

  // X3 — SimHash near-dup detection (64-bit signature, quarter-block
  // LSH, Hamming ≤ 3). Rows-only for the same hash-portability reason.
  q("x3_simhash_neardups") { (s, dir) =>
    graft.ext.Dedup.simhashNearDups(Tables.documents(s, dir), "doc_id", "text", maxHamming = 3)
      .ordered("id1", "id2")
  }

  // X3b — ORACLE TWIN of x3's verify stage: simhash signatures are
  // xxhash64-dependent, but the verification math — Hamming distance
  // over 64-bit signatures — is portable. Build a PORTABLE signature
  // (bit i = presence of the i-th vocabulary token, alphabetic order —
  // the corpus vocabulary is 31 tokens, data-derived in both engines)
  // and run the same hamming() kernel over the fixed pair table.
  q("x3b_hamming_verify",
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents),
      |vocab AS (
      |  SELECT tok, ROW_NUMBER() OVER (ORDER BY tok) - 1 AS bit
      |  FROM (SELECT DISTINCT unnest(t) AS tok FROM toks)),
      |pres AS (SELECT DISTINCT doc_id, unnest(t) AS tok FROM toks),
      |sig AS (
      |  SELECT p.doc_id, CAST(SUM(1::BIGINT << v.bit) AS BIGINT) AS s
      |  FROM pres p JOIN vocab v USING (tok) GROUP BY 1)
      |SELECT a.doc_id AS id1, b.doc_id AS id2,
      |  CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
      |FROM sig a JOIN sig b ON b.doc_id = a.doc_id + 1
      |WHERE a.doc_id % 5 = 0
      |ORDER BY id1""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val t = split(trim(lower(col("text"))), "\\s+")
    // vocabulary bit order: unpartitioned window over DISTINCT tokens —
    // 31 rows, metadata-sized by corpus construction
    val vocab = docs.select(explode(t).as("tok")).distinct()
      .select(col("tok"),
        (row_number().over(Window.orderBy(col("tok"))) - 1).as("bit"))
    val sig = docs.select(col("doc_id"), explode(array_distinct(t)).as("tok"))
      .join(broadcast(vocab), "tok")
      .groupBy("doc_id")
      .agg(sum(expr("shiftleft(1L, cast(bit as int))")).as("s"))
    // join-free consecutive pairing: each signature row contributes to
    // at most two pair keys (left of pair doc_id when doc_id%5=0, right
    // of pair doc_id-1), then ONE hash agg gathers both sides — the
    // naive a⋈b self-join re-derived the whole signature subtree twice.
    // Same shuffle key layout at 100 TB: pair id is as dense as doc id.
    val contrib = sig.select(explode(filter(array(
        when(col("doc_id") % 5 === 0,
          struct(col("doc_id").as("p"), lit(0).as("side"), col("s"))),
        when((col("doc_id") - 1) % 5 === 0,
          struct((col("doc_id") - 1).as("p"), lit(1).as("side"), col("s")))),
      c => c.isNotNull)).as("c"))
      .select(col("c.p").as("p"), col("c.side").as("side"), col("c.s").as("s"))
    contrib.groupBy("p")
      .agg(max(when(col("side") === 0, col("s"))).as("s1"),
        max(when(col("side") === 1, col("s"))).as("s2"))
      .filter(col("s1").isNotNull && col("s2").isNotNull)
      .select(col("p").as("id1"), (col("p") + 1).as("id2"),
        graft.ext.Dedup.hamming(col("s1"), col("s2")).cast("long").as("hamming"))
      .ordered("id1")
  }

  // X4 — exact word-set Jaccard pairs within a blocking key (portable
  // dedup variant; jaccard is int/int so exactly comparable).
  q("x4_word_jaccard",
    """WITH toks AS (
      |  SELECT DISTINCT source AS blk, doc_id AS id,
      |         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
      |  FROM documents),
      |sizes AS (SELECT blk, id, COUNT(*) AS sz FROM toks GROUP BY 1, 2),
      |inter AS (
      |  SELECT a.blk, a.id AS id1, b.id AS id2, COUNT(*) AS n_inter
      |  FROM toks a JOIN toks b ON a.blk = b.blk AND a.tok = b.tok AND a.id < b.id
      |  GROUP BY 1, 2, 3)
      |SELECT i.blk, i.id1, i.id2,
      |       CAST(i.n_inter AS DOUBLE) / (s1.sz + s2.sz - i.n_inter) AS jaccard
      |FROM inter i
      |JOIN sizes s1 ON s1.blk = i.blk AND s1.id = i.id1
      |JOIN sizes s2 ON s2.blk = i.blk AND s2.id = i.id2
      |WHERE CAST(i.n_inter AS DOUBLE) / (s1.sz + s2.sz - i.n_inter) >= 0.8
      |ORDER BY i.blk, i.id1, i.id2""".stripMargin) { (s, dir) =>
    graft.ext.Dedup.wordJaccardPairs(
        Tables.documents(s, dir), "doc_id", "text", "source", threshold = 0.8)
      .ordered("blk", "id1", "id2")
  }

  // X5 — embedding-cosine near-dup pairs within a blocking key (label).
  q("x5_embedding_neardups",
    """SELECT a.label AS blk, a.vec_id AS id1, b.vec_id AS id2,
      |  ROUND(
      |    list_sum(list_transform(range(1, len(a.embedding) + 1),
      |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
      |  4) AS cos
      |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE list_sum(list_transform(range(1, len(a.embedding) + 1),
      |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
      |    >= 0.3
      |ORDER BY blk, id1, id2""".stripMargin) { (s, dir) =>
    graft.ext.Similarity.embeddingNearDups(Tables.embeddings(s, dir), "label", 0.3)
      .withColumn("cos", round(col("cos"), 4))
      .ordered("blk", "id1", "id2")
  }

  // X5b — embedding near-dups with NO blocking key given: LSH-band
  // candidates verified by exact cosine (the realistic corpus-dedup
  // shape at 100 TB). Rows-only (hash-dependent candidates).
  q("x5b_embedding_neardups_lsh") { (s, dir) =>
    // 8-bit bands: the corpus-scale operating point — near-dups (cos
    // ≥ 0.9) are caught with P≈0.94 while bucket sizes stay ~N/256,
    // keeping the candidate self-join linear-ish. (The spec measures
    // recall at a looser threshold with finer bands.)
    graft.ext.Similarity.embeddingNearDupsLsh(
        Tables.embeddings(s, dir), threshold = 0.4)
      .withColumn("cos", round(col("cos"), 4))
      .ordered("id1", "id2")
  }

  // X5c — ORACLE TWIN of x5b's verify stage: LSH-band candidates are
  // hash-dependent (rows-only), but the verification math — exact
  // cosine over GIVEN pairs — is portable. Score the fixed pair table
  // with the same dot/norm kernels the LSH verify uses.
  q("x5c_cosine_verify",
    """SELECT a.vec_id AS id1, b.vec_id AS id2,
      |  ROUND(
      |    list_sum(list_transform(range(1, len(a.embedding) + 1),
      |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
      |  6) AS cos
      |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
      |WHERE a.vec_id % 5 = 0
      |ORDER BY id1""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    val a = emb.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("id1"), col("embedding").as("e1"))
    val b = emb.select(col("vec_id").as("id2"), col("embedding").as("e2"))
    a.join(b, col("id2") === col("id1") + 1)
      .select(col("id1"), col("id2"),
        round(graft.ext.Similarity.dot(col("e1"), col("e2")) /
          (graft.ext.Similarity.norm(col("e1")) *
           graft.ext.Similarity.norm(col("e2"))), 6).as("cos"))
      .ordered("id1")
  }

  // X6 — brute-force cosine top-k similarity search (ANN baseline).
  q("x6_sim_topk_brute",
    """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
      |scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    list_sum(list_transform(range(1, len(q.embedding) + 1),
      |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
      |    AS cos
      |  FROM q JOIN embeddings c ON q.vec_id <> c.vec_id)
      |SELECT query_id, neighbor_id, ROUND(cos, 4) AS cos, rk FROM (
      |  SELECT query_id, neighbor_id, cos,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
      |  FROM scored) WHERE rk <= 5
      |ORDER BY query_id, rk""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    graft.ext.Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
      .withColumn("cos", round(col("cos"), 4))
      .ordered("query_id", "rk")
  }

  // X7 — LSH-bucketed approximate top-k (scale path; recall vs X6 is
  // spec-tested, hash-dependent so no SQL oracle).
  q("x7_sim_topk_lsh") { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    graft.ext.Similarity.lshTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
      .withColumn("cos", round(col("cos"), 4))
      .ordered("query_id", "rk")
  }

  // X7b — IVF approximate top-k (k-means coarse quantizer, probe the
  // nearest cells only). Rows-only: quantizer output is
  // seed-deterministic but not SQL-portable; recall vs X6 is
  // spec-tested.
  q("x7b_sim_topk_ivf") { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    val (idx, _) = ivfIndex(s, dir)
    graft.ext.Ivf.topK(emb.filter(col("vec_id") < 10), idx, k = 5, nprobe = 4)
      .withColumn("cos", round(col("cos"), 4))
      .ordered("query_id", "rk")
  }

  // X7c — IVF over the STORED per-cell layout: probe through the
  // partition-pruned per-cell scan (IvfStorageSpec asserts the pruning;
  // here the gate checks the results). Deterministic: same seed/kmeans
  // as x7b, so stored results == in-memory results.
  q("x7c_sim_topk_ivf_stored") { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    val (_, path) = ivfIndex(s, dir)
    graft.ext.Ivf.topKStored(emb.filter(col("vec_id") < 10), s, path, k = 5, nprobe = 4)
      .withColumn("cos", round(col("cos"), 4))
      .ordered("query_id", "rk")
  }

  // X8 — heuristic language ID (marker-stopword argmax; tie → larger
  // code, no hits → 'und'; the CASE chain mirrors the struct-max rule).
  q("x8_langid",
    """WITH h AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |        t -> list_contains(['the','a','of','and','to','is'], t))) AS h_en,
      |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |        t -> list_contains(['der','die','das','und','ist','ein'], t))) AS h_de,
      |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |        t -> list_contains(['le','la','les','et','est','un'], t))) AS h_fr,
      |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |        t -> list_contains(['el','los','las','y','es','un'], t))) AS h_es,
      |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |        t -> list_contains(['的','是','了','在','和','有'], t))) AS h_zh
      |  FROM documents)
      |SELECT doc_id, lang,
      |  CASE WHEN greatest(h_en, h_de, h_fr, h_es, h_zh) = 0 THEN 'und'
      |       WHEN h_zh = greatest(h_en, h_de, h_fr, h_es, h_zh) THEN 'zh'
      |       WHEN h_fr = greatest(h_en, h_de, h_fr, h_es, h_zh) THEN 'fr'
      |       WHEN h_es = greatest(h_en, h_de, h_fr, h_es, h_zh) THEN 'es'
      |       WHEN h_en = greatest(h_en, h_de, h_fr, h_es, h_zh) THEN 'en'
      |       ELSE 'de' END AS pred
      |FROM h ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        graft.ext.TextOps.langId(col("text")).as("pred"))
      .ordered("doc_id")
  }

  // X9 — text quality features (training-data filtering signals).
  q("x9_text_quality",
    """SELECT doc_id,
      |  length(text) AS n_chars,
      |  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
      |  CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
      |    / length(text) AS punct_ratio,
      |  CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |       t -> list_contains(['the','a','of','and','to','is'], t))) AS DOUBLE)
      |    / len(regexp_split_to_array(trim(text), '\s+')) AS stopword_ratio,
      |  CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
      |    / len(regexp_split_to_array(trim(text), '\s+')) AS mean_word_len
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val feats = graft.ext.TextOps.qualityFeatures(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id") +: feats.map { case (n, c) => c.as(n) }: _*)
      .ordered("doc_id")
  }

  // X9B — deflate compression ratio (rows-only by nature: the value
  // IS the JDK zlib's output and DuckDB carries no deflate scalar —
  // TextQualitySpec pins it byte-exact against a local Deflater, the
  // repetitive≪natural separation, and the Cleaning-knob wiring).
  q("x9b_compression_ratio") { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.ext.TextOps.compressionRatio(col("text")).as("compression_ratio"))
      .ordered("doc_id")
  }

  // X10 — token counting: whitespace + BPE-ish lexical tokens.
  q("x10_token_count",
    s"""SELECT doc_id,
       |  len(regexp_split_to_array(trim(text), '\\s+')) AS ws_tokens,
       |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_tokens
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.ext.TextOps.tokenCount(col("text")).as("ws_tokens"),
        graft.ext.TextOps.bpeTokenCount(col("text")).as("bpe_tokens"))
      .ordered("doc_id")
  }

  // X11 — order-sensitive rolling fingerprint (portable variant; the
  // production 64-bit key is TextOps.fingerprint64, used by dedup).
  q("x11_fingerprint",
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(list_sum(list_transform(range(1, len(w) + 1),
      |    i -> i * ascii(substring(w[i], 1, 1)) * length(w[i])))
      |  % 2147483647 AS BIGINT) AS fp
      |FROM toks ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.ext.TextOps.rollingFingerprint(col("text")).as("fp"))
      .ordered("doc_id")
  }

  // X12 — multimodal metadata columns (binary payload + typed metadata;
  // pruning happens on metadata before any payload decode).
  q("x12_multimodal_meta",
    """SELECT doc_id AS media_id,
      |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |       ELSE 'video' END AS kind,
      |  octet_length(encode(text)) AS n_bytes,
      |  CAST(n_chars % 640 AS INTEGER) AS width,
      |  CAST(n_chars % 480 AS INTEGER) AS height,
      |  n_chars * 40 AS duration_ms
      |FROM documents ORDER BY media_id""".stripMargin) { (s, dir) =>
    graft.ext.Multimodal.syntheticMediaTable(s, dir)
      .select(col("media_id"), col("kind"),
        octet_length(col("payload")).as("n_bytes"),
        col("width"), col("height"), col("duration_ms"))
      .ordered("media_id")
  }

  // X12c — frame sampling fan-out for video rows.
  q("x12c_frame_sample",
    """SELECT doc_id AS media_id, n_chars * 40 AS duration_ms,
      |  len(range(0, n_chars * 40, 800)) AS n_frames,
      |  (n_chars * 40 - 1) // 800 * 800 AS last_offset_ms
      |FROM documents WHERE CAST(doc_id % 3 AS INTEGER) = 2
      |ORDER BY media_id""".stripMargin) { (s, dir) =>
    graft.ext.Multimodal.sampleFrames(
        graft.ext.Multimodal.syntheticMediaTable(s, dir), intervalMs = 800)
      .groupBy("media_id", "duration_ms")
      .agg(count(lit(1)).as("n_frames"), max(col("frame_offset_ms")).as("last_offset_ms"))
      .ordered("media_id")
  }

  // X12d — resize-to-fit: aspect-preserving fit into a 224 box. The
  // metadata math is integer-exact (DIV, no FP) so it hash-matches;
  // the payload byte-slice is the clearly-marked codec stand-in and is
  // verified by length only.
  q("x12d_resize",
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    CAST(n_chars % 640 AS INTEGER) AS width,
      |    CAST(n_chars % 480 AS INTEGER) AS height,
      |    octet_length(encode(text)) AS len
      |  FROM documents),
      |s AS (
      |  SELECT media_id, width, height, len,
      |    CASE WHEN greatest(width, height) <= 224 THEN CAST(width AS BIGINT)
      |         ELSE greatest(1, CAST(width AS BIGINT) * 224 // greatest(width, height)) END AS out_w,
      |    CASE WHEN greatest(width, height) <= 224 THEN CAST(height AS BIGINT)
      |         ELSE greatest(1, CAST(height AS BIGINT) * 224 // greatest(width, height)) END AS out_h
      |  FROM m)
      |SELECT media_id, width, height, out_w, out_h,
      |  least(CAST(len AS BIGINT),
      |    greatest(1, CAST(len AS BIGINT) * out_w * out_h
      |      // greatest(CAST(width AS BIGINT) * height, 1))) AS out_bytes
      |FROM s ORDER BY media_id""".stripMargin) { (s, dir) =>
    graft.ext.Multimodal.resizeToFit(
        graft.ext.Multimodal.syntheticMediaTable(s, dir), box = 224)
      .select(col("media_id"), col("width"), col("height"),
        col("out_w"), col("out_h"), col("out_bytes"))
      .ordered("media_id")
  }

  // X12b — decode/feature-extract through the per-partition batch path
  // (mapPartitions with the stub codec); rows-only — the codec is a
  // deterministic fake, the Spark plumbing is what's under test.
  q("x12b_media_features") { (s, dir) =>
    import s.implicits._
    val media = graft.ext.Multimodal.syntheticMediaTable(s, dir)
      .as[graft.ext.Multimodal.MediaRow]
    graft.ext.Multimodal.extractFeatures(media).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"), col("checksum"),
        round(element_at(col("feature"), 1), 4).as("f0"))
      .ordered("media_id")
  }

  // X12e — REAL image decode end-to-end: PNG payloads generated
  // executor-side, decoded by the JDK ImageIO codec through the same
  // per-partition batch path as x12b — the codec seam's FakeCodec gap
  // closed with zero native dependencies. Rows-only by design (PNG
  // container bytes are encoder-dependent); the decoded pixel features
  // and checksums are pinned to first-principles golden values in
  // ExtSpec.
  q("x12e_imageio_decode") { (s, dir) =>
    val media = graft.ext.Multimodal.syntheticImageTable(s, dir)
    graft.ext.Multimodal.extractFeatures(media,
        graft.ext.Multimodal.ImageIoCodec).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"), col("checksum"),
        round(element_at(col("feature"), 4), 4).as("mean_r"),
        round(element_at(col("feature"), 7), 4).as("mean_luma"))
      .ordered("media_id")
  }

  // X12f — REAL audio decode end-to-end: WAV payloads (deterministic
  // test tones, generated executor-side) decoded by the JDK
  // javax.sound codec through the per-partition batch path — the audio
  // twin of x12e. Rows-only by design; decoded-sample features are
  // pinned to closed-form golden values in ExtSpec.
  q("x12f_wav_decode") { (s, dir) =>
    val media = graft.ext.Multimodal.syntheticAudioTable(s, dir)
    graft.ext.Multimodal.extractFeatures(media,
        graft.ext.Multimodal.WavCodec).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"), col("checksum"),
        round(element_at(col("feature"), 4), 4).as("rms"),
        round(element_at(col("feature"), 6), 4).as("zcr"))
      .ordered("media_id")
  }

  // X12g — REAL video decode end-to-end, ORACLE-ANCHORED: AVI payloads
  // (deterministic uncompressed-DIB test patterns, generated
  // executor-side) are parsed and decoded by the JDK-only AviCodec and
  // fanned out one row per decoded frame. DIB frames are lossless, so
  // the per-frame INTEGER channel sums equal the generator's
  // closed-form pattern exactly — DuckDB re-derives them from first
  // principles with generate_series, making this a hash-exact oracle
  // over a real video-container decode (the MJPEG path and FP features
  // are spec-pinned in ExtSpec).
  q("x12g_avi_frames",
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    CAST(doc_id % 6 + 2 AS INTEGER) AS nf,
      |    CAST(doc_id % 8 + 4 AS INTEGER) AS w,
      |    CAST(doc_id % 6 + 4 AS INTEGER) AS h
      |  FROM documents),
      |f AS (
      |  SELECT m.*, CAST(t.fi AS INTEGER) AS frame_idx
      |  FROM m, UNNEST(generate_series(0, nf - 1)) AS t(fi)),
      |px AS (
      |  SELECT f.media_id, f.frame_idx, f.w, f.h,
      |    CAST(gx.x AS BIGINT) AS x, CAST(gy.y AS BIGINT) AS y
      |  FROM f, UNNEST(generate_series(0, w - 1)) AS gx(x),
      |       UNNEST(generate_series(0, h - 1)) AS gy(y))
      |SELECT media_id, frame_idx,
      |  CAST(frame_idx AS BIGINT) * 100 AS frame_ms,
      |  w AS width, h AS height,
      |  CAST(SUM((media_id + frame_idx * 19 + x * 7 + y * 13) % 256) AS BIGINT) AS sum_r,
      |  CAST(SUM((media_id * 3 + frame_idx * 23 + x * 11 + y * 5) % 256) AS BIGINT) AS sum_g,
      |  CAST(SUM((media_id * 5 + frame_idx * 29 + x * 3 + y * 17) % 256) AS BIGINT) AS sum_b
      |FROM px GROUP BY 1, 2, 3, 4, 5
      |ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
    graft.ext.Multimodal.videoFrameTable(
        graft.ext.Multimodal.syntheticVideoTable(s, dir)).toDF()
      .select(col("media_id"), col("frame_idx"), col("frame_ms"),
        col("width"), col("height"), col("sum_r"), col("sum_g"), col("sum_b"))
      .ordered("media_id", "frame_idx")
  }

  // X45 — heavy hitters via the Space-Saving sketch aggregate
  // (functions.SketchAggregates): top word-bigrams of the corpus
  // through a bounded mergeable summary instead of a full
  // groupBy(gram).count() shuffle — at 100 TB only capacity-sized
  // buffers cross the exchange. Capacity 2048 ≥ the corpus's distinct
  // bigram count, the sketch's EXACT regime (no eviction anywhere, so
  // counts equal true counts and err ≡ 0 — the contract FunctionsSpec
  // pins), which makes the whole distributed sketch path hash-exact
  // against DuckDB's exact counts; the eviction regime's bounds are
  // spec-verified.
  q("x45_heavy_hitters",
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      |g AS (
      |  SELECT t[i] || ' ' || t[i+1] AS gram
      |  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)),
      |c AS (SELECT gram, COUNT(*) AS cnt FROM g GROUP BY 1)
      |SELECT gram, cnt, CAST(0 AS BIGINT) AS err
      |FROM c ORDER BY cnt DESC, gram LIMIT 25""".stripMargin) { (s, dir) =>
    val toks = split(trim(col("text")), "\\s+")
    Tables.documents(s, dir)
      .select(explode(graft.functions.TextExpressions.wordNgramsOf(toks, 2)).as("gram"))
      .agg(graft.functions.SketchAggregates.spaceSavingTopK(col("gram"), 2048).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.term").as("gram"), col("e.count").as("cnt"), col("e.err").as("err"))
      .orderBy(col("cnt").desc, col("gram").asc)
      .limit(25)
  }

  // X12h — SELECTIVE frame decode with real container seeks: sample
  // each clip at 250 ms, decode ONLY the sampled frames (AviCodec
  // .layout jumps through idx1 — at 100 TB a 1 fps sample of a 24 fps
  // corpus decodes 1/24th of its frames). The sampled indices and the
  // per-frame integer channel sums are both closed-form, so DuckDB
  // re-derives the whole selective decode — sampling arithmetic
  // included — hash-exact (the x12g precedent narrowed to a subset).
  q("x12h_frame_seek",
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    CAST(doc_id % 6 + 2 AS INTEGER) AS nf,
      |    CAST(doc_id % 8 + 4 AS INTEGER) AS w,
      |    CAST(doc_id % 6 + 4 AS INTEGER) AS h
      |  FROM documents),
      |f AS (
      |  SELECT DISTINCT m.media_id, m.w, m.h,
      |    CAST(t.off // 100 AS INTEGER) AS frame_idx
      |  FROM m, UNNEST(generate_series(0, nf * 100 - 1, 250)) AS t(off)),
      |px AS (
      |  SELECT f.media_id, f.frame_idx, f.w, f.h,
      |    CAST(gx.x AS BIGINT) AS x, CAST(gy.y AS BIGINT) AS y
      |  FROM f, UNNEST(generate_series(0, w - 1)) AS gx(x),
      |       UNNEST(generate_series(0, h - 1)) AS gy(y))
      |SELECT media_id, frame_idx,
      |  CAST(frame_idx AS BIGINT) * 100 AS frame_ms,
      |  w AS width, h AS height,
      |  CAST(SUM((media_id + frame_idx * 19 + x * 7 + y * 13) % 256) AS BIGINT) AS sum_r,
      |  CAST(SUM((media_id * 3 + frame_idx * 23 + x * 11 + y * 5) % 256) AS BIGINT) AS sum_g,
      |  CAST(SUM((media_id * 5 + frame_idx * 29 + x * 3 + y * 17) % 256) AS BIGINT) AS sum_b
      |FROM px GROUP BY 1, 2, 3, 4, 5
      |ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
    graft.ext.Multimodal.sampleFramesDecoded(
        graft.ext.Multimodal.syntheticVideoTable(s, dir), intervalMs = 250).toDF()
      .select(col("media_id"), col("frame_idx"), col("frame_ms"),
        col("width"), col("height"), col("sum_r"), col("sum_g"), col("sum_b"))
      .ordered("media_id", "frame_idx")
  }

  // X45b — GROUPED heavy hitters: one Space-Saving summary per source
  // (the sketch as a grouped aggregate — per-domain vocabularies with
  // one bounded buffer per group crossing the exchange), top-5 bigrams
  // per source by (count desc, gram). Same exact-regime contract as
  // x45, so the grouped path is hash-exact against DuckDB's per-source
  // exact counts.
  q("x45b_domain_hitters",
    """WITH toks AS (
      |  SELECT source, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      |g AS (
      |  SELECT source, t[i] || ' ' || t[i+1] AS gram
      |  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)),
      |c AS (SELECT source, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2),
      |r AS (
      |  SELECT source, gram, cnt,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY cnt DESC, gram) AS rk
      |  FROM c)
      |SELECT source, gram, cnt, rk FROM r WHERE rk <= 5
      |ORDER BY source, rk""".stripMargin) { (s, dir) =>
    val toks = split(trim(col("text")), "\\s+")
    Tables.documents(s, dir)
      .select(col("source"),
        explode(graft.functions.TextExpressions.wordNgramsOf(toks, 2)).as("gram"))
      .groupBy("source")
      .agg(graft.functions.SketchAggregates.spaceSavingTopK(col("gram"), 2048).as("sk"))
      // the summary arrives (count desc, term asc)-sorted: the top-5
      // slice needs no re-ranking window, just positional explode
      .select(col("source"), posexplode(slice(col("sk"), 1, 5)).as(Seq("p", "e")))
      .select(col("source"), col("e.term").as("gram"), col("e.count").as("cnt"),
        (col("p") + 1).cast("long").as("rk"))
      .ordered("source", "rk")
  }

  // T10 — sumSeriesWithWildcards: combine series whose names differ only
  // at the wildcard node (the u<bucket> segment), through the stored
  // target-string path. Summing the per-(deep-series, minute) sums
  // exactly reproduces the per-type minute sums.
  q("t10_wildcards",
    s"""SELECT 'events.' || event_type AS metric, date_trunc('minute', ts) AS ts,
       |  ${DSUM("value")} AS value
       |FROM events
       |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val deep = Tables.metricStoreDeepWindowed(s, dir,
      java.sql.Timestamp.valueOf("2024-01-10 00:00:00"),
      java.sql.Timestamp.valueOf("2024-01-11 00:00:00"))
    graft.dsl.TargetLang.plan("""sumSeriesWithWildcards(summarize(events.*.u*, "1min"), 2)""", deep)
      .ordered("metric", "ts")
  }

  // T11 — weightedAverage(avgList, weightList, node): per-minute means
  // weighted by per-minute counts, paired on the type node — the result
  // is the overall per-minute mean, which the oracle states directly.
  q("t11_weighted_average",
    s"""WITH r AS (
       |  SELECT 'events.' || event_type AS metric, date_trunc('minute', ts) AS ts,
       |    ${DSUM("value")} / COUNT(*) AS va, CAST(COUNT(*) AS DOUBLE) AS vw
       |  FROM events
       |  WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
       |  GROUP BY 1, 2)
       |SELECT 'weightedAverage(summarize(events.*,"1min","avg"),summarize(events.*,"1min","count"),1)' AS metric,
       |  ts,
       |  CAST(SUM(CAST(va * vw AS DECIMAL(18,6))) AS DOUBLE)
       |    / CAST(SUM(CAST(vw AS DECIMAL(18,6))) AS DOUBLE) AS value
       |FROM r GROUP BY ts ORDER BY ts""".stripMargin) { (s, dir) =>
    val store = Tables.metricStoreWindowed(s, dir,
      java.sql.Timestamp.valueOf("2024-01-10 00:00:00"),
      java.sql.Timestamp.valueOf("2024-01-10 23:59:59.999999"))
    graft.dsl.TargetLang.plan(
      """weightedAverage(summarize(events.*, "1min", "avg"), summarize(events.*, "1min", "count"), 1)""",
      store)
      .ordered("ts")
  }

  // T12 — linearRegression over the hourly series, via the stored-string
  // path on the rollup store. Both engines run the identical
  // sum-formulated OLS (x = seconds since first point, decimal-exact
  // sums), so fitted doubles hash-match without rounding.
  q("t12_linreg",
    s"""WITH r AS (
       |  SELECT 'events.' || event_type AS metric, date_trunc('hour', ts) AS ts,
       |    ${DSUM("value")} AS v
       |  FROM events
       |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
       |  GROUP BY 1, 2),
       |x AS (
       |  SELECT metric, ts, v,
       |    CAST(epoch(ts) AS BIGINT) - MIN(CAST(epoch(ts) AS BIGINT)) OVER (PARTITION BY metric) AS x
       |  FROM r),
       |s AS (
       |  SELECT metric, ts, x,
       |    COUNT(v) OVER w AS n,
       |    SUM(CASE WHEN v IS NOT NULL THEN x END) OVER w AS sx,
       |    CAST(SUM(CAST(v AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sy,
       |    SUM(CASE WHEN v IS NOT NULL THEN x * x END) OVER w AS sxx,
       |    CAST(SUM(CAST(CAST(x AS DOUBLE) * v AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sxy
       |  FROM x WINDOW w AS (PARTITION BY metric))
       |SELECT 'linearRegression(' || metric || ')' AS metric, ts,
       |  (sy - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
       |     / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
       |   + (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
       |     / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(x AS DOUBLE) AS value
       |FROM s ORDER BY metric, ts""".stripMargin) { (s, dir) =>
    val hourlyStore = minuteRollupClipped(s, dir, "2024-01-08 00:00:00", "2024-01-15 00:00:00")
      .select(col("metric"), col("ts"), col("sum_dec").cast("double").as("value"))
    graft.dsl.TargetLang.plan("""linearRegression(summarize(events.*, "1h"))""", hourlyStore)
      .ordered("metric", "ts")
  }

  // A8c — holtWintersForecast via the stored-string path (rows-only:
  // the recurrence has no portable SQL twin; HoltWintersSpec proves
  // forecast == band midpoint).
  q("a8c_holtwinters_forecast") { (s, dir) =>
    val hourly = hourRollup(s, dir)
      .select(col("metric"), col("ts"), col("value_dec").cast("double").as("value"))
    graft.dsl.TargetLang.plan("holtWintersForecast(events.*, 3, 24)", hourly)
      .select(col("metric"), col("ts"), round(col("value"), 6).as("value"))
      .ordered("metric", "ts")
  }

  // ST7 — the 1-minute pre-aggregated rollup the streaming ingest
  // materializes (batch twin of graft.streaming.Ingest).
  q("st7_rollup_1min",
    s"""SELECT 'events.' || event_type AS metric, date_trunc('minute', ts) AS ts,
       |  COUNT(*) AS n, ${DSUM("value")} AS sum_v
       |FROM events
       |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    minuteRollupClipped(s, dir, "2024-01-10 00:00:00", "2024-01-11 00:00:00")
      .select(col("metric"), col("ts"), col("n"), col("sum_dec").cast("double").as("sum_v"))
      .ordered("metric", "ts")
  }

  // T13 — smartSummarize: buckets anchored at the window's first point
  // (00:07 clip makes the from-aligned grid differ from the epoch grid;
  // a plain summarize would bucket at 00:00/01:30/...). Anchor = min ts
  // of the clipped frame in BOTH engines.
  q("t13_smart_summarize",
    s"""WITH r AS (
       |  SELECT 'events.' || event_type AS metric, date_trunc('minute', ts) AS ts,
       |    ${DSUMD("value")} AS v
       |  FROM events
       |  WHERE ts >= TIMESTAMP '2024-01-10 00:07:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
       |  GROUP BY 1, 2),
       |a AS (SELECT MIN(CAST(epoch(ts) AS BIGINT)) AS f FROM r)
       |SELECT metric,
       |  make_timestamp((a.f + (CAST(epoch(r.ts) AS BIGINT) - a.f) // 5400 * 5400) * 1000000) AS ts,
       |  CAST(SUM(v) AS DOUBLE) AS value
       |FROM r, a
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val series = minuteRollupClipped(s, dir, "2024-01-10 00:07:00", "2024-01-11 00:00:00")
      .select(col("metric"), col("ts"), col("sum_dec").cast("double").as("value"))
    graft.dsl.TargetLang.plan("""smartSummarize(events.*, "90min", "sum")""", series)
      .ordered("metric", "ts")
  }

  // T14 — highestCurrent: keep the 2 whole series whose LAST point is
  // greatest (score = arg-max-by-ts, deterministic metric tie-break).
  q("t14_highest_current",
    s"""WITH r AS (
       |  SELECT 'events.' || event_type AS metric, date_trunc('minute', ts) AS ts,
       |    ${DSUM("value")} AS v
       |  FROM events
       |  WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
       |  GROUP BY 1, 2),
       |s AS (SELECT metric, arg_max(v, ts) AS lastv FROM r GROUP BY 1),
       |k AS (SELECT metric FROM s ORDER BY lastv DESC, metric LIMIT 2)
       |SELECT r.metric, r.ts, r.v AS value
       |FROM r JOIN k USING (metric)
       |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val series = minuteRollupClipped(s, dir, "2024-01-10 00:00:00", "2024-01-11 00:00:00")
      .select(col("metric"), col("ts"), col("sum_dec").cast("double").as("value"))
    graft.dsl.TargetLang.plan("highestCurrent(events.*, 2)", series)
      .ordered("metric", "ts")
  }

  // =======================================================================
  // X14-X16 — deterministic sampling / split / shuffle (ext.Sampling).
  // The split is a pure column expression over md5 hex compared against
  // 128-bit fraction thresholds — shuffle-free, engine-portable, and
  // stable under corpus growth (a row's bucket depends only on its own
  // key). See Sampling.scala scaladoc for the 100-TB layout rationale.
  // =======================================================================

  private val SplitSeed = "graft-split-v1"
  private def splitDrawSql = s"md5(CAST(doc_id AS VARCHAR) || ':' || '$SplitSeed')"

  // X72 — LEAKAGE-SAFE domain-level split: the split key is the
  // domain, not the doc id, so every document of a domain lands in the
  // same split by construction (near-dups concentrate within domains;
  // a row-keyed split would let them straddle train/test — the
  // classic contamination bug). The output groups by (domain, split):
  // a domain appearing under TWO splits would add rows and break the
  // gate, so the atomicity invariant is pinned structurally, and the
  // hash pins the exact assignment.
  q("x72_domain_split",
    s"""WITH d AS (
       |  SELECT doc_id,
       |    'h' || CAST(doc_id % 50 AS VARCHAR) || '.example' AS domain
       |  FROM documents),
       |a AS (
       |  SELECT domain,
       |    CASE WHEN md5(domain || ':' || '$SplitSeed')
       |           < '${graft.ext.Sampling.hexThreshold(0.8)}' THEN 'train'
       |         WHEN md5(domain || ':' || '$SplitSeed')
       |           < '${graft.ext.Sampling.hexThreshold(0.9)}' THEN 'val'
       |         ELSE 'test' END AS split,
       |    COUNT(*) AS n_docs
       |  FROM d GROUP BY 1, 2)
       |SELECT domain, split, n_docs FROM a ORDER BY domain""".stripMargin) { (s, dir) =>
    val d = Tables.documents(s, dir)
      .select(col("doc_id"),
        concat(lit("h"), (col("doc_id") % 50).cast("string"),
          lit(".example")).as("domain"))
    d.withColumn("split", graft.ext.Sampling.splitColumn(col("domain"),
        SplitSeed, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
      .groupBy("domain", "split").agg(count(lit(1)).as("n_docs"))
      .ordered("domain")
  }

  // X94 — SPLIT-LEAKAGE audit + repair ([[graft.ext.Dedup
  // .repairSplitLeakage]]): duplicate clusters (x1b's normalized-text
  // key) crossed with the domain split (x72's assignment) — a dup
  // cluster spanning train AND val/test is exactly the leakage that
  // silently inflates eval metrics. Derived-input fixture (the x75
  // pattern — the base corpus has NO normalized dups): every %4==1 doc
  // gains a copy whose appended punctuation normalizes away and whose
  // shifted id (+100001) lands on the NEXT %50 domain, so many
  // clusters genuinely straddle splits while others don't — the output
  // witnesses leaked (n_splits=2, n_moved=1) AND clean (n_splits=1,
  // n_moved=0) clusters. Per multi-doc cluster: size, distinct splits
  // BEFORE repair, the leader's split every member moves to, and how
  // many moved. A wrong leader rule, a missed cluster, or a
  // non-deterministic repair each break rows or hash.
  q("x94_split_leakage",
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100001, text || ' !! ' FROM documents
       |  WHERE doc_id % 4 = 1),
       |d AS (
       |  SELECT doc_id,
       |    md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS k,
       |    CASE WHEN md5('h' || CAST(doc_id % 50 AS VARCHAR) || '.example'
       |                  || ':' || '$SplitSeed')
       |           < '${graft.ext.Sampling.hexThreshold(0.8)}' THEN 'train'
       |         WHEN md5('h' || CAST(doc_id % 50 AS VARCHAR) || '.example'
       |                  || ':' || '$SplitSeed')
       |           < '${graft.ext.Sampling.hexThreshold(0.9)}' THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM corpus),
       |lead AS (
       |  SELECT k, MIN(doc_id) AS keep_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_dups,
       |    CAST(COUNT(DISTINCT split) AS BIGINT) AS n_splits,
       |    arg_min(split, doc_id) AS repaired_split
       |  FROM d GROUP BY k)
       |SELECT l.keep_id, l.n_dups, l.n_splits, l.repaired_split,
       |  CAST(SUM(CASE WHEN d.split <> l.repaired_split THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_moved
       |FROM d JOIN lead l USING (k)
       |WHERE l.n_dups > 1
       |GROUP BY 1, 2, 3, 4
       |ORDER BY keep_id""".stripMargin) { (s, dir) =>
    val norm = trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))
    val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val corpus = base.unionByName(
      base.filter(col("doc_id") % 4 === 1).select(
        (col("doc_id") + 100001L).as("doc_id"),
        concat(col("text"), lit(" !! ")).as("text")))
    val d = corpus
      .select(col("doc_id"), md5(norm).as("k"),
        concat(lit("h"), (col("doc_id") % 50).cast("string"),
          lit(".example")).as("domain"))
      .withColumn("split", graft.ext.Sampling.splitColumn(col("domain"),
        SplitSeed, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    graft.ext.Dedup.repairSplitLeakage(d, "doc_id", "k", "split")
      .filter(col("cluster_size") > 1)
      .groupBy(col("keep_id"), col("cluster_size").as("n_dups"),
        col("n_splits"), col("repaired_split"))
      .agg(sum(when(col("moved"), 1L).otherwise(0L)).as("n_moved"))
      .select("keep_id", "n_dups", "n_splits", "repaired_split", "n_moved")
      .ordered("keep_id")
  }

  // X14 — train/val/test split sizes (80/10/10). Oracle runs the same
  // hex-threshold CASE; counts AND char mass must agree exactly.
  q("x14_split_sizes",
    s"""SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS chars
       |FROM (
       |  SELECT CASE WHEN $splitDrawSql < '${graft.ext.Sampling.hexThreshold(0.8)}' THEN 'train'
       |              WHEN $splitDrawSql < '${graft.ext.Sampling.hexThreshold(0.9)}' THEN 'val'
       |              ELSE 'test' END AS split,
       |         n_chars
       |  FROM documents)
       |GROUP BY split ORDER BY split""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .withColumn("split", graft.ext.Sampling.splitColumn(col("doc_id"), SplitSeed,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"))
      .ordered("split")
  }

  // X15 — stratified exactly-N sample: 5 docs per language, drawn by the
  // seeded hash order (uniform without replacement, reproducible).
  q("x15_stratified_sample",
    s"""SELECT lang, doc_id FROM (
       |  SELECT lang, doc_id,
       |         row_number() OVER (PARTITION BY lang ORDER BY $splitDrawSql, doc_id) AS rk
       |  FROM documents)
       |WHERE rk <= 5 ORDER BY lang, doc_id""".stripMargin) { (s, dir) =>
    graft.ext.Sampling.stratifiedTake(
        Tables.documents(s, dir), Seq("lang"), col("doc_id"), SplitSeed, n = 5)
      .select("lang", "doc_id")
      .ordered("lang", "doc_id")
  }

  // X16 — reproducible global shuffle order (training-order head). The
  // gate takes the first 100 ranks; SamplingSpec proves the scale path
  // (shuffledFiles: bucket + local sort, no global sort) yields the
  // identical total order.
  q("x16_global_shuffle",
    s"""SELECT shuffle_rank, doc_id FROM (
       |  SELECT doc_id, row_number() OVER (ORDER BY $splitDrawSql, doc_id) AS shuffle_rank
       |  FROM documents)
       |WHERE shuffle_rank <= 100 ORDER BY shuffle_rank""".stripMargin) { (s, dir) =>
    graft.ext.Sampling.shuffledOrder(Tables.documents(s, dir), col("doc_id"), SplitSeed)
      .filter(col("shuffle_rank") <= 100)
      .select("shuffle_rank", "doc_id")
      .ordered("shuffle_rank")
  }

  // X17 — document chunking into overlapping token windows (ext.Packing
  // .chunk): window 64, stride 48. Chunk geometry is arithmetic on the
  // token count; both engines slice the same token list.
  q("x17_chunking",
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l FROM documents),
      |c AS (
      |  SELECT doc_id, l, len(l) AS n,
      |    CASE WHEN len(l) <= 64 THEN 1
      |         ELSE CAST(CEIL((len(l) - 64) / 48.0) AS INT) + 1 END AS nc
      |  FROM toks)
      |SELECT doc_id, i AS chunk_id,
      |  array_to_string(l[i*48+1 : i*48+64], ' ') AS chunk_text,
      |  LEAST(n - i*48, 64) AS chunk_tokens
      |FROM c, UNNEST(generate_series(0, nc - 1)) AS t(i)
      |ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
    graft.ext.Packing.chunk(Tables.documents(s, dir), "doc_id", "text",
        window = 64, stride = 48)
      .ordered("doc_id", "chunk_id")
  }

  // X18 — GPT-style contiguous sequence packing (ext.Packing
  // .packContiguous): tokens laid end-to-end in doc_id order, cut every
  // 256. Placement is one cumulative-sum window, mirrored exactly by the
  // oracle's running SUM.
  q("x18_packing",
    """WITH d AS (
      |  SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS ntok
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, ntok,
      |    CAST(SUM(ntok) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ntok AS BIGINT)
      |      AS tok_start
      |  FROM d)
      |SELECT doc_id, ntok, tok_start,
      |  tok_start // 256 AS seq_first,
      |  (tok_start + ntok - 1) // 256 AS seq_last,
      |  tok_start % 256 AS seq_offset,
      |  (tok_start + ntok - 1) // 256 - tok_start // 256 + 1 AS n_seqs
      |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("ntok"))
    graft.ext.Packing.packContiguous(docs, "ntok", 256L, Seq(col("doc_id")))
      .select(col("doc_id"), col("ntok"), col("tok_start"),
        col("seq_first"), col("seq_last"), col("offset").as("seq_offset"), col("n_seqs"))
      .ordered("doc_id")
  }

  // X19 — Gopher-style n-gram repetition metrics (ext.TextOps): per-doc
  // most-frequent 2-gram (count + char coverage) and duplicated-3-gram
  // char mass. Both engines count grams by hash aggregation and break
  // top-gram ties by lexicographically greatest gram; fractions are
  // exact-int products divided once, rounded at 6.
  q("x19_repetition",
    """WITH toks AS (
      |  SELECT doc_id, length(text) AS n_chars,
      |         string_split_regex(trim(lower(text)), '\s+') AS l
      |  FROM documents),
      |g2 AS (
      |  SELECT doc_id, l[i] || ' ' || l[i+1] AS g
      |  FROM toks, UNNEST(generate_series(1, len(l)-1)) AS t(i)),
      |c2 AS (SELECT doc_id, g, COUNT(*) AS cnt FROM g2 GROUP BY 1, 2),
      |m2 AS (SELECT doc_id, MAX(cnt) AS top_cnt FROM c2 GROUP BY 1),
      |t2 AS (
      |  SELECT c2.doc_id, m2.top_cnt, MAX(c2.g) AS top_gram
      |  FROM c2 JOIN m2 ON c2.doc_id = m2.doc_id AND c2.cnt = m2.top_cnt
      |  GROUP BY 1, 2),
      |g3 AS (
      |  SELECT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS g
      |  FROM toks, UNNEST(generate_series(1, len(l)-2)) AS t(i)),
      |c3 AS (SELECT doc_id, g, COUNT(*) AS cnt FROM g3 GROUP BY 1, 2),
      |s3 AS (
      |  SELECT doc_id,
      |         SUM(CASE WHEN cnt > 1 THEN cnt * length(g) ELSE 0 END) AS dup_chars
      |  FROM c3 GROUP BY 1)
      |SELECT tk.doc_id, t2.top_gram, t2.top_cnt,
      |  ROUND(t2.top_cnt * length(t2.top_gram) / tk.n_chars, 6) AS top2_frac,
      |  ROUND(COALESCE(s3.dup_chars, 0) / tk.n_chars, 6) AS dup3_frac
      |FROM toks tk
      |JOIN t2 ON t2.doc_id = tk.doc_id
      |LEFT JOIN s3 ON s3.doc_id = tk.doc_id
      |ORDER BY tk.doc_id""".stripMargin) { (s, dir) =>
    // both gram orders come from the same shuffle-free fold — one scan,
    // no joins (the oracle needs its multi-CTE shape; we don't). The
    // fold structs are materialized ONCE in a child projection: inlining
    // them into each consuming column would re-run the whole fold per
    // reference (measured 5.1 s vs 0.5 s at sf0.1).
    Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.ext.TextOps.ngramRepetitionCols(col("text"), 2).as("_t2"),
        graft.ext.TextOps.ngramRepetitionCols(col("text"), 3).as("_t3"),
        length(col("text")).cast("double").as("_nc"))
      .select(col("doc_id"),
        col("_t2.topg").as("top_gram"),
        col("_t2.top").as("top_cnt"),
        when(col("_nc") > 0,
          round(col("_t2.top") * length(col("_t2.topg")) / col("_nc"), 6))
          .otherwise(lit(0.0)).as("top2_frac"),
        round(coalesce(col("_t3.dup") / col("_nc"), lit(0.0)), 6).as("dup3_frac"))
      .ordered("doc_id")
  }

  // X20 — duplicate-cluster resolution: connected components over the
  // x4 near-dup pairs (min-label propagation + pointer jumping in Spark;
  // the oracle walks the same closure with a recursive CTE). Keeping one
  // doc per PAIR is wrong the moment A~B~C without A~C — this is the
  // stage that fixes it.
  q("x20_dup_clusters",
    """WITH RECURSIVE toks AS (
      |  SELECT DISTINCT source AS blk, doc_id AS id,
      |         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
      |  FROM documents),
      |sizes AS (SELECT blk, id, COUNT(*) AS sz FROM toks GROUP BY 1, 2),
      |inter AS (
      |  SELECT a.blk, a.id AS id1, b.id AS id2, COUNT(*) AS n_inter
      |  FROM toks a JOIN toks b ON a.blk = b.blk AND a.tok = b.tok AND a.id < b.id
      |  GROUP BY 1, 2, 3),
      |pairs AS (
      |  SELECT i.id1, i.id2 FROM inter i
      |  JOIN sizes s1 ON s1.blk = i.blk AND s1.id = i.id1
      |  JOIN sizes s2 ON s2.blk = i.blk AND s2.id = i.id2
      |  WHERE CAST(i.n_inter AS DOUBLE) / (s1.sz + s2.sz - i.n_inter) >= 0.8),
      |edges AS (
      |  SELECT id1 AS src, id2 AS dst FROM pairs
      |  UNION SELECT id2, id1 FROM pairs),
      |reach AS (
      |  SELECT src AS id, src AS lbl FROM edges
      |  UNION
      |  SELECT e.src AS id, r.lbl FROM edges e JOIN reach r ON r.id = e.dst),
      |comp AS (SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id)
      |SELECT cluster_id, COUNT(*) AS n_docs, MIN(id) AS keep_id, MAX(id) AS max_id
      |FROM comp GROUP BY 1 ORDER BY cluster_id""".stripMargin) { (s, dir) =>
    val pairs = graft.ext.Dedup.wordJaccardPairs(
      Tables.documents(s, dir), "doc_id", "text", "source", threshold = 0.8)
    graft.ext.Dedup.clusterStats(graft.ext.Dedup.connectedComponents(pairs))
      .ordered("cluster_id")
  }

  // X70 — quality-aware dedup decision
  // ([[graft.ext.Dedup.keepBestPerCluster]]): per near-dup cluster keep
  // the highest-n_chars member (ties: smallest doc_id), unpaired docs
  // untouched — the RefinedWeb/FineWeb keep-best step after x20's
  // clustering. Window-free (two hash aggs + anti-join — a boilerplate
  // cluster at corpus scale can be corpus-sized). The oracle re-derives
  // x20's clusters and applies the textbook argmax.
  q("x70_keep_best",
    """WITH RECURSIVE toks AS (
      |  SELECT DISTINCT source AS blk, doc_id AS id,
      |         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
      |  FROM documents),
      |sizes AS (SELECT blk, id, COUNT(*) AS sz FROM toks GROUP BY 1, 2),
      |inter AS (
      |  SELECT a.blk, a.id AS id1, b.id AS id2, COUNT(*) AS n_inter
      |  FROM toks a JOIN toks b ON a.blk = b.blk AND a.tok = b.tok AND a.id < b.id
      |  GROUP BY 1, 2, 3),
      |pairs AS (
      |  SELECT i.id1, i.id2 FROM inter i
      |  JOIN sizes s1 ON s1.blk = i.blk AND s1.id = i.id1
      |  JOIN sizes s2 ON s2.blk = i.blk AND s2.id = i.id2
      |  WHERE CAST(i.n_inter AS DOUBLE) / (s1.sz + s2.sz - i.n_inter) >= 0.8),
      |edges AS (
      |  SELECT id1 AS src, id2 AS dst FROM pairs
      |  UNION SELECT id2, id1 FROM pairs),
      |reach AS (
      |  SELECT src AS id, src AS lbl FROM edges
      |  UNION
      |  SELECT e.src AS id, r.lbl FROM edges e JOIN reach r ON r.id = e.dst),
      |comp AS (SELECT id, MIN(lbl) AS c FROM reach GROUP BY id),
      |sc AS (SELECT comp.c, comp.id, d.n_chars
      |       FROM comp JOIN documents d ON d.doc_id = comp.id),
      |best AS (SELECT c, MAX(n_chars) AS ms FROM sc GROUP BY c),
      |keep AS (SELECT s.c, MIN(s.id) AS keep_id
      |         FROM sc s JOIN best b ON b.c = s.c AND s.n_chars = b.ms
      |         GROUP BY s.c),
      |losers AS (SELECT s.id FROM sc s JOIN keep k ON k.c = s.c
      |           WHERE s.id <> k.keep_id)
      |SELECT doc_id, n_chars FROM documents
      |WHERE doc_id NOT IN (SELECT id FROM losers)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val pairs = graft.ext.Dedup.wordJaccardPairs(
      Tables.documents(s, dir), "doc_id", "text", "source", threshold = 0.8)
    graft.ext.Dedup.keepBestPerCluster(
        Tables.documents(s, dir), "doc_id", "n_chars", pairs)
      .select(col("doc_id"), col("n_chars"))
      .ordered("doc_id")
  }

  // X71 — Unicode normalization + mojibake repair
  // ([[graft.ext.TextOps.normalizeUnicode]] / `fixMojibake`): the
  // normalize-before-dedup hygiene step. Planted per doc: a combining
  // acute (e + U+0301 → é) and the Angstrom sign (U+212B → Å) that NFC
  // must compose (DuckDB's nfc_normalize is the cross-engine oracle —
  // NFC is stable for assigned code points); a classic UTF-8-as-
  // Latin-1 mis-decode ("cafÃ©") the repair must fix to the closed
  // form; and an INNOCENT accented string that must pass through
  // untouched (strict re-decode fails ⇒ no repair).
  q("x71_unicode_fix",
    """SELECT doc_id,
      |  nfc_normalize('p' || CAST(doc_id AS VARCHAR) || 'e' || chr(769)
      |    || 'x' || chr(8491)) AS nfc_text,
      |  'caf' || chr(233) || ' doc ' || CAST(doc_id AS VARCHAR) AS fixed,
      |  'touch' || chr(233) || '!' AS untouched
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val id = col("doc_id").cast("string")
    Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.ext.TextOps.normalizeUnicode(
          concat(lit("p"), id, lit("e\u0301x\u212B"))).as("nfc_text"),
        graft.ext.TextOps.fixMojibake(
          concat(lit("caf\u00C3\u00A9 doc "), id)).as("fixed"),
        graft.ext.TextOps.fixMojibake(lit("touch\u00E9!")).as("untouched"))
      .ordered("doc_id")
  }

  // X21 — benchmark decontamination: corpus docs sharing ≥3 distinct
  // word 3-grams with the held-out probe set (doc_id % 41 == 0 plays the
  // benchmark). Spark joins 8-byte gram hashes with the probe side
  // broadcast; the oracle joins gram strings — counts must agree.
  q("x21_decontamination",
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS l
      |  FROM documents),
      |grams AS (
      |  SELECT DISTINCT doc_id, array_to_string(l[i : i+2], ' ') AS g
      |  FROM toks, UNNEST(generate_series(1, len(l) - 2)) AS t(i)),
      |shared AS (
      |  SELECT c.doc_id AS id, COUNT(DISTINCT c.g) AS n_shared_grams,
      |         COUNT(DISTINCT p.doc_id) AS n_probes
      |  FROM grams c JOIN grams p ON c.g = p.g
      |  WHERE c.doc_id % 41 <> 0 AND p.doc_id % 41 = 0
      |  GROUP BY 1)
      |SELECT id, n_shared_grams, n_probes FROM shared
      |WHERE n_shared_grams >= 3 ORDER BY id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    graft.ext.Dedup.ngramContamination(
        docs.filter(col("doc_id") % 41 =!= 0),
        docs.filter(col("doc_id") % 41 === 0),
        "doc_id", "text", n = 3, minShared = 3)
      .ordered("id")
  }

  // X22 — exact-window (substring) duplication: doc pairs sharing an
  // exact 6-token window, with the document-frequency cap (≤50 docs per
  // window) that keeps boilerplate grams from exploding the pair join.
  q("x22_window_dups",
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS l
      |  FROM documents),
      |grams AS (
      |  SELECT DISTINCT doc_id, array_to_string(l[i : i+5], ' ') AS g
      |  FROM toks, UNNEST(generate_series(1, len(l) - 5)) AS t(i)),
      |capped AS (
      |  SELECT g FROM grams GROUP BY g HAVING COUNT(*) BETWEEN 2 AND 50)
      |SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_windows
      |FROM grams a JOIN capped USING (g) JOIN grams b USING (g)
      |WHERE a.doc_id < b.doc_id
      |GROUP BY 1, 2 ORDER BY id1, id2""".stripMargin) { (s, dir) =>
    graft.ext.Dedup.windowDupPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 6, maxDf = 50)
      .ordered("id1", "id2")
  }

  // X23 — PII detection + redaction. The corpus text is synthetic word
  // soup, so the gate plants deterministic identifiers derived from real
  // columns (the x12 derived-binary precedent) and both engines run the
  // IDENTICAL RE2-compatible patterns: counts on the original, typed
  // placeholders in the redacted string, compared verbatim.
  q("x23_pii_redaction",
    s"""WITH withpii AS (
       |  SELECT doc_id,
       |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail-' || lang || '.com'
       |         || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR)
       |         || CASE WHEN doc_id % 3 = 0
       |                 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
       |                      || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |                 ELSE '' END
       |         || CASE WHEN doc_id % 5 = 0
       |                 THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |                 ELSE '' END AS t
       |  FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(t, '${graft.ext.TextOps.EmailRx}')) AS n_emails,
       |  len(regexp_extract_all(t, '${graft.ext.TextOps.Ipv4Rx}')) AS n_ipv4,
       |  len(regexp_extract_all(t, '${graft.ext.TextOps.PhoneRx}')) AS n_phones,
       |  len(regexp_extract_all(t, '${graft.ext.TextOps.SsnRx}')) AS n_ssns,
       |  regexp_replace(
       |    regexp_replace(
       |      regexp_replace(
       |        regexp_replace(t, '${graft.ext.TextOps.EmailRx}', '<EMAIL>', 'g'),
       |        '${graft.ext.TextOps.SsnRx}', '<SSN>', 'g'),
       |      '${graft.ext.TextOps.PhoneRx}', '<PHONE>', 'g'),
       |    '${graft.ext.TextOps.Ipv4Rx}', '<IP>', 'g') AS redacted
       |FROM withpii ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val t = concat(
      col("text"),
      lit(" contact user"), col("doc_id").cast("string"), lit("@mail-"), col("lang"), lit(".com"),
      lit(" ip 10."), (col("doc_id") % 256).cast("string"), lit(".0."), (col("doc_id") % 100).cast("string"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" call 555-"), lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
          lit("-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(""),
      when(col("doc_id") % 5 === 0,
        concat(lit(" ssn 123-45-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(""))
    val base = Tables.documents(s, dir).select(col("doc_id"), t.as("t"))
    val counts = graft.ext.TextOps.piiCounts(col("t")).map { case (n, c) => c.cast("long").as(n) }
    base.select(Seq(col("doc_id")) ++ counts
        :+ graft.ext.TextOps.piiRedact(col("t")).as("redacted"): _*)
      .ordered("doc_id")
  }

  // X24 — C4-style line filtering: lines derived deterministically from
  // the real token stream (8-token lines, terminal '.' on every third
  // (doc_id + line) — C4's "ends in terminal punctuation" rule needs
  // punctuation to exist), rules = ends-in-punct ∧ ≥5 words ∧ no
  // blacklisted fragment ('slow' — a live vocabulary word, so the rule
  // actually fires). Whole pass is higher-order array exprs — codegen,
  // no explode, no shuffle.
  q("x24_c4_lines",
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l FROM documents),
      |c AS (
      |  SELECT doc_id, l, CAST(CEIL(len(l) / 8.0) AS INT) AS nl FROM toks),
      |lines AS (
      |  SELECT doc_id,
      |    array_to_string(l[i*8+1 : i*8+8], ' ')
      |      || CASE WHEN (doc_id + i) % 3 = 0 THEN '.' ELSE '' END AS line
      |  FROM c, UNNEST(generate_series(0, nl - 1)) AS t(i)),
      |k AS (
      |  SELECT doc_id, line,
      |    (regexp_matches(line, '[.!?"]$')
      |      AND len(string_split_regex(trim(line), '\s+')) >= 5
      |      AND NOT contains(lower(line), 'slow')) AS keep
      |  FROM lines)
      |SELECT doc_id, COUNT(*) AS n_lines,
      |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN keep THEN length(line) ELSE 0 END) AS BIGINT) AS kept_chars
      |FROM k GROUP BY 1 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("l"))
      .withColumn("nl", ceil(size(col("l")) / lit(8.0)).cast("int"))
      .withColumn("lines", transform(sequence(lit(0), col("nl") - 1),
        i => concat(
          concat_ws(" ", slice(col("l"), i * 8 + 1, lit(8))),
          when((col("doc_id") + i) % 3 === 0, ".").otherwise(""))))
    val stats = graft.ext.TextOps.c4LineStats(col("lines"), minWords = 5,
      blacklist = Seq("slow"))
    docs.select(Seq(col("doc_id")) ++ stats.map { case (n, c) => c.as(n) }: _*)
      .ordered("doc_id")
  }

  // X47 — HTML → main-text extraction, the crawl-corpus front door
  // (trafilatura/jusText's slot). The x23/x12 derived-input pattern:
  // both engines build the IDENTICAL page around each document — title,
  // style/script junk (with a '</p>' inside a JS string and a '>' in a
  // quoted attribute), nav/header/footer chrome, entity-encoded body
  // (&amp; &lt; &#8212; &#x41; &nbsp;), a link-dense share bar, and a
  // too-short ad stub. Spark runs the REAL block parser + jusText-style
  // pruning (graft_html_blocks kernel + column algebra); the oracle
  // knows the closed-form answer because the template is known. Any
  // parser bug — chrome kept, script text leaking, entity misdecoded,
  // link density miscounted — breaks the hash.
  q("x47_html_extract",
    """WITH gen AS (
      |  SELECT doc_id, lang, source,
      |    trim(regexp_replace(text, '\s+', ' ', 'g')) AS p1
      |  FROM documents),
      |parts AS (
      |  SELECT doc_id, lang, source, p1,
      |    'Tom & Jerry <3 ' || chr(8212) || ' "' || lang || '" AZ' AS p2,
      |    'ref ' || CAST(doc_id AS VARCHAR) || ' End of document '
      |      || CAST(doc_id AS VARCHAR) || '.' AS p3
      |  FROM gen)
      |SELECT doc_id,
      |  'Doc ' || CAST(doc_id AS VARCHAR) || ' - ' || source AS title,
      |  (CASE WHEN length(p1) >= 10 THEN p1 || chr(10) ELSE '' END)
      |    || p2 || chr(10) || p3 AS main_text,
      |  CAST(8 + CASE WHEN p1 <> '' THEN 1 ELSE 0 END AS BIGINT) AS n_blocks,
      |  CAST(2 + CASE WHEN length(p1) >= 10 THEN 1 ELSE 0 END AS BIGINT) AS n_kept,
      |  CAST(length(p2) + length(p3)
      |    + CASE WHEN length(p1) >= 10 THEN length(p1) ELSE 0 END AS BIGINT) AS kept_chars,
      |  CAST(57 + length(lang) + length(CAST(doc_id AS VARCHAR)) AS BIGINT) AS link_chars
      |FROM parts ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val id = col("doc_id").cast("string")
    val esc = regexp_replace(regexp_replace(regexp_replace(
      col("text"), "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
    val html = concat(
      lit("<!DOCTYPE html><html><head><title>Doc "), id, lit(" - "), col("source"),
      lit("</title><style>body { color: #000; }</style>"),
      lit("""<script>var x = 1 < 2; var s = "</p>";</script></head>"""),
      lit("<body><header><h1>Doc "), id, lit("</h1>"),
      lit("""<nav><a href="/">Home</a> <a href="/archive">Archive """), col("lang"),
      lit("""</a> <a href="/contact">Contact</a></nav></header>"""),
      lit("""<!-- chrome ends --><div class="content"><p>"""), esc, lit("</p>"),
      lit("<p>Tom&nbsp;&amp; Jerry &lt;3 &#8212; &quot;"), col("lang"),
      lit("""&quot; &#x41;Z</p><p><a href="/ref" title="a > b">ref """), id,
      lit("</a> End of document "), id, lit(".</p></div>"),
      lit("""<div class="share"><a>Tweet</a> <a>Share this page</a> <a>Like</a></div>"""),
      lit("<div>Ad</div>"),
      lit("""<footer>&copy; 2026 example.org <a href="/t">Terms</a></footer></body></html>"""))
    val withBlocks = Tables.documents(s, dir)
      .withColumn("blocks", graft.ext.Extract.htmlBlocks(html))
    val stats = graft.ext.Extract.blockStats(col("blocks"))
      .filter { case (n, _) => n != "boilerplate_chars" }
    withBlocks.select(Seq(col("doc_id"),
        graft.ext.Extract.titleFromBlocks(col("blocks")).as("title"),
        graft.ext.Extract.mainTextFromBlocks(col("blocks")).as("main_text"))
        ++ stats.map { case (n, c) => c.as(n) }: _*)
      .ordered("doc_id")
  }

  // X49 — WARC container parsing, the crawl corpus's physical front
  // door (x47's sibling: WARC framing → HTTP split → HTML extract).
  // Derived-input oracle: both engines assemble an identical
  // single-record WARC capture per document (version line, typed
  // headers, a Content-Length computed in BYTES over the entity-
  // escaped HTML payload, CRLF framing); Spark runs the REAL streaming
  // record parser (graft_warc_records) + HTTP splitter + extractor,
  // DuckDB knows the closed-form answer. A framing bug — header
  // mis-split, byte/char length confusion, payload misalignment —
  // breaks the hash.
  q("x49_warc_extract",
    """WITH gen AS (
      |  SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS p1,
      |    'HTTP/1.1 200 OK' || chr(13) || chr(10)
      |      || 'Content-Type: text/html' || chr(13) || chr(10)
      |      || chr(13) || chr(10)
      |      || '<p>' || replace(replace(replace(text,
      |           '&', '&amp;'), '<', '&lt;'), '>', '&gt;') || '</p>' AS payload
      |  FROM documents)
      |SELECT doc_id,
      |  '1.0' AS warc_version,
      |  'response' AS warc_type,
      |  'https://example.org/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
      |  CAST(strlen(payload) AS BIGINT) AS content_length,
      |  200 AS status,
      |  CASE WHEN length(p1) >= 10 THEN p1 ELSE '' END AS main_text
      |FROM gen ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val id = col("doc_id").cast("string")
    val esc = regexp_replace(regexp_replace(regexp_replace(
      col("text"), "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
    val payload = concat(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>"), esc, lit("</p>"))
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://example.org/doc/"),
      id,
      lit("\r\nWARC-Date: 2026-08-14T00:00:00Z" +
        "\r\nContent-Type: application/http; msgtype=response" +
        "\r\nContent-Length: "),
      octet_length(payload).cast("string"),
      lit("\r\n\r\n"), payload, lit("\r\n\r\n"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(graft.ext.Warc.records(rec.cast("binary"))).as("r"))
      .select(col("doc_id"),
        col("r.version").as("warc_version"),
        element_at(col("r.headers"), "WARC-Type").as("warc_type"),
        element_at(col("r.headers"), "WARC-Target-URI").as("target_uri"),
        element_at(col("r.headers"), "Content-Length").cast("long").as("content_length"),
        graft.ext.Warc.httpStatus(col("r.payload")).as("status"),
        graft.ext.Extract.mainText(graft.ext.Warc.httpBody(col("r.payload")))
          .as("main_text"))
      .ordered("doc_id")
  }

  // X49B — transfer/content-coded WARC bodies, the round-11 weak mark's
  // oracle gate: real CommonCrawl captures preserve on-the-wire bytes,
  // so 200 text/html responses routinely arrive chunked and/or gzipped.
  // Both engines know the DECODED closed form (it is x49's p1); only
  // Spark runs the real pipeline — chunk framing assembled per row (hex
  // size lines, split mid-body), gzip members compressed by the
  // deterministic JDK kernel, then records → streaming front door
  // (extractWarc: de-chunk → inflate → charset decode → extract). A
  // decode bug leaks hex framing lines or gzip bytes into main_text and
  // breaks the hash; a brotli-labeled record must be EXCLUDED, so a
  // pass also pins the undecodable-encoding gate.
  q("x49b_warc_encoded",
    """WITH gen AS (
      |  SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS p1
      |  FROM documents)
      |SELECT doc_id,
      |  CASE doc_id % 4 WHEN 0 THEN 'chunked' WHEN 1 THEN 'gzip'
      |    ELSE 'chunked+gzip' END AS mode,
      |  'https://example.org/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
      |  p1 AS main_text
      |FROM gen
      |WHERE doc_id % 4 <> 3 AND length(p1) >= 10
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val id = col("doc_id").cast("string")
    val esc = regexp_replace(regexp_replace(regexp_replace(
      col("text"), "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
    val bodyPlain = concat(lit("<p>"), esc, lit("</p>")).cast("binary")
    val bodyGz = graft.ext.Warc.gzipBytes(bodyPlain)
    // RFC 9112 chunk framing, split mid-entity: first 11 bytes, then
    // the rest (a body ≤ 11 bytes degrades to one chunk), 0-terminator
    def chunked(bin: Column): Column = concat(
      lower(hex(least(octet_length(bin), lit(11)))).cast("binary"),
      lit("\r\n").cast("binary"),
      substring(bin, 1, 11), lit("\r\n").cast("binary"),
      when(octet_length(bin) > 11, concat(
          lower(hex(octet_length(bin) - 11)).cast("binary"),
          lit("\r\n").cast("binary"),
          substring(bin, 12, 1 << 28), lit("\r\n").cast("binary")))
        .otherwise(lit("").cast("binary")),
      lit("0\r\n\r\n").cast("binary"))
    val mode = col("doc_id") % 4
    val codingHeaders = when(mode === 0, "Transfer-Encoding: chunked")
      .when(mode === 1, "Content-Encoding: gzip")
      .when(mode === 2, "Transfer-Encoding: chunked\r\nContent-Encoding: gzip")
      .otherwise("Content-Encoding: br") // undecodable: must be filtered out
    val bodyWire = when(mode === 0, chunked(bodyPlain))
      .when(mode === 1, bodyGz)
      .when(mode === 2, chunked(bodyGz))
      .otherwise(bodyPlain)
    val payload = concat(
      concat(lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"),
        codingHeaders, lit("\r\n\r\n")).cast("binary"),
      bodyWire)
    val rec = concat(
      concat(
        lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://example.org/doc/"),
        id,
        lit("\r\nContent-Type: application/http; msgtype=response\r\nContent-Length: "),
        octet_length(payload).cast("string"), lit("\r\n\r\n")).cast("binary"),
      payload, lit("\r\n\r\n").cast("binary"))
    // wire-record construction memoized per dir — the gate times the
    // READER (records → de-chunk → inflate → charset → extract), not
    // the fixture's per-row compressors (see warcWireDir)
    val src = s.read.parquet(warcWireDir(s, dir, "x49b")(
      Tables.documents(s, dir).select(col("doc_id"), rec.as("warc"))))
    graft.streaming.DocumentIngest.extractWarc(src, "warc", "text")
      .select(col("doc_id"),
        when(col("doc_id") % 4 === 0, "chunked")
          .when(col("doc_id") % 4 === 1, "gzip")
          .otherwise("chunked+gzip").as("mode"),
        col("target_uri"), col("text").as("main_text"))
      .ordered("doc_id")
  }

  // X49C — zstd content decoding reclaimed through the decoder seam:
  // x49b pinned that an encoding with NO decoder is EXCLUDED; this
  // gate pins the flip — `Content-Encoding: zstd` rows (compressed by
  // the deterministic zstd kernel) now DECODE by default, because
  // zstd-jni ships with Spark itself (Warc.ZstdDecoder in
  // Warc.defaultDecoders). Modes: plain zstd, chunked+zstd (transfer
  // de-chunk by the codegen kernel THEN content decode by the seam
  // closure — the RFC 9112 layer order pinned across the seam
  // boundary), and a br row that must STILL be excluded (the seam
  // reclaims exactly what it claims, nothing else).
  q("x49c_warc_zstd",
    """WITH gen AS (
      |  SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS p1
      |  FROM documents)
      |SELECT doc_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'zstd' ELSE 'chunked+zstd' END AS mode,
      |  'https://example.org/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
      |  p1 AS main_text
      |FROM gen
      |WHERE doc_id % 3 <> 2 AND length(p1) >= 10
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val id = col("doc_id").cast("string")
    val esc = regexp_replace(regexp_replace(regexp_replace(
      col("text"), "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
    val bodyPlain = concat(lit("<p>"), esc, lit("</p>")).cast("binary")
    val bodyZst = graft.ext.Warc.zstdBytes(bodyPlain)
    def chunked(bin: Column): Column = concat(
      lower(hex(least(octet_length(bin), lit(11)))).cast("binary"),
      lit("\r\n").cast("binary"),
      substring(bin, 1, 11), lit("\r\n").cast("binary"),
      when(octet_length(bin) > 11, concat(
          lower(hex(octet_length(bin) - 11)).cast("binary"),
          lit("\r\n").cast("binary"),
          substring(bin, 12, 1 << 28), lit("\r\n").cast("binary")))
        .otherwise(lit("").cast("binary")),
      lit("0\r\n\r\n").cast("binary"))
    val mode = col("doc_id") % 3
    val codingHeaders = when(mode === 0, "Content-Encoding: zstd")
      .when(mode === 1, "Transfer-Encoding: chunked\r\nContent-Encoding: zstd")
      .otherwise("Content-Encoding: br") // still undecodable: must die
    val bodyWire = when(mode === 0, bodyZst)
      .when(mode === 1, chunked(bodyZst))
      .otherwise(bodyPlain)
    val payload = concat(
      concat(lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"),
        codingHeaders, lit("\r\n\r\n")).cast("binary"),
      bodyWire)
    val rec = concat(
      concat(
        lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://example.org/doc/"),
        id,
        lit("\r\nContent-Type: application/http; msgtype=response\r\nContent-Length: "),
        octet_length(payload).cast("string"), lit("\r\n\r\n")).cast("binary"),
      payload, lit("\r\n\r\n").cast("binary"))
    // constructor memoized per dir, like x49b — the gate times the
    // reader incl. the zstd decoder closure, not the compressor
    val src = s.read.parquet(warcWireDir(s, dir, "x49c")(
      Tables.documents(s, dir).select(col("doc_id"), rec.as("warc"))))
    graft.streaming.DocumentIngest.extractWarc(src, "warc", "text")
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "zstd")
          .otherwise("chunked+zstd").as("mode"),
        col("target_uri"), col("text").as("main_text"))
      .ordered("doc_id")
  }

  // X67 — document-extraction seam ([[graft.ext.DocExtract.texts]]):
  // the media-type dispatcher over (content-type, bytes) rows — plain
  // text round-trips the charset decode verbatim, HTML runs the real
  // extraction policy, and application/pdf rows (no extractor
  // supplied) are EXCLUDED — the oracle omits them, so a dispatch or
  // exclusion bug breaks rows; DocExtractSpec pins the stub-extractor
  // reclaim + telemetry sides.
  q("x67_doc_extract",
    """WITH gen AS (
      |  SELECT doc_id, text, trim(regexp_replace(text, '\s+', ' ', 'g')) AS p1
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'text/plain' ELSE 'text/html' END AS mt,
      |  CASE WHEN doc_id % 3 = 0 THEN text ELSE p1 END AS text
      |FROM gen
      |WHERE (doc_id % 3 = 0 AND text IS NOT NULL AND text <> '')
      |   OR (doc_id % 3 = 1 AND length(p1) >= 10)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val esc = regexp_replace(regexp_replace(regexp_replace(
      col("text"), "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
    val m3 = col("doc_id") % 3
    val ct = when(m3 === 0, "text/plain; charset=utf-8")
      .when(m3 === 1, "text/html")
      .otherwise("application/pdf")
    val bytes = when(m3 === 0, coalesce(col("text"), lit("")).cast("binary"))
      .when(m3 === 1, concat(lit("<p>"), esc, lit("</p>")).cast("binary"))
      .otherwise(lit("%PDF-1.7 fake").cast("binary"))
    graft.ext.DocExtract.texts(
        Tables.documents(s, dir).select(col("doc_id"), ct.as("ct"), bytes.as("b")),
        "ct", "b", "text")
      .select(col("doc_id"), graft.ext.DocExtract.mediaType(col("ct")).as("mt"),
        col("text"))
      .ordered("doc_id")
  }

  // X73 — the DataSource V2 `warc` FORMAT end to end: real `.warc.gz`
  // FILES on disk (one gzip member per record — the CommonCrawl
  // layout; written once per scale dir by an executor-side sink, the
  // warcWireDir discipline), read back through
  // `spark.read.format("warc")` and the extraction pipeline. The
  // oracle is x49's closed form keyed by the URI-recovered doc id —
  // a file-framing, gzip-member, partition-planning, or
  // pruning-pushdown bug breaks rows or hash.
  q("x73_warc_source",
    """WITH gen AS (
      |  SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS p1
      |  FROM documents)
      |SELECT doc_id,
      |  'response' AS warc_type,
      |  'https://example.org/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
      |  200 AS status,
      |  CASE WHEN length(p1) >= 10 THEN p1 ELSE '' END AS main_text
      |FROM gen ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val files = warcFilesFor(s, dir)
    s.read.format("warc").load(files + "/*.warc.gz")
      .select(
        regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1)
          .cast("long").as("doc_id"),
        col("warc_type"), col("target_uri"),
        graft.ext.Warc.httpStatus(col("payload")).as("status"),
        graft.ext.Extract.mainText(
          graft.ext.Warc.httpBodyText(col("payload"))).as("main_text"))
      .ordered("doc_id")
  }

  // X74 — the WARC ARCHIVING SINK round-trip ([[graft.ext.Warc
  // .writeRecords]] → the DSv2 `warc` reader): captures written by the
  // REAL sink (one gzip member per record, executor-side, memoized per
  // scale dir) must read back byte-faithful — uri, date, declared
  // length, payload text. A framing bug on the WRITE side (byte/char
  // length confusion, CRLF mis-close, member boundaries) breaks the
  // reader's parse and the hash.
  q("x74_warc_roundtrip",
    """SELECT doc_id,
      |  'https://archive.example/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
      |  '2026-08-15T00:00:00Z' AS warc_date,
      |  CAST(strlen('HTTP/1.1 200 OK' || chr(13) || chr(10) || chr(13) || chr(10)
      |    || COALESCE(text, '')) AS BIGINT) AS content_length,
      |  COALESCE(text, '') AS body
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val files = warcSinkFilesFor(s, dir)
    s.read.format("warc").load(files + "/*.warc.gz")
      .select(
        regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1)
          .cast("long").as("doc_id"),
        col("target_uri"), col("warc_date"), col("content_length"),
        graft.ext.Warc.httpBody(col("payload")).as("body"))
      .ordered("doc_id")
  }

  // X12I — image near-dup pairs ([[graft.ext.Multimodal.imageNearDups]]:
  // perceptual dHash + the signature-agnostic Hamming banding engine).
  // Rows-only gate (no SQL engine decodes PNG): the synthetic image
  // table unioned with re-tagged byte-identical twins of every 3rd
  // image; the decode+hash stage runs over the WHOLE table, and the
  // output keeps the PLANTED twin pairs (id2 = id1 + 1e6) so the row
  // count stays linear — the synthetic fixture's low-entropy patterns
  // collide across seeds (a real image corpus' dHash diversity keeps
  // collision classes small), and without the planted filter the
  // accidental-collision pairs would grow quadratically with SF.
  // ExtSpec pins the hash semantics (brightness invariance, resize
  // proximity, undecodable drop) on golden fixtures.
  q("x12i_image_neardups") { (s, dir) =>
    import s.implicits._
    val media = graft.ext.Multimodal.syntheticImageTable(s, dir)
    val twins = media.filter(col("media_id") % 3 === 0)
      .withColumn("media_id", col("media_id") + lit(1000000L))
      .as[graft.ext.Multimodal.MediaRow]
    graft.ext.Multimodal.imageNearDups(media.unionByName(twins), maxHamming = 0)
      .filter(col("id2") === col("id1") + lit(1000000L))
      .orderBy("id1", "id2")
  }

  // X12L — image near-dups at REAL perceptual radius ([[graft.ext
  // .Dedup.signatureNearDups]] 8-bit-block path, exhaustive to Hamming
  // 7): every 3rd image gets a NEAR-identical (not byte-identical)
  // twin — pixel (0,0) forced to white, which moves exactly ONE dHash
  // cell mean and so at most ONE signature bit — and the pair stage
  // runs at maxHamming = 6, the radius real dHash image dedup uses
  // (quarter blocking refused anything above 3). Planted-pair filter
  // keeps rows linear in SF (the x12i rationale); the hamming column
  // (0 or 1 per twin, deterministic integer pixel math) rides the
  // hash.
  q("x12l_image_neardups_r6") { (s, dir) =>
    import s.implicits._
    val media = graft.ext.Multimodal.syntheticImageTable(s, dir)
    val twins = media.filter(col("media_id") % 3 === 0)
      .as[graft.ext.Multimodal.MediaRow]
      .map { m =>
        // in-memory stream (see [[graft.ext.Multimodal.ImageIoCodec]]
        // .read — the default path pays a disk cache file per decode)
        val img = javax.imageio.ImageIO.read(
          new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(m.payload)))
        img.setRGB(0, 0, 0xFFFFFF)
        m.copy(media_id = m.media_id + 1000000L,
          payload = graft.ext.Multimodal.ImageIoCodec.encodePng(img))
      }
    graft.ext.Multimodal.imageNearDups(media.unionByName(twins), maxHamming = 6)
      .filter(col("id2") === col("id1") + lit(1000000L))
      .orderBy("id1", "id2")
  }

  // X12M — image near-dups over the DCT pHash ([[graft.ext.Multimodal
  // .imageNearDupsPhash]]: integer 32×32-grid DCT-II via a fixed-point
  // StrictMath cosine table, 8×8 low-frequency block thresholded at
  // the median — the recompression-robust upgrade over dHash, whose
  // near-tie gradient bits JPEG noise flips; ExtSpec pins the golden
  // where a JPEG re-encode lands within pHash radius 6 but past dHash
  // radius 6). Same x12l planted-twin design (pixel (0,0) forced
  // white) at the banding engine's full radius 7: a 1-pixel change
  // moves exactly one 32×32 grid cell, so the DCT shift flips only
  // near-median bits — the hamming column rides the hash and the
  // planted filter keeps rows linear in SF.
  q("x12m_image_neardups_phash") { (s, dir) =>
    import s.implicits._
    val media = graft.ext.Multimodal.syntheticImageTable(s, dir)
    val twins = media.filter(col("media_id") % 3 === 0)
      .as[graft.ext.Multimodal.MediaRow]
      .map { m =>
        // in-memory stream (see [[graft.ext.Multimodal.ImageIoCodec]]
        // .read — the default path pays a disk cache file per decode)
        val img = javax.imageio.ImageIO.read(
          new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(m.payload)))
        img.setRGB(0, 0, 0xFFFFFF)
        m.copy(media_id = m.media_id + 1000000L,
          payload = graft.ext.Multimodal.ImageIoCodec.encodePng(img))
      }
    graft.ext.Multimodal.imageNearDupsPhash(media.unionByName(twins),
        maxHamming = 7)
      .filter(col("id2") === col("id1") + lit(1000000L))
      .orderBy("id1", "id2")
  }

  // X12J — audio near-dup pairs ([[graft.ext.Multimodal.audioNearDups]]:
  // energy-contour hash + the shared Hamming banding engine). Same
  // planted-twin design as x12i: the hash stage runs over the whole
  // synthetic audio table, the output keeps the byte-identical twins
  // so rows stay linear in SF.
  q("x12j_audio_neardups") { (s, dir) =>
    import s.implicits._
    val media = graft.ext.Multimodal.syntheticAudioTable(s, dir)
    val twins = media.filter(col("media_id") % 3 === 0)
      .withColumn("media_id", col("media_id") + lit(1000000L))
      .as[graft.ext.Multimodal.MediaRow]
    graft.ext.Multimodal.audioNearDups(media.unionByName(twins), maxHamming = 0)
      .filter(col("id2") === col("id1") + lit(1000000L))
      .orderBy("id1", "id2")
  }

  // X79 — WebDataset TAR shard round-trip ([[graft.ext.WebDataset
  // .writeShards]] → [[readEntries]] → [[samples]]): documents packed
  // as two-field samples (txt + meta) into real ustar shards, read
  // back and re-keyed — the multimodal training-data packaging path.
  // The oracle states the closed form; a framing bug (octal size,
  // checksum, 512 padding, entry grouping) breaks the parse and the
  // hash. Shards are memoized per scale dir (the warcSink discipline).
  q("x79_webdataset_roundtrip",
    """SELECT doc_id, COALESCE(text, '') AS text,
      |  CAST(doc_id * 7 AS VARCHAR) AS meta
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val shards = wdsShardsFor(s, dir)
    val sm = graft.ext.WebDataset.samples(
      graft.ext.WebDataset.readEntries(s, shards + "/*.tar"))
    sm.select(col("key").cast("long").as("doc_id"),
        expr("CAST(fields['txt'] AS STRING)").as("text"),
        expr("CAST(fields['meta'] AS STRING)").as("meta"))
      .ordered("doc_id")
  }

  private val wdsMemo = scala.collection.concurrent.TrieMap.empty[String, String]
  private def wdsShardsFor(s: SparkSession, dir: String): String =
    wdsMemo.getOrElseUpdate(dir, {
      val out = java.nio.file.Files.createTempDirectory("graft-wds-gate").toString
      graft.ext.WebDataset.writeShards(
        Tables.documents(s, dir).select(col("doc_id").as("key"),
          coalesce(col("text"), lit("")).as("txt"),
          (col("doc_id") * 7).cast("string").as("meta")).repartition(4),
        "key", Seq("txt" -> col("txt"), "meta" -> col("meta")), out)
      out
    })

  // X80 — CROSS-MODAL sample assembly, the multimodal loop closed
  // end-to-end: documents (captions) join their [[graft.ext.Multimodal
  // .syntheticImageTable]] media by id, pack as (txt + png) WebDataset
  // samples ([[graft.ext.WebDataset.writeShards]] — BYTE-TARGETED at
  // 256 KiB via [[writeShardsBySize]], exercising the prefix-sum
  // assignment on a real mixed text+binary corpus), read back, and
  // BOTH fields verify: the caption hash-exact against the documents
  // closed form, the image by decoding the round-tripped PNG and
  // comparing its decoded-pixel checksum against a freshly generated
  // twin (`img_ok` — any corruption of the binary field in tar framing
  // or field mapping flips it and breaks the hash).
  q("x80_crossmodal_pack",
    """SELECT doc_id, COALESCE(text, '') AS caption,
      |  CAST(1 AS BOOLEAN) AS img_ok
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val sm = graft.ext.WebDataset.samples(
      graft.ext.WebDataset.readEntries(s, x80ShardsFor(s, dir) + "/*.tar"))
    sm.select(col("key").cast("long").as("doc_id"),
        expr("CAST(fields['txt'] AS STRING)").as("caption"),
        col("fields")("png").as("img"))
      .as[(Long, String, Array[Byte])]
      .map { case (id, cap, img) =>
        val w = (id % 16 + 4).toInt
        val h = (id % 12 + 4).toInt
        // expectation from the closed-form pixels (no throwaway PNG
        // encode+decode per row — measured 2x the whole verify)
        val expect =
          graft.ext.Multimodal.ImageIoCodec.syntheticChecksum(id, w, h)
        (id, cap,
          img != null && graft.ext.Multimodal.ImageIoCodec.checksum(img) == expect)
      }
      .toDF("doc_id", "caption", "img_ok")
      .ordered("doc_id")
  }

  private val x80Memo = scala.collection.concurrent.TrieMap.empty[String, String]
  private def x80ShardsFor(s: SparkSession, dir: String): String =
    x80Memo.getOrElseUpdate(dir, {
      val out = java.nio.file.Files.createTempDirectory("graft-x80-gate").toString
      val captions = Tables.documents(s, dir)
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("caption"))
      val media = graft.ext.Multimodal.syntheticImageTable(s, dir).toDF()
        .select(col("media_id").as("doc_id"), col("payload"))
      graft.ext.WebDataset.writeShardsBySize(
        captions.join(media, Seq("doc_id")),
        "doc_id", Seq("txt" -> col("caption"), "png" -> col("payload")),
        out, targetBytes = 256 * 1024)
      out
    })

  // X12K — video near-dup pairs ([[graft.ext.Multimodal.videoNearDups]]:
  // sampled-frame dHash fingerprints, shared-frame-count threshold).
  // Planted-twin design (x12i/x12j): fingerprints over the whole
  // synthetic video table, output kept to the byte-identical twins.
  // minShared=1 because the smallest synthetic videos sample few
  // frames and some frames hash degenerate (dropped by design).
  q("x12k_video_neardups") { (s, dir) =>
    import s.implicits._
    val media = graft.ext.Multimodal.syntheticVideoTable(s, dir)
    val twins = media.filter(col("media_id") % 3 === 0)
      .withColumn("media_id", col("media_id") + lit(1000000L))
      .as[graft.ext.Multimodal.MediaRow]
    graft.ext.Multimodal.videoNearDups(media.unionByName(twins),
        intervalMs = 100, minShared = 1)
      .filter(col("id2") === col("id1") + lit(1000000L))
      .orderBy("id1", "id2")
  }

  // X81 — WAT metadata sidecar round-trip ([[graft.ext.Warc
  // .writeWatRecords]] → [[watEnvelopes]]): the frontier fixture's
  // HTML pages archived as responses, their WAT derived (ONE codegen
  // to_json over the shared body-decode + link kernels), written as
  // `metadata` records, read back, and compared against the closed
  // form of every page's 7 out-links IN DOCUMENT ORDER (3 items, the
  // tracking-param twin, the opaque javascript: ref, the spam link,
  // the resolved relative self-link) plus status/mime/title. A wrong
  // link resolution, JSON envelope field, or record framing breaks
  // the hash. Completes the CommonCrawl artifact trio: WARC (x74),
  // WET (x61), CDX (x77) — and now WAT.
  q("x81_wat_sidecar",
    """SELECT doc_id,
      |  'https://h' || CAST(doc_id % 50 AS VARCHAR) || '.example/page'
      |    || CAST(doc_id AS VARCHAR) AS url,
      |  200 AS status, 'text/html' AS mime, '' AS title, 7 AS n_links,
      |  'https://h' || CAST((doc_id * 7 + 1) % 50 AS VARCHAR) || '.example/item'
      |    || CAST(doc_id AS VARCHAR) || '-1 '
      |  || 'https://h' || CAST((doc_id * 7 + 2) % 50 AS VARCHAR) || '.example/item'
      |    || CAST(doc_id AS VARCHAR) || '-2 '
      |  || 'https://h' || CAST((doc_id * 7 + 3) % 50 AS VARCHAR) || '.example/item'
      |    || CAST(doc_id AS VARCHAR) || '-3 '
      |  || 'https://h' || CAST((doc_id * 7 + 1) % 50 AS VARCHAR) || '.example/item'
      |    || CAST(doc_id AS VARCHAR) || '-1?utm_source=track '
      |  || 'javascript:void(0) '
      |  || 'https://spam.blocked.example/x' || CAST(doc_id AS VARCHAR) || ' '
      |  || 'https://h' || CAST(doc_id % 50 AS VARCHAR) || '.example/page'
      |    || CAST(doc_id AS VARCHAR) AS links_str
      |FROM documents WHERE doc_id % 50 < 40 ORDER BY doc_id""".stripMargin) {
    (s, dir) =>
      val env = graft.ext.Warc.watEnvelopes(
        graft.ext.Warc.read(s, watArchiveFor(s, dir) + "/*.warc.gz"))
      env.select(
          regexp_extract(col("target_uri"), "/page([0-9]+)$", 1)
            .cast("long").as("doc_id"),
          col("target_uri").as("url"), col("status"), col("mime"),
          col("title"), size(col("links")).as("n_links"),
          array_join(col("links"), " ").as("links_str"))
        .ordered("doc_id")
  }

  // X86 — cluster-balanced sampling ([[graft.ext.Sampling
  // .clusterBalancedTake]]): seeded k-means cells over the embedding
  // corpus, then the exact per-cell stratified take — the
  // "cluster-then-sample" diversification a uniform draw can't give
  // (a dominant semantic mode can never fill the budget). Rows-only
  // (no SQL engine replicates the MLlib quantizer); determinism and
  // the per-cell cap/exactness are pinned in SamplingSpec.
  q("x86_cluster_balanced") { (s, dir) =>
    graft.ext.Sampling.clusterBalancedTake(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        cells = 8, perCell = 20, seed = "x86")
      .select(col("cell"), col("vec_id"))
      .ordered("cell", "vec_id")
  }

  // X86B — the cluster-balanced TAKE oracle-exact (the x26b "stored
  // label plays the fitted quantizer" move): only the k-means cell
  // assignment is engine-specific in x86 — here the stored `label`
  // column pins it, and the ENTIRE take discipline ([[graft.ext
  // .Sampling.stratifiedTake]]'s critical-bucket quota machinery:
  // md5-seeded draw, first-n per stratum in (draw, key) order) runs
  // against DuckDB's naive ROW_NUMBER re-derivation — a quota
  // off-by-one, draw-formula drift, or tie-break slip breaks the hash.
  q("x86b_cluster_take_oracle",
    """WITH r AS (
      |  SELECT label AS cell, vec_id,
      |    ROW_NUMBER() OVER (PARTITION BY label
      |      ORDER BY md5(CAST(vec_id AS VARCHAR) || ':x86b'), vec_id) AS rk
      |  FROM embeddings)
      |SELECT cell, vec_id FROM r WHERE rk <= 20
      |ORDER BY cell, vec_id""".stripMargin) { (s, dir) =>
    graft.ext.Sampling.stratifiedTake(
        Tables.embeddings(s, dir).withColumn("cell", col("label")),
        Seq("cell"), col("vec_id"), "x86b", 20)
      .select(col("cell"), col("vec_id"))
      .ordered("cell", "vec_id")
  }

  // X85 — corpus DRIFT monitor ([[graft.ext.TextOps.vocabDivergence]]):
  // KL both ways + bounded Jensen-Shannon over the union vocab with
  // add-0.5 smoothing, even-doc corpus vs odd-doc corpus — the check a
  // pipeline runs between corpus versions ("did the new filter shift
  // the distribution?"). One token-count agg per side, one full-outer
  // vocab join, per-term contributions on the round-12 decimal
  // consensus — the oracle runs the identical IEEE forms; a smoothing,
  // union-vocab, or probability-normalization slip breaks the hash.
  q("x85_vocab_divergence",
    """WITH ta AS (
      |  SELECT UNNEST(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      |  FROM documents WHERE doc_id % 2 = 0),
      |tb AS (
      |  SELECT UNNEST(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      |  FROM documents WHERE doc_id % 2 = 1),
      |ca AS (SELECT term, COUNT(*)::BIGINT AS ca FROM ta WHERE term <> '' GROUP BY 1),
      |cb AS (SELECT term, COUNT(*)::BIGINT AS cb FROM tb WHERE term <> '' GROUP BY 1),
      |merged AS (
      |  SELECT COALESCE(ca.ca, 0) AS ca, COALESCE(cb.cb, 0) AS cb
      |  FROM ca FULL OUTER JOIN cb USING (term)),
      |stats AS (
      |  SELECT SUM(ca)::BIGINT AS na, SUM(cb)::BIGINT AS nb,
      |         COUNT(*)::BIGINT AS v FROM merged),
      |c AS (
      |  SELECT na, nb, v,
      |    (ca + 0.5) / (na + 0.5 * v) AS p,
      |    (cb + 0.5) / (nb + 0.5 * v) AS q
      |  FROM merged CROSS JOIN stats),
      |sums AS (
      |  SELECT na, nb, v,
      |    SUM(CAST(ROUND(p * LN(p / q), 12) AS DECIMAL(32,14))) AS s_ab,
      |    SUM(CAST(ROUND(q * LN(q / p), 12) AS DECIMAL(32,14))) AS s_ba,
      |    SUM(CAST(ROUND(p * LN(p / ((p + q) / 2)) / 2
      |      + q * LN(q / ((p + q) / 2)) / 2, 12) AS DECIMAL(32,14))) AS s_js
      |  FROM c GROUP BY 1, 2, 3)
      |SELECT v AS n_terms, na AS n_tokens_a, nb AS n_tokens_b,
      |  ROUND(CAST(s_ab AS DOUBLE), 6) AS kl_ab,
      |  ROUND(CAST(s_ba AS DOUBLE), 6) AS kl_ba,
      |  ROUND(CAST(s_js AS DOUBLE), 6) AS js
      |FROM sums""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    graft.ext.TextOps.vocabDivergence(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1), "text")
  }

  // X83 — WARC revisit records ([[graft.ext.Warc.writeRecordsDeduped]]
  // → [[readDeduped]] → [[resolveRevisits]]): every doc captured on
  // day 1; even docs re-captured UNCHANGED on day 2 — the recrawl
  // case the ISO 28500 revisit profile exists for. The day-2 captures
  // store as payload-free revisit records (the spec asserts the byte
  // shrink); the gate checks the LOGICAL view: resolution fills every
  // revisit from the original it names, digest-gated, so the full
  // capture history comes back body-exact. A wrong winner pick,
  // refers-to linkage, digest, or fill join breaks the hash.
  q("x83_warc_revisit",
    """SELECT doc_id, url, warc_date, body FROM (
      |  SELECT doc_id,
      |    'https://rv.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
      |    '2026-08-14T00:00:00Z' AS warc_date,
      |    'rv ' || COALESCE(text, '') AS body FROM documents
      |  UNION ALL
      |  SELECT doc_id,
      |    'https://rv.example/doc/' || CAST(doc_id AS VARCHAR),
      |    '2026-08-15T00:00:00Z', 'rv ' || COALESCE(text, '')
      |  FROM documents WHERE doc_id % 2 = 0)
      |ORDER BY doc_id, warc_date""".stripMargin) { (s, dir) =>
    graft.ext.Warc.resolveRevisits(
        graft.ext.Warc.readDeduped(s, revisitArchiveFor(s, dir) + "/*.warc.gz"))
      .select(
        regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1)
          .cast("long").as("doc_id"),
        col("target_uri").as("url"), col("warc_date"),
        graft.ext.Warc.httpBody(col("payload")).as("body"))
      .ordered("doc_id", "warc_date")
  }

  private val revisitMemo = scala.collection.concurrent.TrieMap.empty[String, String]
  private def revisitArchiveFor(s: SparkSession, dir: String): String =
    revisitMemo.getOrElseUpdate(dir, {
      val out = java.nio.file.Files.createTempDirectory("graft-rv-gate").toString
      def epoch(day: String, filt: Column) =
        Tables.documents(s, dir).filter(filt).select(
          concat(lit("https://rv.example/doc/"),
            col("doc_id").cast("string")).as("uri"),
          lit(day).as("ts"),
          concat(lit("HTTP/1.1 200 OK\r\n\r\nrv "),
            coalesce(col("text"), lit(""))).as("payload"))
      graft.ext.Warc.writeRecordsDeduped(
        epoch("2026-08-14T00:00:00Z", lit(true))
          .unionByName(epoch("2026-08-15T00:00:00Z", col("doc_id") % 2 === 0))
          .repartition(4),
        "uri", "ts", "payload", out)
      out
    })

  // X82 — SURT url-keys ([[graft.ext.UrlOps.surtKey]], the CommonCrawl
  // CDX `urlkey`): mixed-case www/params URLs canonicalize to the
  // sort-friendly reversed-host form whose point is RANGE-scannable
  // site locality in a sorted CDX store (one site = one contiguous
  // key range = parquet zone-map pruning). The oracle states the
  // closed form — host reversal, www strip, case fold, and the
  // param SORT are each load-bearing in the hash.
  q("x82_surt_urlkey",
    """SELECT doc_id,
      |  'com,example,h' || CAST(doc_id % 50 AS VARCHAR) || ')/item/'
      |    || CAST(doc_id AS VARCHAR) || '?a=1&m=2&z='
      |    || CAST(doc_id AS VARCHAR) AS urlkey
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val id = col("doc_id").cast("string")
    val url = concat(lit("https://WWW.H"), (col("doc_id") % 50).cast("string"),
      lit(".Example.com/Item/"), id, lit("?Z="), id, lit("&a=1&M=2"))
    Tables.documents(s, dir)
      .select(col("doc_id"), graft.ext.UrlOps.surtKey(url).as("urlkey"))
      .ordered("doc_id")
  }

  private val watMemo = scala.collection.concurrent.TrieMap.empty[String, String]
  private def watArchiveFor(s: SparkSession, dir: String): String =
    watMemo.getOrElseUpdate(dir, {
      val arc = java.nio.file.Files.createTempDirectory("graft-wat-arc").toString
      val wat = java.nio.file.Files.createTempDirectory("graft-wat-gate").toString
      graft.ext.Warc.writeRecords(
        frontierFixturePages(s, dir).select(col("url").as("uri"),
          lit("2026-08-15T00:00:00Z").as("ts"),
          concat(lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"),
            col("html")).as("payload")).repartition(4),
        "uri", "ts", "payload", arc)
      graft.ext.Warc.writeWatRecords(
        graft.ext.Warc.read(s, arc + "/*.warc.gz"), wat)
      wat
    })

  /** The x78 TWO-EPOCH archive: every doc captured on day 1 (v1
    * bodies); even docs RE-captured on day 2 (v2 bodies). One merged
    * CDX index parquet, memoized per scale dir. */
  private val warcEpochIdxMemo = scala.collection.concurrent.TrieMap.empty[String, String]
  private def warcEpochIndexFor(s: SparkSession, dir: String): String =
    warcEpochIdxMemo.getOrElseUpdate(dir, {
      val idx = java.nio.file.Files.createTempDirectory("graft-epoch-idx").toString
      def epoch(tag: String, day: String, filt: Column): org.apache.spark.sql.DataFrame =
        graft.ext.Warc.writeRecordsIndexed(
          Tables.documents(s, dir).filter(filt).select(
            concat(lit("https://archive.example/doc/"),
              col("doc_id").cast("string")).as("uri"),
            lit(day).as("ts"),
            concat(lit(s"HTTP/1.1 200 OK\r\n\r\n$tag "),
              coalesce(col("text"), lit(""))).as("payload")).repartition(4),
          "uri", "ts", "payload",
          java.nio.file.Files.createTempDirectory(s"graft-epoch-$tag").toString)
          .toDF()
      epoch("v1", "2026-08-14T00:00:00Z", lit(true))
        .union(epoch("v2", "2026-08-15T00:00:00Z", col("doc_id") % 2 === 0))
        .write.mode("overwrite").parquet(idx)
      idx
    })

  // X78 — URL-dedup over the CDX index + random access ([[graft.ext
  // .Warc.readLatestCaptures]]): every doc captured in epoch 1, even
  // docs re-captured in epoch 2 — the newest capture wins per URL ON
  // THE INDEX ALONE (one metadata aggregation; only winners' byte
  // ranges are fetched, INSIDE the decision's own exchange — the
  // fused form shuffles the index once, not twice, and needs no join
  // back to the index for the url key). The oracle states the per-doc
  // winning body; a wrong max-struct ordering or a fetch of the losing
  // epoch's range breaks the hash.
  q("x78_warc_latest_capture",
    """SELECT doc_id,
      |  'https://archive.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
      |  CASE WHEN doc_id % 2 = 0 THEN '2026-08-15T00:00:00Z'
      |       ELSE '2026-08-14T00:00:00Z' END AS warc_date,
      |  (CASE WHEN doc_id % 2 = 0 THEN 'v2 ' ELSE 'v1 ' END)
      |    || COALESCE(text, '') AS body
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.ext.Warc.readLatestCaptures(
        s.read.parquet(warcEpochIndexFor(s, dir)))
      .select(
        regexp_extract(col("url"), "/doc/([0-9]+)$", 1)
          .cast("long").as("doc_id"),
        col("url"), col("warc_date"),
        graft.ext.Warc.httpBody(col("payload")).as("body"))
      .ordered("doc_id")
  }

  /** The x88 DEDUPED two-epoch archive + linkage index: every doc
    * captured on day 1; even docs RE-captured UNCHANGED on day 2 —
    * [[graft.ext.Warc.writeRecordsDedupedIndexed]] stores day 2 as
    * payload-free revisits of day 1 and returns the index with the
    * Refers-To linkage. Payloads carry the doc id so digest dedup
    * never crosses documents. Memoized per scale dir. */
  private val dedupIdxMemo = scala.collection.concurrent.TrieMap.empty[String, String]
  private def dedupIndexFor(s: SparkSession, dir: String): String =
    dedupIdxMemo.getOrElseUpdate(dir, {
      val arc = java.nio.file.Files.createTempDirectory("graft-rsv-arc").toString
      val idx = java.nio.file.Files.createTempDirectory("graft-rsv-idx").toString
      def epoch(day: String, filt: Column) =
        Tables.documents(s, dir).filter(filt).select(
          concat(lit("https://rs.example/doc/"),
            col("doc_id").cast("string")).as("uri"),
          lit(day).as("ts"),
          concat(lit("HTTP/1.1 200 OK\r\n\r\nrs "),
            col("doc_id").cast("string"), lit(" "),
            coalesce(col("text"), lit(""))).as("payload"))
      graft.ext.Warc.writeRecordsDedupedIndexed(
          epoch("2026-08-14T00:00:00Z", lit(true))
            .unionByName(epoch("2026-08-15T00:00:00Z", col("doc_id") % 2 === 0))
            .repartition(4),
          "uri", "ts", "payload", arc)
        .write.mode("overwrite").parquet(idx)
      idx
    })

  // X88 — REVISIT-AWARE latest-capture serving ([[graft.ext.Warc
  // .writeRecordsDedupedIndexed]] → [[graft.ext.Warc
  // .readLatestCapturesDeduped]], routed through the readLatestCaptures
  // front door by the linkage-column witness): over the deduped
  // two-epoch archive, every EVEN doc's newest capture is a
  // payload-FREE revisit — the serving decision runs on the index,
  // resolves the winner through Refers-To, fetches the ORIGINAL's byte
  // range by positioned read, and digest-gates the bytes. The oracle
  // states winner date + exact body + revisit-ness per doc; serving
  // the revisit record's own (empty) payload, picking the wrong epoch,
  // or a broken digest gate each break rows or hash.
  q("x88_revisit_serving",
    """SELECT doc_id,
      |  'https://rs.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
      |  CASE WHEN doc_id % 2 = 0 THEN '2026-08-15T00:00:00Z'
      |       ELSE '2026-08-14T00:00:00Z' END AS warc_date,
      |  'rs ' || CAST(doc_id AS VARCHAR) || ' ' || COALESCE(text, '') AS body,
      |  (doc_id % 2 = 0) AS was_revisit
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.ext.Warc.readLatestCaptures(s.read.parquet(dedupIndexFor(s, dir)))
      .select(
        regexp_extract(col("url"), "/doc/([0-9]+)$", 1)
          .cast("long").as("doc_id"),
        col("url"), col("warc_date"),
        graft.ext.Warc.httpBody(col("payload")).as("body"),
        col("was_revisit"))
      .ordered("doc_id")
  }

  /** The x89 DEDUPED SITE store: the x88 revisit mechanism on
    * site-structured URLs, plus a MIRROR site whose day-1 captures are
    * byte-identical to site h7's (so they dedup into CROSS-SITE
    * revisits of h7's originals), all folded into a [[graft.ext
    * .CdxStore]] through the real append+compact protocol. Even/odd
    * is constant within a %50 site, so the recapture criterion is
    * doc_id % 3. Memoized per scale dir. */
  private val cdxDedupMemo = scala.collection.concurrent.TrieMap.empty[String, String]
  private def cdxDedupStoreFor(s: SparkSession, dir: String): String =
    cdxDedupMemo.getOrElseUpdate(dir, {
      val t = "graft_cdxdedup_" + Integer.toHexString(dir.hashCode)
      graft.store.Bucketing.dropWithLocation(s, t)
      val arc = java.nio.file.Files.createTempDirectory("graft-cdxdd").toString
      val idxDir = java.nio.file.Files.createTempDirectory("graft-cdxdd-idx").toString
      val id = col("doc_id").cast("string")
      val pay = concat(lit("HTTP/1.1 200 OK\r\n\r\nsv "), id, lit(" "),
        coalesce(col("text"), lit("")))
      def cap(host: Column, day: String, filt: Column) =
        Tables.documents(s, dir).filter(filt).select(
          concat(lit("https://"), host, lit(".example.com/item/"), id).as("uri"),
          lit(day).as("ts"), pay.as("payload"))
      val site = concat(lit("h"), (col("doc_id") % 50).cast("string"))
      graft.ext.Warc.writeRecordsDedupedIndexed(
          cap(site, "2026-08-14T00:00:00Z", lit(true))
            .unionByName(cap(site, "2026-08-15T00:00:00Z", col("doc_id") % 3 === 0))
            .unionByName(cap(lit("mirror"), "2026-08-14T00:00:00Z",
              col("doc_id") % 50 === 7))
            .repartition(4),
          "uri", "ts", "payload", arc).toDF()
        .withColumn("urlkey", graft.ext.UrlOps.surtKey(col("target_uri")))
        .write.mode("overwrite").parquet(idxDir)
      val idx = s.read.parquet(idxDir)
      val half = crc32(col("target_uri")) % 2 === 0
      graft.ext.CdxStore.append(idx.filter(half), t, buckets = 8)
      graft.ext.CdxStore.append(idx.filter(!half), t, buckets = 8)
      graft.ext.CdxStore.compact(s, t, buckets = 8)
      t
    })

  // X89 — SITE-scoped revisit-aware serving FROM THE STORE ([[graft
  // .ext.CdxStore.serveLatestCaptures]] — the r17 #2/#3 features
  // composed end to end): site h7 range-prunes off the compacted
  // store, winners decide on the slice, in-site revisit winners
  // (doc_id % 3 == 0 recaptures) resolve through Refers-To; the
  // MIRROR site's every winner is a CROSS-SITE revisit whose original
  // lives outside the slice — the referred keys fetch through the
  // pushed-IN extra lookup, digest-gated. The oracle states both
  // sites' full serving (winner date + exact body + revisit-ness); a
  // broken range end, a slice-only originals join (mirror rows
  // vanish), or a wrong epoch each break rows or hash.
  q("x89_cdx_revisit_site",
    """SELECT doc_id, url, warc_date, body, was_revisit FROM (
      |  SELECT doc_id,
      |    'https://h7.example.com/item/' || CAST(doc_id AS VARCHAR) AS url,
      |    CASE WHEN doc_id % 3 = 0 THEN '2026-08-15T00:00:00Z'
      |         ELSE '2026-08-14T00:00:00Z' END AS warc_date,
      |    'sv ' || CAST(doc_id AS VARCHAR) || ' ' || COALESCE(text, '') AS body,
      |    (doc_id % 3 = 0) AS was_revisit
      |  FROM documents WHERE doc_id % 50 = 7
      |  UNION ALL
      |  SELECT doc_id,
      |    'https://mirror.example.com/item/' || CAST(doc_id AS VARCHAR),
      |    '2026-08-14T00:00:00Z',
      |    'sv ' || CAST(doc_id AS VARCHAR) || ' ' || COALESCE(text, ''),
      |    TRUE
      |  FROM documents WHERE doc_id % 50 = 7)
      |ORDER BY url, doc_id""".stripMargin) { (s, dir) =>
    val t = cdxDedupStoreFor(s, dir)
    def serve(prefix: String) =
      graft.ext.CdxStore.serveLatestCaptures(s, t, prefix)
        .select(
          regexp_extract(col("url"), "/item/([0-9]+)$", 1)
            .cast("long").as("doc_id"),
          col("url"), col("warc_date"),
          graft.ext.Warc.httpBody(col("payload")).as("body"),
          col("was_revisit"))
    serve("com,example,h7)").unionByName(serve("com,example,mirror)"))
      .ordered("url", "doc_id")
  }

  // X89B — zipnum REVISIT-AWARE serving ([[graft.ext.CdxStore
  // .serveLatestCapturesIndexed]]): x89's deduped site store exported
  // to the range layout and served THROUGH cluster.idx — site slice
  // and the mirror site's cross-site referred originals both
  // index-routed (one cluster.idx read + binary search per referred
  // key, then only those blocks scanned). Same closed-form oracle as
  // x89: a block-routing miss (mirror rows vanish), a broken residual
  // predicate, or a wrong epoch each break rows or hash.
  private val zipnumDedupMemo = scala.collection.concurrent.TrieMap.empty[String, String]
  q("x89b_cdx_zipnum_revisit",
    """SELECT doc_id, url, warc_date, body, was_revisit FROM (
      |  SELECT doc_id,
      |    'https://h7.example.com/item/' || CAST(doc_id AS VARCHAR) AS url,
      |    CASE WHEN doc_id % 3 = 0 THEN '2026-08-15T00:00:00Z'
      |         ELSE '2026-08-14T00:00:00Z' END AS warc_date,
      |    'sv ' || CAST(doc_id AS VARCHAR) || ' ' || COALESCE(text, '') AS body,
      |    (doc_id % 3 = 0) AS was_revisit
      |  FROM documents WHERE doc_id % 50 = 7
      |  UNION ALL
      |  SELECT doc_id,
      |    'https://mirror.example.com/item/' || CAST(doc_id AS VARCHAR),
      |    '2026-08-14T00:00:00Z',
      |    'sv ' || CAST(doc_id AS VARCHAR) || ' ' || COALESCE(text, ''),
      |    TRUE
      |  FROM documents WHERE doc_id % 50 = 7)
      |ORDER BY url, doc_id""".stripMargin) { (s, dir) =>
    val rl = zipnumDedupMemo.getOrElseUpdate(dir, {
      val d = java.nio.file.Files.createTempDirectory("graft-zipnum-dd").toString
      graft.ext.CdxStore.exportRangeLayout(s, cdxDedupStoreFor(s, dir), d,
        blocks = 16)
      d
    })
    def serve(prefix: String) =
      graft.ext.CdxStore.serveLatestCapturesIndexed(s, rl, prefix)
        .select(
          regexp_extract(col("url"), "/item/([0-9]+)$", 1)
            .cast("long").as("doc_id"),
          col("url"), col("warc_date"),
          graft.ext.Warc.httpBody(col("payload")).as("body"),
          col("was_revisit"))
    serve("com,example,h7)").unionByName(serve("com,example,mirror)"))
      .ordered("url", "doc_id")
  }

  /** The x92 INCREMENTAL two-batch archive: batch 1 = all docs day 1,
    * batch 2 = even docs recaptured UNCHANGED day 2 — through
    * [[graft.ext.Warc.writeRecordsDedupedIncremental]] + the digest
    * store, so batch 2's revisits refer CROSS-BATCH to batch 1's
    * stored originals. Memoized per scale dir; returns the
    * accumulated-index path. */
  private val incDedupMemo = scala.collection.concurrent.TrieMap.empty[String, String]
  private def incDedupIndexFor(s: SparkSession, dir: String): String =
    incDedupMemo.getOrElseUpdate(dir, {
      val t = "graft_incdigests_" + Integer.toHexString(dir.hashCode)
      graft.store.Bucketing.dropWithLocation(s, t)
      val idx = java.nio.file.Files.createTempDirectory("graft-inc-idx").toString
      def batch(day: String, filt: Column) =
        Tables.documents(s, dir).filter(filt).select(
          concat(lit("https://inc.example/doc/"),
            col("doc_id").cast("string")).as("uri"),
          lit(day).as("ts"),
          concat(lit("HTTP/1.1 200 OK\r\n\r\ninc "),
            col("doc_id").cast("string"), lit(" "),
            coalesce(col("text"), lit(""))).as("payload"))
      val i1 = graft.ext.Warc.writeRecordsDedupedIncremental(
        batch("2026-08-14T00:00:00Z", lit(true)).repartition(4),
        "uri", "ts", "payload",
        java.nio.file.Files.createTempDirectory("graft-inc-b1").toString,
        t, batchId = 1L, buckets = 8)
      val i2 = graft.ext.Warc.writeRecordsDedupedIncremental(
        batch("2026-08-15T00:00:00Z", col("doc_id") % 2 === 0).repartition(4),
        "uri", "ts", "payload",
        java.nio.file.Files.createTempDirectory("graft-inc-b2").toString,
        t, batchId = 2L, buckets = 8)
      i1.toDF().unionByName(i2.toDF())
        .write.mode("overwrite").parquet(idx)
      idx
    })

  // X92 — INCREMENTAL cross-batch dedup archiving ([[graft.ext.Warc
  // .writeRecordsDedupedIncremental]]: the bucketed digest store makes
  // a weekly-recrawl stream store unchanged content as payload-FREE
  // revisits of ORIGINALS FROM EARLIER BATCHES — the archive grows
  // with the change rate across the whole crawl history, not per
  // batch). Two real batches through the store, served over the
  // accumulated index: the oracle states winner date + exact body +
  // revisit-ness per doc; a broken store join (batch-2 responses), a
  // wrong Refers-To (resolution fails, rows drop), or a digest
  // mismatch each break rows or hash.
  q("x92_incremental_dedup",
    """SELECT doc_id,
      |  'https://inc.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
      |  CASE WHEN doc_id % 2 = 0 THEN '2026-08-15T00:00:00Z'
      |       ELSE '2026-08-14T00:00:00Z' END AS warc_date,
      |  'inc ' || CAST(doc_id AS VARCHAR) || ' ' || COALESCE(text, '') AS body,
      |  (doc_id % 2 = 0) AS was_revisit
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.ext.Warc.readLatestCapturesDeduped(
        s.read.parquet(incDedupIndexFor(s, dir)))
      .select(
        regexp_extract(col("url"), "/doc/([0-9]+)$", 1)
          .cast("long").as("doc_id"),
        col("url"), col("warc_date"),
        graft.ext.Warc.httpBody(col("payload")).as("body"),
        col("was_revisit"))
      .ordered("doc_id")
  }

  // X77 — CDX-indexed RANDOM ACCESS into the archive ([[graft.ext.Warc
  // .writeRecordsIndexed]] sidecar → [[graft.ext.Warc.readIndexed]]):
  // a 1-in-17 subset of records fetched by POSITIONED READS of their
  // (path, offset, length) byte ranges — cost ∝ requested records,
  // never archive size (the CommonCrawl CDX pattern). The oracle
  // states the closed form of exactly those captures; a wrong offset
  // or length lands mid-member and the gunzip/parse (and the hash)
  // break.
  q("x77_warc_random_access",
    """SELECT doc_id,
      |  'https://archive.example/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
      |  CAST(strlen('HTTP/1.1 200 OK' || chr(13) || chr(10) || chr(13) || chr(10)
      |    || COALESCE(text, '')) AS BIGINT) AS content_length,
      |  COALESCE(text, '') AS body
      |FROM documents WHERE doc_id % 17 = 0 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val idx = s.read.parquet(warcIndexFor(s, dir))
      .withColumn("doc_id",
        regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1).cast("long"))
      .filter(col("doc_id") % 17 === 0)
    graft.ext.Warc.readIndexed(idx)
      .select(
        regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1)
          .cast("long").as("doc_id"),
        col("target_uri"), col("content_length"),
        graft.ext.Warc.httpBody(col("payload")).as("body"))
      .ordered("doc_id")
  }

  /** The x87 accumulated CDX store: the x77 indexed archive re-keyed
    * with x82's SURT urlkeys and folded into a [[graft.ext.CdxStore]]
    * through the REAL maintenance protocol — two appends (split by a
    * uri hash), a REPLAY of the first (must append nothing — the
    * idempotency exercised on the oracle path), then a compaction.
    * Built once per scale dir. */
  private val cdxStoreMemo = scala.collection.concurrent.TrieMap.empty[String, String]
  private def cdxStoreFor(s: SparkSession, dir: String): String =
    cdxStoreMemo.getOrElseUpdate(dir, {
      val t = "graft_cdxstore_" + Integer.toHexString(dir.hashCode)
      graft.store.Bucketing.dropWithLocation(s, t)
      val arc = java.nio.file.Files.createTempDirectory("graft-cdxgate").toString
      val idxDir = java.nio.file.Files.createTempDirectory("graft-cdxgate-idx").toString
      val id = col("doc_id").cast("string")
      val uri = concat(lit("https://WWW.H"), (col("doc_id") % 50).cast("string"),
        lit(".Example.com/Item/"), id, lit("?Z="), id, lit("&a=1&M=2"))
      val payload = concat(lit("HTTP/1.1 200 OK\r\n\r\n"),
        coalesce(col("text"), lit("")))
      graft.ext.Warc.writeRecordsIndexed(
          Tables.documents(s, dir).select(uri.as("uri"),
            lit("2026-08-15T00:00:00Z").as("ts"), payload.as("payload"))
            .repartition(4),
          "uri", "ts", "payload", arc).toDF()
        .withColumn("urlkey", graft.ext.UrlOps.surtKey(col("target_uri")))
        .write.mode("overwrite").parquet(idxDir)
      val idx = s.read.parquet(idxDir)
      val half = crc32(col("target_uri")) % 2 === 0
      graft.ext.CdxStore.append(idx.filter(half), t, buckets = 8)
      graft.ext.CdxStore.append(idx.filter(!half), t, buckets = 8)
      graft.ext.CdxStore.append(idx.filter(half), t, buckets = 8) // replay: no-op
      graft.ext.CdxStore.compact(s, t, buckets = 8)
      t
    })

  // X87 — CDX STORE site-range serving ([[graft.ext.CdxStore
  // .capturesForSite]] → [[graft.ext.Warc.readIndexed]]): the
  // accumulated urlkey-bucketed+sorted capture store (built through
  // append×2 + replay + compact — the real maintenance protocol)
  // queried for ONE site as a SURT range predicate pushed to the
  // parquet scan, winners' bodies fetched by positioned reads. Joins
  // x82's urlkey form with x77's random-access fetch: the oracle
  // states the closed form of site h7's captures; a broken append
  // dedup (row count), range bound (rows from a neighbor site — note
  // h7 vs h70: ')' < '0' makes the range END load-bearing), or a
  // wrong offset (parse fails) each break the hash.
  q("x87_cdx_site_serving",
    """SELECT doc_id,
      |  'com,example,h7)/item/' || CAST(doc_id AS VARCHAR)
      |    || '?a=1&m=2&z=' || CAST(doc_id AS VARCHAR) AS urlkey,
      |  COALESCE(text, '') AS body
      |FROM documents WHERE doc_id % 50 = 7 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val site = graft.ext.CdxStore.capturesForSite(s,
      cdxStoreFor(s, dir), "com,example,h7)")
    graft.ext.Warc.readIndexed(site)
      .select(
        regexp_extract(col("target_uri"), "/Item/([0-9]+)", 1)
          .cast("long").as("doc_id"),
        graft.ext.UrlOps.surtKey(col("target_uri")).as("urlkey"),
        graft.ext.Warc.httpBody(col("payload")).as("body"))
      .ordered("doc_id")
  }

  // X87C — zipnum-style SECONDARY-INDEX serving ([[graft.ext.CdxStore
  // .exportRangeLayout]] → [[capturesForSiteIndexed]]): the x87 store
  // re-laid out range-sorted with a cluster.idx block index, site h7
  // looked up through the INDEX (touching only its own blocks —
  // CdxStoreSpec IO-asserts the file set), bodies fetched by the same
  // positioned reads. Same closed-form oracle as x87: a lookup that
  // reads the wrong blocks, drops a block-straddling row, or breaks
  // the residual range predicate each break rows or hash.
  private val zipnumMemo = scala.collection.concurrent.TrieMap.empty[String, String]
  q("x87c_cdx_zipnum_serving",
    """SELECT doc_id,
      |  'com,example,h7)/item/' || CAST(doc_id AS VARCHAR)
      |    || '?a=1&m=2&z=' || CAST(doc_id AS VARCHAR) AS urlkey,
      |  COALESCE(text, '') AS body
      |FROM documents WHERE doc_id % 50 = 7 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val rl = zipnumMemo.getOrElseUpdate(dir, {
      val d = java.nio.file.Files.createTempDirectory("graft-zipnum-q").toString
      graft.ext.CdxStore.exportRangeLayout(s, cdxStoreFor(s, dir), d, blocks = 16)
      d
    })
    val site = graft.ext.CdxStore.capturesForSiteIndexed(s, rl, "com,example,h7)")
    graft.ext.Warc.readIndexed(site)
      .select(
        regexp_extract(col("target_uri"), "/Item/([0-9]+)", 1)
          .cast("long").as("doc_id"),
        graft.ext.UrlOps.surtKey(col("target_uri")).as("urlkey"),
        graft.ext.Warc.httpBody(col("payload")).as("body"))
      .ordered("doc_id")
  }

  /** The x87b THREE-epoch as-of store: site h7 captured in full on
    * day 1 (v1 bodies); %3 docs recaptured UNCHANGED on day 2
    * (revisits of day 1); %7 docs recaptured CHANGED on day 3 (v3
    * bodies, fresh responses). doc_id within a %50 site is constant
    * parity, so the recapture criteria are %3/%7 (both cover all
    * residues over 7+50k). Built through the real append+compact
    * protocol; memoized per scale dir. */
  private val cdxAsofMemo = scala.collection.concurrent.TrieMap.empty[String, String]
  private def cdxAsofStoreFor(s: SparkSession, dir: String): String =
    cdxAsofMemo.getOrElseUpdate(dir, {
      val t = "graft_cdxasof_" + Integer.toHexString(dir.hashCode)
      graft.store.Bucketing.dropWithLocation(s, t)
      val arc = java.nio.file.Files.createTempDirectory("graft-asof").toString
      val idxDir = java.nio.file.Files.createTempDirectory("graft-asof-idx").toString
      val id = col("doc_id").cast("string")
      def cap(day: String, filt: Column, ver: String) =
        Tables.documents(s, dir)
          .filter(col("doc_id") % 50 === 7 && filt).select(
            concat(lit("https://h7.example.com/item/"), id).as("uri"),
            lit(day).as("ts"),
            concat(lit("HTTP/1.1 200 OK\r\n\r\n"), lit(ver), lit(" "), id,
              lit(" "), coalesce(col("text"), lit(""))).as("payload"))
      graft.ext.Warc.writeRecordsDedupedIndexed(
          cap("2026-08-14T00:00:00Z", lit(true), "v1")
            .unionByName(cap("2026-08-15T00:00:00Z", col("doc_id") % 3 === 0, "v1"))
            .unionByName(cap("2026-08-16T00:00:00Z", col("doc_id") % 7 === 0, "v3"))
            .repartition(4),
          "uri", "ts", "payload", arc).toDF()
        .withColumn("urlkey", graft.ext.UrlOps.surtKey(col("target_uri")))
        .write.mode("overwrite").parquet(idxDir)
      val idx = s.read.parquet(idxDir)
      val half = crc32(col("target_uri")) % 2 === 0
      graft.ext.CdxStore.append(idx.filter(half), t, buckets = 8)
      graft.ext.CdxStore.append(idx.filter(!half), t, buckets = 8)
      graft.ext.CdxStore.compact(s, t, buckets = 8)
      t
    })

  // X87B — AS-OF (wayback) site serving ([[graft.ext.CdxStore
  // .serveLatestCaptures]] with a temporal cut): over the three-epoch
  // store, the mid-archive cut (end of day 2) serves DIFFERENT winners
  // than HEAD — at the cut every %3 doc serves day 2's revisit
  // (resolved through Refers-To to day 1's v1 bytes, the
  // revisit-across-the-cut path) and everything else day 1's original;
  // at HEAD every %7 doc instead serves day 3's CHANGED v3 response.
  // Both cuts in one gate so the oracle itself witnesses they differ.
  // A cut applied to the originals lookup (revisit resolution fails),
  // a >= cut bound, or day-3 rows leaking into the cut each break
  // rows or hash.
  q("x87b_cdx_asof_serving",
    """SELECT cut, doc_id, url, warc_date, body, was_revisit FROM (
      |  SELECT 'asof' AS cut, doc_id,
      |    'https://h7.example.com/item/' || CAST(doc_id AS VARCHAR) AS url,
      |    CASE WHEN doc_id % 3 = 0 THEN '2026-08-15T00:00:00Z'
      |         ELSE '2026-08-14T00:00:00Z' END AS warc_date,
      |    'v1 ' || CAST(doc_id AS VARCHAR) || ' '
      |      || COALESCE(text, '') AS body,
      |    (doc_id % 3 = 0) AS was_revisit
      |  FROM documents WHERE doc_id % 50 = 7
      |  UNION ALL
      |  SELECT 'head', doc_id,
      |    'https://h7.example.com/item/' || CAST(doc_id AS VARCHAR),
      |    CASE WHEN doc_id % 7 = 0 THEN '2026-08-16T00:00:00Z'
      |         WHEN doc_id % 3 = 0 THEN '2026-08-15T00:00:00Z'
      |         ELSE '2026-08-14T00:00:00Z' END,
      |    (CASE WHEN doc_id % 7 = 0 THEN 'v3 ' ELSE 'v1 ' END)
      |      || CAST(doc_id AS VARCHAR) || ' ' || COALESCE(text, ''),
      |    (doc_id % 7 <> 0 AND doc_id % 3 = 0)
      |  FROM documents WHERE doc_id % 50 = 7)
      |ORDER BY cut, doc_id""".stripMargin) { (s, dir) =>
    val t = cdxAsofStoreFor(s, dir)
    def serve(asOf: Option[String], label: String) =
      graft.ext.CdxStore.serveLatestCaptures(s, t, "com,example,h7)",
          asOf, normalize = true, maxRefKeys = 10000)
        .select(lit(label).as("cut"),
          regexp_extract(col("url"), "/item/([0-9]+)$", 1)
            .cast("long").as("doc_id"),
          col("url"), col("warc_date"),
          graft.ext.Warc.httpBody(col("payload")).as("body"),
          col("was_revisit"))
    serve(Some("2026-08-15T12:00:00Z"), "asof").unionByName(serve(None, "head"))
      .ordered("cut", "doc_id")
  }

  // X87D — AS-OF serving THROUGH the zipnum layout ([[graft.ext
  // .CdxStore.serveLatestCapturesIndexed]] with a temporal cut): the
  // r18 features composed — x87b's three-epoch store re-laid out
  // range-sorted behind cluster.idx, BOTH cuts served through the
  // indexed path (site slice via index-selected blocks + residual
  // range predicate; out-of-range originals via binary-searched
  // blocksForKeys). The residual-predicate × cut interaction is
  // exactly where a bound slips: a cut applied before the range
  // residual, a >= bound, or an originals lookup routed through the
  // cut each break rows or hash. Same closed-form oracle as x87b.
  private val zipnumAsofMemo = scala.collection.concurrent.TrieMap.empty[String, String]
  q("x87d_cdx_zipnum_asof",
    """SELECT cut, doc_id, url, warc_date, body, was_revisit FROM (
      |  SELECT 'asof' AS cut, doc_id,
      |    'https://h7.example.com/item/' || CAST(doc_id AS VARCHAR) AS url,
      |    CASE WHEN doc_id % 3 = 0 THEN '2026-08-15T00:00:00Z'
      |         ELSE '2026-08-14T00:00:00Z' END AS warc_date,
      |    'v1 ' || CAST(doc_id AS VARCHAR) || ' '
      |      || COALESCE(text, '') AS body,
      |    (doc_id % 3 = 0) AS was_revisit
      |  FROM documents WHERE doc_id % 50 = 7
      |  UNION ALL
      |  SELECT 'head', doc_id,
      |    'https://h7.example.com/item/' || CAST(doc_id AS VARCHAR),
      |    CASE WHEN doc_id % 7 = 0 THEN '2026-08-16T00:00:00Z'
      |         WHEN doc_id % 3 = 0 THEN '2026-08-15T00:00:00Z'
      |         ELSE '2026-08-14T00:00:00Z' END,
      |    (CASE WHEN doc_id % 7 = 0 THEN 'v3 ' ELSE 'v1 ' END)
      |      || CAST(doc_id AS VARCHAR) || ' ' || COALESCE(text, ''),
      |    (doc_id % 7 <> 0 AND doc_id % 3 = 0)
      |  FROM documents WHERE doc_id % 50 = 7)
      |ORDER BY cut, doc_id""".stripMargin) { (s, dir) =>
    val t = cdxAsofStoreFor(s, dir)
    val rl = zipnumAsofMemo.getOrElseUpdate(dir, {
      val d = java.nio.file.Files.createTempDirectory("graft-zipasof-q").toString
      graft.ext.CdxStore.exportRangeLayout(s, t, d, blocks = 16)
      d
    })
    def serve(asOf: Option[String], label: String) =
      graft.ext.CdxStore.serveLatestCapturesIndexed(s, rl, "com,example,h7)",
          asOf, normalize = true, maxRefKeys = 10000)
        .select(lit(label).as("cut"),
          regexp_extract(col("url"), "/item/([0-9]+)$", 1)
            .cast("long").as("doc_id"),
          col("url"), col("warc_date"),
          graft.ext.Warc.httpBody(col("payload")).as("body"),
          col("was_revisit"))
    serve(Some("2026-08-15T12:00:00Z"), "asof").unionByName(serve(None, "head"))
      .ordered("cut", "doc_id")
  }

  // X75 — anchor-text retrieval ([[graft.ext.Retrieval
  // .bm25fTopKFromIndex]], BM25F-lite): body BM25 off the memoized
  // STORED index + anchor-field BM25 off an index built straight from
  // (target, term) link rows, combined as body + 0.4·anchor in one
  // exact-decimal sum. The derived-input fixture plants anchors on
  // 3/10 of docs — 'zqxdocs' appears ONLY in anchors, so every doc it
  // surfaces is an anchor-only match the body index cannot see; %20
  // docs receive their anchor from TWO source pages (UNION ALL twin),
  // doubling anchor tf AND dl; the 'plain navigation link' class
  // carries no query term but must still shape the anchor field's
  // n_docs/avgdl. Each field scores against its OWN stats (the
  // per-field linear BM25F form); the weight multiplies in the double
  // domain inside the shared round-9 consensus.
  q("x75_anchor_bm25f",
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      |words AS (SELECT doc_id, UNNEST(t) AS term FROM toks),
      |dl AS (SELECT doc_id, COUNT(*)::DOUBLE AS dl FROM words GROUP BY 1),
      |stats AS (SELECT COUNT(*)::DOUBLE AS n_docs, AVG(dl) AS avgdl FROM dl),
      |tf AS (
      |  SELECT doc_id, term, COUNT(*)::DOUBLE AS tf FROM words
      |  WHERE term IN ('data', 'zqxdocs', 'spark') GROUP BY 1, 2),
      |dfreq AS (SELECT term, COUNT(*)::DOUBLE AS df FROM tf GROUP BY 1),
      |bodyc AS (
      |  SELECT tf.doc_id,
      |    CAST(ROUND(
      |      LN((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0) *
      |      (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)),
      |    9) AS DECIMAL(28,10)) AS c
      |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
      |anc AS (
      |  SELECT doc_id, CASE doc_id % 10
      |    WHEN 0 THEN 'zqxdocs official spark guide'
      |    WHEN 3 THEN 'zqxdocs zqxdocs data'
      |    WHEN 7 THEN 'plain navigation link' END AS anchor
      |  FROM documents WHERE doc_id % 10 IN (0, 3, 7)),
      |lnk AS (
      |  SELECT doc_id, anchor FROM anc
      |  UNION ALL SELECT doc_id, anchor FROM anc WHERE doc_id % 20 = 0),
      |awords AS (
      |  SELECT doc_id, UNNEST(regexp_split_to_array(trim(anchor), '\s+')) AS term
      |  FROM lnk),
      |adl AS (SELECT doc_id, COUNT(*)::DOUBLE AS dl FROM awords GROUP BY 1),
      |astats AS (SELECT COUNT(*)::DOUBLE AS n_docs, AVG(dl) AS avgdl FROM adl),
      |atf AS (
      |  SELECT doc_id, term, COUNT(*)::DOUBLE AS tf FROM awords
      |  WHERE term IN ('data', 'zqxdocs', 'spark') GROUP BY 1, 2),
      |adf AS (SELECT term, COUNT(*)::DOUBLE AS df FROM atf GROUP BY 1),
      |ancc AS (
      |  SELECT atf.doc_id,
      |    CAST(ROUND(CAST(0.4 AS DOUBLE) * (
      |      LN((astats.n_docs - adf.df + 0.5) / (adf.df + 0.5) + 1.0) *
      |      (atf.tf * 2.2) / (atf.tf + 1.2 * (0.25 + 0.75 * adl.dl / astats.avgdl))),
      |    9) AS DECIMAL(28,10)) AS c
      |  FROM atf JOIN adf USING (term) JOIN adl USING (doc_id) CROSS JOIN astats),
      |allc AS (SELECT * FROM bodyc UNION ALL SELECT * FROM ancc)
      |SELECT doc_id, ROUND(CAST(SUM(c) AS DOUBLE), 6) AS score
      |FROM allc GROUP BY doc_id
      |ORDER BY SUM(c) DESC, doc_id LIMIT 25""".stripMargin) { (s, dir) =>
    val anc = Tables.documents(s, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 0, "zqxdocs official spark guide")
          .when(col("doc_id") % 10 === 3, "zqxdocs zqxdocs data")
          .when(col("doc_id") % 10 === 7, "plain navigation link")
          .as("anchor"))
      .filter(col("anchor").isNotNull)
    val lnk = anc.union(anc.filter(col("doc_id") % 20 === 0))
    val terms = lnk.select(col("doc_id"),
      explode(split(trim(col("anchor")), "\\s+")).as("term"))
    val anchorIdx = graft.ext.Retrieval.buildIndexFromTerms(terms, "doc_id")
    graft.ext.Retrieval.bm25fTopKFromIndex(lexIndex(s, dir), anchorIdx,
      "doc_id", queryTerms = Seq("data", "zqxdocs", "spark"), k = 25,
      anchorWeight = 0.4)
  }

  // X76 — PAGE-LEVEL frontier ordering ([[graft.ext.Frontier.fromPages]]
  // `pageLevelOrdering=true` → [[graft.ext.Sampling.prioritizedTake]]):
  // the cap's within-host slots go to the candidates with the highest
  // page-level PageRank (candidates are dangling receivers of link
  // mass), host selection and quotas untouched. The oracle runs TWO
  // independent 5-round rank unrolls in one WITH clause — host-level
  // (rank column) and page-level (prank + the take order) — plus the
  // literal take form: row_number over (prank DESC, seeded md5, url)
  // per host. Fixture: 40 page hosts × 2 links each into 5 candidate
  // hosts × 3 candidate URLs — in-degree differences give distinct
  // pranks, cap 2 of 3 forces a rank decision on every candidate host.
  q("x76_frontier_page_ranked",
    s"""WITH pages AS (SELECT doc_id FROM documents WHERE doc_id % 50 < 40),
      |e0 AS MATERIALIZED (
      |  SELECT DISTINCT 'h' || CAST(doc_id % 50 AS VARCHAR) || '.example' AS src,
      |         'cand' || CAST(doc_id % 5 AS VARCHAR) || '.example' AS dst
      |  FROM pages),
      |${pageRankRoundsCte(5)}p_e0 AS MATERIALIZED (
      |  SELECT DISTINCT
      |    'https://h' || CAST(doc_id % 50 AS VARCHAR) || '.example/page'
      |      || CAST(doc_id AS VARCHAR) AS src,
      |    'https://cand' || CAST(doc_id % 5 AS VARCHAR) || '.example/c'
      |      || CAST((doc_id + q) % 3 AS VARCHAR) AS dst
      |  FROM pages, UNNEST([0, 1]) AS t(q)),
      |${pageRankRoundsCte(5, "p_")}cand AS (
      |  SELECT DISTINCT
      |    'cand' || CAST(doc_id % 5 AS VARCHAR) || '.example' AS host,
      |    'https://cand' || CAST(doc_id % 5 AS VARCHAR) || '.example/c'
      |      || CAST((doc_id + q) % 3 AS VARCHAR) AS url
      |  FROM pages, UNNEST([0, 1]) AS t(q)),
      |ranked AS (
      |  SELECT c.host, c.url,
      |    COALESCE(hf.rank, 0.0) AS rank, COALESCE(pf.rank, 0.0) AS prank
      |  FROM cand c
      |  LEFT JOIN fin hf ON hf.id = c.host
      |  LEFT JOIN p_fin pf ON pf.id = c.url),
      |capped AS (
      |  SELECT host, url, rank, prank,
      |    row_number() OVER (PARTITION BY host
      |      ORDER BY prank DESC, md5(url || ':' || 'graft-frontier-v1'), url) AS rk
      |  FROM ranked)
      |SELECT host, url, rank, prank FROM capped WHERE rk <= 2
      |ORDER BY host, url""".stripMargin) { (s, dir) =>
    val id = col("doc_id").cast("string")
    val k5 = (col("doc_id") % 5).cast("string")
    val c1 = (col("doc_id") % 3).cast("string")
    val c2 = ((col("doc_id") + 1) % 3).cast("string")
    val html = concat(
      lit("<html><body><a href=\"https://cand"), k5, lit(".example/c"), c1,
      lit("\">x</a><a href=\"https://cand"), k5, lit(".example/c"), c2,
      lit("\">y</a></body></html>"))
    val pageUrl = concat(lit("https://h"), (col("doc_id") % 50).cast("string"),
      lit(".example/page"), id)
    val pages = Tables.documents(s, dir)
      .filter(col("doc_id") % 50 < 40)
      .select(pageUrl.as("url"), html.as("html"))
    graft.ext.Frontier.fromPages(pages, "url", "html", perHostCap = 2,
        seed = "graft-frontier-v1", prIterations = 5,
        pageLevelOrdering = true)
      .ordered("host", "url")
  }

  // X50 — URL hygiene (the curation step C4/RefinedWeb run on every
  // crawl URI before URL dedup and domain governance): normalization
  // (case, default ports, fragment, sorted query with tracking params
  // stripped) + registered-domain extraction + blocklist gate. The
  // derived-input pattern once more: four URL shapes generated from
  // real columns — uppercase scheme/host with :443 and utm/fbclid junk
  // and a fragment, :80 with an empty path, a kept non-default port
  // with percent-encodings, and a malformed row — Spark runs the real
  // normalizer, DuckDB states the closed-form expected output.
  q("x50_url_normalize",
    """WITH gen AS (
      |  SELECT doc_id, doc_id % 7 AS d7, doc_id % 4 AS shape FROM documents)
      |SELECT doc_id,
      |  CASE shape
      |    WHEN 0 THEN 'https://www.example' || CAST(d7 AS VARCHAR)
      |      || '.co.uk/Path/' || CAST(doc_id AS VARCHAR) || '?a=1&b=2'
      |    WHEN 1 THEN 'http://sub.host' || CAST(d7 AS VARCHAR) || '.org/'
      |    WHEN 2 THEN 'https://cdn.example' || CAST(d7 AS VARCHAR)
      |      || '.com:8080/a%20b?y=8&z=9'
      |    ELSE NULL END AS norm_url,
      |  CASE shape
      |    WHEN 0 THEN 'example' || CAST(d7 AS VARCHAR) || '.co.uk'
      |    WHEN 1 THEN 'host' || CAST(d7 AS VARCHAR) || '.org'
      |    WHEN 2 THEN 'example' || CAST(d7 AS VARCHAR) || '.com'
      |    ELSE NULL END AS domain,
      |  ((shape = 0 AND d7 = 0) OR (shape = 2 AND d7 = 3)) AS blocked
      |FROM gen ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val id = col("doc_id").cast("string")
    val d7 = (col("doc_id") % 7).cast("string")
    val url = when(col("doc_id") % 4 === 0, concat(
        lit("HTTPS://WWW.Example"), d7, lit(".CO.UK:443/Path/"), id,
        lit("?utm_source=feed&b=2&a=1&fbclid=xyz#top")))
      .when(col("doc_id") % 4 === 1, concat(
        lit("http://Sub.Host"), d7, lit(".ORG:80")))
      .when(col("doc_id") % 4 === 2, concat(
        lit("https://cdn.example"), d7, lit(".com:8080/a%20b?z=9&y=8")))
      .otherwise(concat(lit("not a url "), id))
    val blocklist = Seq("example0.co.uk", "example3.com")
    Tables.documents(s, dir)
      .select(col("doc_id"), url.as("u"))
      .select(col("doc_id"),
        graft.ext.UrlOps.normalizeUrl(col("u")).as("norm_url"),
        graft.ext.UrlOps.urlDomain(col("u")).as("domain"),
        coalesce(graft.ext.UrlOps.domainBlocked(col("u"), blocklist), lit(false))
          .as("blocked"))
      .ordered("doc_id")
  }

  // X51 — jusText contextual boilerplate removal (the two-pass rule
  // x47's single-pass gate can't express). The generated page plants
  // one block per context rule: a short heading BETWEEN two good
  // paragraphs (kept: both neighbors good), a near-good line after a
  // good paragraph (kept: one good neighbor suffices), a short and a
  // near-good block stranded between a link-dense widget and footer
  // chrome (both dropped: no good neighbor). The oracle states the
  // closed-form survivor list; a wrong neighbor scan, a mis-sided
  // edge default, or an off-by-one in the decided-class arrays all
  // break the hash.
  q("x51_justext_context",
    """WITH gen AS (
      |  SELECT doc_id, doc_id % 7 AS d7,
      |    'This opening paragraph about document ' || CAST(doc_id AS VARCHAR)
      |      || ' is comfortably long enough to classify as good by itself.' AS p1,
      |    'A second long paragraph for document ' || CAST(doc_id AS VARCHAR)
      |      || ' that the classifier also marks good without any context.' AS p2,
      |    'Fact ' || CAST(doc_id % 7 AS VARCHAR) AS hd,
      |    'Moderate line about doc ' || CAST(doc_id AS VARCHAR) AS nr
      |  FROM documents)
      |SELECT doc_id,
      |  p1 || chr(10) || hd || chr(10) || p2 || chr(10) || nr AS main_text,
      |  CAST(length(p1) + length(hd) + length(p2) + length(nr) + 3 AS BIGINT)
      |    AS kept_chars
      |FROM gen ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val id = col("doc_id").cast("string")
    val d7 = (col("doc_id") % 7).cast("string")
    val html = concat(
      lit("<body><nav><a>Home</a> <a>About</a> <a>Contact</a></nav><p>"),
      lit("This opening paragraph about document "), id,
      lit(" is comfortably long enough to classify as good by itself.</p>"),
      lit("<div>Fact "), d7, lit("</div><p>"),
      lit("A second long paragraph for document "), id,
      lit(" that the classifier also marks good without any context.</p>"),
      lit("<div>Moderate line about doc "), id, lit("</div>"),
      lit("""<div class="w"><a>Tweet</a> <a>Share this page</a></div>"""),
      lit("<div>Tail "), d7, lit("</div>"),
      lit("<div>Related items listed here</div>"),
      lit("<footer>chrome text <a>Terms</a></footer></body>"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.ext.Extract.contextualMainText(html).as("main_text"))
      .withColumn("kept_chars", length(col("main_text")).cast("long"))
      .ordered("doc_id")
  }

  // X52 — sentence-boundary chunking (the embedding/RAG layout where
  // windows must not cut sentences). Sentences derive from the token
  // stream with VARIABLE lengths (5 + (doc_id+i) % 7 tokens — uniform
  // lengths would make the greedy grouping a constant and prove
  // nothing); Spark runs the real aggregate-fold greedy scan, DuckDB
  // replays the same greedy semantics as a recursive CTE over the
  // sentence sequence. An off-by-one in the overflow test, a mis-reset
  // accumulator, or a dropped truncated tail sentence all break the
  // hash.
  q("x52_sentence_chunks",
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
      |idx AS (
      |  SELECT doc_id, t, len(t) AS n,
      |    CAST(CEIL(len(t) / 5.0) AS INT) AS mi FROM toks),
      |lens AS (
      |  SELECT doc_id, t, n, i, 5 + (doc_id + i) % 7 AS l
      |  FROM idx, UNNEST(generate_series(0, mi)) AS g(i)),
      |st AS (
      |  SELECT doc_id, t, n, i, l,
      |    COALESCE(SUM(l) OVER (PARTITION BY doc_id ORDER BY i
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s0
      |  FROM lens),
      |sent AS (
      |  SELECT doc_id, i, array_to_string(t[s0+1 : s0+l], ' ') AS sentence,
      |    CAST(LEAST(l, n - s0) AS INT) AS ntok
      |  FROM st WHERE s0 < n),
      |steps AS (
      |  SELECT doc_id, i, sentence, ntok, ntok AS acc, 0 AS chunk_id
      |  FROM sent WHERE i = 0
      |  UNION ALL
      |  SELECT s.doc_id, s.i, s.sentence, s.ntok,
      |    CASE WHEN p.acc + s.ntok > 30 THEN s.ntok ELSE p.acc + s.ntok END,
      |    CASE WHEN p.acc + s.ntok > 30 THEN p.chunk_id + 1 ELSE p.chunk_id END
      |  FROM steps p JOIN sent s ON s.doc_id = p.doc_id AND s.i = p.i + 1)
      |SELECT doc_id, chunk_id,
      |  string_agg(sentence, ' ' ORDER BY i) AS chunk_text,
      |  CAST(SUM(ntok) AS INT) AS chunk_tokens,
      |  CAST(COUNT(*) AS INT) AS n_sentences
      |FROM steps GROUP BY 1, 2 ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
    val toks = split(trim(col("text")), "\\s+")
    val n = size(toks)
    val maxI = ceil(n / lit(5.0)).cast("int")
    val lens = transform(sequence(lit(0), maxI),
      i => (lit(5) + pmod(col("doc_id") + i, lit(7))).cast("int"))
    // exclusive-prefix-sum starts via one aggregate scan (the jusText
    // context-pass pattern), then slice each sentence out of the tokens
    val z = struct(array().cast("array<int>").as("arr"), lit(0).as("acc"))
    val starts = aggregate(lens, z, (st, l) => struct(
      concat(st.getField("arr"), array(st.getField("acc"))).as("arr"),
      (st.getField("acc") + l).as("acc"))).getField("arr")
    val sents = filter(
      zip_with(starts, lens, (s0, l) =>
        when(s0 < n, array_join(slice(toks, s0 + 1, l), " "))),
      s => s.isNotNull)
    graft.ext.Packing.chunkBySentences(
        Tables.documents(s, dir).select(col("doc_id"), sents.as("__sents")),
        "doc_id", col("__sents"), maxTokens = 30)
      .ordered("doc_id", "chunk_id")
  }

  // X53 — robots.txt compliance refiltering (RFC 9309 + Google
  // wildcards): six URL shapes against a fixed policy, decided for two
  // user-agents (the '*' group and a specific-group agent — group
  // selection is load-bearing: graftbot's group REPLACES the global
  // rules rather than inheriting them). Spark runs the real parse +
  // longest-match kernels; the oracle states the closed-form verdicts.
  // A wrong tie rule, a prefix/anchored-wildcard bug, or group
  // inheritance all break the hash.
  q("x53_robots_refilter",
    """SELECT doc_id,
      |  'site' || CAST(doc_id % 5 AS VARCHAR) || '.example' AS domain,
      |  CASE doc_id % 6
      |    WHEN 0 THEN '/articles/' || CAST(doc_id AS VARCHAR)
      |    WHEN 1 THEN '/private/' || CAST(doc_id AS VARCHAR)
      |    WHEN 2 THEN '/private/ok/' || CAST(doc_id AS VARCHAR)
      |    WHEN 3 THEN '/data/' || CAST(doc_id AS VARCHAR) || '.json'
      |    WHEN 4 THEN '/data/' || CAST(doc_id AS VARCHAR) || '.jsonl'
      |    ELSE '/graft/' || CAST(doc_id AS VARCHAR) END AS path,
      |  doc_id % 6 NOT IN (1, 3) AS allowed_any,
      |  doc_id % 6 <> 5 AS allowed_graftbot
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val robots = lit(
      "User-agent: *\nDisallow: /private/\nAllow: /private/ok/\n" +
        "Disallow: /*.json$\n\nUser-agent: graftbot\nDisallow: /graft/\n")
    val id = col("doc_id").cast("string")
    val path = when(col("doc_id") % 6 === 0, concat(lit("/articles/"), id))
      .when(col("doc_id") % 6 === 1, concat(lit("/private/"), id))
      .when(col("doc_id") % 6 === 2, concat(lit("/private/ok/"), id))
      .when(col("doc_id") % 6 === 3, concat(lit("/data/"), id, lit(".json")))
      .when(col("doc_id") % 6 === 4, concat(lit("/data/"), id, lit(".jsonl")))
      .otherwise(concat(lit("/graft/"), id))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        concat(lit("site"), (col("doc_id") % 5).cast("string"), lit(".example"))
          .as("domain"),
        path.as("path"),
        graft.ext.Robots.allowed(path,
          graft.ext.Robots.rulesFor(robots, lit("anybot"))).as("allowed_any"),
        graft.ext.Robots.allowed(path,
          graft.ext.Robots.rulesFor(robots, lit("graftbot"))).as("allowed_graftbot"))
      .ordered("doc_id")
  }

  // X53B — Crawl-delay extraction ([[graft.ext.Robots.crawlDelay]]):
  // per-host robots with a derived delay, a no-delay shape (null
  // path), a junk-value shape (ignored → null), and an agent-specific
  // group whose delay OVERRIDES '*' for graftbot while anybot keeps
  // the global one — group selection is load-bearing exactly as in
  // x53. The oracle states the closed-form seconds per shape.
  q("x53b_crawl_delay",
    """SELECT doc_id,
      |  'site' || CAST(doc_id % 5 AS VARCHAR) || '.example' AS domain,
      |  CASE WHEN doc_id % 4 IN (1, 2) THEN NULL
      |       ELSE CAST(doc_id % 5 AS DOUBLE) END AS delay_any,
      |  CASE WHEN doc_id % 4 = 1 THEN NULL
      |       WHEN doc_id % 4 = 2 THEN CAST(9 AS DOUBLE)
      |       WHEN doc_id % 4 = 3 THEN CAST(1 AS DOUBLE)
      |       ELSE CAST(doc_id % 5 AS DOUBLE) END AS delay_graftbot
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val k = (col("doc_id") % 5).cast("string")
    // m4=0: '*' carries "k.5" then "k" — the LATER line overrides, so
    // k is the verdict (the override path is oracle-pinned); m4=1: no
    // delay anywhere (null path); m4=2: junk '*' value (ignored →
    // anybot null) + a graftbot group delay 9; m4=3: '*' delay k with
    // a graftbot group override of 1 (group selection load-bearing,
    // the x53 discipline)
    val txt = when(col("doc_id") % 4 === 0,
        concat(lit("User-agent: *\nCrawl-delay: "), k,
          lit(".5\nCrawl-delay: "), k, lit("\nDisallow: /x\n")))
      .when(col("doc_id") % 4 === 1,
        lit("User-agent: *\nDisallow: /x\n"))
      .when(col("doc_id") % 4 === 2,
        lit("User-agent: *\nCrawl-delay: fast\n" +
          "User-agent: graftbot\nCrawl-delay: 9\n"))
      .otherwise(
        concat(lit("User-agent: *\nCrawl-delay: "), k,
          lit("\nUser-agent: graftbot\nCrawl-delay: 1\n")))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        concat(lit("site"), k, lit(".example")).as("domain"),
        graft.ext.Robots.crawlDelay(txt, lit("anybot")).as("delay_any"),
        graft.ext.Robots.crawlDelay(txt, lit("graftbot")).as("delay_graftbot"))
      .ordered("doc_id")
  }

  // X54 — the complete crawl front door, ONE plan: WARC record parse →
  // HTTP status gate → HTML-Content-Type gate → meta-noindex gate →
  // URL normalization + registered domain + canonical → robots.txt
  // refilter → jusText extraction. Each doc_id%6 shape plants exactly
  // one gate's failure (404 / noindex / robots-disallowed path /
  // non-HTML 200 / chrome-only page), so the oracle's survivor set
  // (d6=0 with ≥10 extracted chars) proves every gate fired — and the
  // surviving rows' normalized URL, domain, canonical and main text
  // prove the full derivation chain end-to-end. This is the x49 + x50
  // + x51/x47 + x53 machinery COMPOSED, the way a production ingest
  // would actually run it.
  q("x54_crawl_pipeline",
    """WITH gen AS (
      |  SELECT doc_id, doc_id % 5 AS d5, doc_id % 6 AS d6,
      |    trim(regexp_replace(text, '\s+', ' ', 'g')) AS p1
      |  FROM documents)
      |SELECT doc_id,
      |  'https://www.site' || CAST(d5 AS VARCHAR) || '.example/p/'
      |    || CAST(doc_id AS VARCHAR) || '?b=1' AS norm_url,
      |  'site' || CAST(d5 AS VARCHAR) || '.example' AS domain,
      |  'https://site' || CAST(d5 AS VARCHAR) || '.example/canon/'
      |    || CAST(doc_id AS VARCHAR) AS canonical,
      |  p1 AS main_text
      |FROM gen
      |WHERE d6 = 0 AND length(p1) >= 10
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import graft.ext.{Extract, Robots, UrlOps, Warc}
    val id = col("doc_id").cast("string")
    val d5 = (col("doc_id") % 5).cast("string")
    val d6 = col("doc_id") % 6
    val esc = regexp_replace(regexp_replace(regexp_replace(
      col("text"), "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
    val path = when(d6 === 3, concat(lit("/private/"), id))
      .otherwise(concat(lit("/p/"), id))
    val uri = concat(lit("HTTPS://WWW.Site"), d5, lit(".example"), path,
      lit("?utm_source=x&b=1"))
    val page = concat(
      lit("<html><head><title>T</title>"),
      when(d6 === 2, lit("""<meta name="robots" content="noindex">""")).otherwise(""),
      lit("""<link rel="canonical" href="https://site"""), d5,
      lit(".example/canon/"), id, lit("\">"),
      lit("""</head><body><nav><a href="/">Home</a></nav><p>"""), esc,
      lit("</p><footer>c</footer></body></html>"))
    val body = when(d6 === 5,
        lit("""<html><body><nav><a href="/">Home</a> <a href="/a">About</a></nav></body></html>"""))
      .when(d6 === 4, concat(lit("""{"json":""""), id, lit("\"}")))
      .otherwise(page)
    val status = when(d6 === 1, "404 Not Found").otherwise("200 OK")
    val ctype = when(d6 === 4, "application/json").otherwise("text/html")
    val payload = concat(lit("HTTP/1.1 "), status, lit("\r\nContent-Type: "),
      ctype, lit("\r\n\r\n"), body)
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), uri,
      lit("\r\nContent-Type: application/http; msgtype=response\r\nContent-Length: "),
      octet_length(payload).cast("string"), lit("\r\n\r\n"), payload, lit("\r\n\r\n"))
    val robots = lit("User-agent: *\nDisallow: /private/\n")
    val parts = UrlOps.urlParts(col("uri")).toMap
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(Warc.records(rec.cast("binary"))).as("r"))
      .filter(Warc.httpStatus(col("r.payload")) === 200 &&
        Warc.isHtmlResponse(col("r.payload")))
      .select(col("doc_id"),
        element_at(col("r.headers"), "WARC-Target-URI").as("uri"),
        Warc.httpBody(col("r.payload")).as("html"))
      .filter(!Extract.isNoindex(col("html")))
      .filter(Robots.allowed(parts("path"),
        Robots.rulesFor(robots, lit("curationbot"))))
      .select(col("doc_id"),
        UrlOps.normalizeUrl(col("uri")).as("norm_url"),
        UrlOps.urlDomain(col("uri")).as("domain"),
        Extract.canonicalUrl(col("html")).as("canonical"),
        Extract.mainText(col("html")).as("main_text"))
      .filter(col("main_text") =!= "")
      .ordered("doc_id")
  }

  // X55 — corpus-driven stopword induction (Luhn's upper frequency
  // cut, jusText's per-language stopword lists learned from the
  // corpus itself): terms in ≥ half the documents, top-40 by total
  // count. Directly SQL-expressible, so the oracle recomputes it from
  // first principles — document frequency must be DISTINCT-per-doc
  // (a term repeated in one doc counts once), the standard bug this
  // hash would catch. Feeds Extract.mainTextStopworded.
  q("x55_stopword_induction",
    """WITH terms AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      |  FROM documents),
      |t AS (SELECT doc_id, term FROM terms WHERE term <> ''),
      |agg AS (
      |  SELECT term, COUNT(*) AS cnt, COUNT(DISTINCT doc_id) AS df
      |  FROM t GROUP BY 1)
      |SELECT term, cnt, df FROM agg
      |WHERE df >= CEIL((SELECT COUNT(*) FROM documents) * 0.5)
      |ORDER BY cnt DESC, term LIMIT 40""".stripMargin) { (s, dir) =>
    graft.ext.Extract.induceStopwords(
      Tables.documents(s, dir), "doc_id", "text", k = 40, minDocRatio = 0.5)
  }

  // X56 — trained-langid INFERENCE oracle (the x29b precedent: oracle
  // the deterministic scoring stage of an engine-specific pipeline).
  // x57's fitted softmax has no SQL twin (GD + xxhash64 features), but
  // the inference math does: char 1–3-grams of the normalized 160-char
  // prefix hash into the portable md5-prefix bucket space, the pinned
  // per-(bucket, class) weight table has rank-1 closed form (base(b) +
  // k·delta(b) — two decimal sums per doc instead of 20, both engines),
  // and both run the EXACT predict discipline — L1-normalized counts,
  // 9-decimal rounded terms, exact DECIMAL sums, per-class margins
  // A + k·B + intercept_k, argmax with ties to the larger code.
  q("x56_langid_portable",
    s"""WITH norm AS (
       |  SELECT doc_id,
       |    regexp_replace(lower(trim(substr(text, 1, 160))), '\\s+', ' ', 'g') AS s
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, UNNEST(list_concat(list_concat(
       |    list_transform(range(1, len(s) + 1), i -> substr(s, i, 1)),
       |    list_transform(range(1, len(s)), i -> substr(s, i, 2))),
       |    list_transform(range(1, len(s) - 1), i -> substr(s, i, 3)))) AS g
       |  FROM norm),
       |n AS (SELECT doc_id, COUNT(*)::DOUBLE AS nn FROM grams GROUP BY 1),
       |b AS (SELECT doc_id, substr(md5(g), 1, 4) AS bucket, COUNT(*)::DOUBLE AS c
       |      FROM grams GROUP BY 1, 2),
       |t AS (
       |  SELECT b.doc_id,
       |    CAST(SUM(CAST(ROUND(((ascii(substr(bucket, 1, 1)) * 31
       |                          + ascii(substr(bucket, 2, 1)) * 7
       |                          + ascii(substr(bucket, 3, 1)) * 3) % 23 - 11) / 16.0
       |                        * c / nn, 9) AS DECIMAL(28,10))) AS DOUBLE) AS a,
       |    CAST(SUM(CAST(ROUND(((ascii(substr(bucket, 1, 1)) * 13
       |                          + ascii(substr(bucket, 2, 1)) * 5
       |                          + ascii(substr(bucket, 3, 1)) * 11) % 19 - 9) / 12.0
       |                        * c / nn, 9) AS DECIMAL(28,10))) AS DOUBLE) AS d
       |  FROM b JOIN n USING (doc_id) GROUP BY 1),
       |langs(k, lang) AS (VALUES $portableLangValues),
       |m AS (
       |  SELECT doc_id, lang, a + k * d + (k % 5 - 2) / 10.0 AS m
       |  FROM t CROSS JOIN langs),
       |r AS (
       |  SELECT doc_id, lang, m,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY m DESC, lang DESC) AS rk
       |  FROM m)
       |SELECT doc_id, lang, ROUND(m, 6) AS margin
       |FROM r WHERE rk = 1 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val langs = graft.ext.LangId.Seed.Vocab.map(_._1).sorted
    // fused rank-1 portable kernel — bit-exact twin of
    // LangId.predictPortable with these hex coefficients (spec-pinned;
    // the DataFrame form paid an explode plus two agg exchanges)
    graft.ext.LangId.predictPortableFused(
        Tables.documents(s, dir)
          .select(col("doc_id"), substring(col("text"), 1, 160).as("t")),
        "doc_id", "t", langs, minN = 1, maxN = 3,
        base = graft.functions.LangIdExpressions.HexCoef(31, 7, 3, 23, 11, 16.0),
        delta = graft.functions.LangIdExpressions.HexCoef(13, 5, 11, 19, 9, 12.0),
        interceptOf = k => (k % 5 - 2) / 10.0)
      .ordered("doc_id")
  }

  // X57 — TRAINED char-n-gram language ID over the corpus (rows-only:
  // the GD softmax fit has no SQL twin; LangIdSpec proves ≥0.9 holdout
  // accuracy across 20 languages, partition-order-invariant training,
  // and join-path ≡ fold-path scoring; x56 oracle-pins the inference
  // math). The model trains ONCE on the deterministic seed corpus (the
  // classifierMemo amortized-setup rationale — in production the fitted
  // weights are a persisted artifact) and scores every document via
  // [[LangId.langIdCol]] — the join-free, shuffle-free fold that is the
  // 100 TB path — on the standard 160-char prefix, with the x8 marker
  // heuristic as the no-signal fallback.
  q("x57_langid_trained") { (s, dir) =>
    val m = langIdMemo.getOrElseUpdate("seed",
      graft.ext.LangId.train(
        graft.ext.LangId.Seed.corpus(s), "sid", "text", "lang"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.ext.LangId.langIdCol(
          substring(col("text"), 1, 160), m,
          fallback = graft.ext.TextOps.langId(col("text"))).as("lang"))
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .ordered("lang")
  }

  /** x57b's STORED portable-bucket model: trained once per JVM on the
    * deterministic seed corpus (sf-independent — the same weights in
    * every session), written to parquet and READ BACK so the gate
    * scores off the persisted artifact, not the in-memory fit. dim is
    * small on purpose: the gate pins the store→read→score→argmax
    * machinery bit-exactly (LangIdSpec pins model QUALITY at full
    * dim); a small bucket space keeps the weight table embeddable in
    * the oracle SQL. */
  private val langIdStoredDim = 32
  private val langIdStoredMemo =
    scala.collection.concurrent.TrieMap.empty[String, graft.ext.LangId.Model]
  private def langIdStored(s: SparkSession): graft.ext.LangId.Model =
    langIdStoredMemo.getOrElseUpdate("stored", {
      val m = graft.ext.LangId.train(
        graft.ext.LangId.Seed.corpus(s), "sid", "text", "lang",
        dim = langIdStoredDim, iters = 12,
        bucketOf = graft.ext.LangId.portableBucket(langIdStoredDim))
      val path = java.nio.file.Files
        .createTempDirectory("graft-langid-stored").toString
      graft.ext.LangId.writeModel(s, m, path)
      graft.ext.LangId.readModel(s, path)
    })

  /** Shortest-repr-exact double literal for oracle SQL: %.17E keeps 18
    * significant digits — DuckDB's parse lands on the identical IEEE
    * double, and the E form forces DOUBLE (never DECIMAL) typing. */
  private def sqlDouble(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.17E", Double.box(v))

  /** x57b oracle SQL: the STORED model's weights and intercepts ride
    * the query as VALUES tables — DuckDB re-derives the whole scoring
    * pass (portable md5 buckets, L1 counts, 9-decimal rounded terms,
    * DECIMAL sums, intercepts, argmax ties-to-larger) from the same
    * artifact the engine reads. Built lazily (the [[qLazy]] contract):
    * training needs a live session. */
  private def x57bOracleSql(s: SparkSession): String = {
    val m = langIdStored(s)
    val wRows = m.weights.toSeq.sortBy(_._1).flatMap { case (i, vs) =>
      m.langs.zip(vs).map { case (l, w) => s"($i, '$l', ${sqlDouble(w)})" }
    }.mkString(",\n      ")
    val iRows = m.langs.zip(m.intercepts)
      .map { case (l, b) => s"('$l', ${sqlDouble(b)})" }.mkString(", ")
    s"""WITH norm AS (
       |  SELECT doc_id,
       |    regexp_replace(lower(trim(substr(text, 1, 160))), '\\s+', ' ', 'g') AS s
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, UNNEST(list_concat(list_concat(
       |    list_transform(range(1, len(s) + 1), i -> substr(s, i, 1)),
       |    list_transform(range(1, len(s)), i -> substr(s, i, 2))),
       |    list_transform(range(1, len(s) - 1), i -> substr(s, i, 3)))) AS g
       |  FROM norm),
       |n AS (SELECT doc_id, COUNT(*)::DOUBLE AS nn FROM grams GROUP BY 1),
       |b AS (SELECT doc_id,
       |        (ascii(substr(md5(g), 1, 1)) * 53 + ascii(substr(md5(g), 2, 1)) * 17
       |         + ascii(substr(md5(g), 3, 1)) * 7 + ascii(substr(md5(g), 4, 1)))
       |          % $langIdStoredDim AS idx,
       |        COUNT(*)::DOUBLE AS c
       |      FROM grams GROUP BY 1, 2),
       |w(idx, lang, w) AS (VALUES
       |      $wRows),
       |ic(lang, b) AS (VALUES $iRows),
       |t AS (
       |  SELECT b.doc_id, w.lang,
       |    CAST(ROUND(w.w * (b.c / n.nn), 9) AS DECIMAL(28,10)) AS term
       |  FROM b JOIN n USING (doc_id) JOIN w ON w.idx = b.idx),
       |m AS (
       |  SELECT t.doc_id, t.lang, CAST(SUM(t.term) AS DOUBLE) + ic.b AS m
       |  FROM t JOIN ic ON ic.lang = t.lang GROUP BY t.doc_id, t.lang, ic.b),
       |r AS (
       |  SELECT doc_id, lang, m,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY m DESC, lang DESC) AS rk
       |  FROM m)
       |SELECT doc_id, lang, ROUND(m, 6) AS margin
       |FROM r WHERE rk = 1 ORDER BY doc_id""".stripMargin
  }

  // X57B — TRAINED-langid scoring over the STORED model, ORACLE-EXACT
  // (closing the x57 rows-only gap the way x29b closed x29's: the GD
  // FIT stays engine-specific, but the fitted artifact is just a
  // weight table — persisted, read back, and embedded in the oracle
  // SQL, so the entire inference path over real trained weights has a
  // hash-exact anchor; x56 pins the same math over closed-form
  // weights, LangIdSpec pins fit quality + partition invariance).
  qLazy("x57b_langid_stored")(
      x57bOracleSql(SparkSession.active)) { (s, dir) =>
    val m = langIdStored(s)
    // fused portable-scoring kernel — bit-exact twin of
    // LangId.predictStored(portableBucket) (spec-pinned; the DataFrame
    // form planned 4 Exchanges for per-document arithmetic)
    graft.ext.LangId.predictStoredPortable(
        Tables.documents(s, dir)
          .select(col("doc_id"), substring(col("text"), 1, 160).as("t")),
        "doc_id", "t", m)
      .ordered("doc_id")
  }

  // X58 — exact substring-span dedup (Lee et al. 2022 ExactSubstr,
  // suffix array re-shaped to hash aggregations): sliding 10-token
  // windows, duplicated windows keep their corpus-wide first occurrence
  // (min (doc, start)) and are removed everywhere else, a token dies
  // when any removed window covers it. Every stage is engine-portable —
  // window enumeration, first-occurrence choice, covered-position
  // union, reassembly — so the oracle re-derives the WHOLE pass
  // (keeper discipline included, the part a wrong tie-break corrupts).
  q("x58_span_dedup",
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CASE WHEN trim(COALESCE(text, '')) = '' THEN CAST([] AS VARCHAR[])
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS t
       |  FROM documents),
       |base AS (SELECT doc_id, t, len(t) AS n FROM toks),
       |starts AS (
       |  SELECT doc_id, t, UNNEST(range(0, n - 10 + 1)) AS s
       |  FROM base WHERE n >= 10),
       |wins AS (
       |  SELECT doc_id, s,
       |    array_to_string(list_slice(t, s + 1, s + 10), ' ') AS w
       |  FROM starts),
       |ranked AS (
       |  SELECT doc_id, s,
       |    ROW_NUMBER() OVER (PARTITION BY w ORDER BY doc_id, s) AS rn,
       |    COUNT(*) OVER (PARTITION BY w) AS cnt
       |  FROM wins),
       |mexp AS (
       |  SELECT doc_id, s, UNNEST(range(0, 10)) AS o
       |  FROM ranked WHERE cnt >= 2 AND rn > 1),
       |mpos AS (SELECT DISTINCT doc_id, s + o AS p FROM mexp),
       |agg AS (SELECT doc_id, list(p) AS mp FROM mpos GROUP BY 1),
       |out AS (
       |  SELECT b.doc_id,
       |    CAST(b.n AS BIGINT) AS n_tokens,
       |    CAST(COALESCE(len(mp), 0) AS BIGINT) AS n_removed,
       |    COALESCE(array_to_string(list_transform(
       |      list_filter(range(0, b.n),
       |        i -> NOT list_contains(COALESCE(mp, CAST([] AS BIGINT[])), i)),
       |      i -> b.t[i + 1]), ' '), '') AS clean_text
       |  FROM base b LEFT JOIN agg USING (doc_id))
       |SELECT doc_id, n_tokens, n_removed, clean_text
       |FROM out ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.ext.Dedup.removeDuplicateSpans(
        Tables.documents(s, dir), "doc_id", "text", windowTokens = 10)
      .ordered("doc_id")
  }

  /** The x60/x63 derived host graph: hosts h0–h49, three out-links per
    * doc by modular arithmetic, sources restricted to h0–h39 so
    * h40–h49 carry genuine dangling mass. Deduped via
    * [[graft.ext.Graph.hostEdges]] (self-loops dropped). */
  private def hostGraphEdges(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.documents(s, dir)
      .select(col("doc_id"), (col("doc_id") % 50).as("sk"),
        explode(array(lit(1), lit(2), lit(3))).as("j"))
      .filter(col("sk") < 40)
      .select(concat(lit("h"), col("sk").cast("string")).as("src"),
        concat(lit("h"), ((col("doc_id") * 7 + col("j")) % 50).cast("string")).as("dst"))
    graft.ext.Graph.hostEdges(raw, "src", "dst")
  }

  /** The synthesized crawl page shared by x59/x62: (html, base-URL)
    * column pair over `doc_id`/`text`. One link per resolution class —
    * absolute with an entity-encoded query, root-relative,
    * path-relative, dot-segment, query-only — plus a script-embedded
    * decoy and an href-less anchor that must never surface. */
  private def crawlLinkPage: (Column, Column) = {
    val id = col("doc_id").cast("string")
    val esc = regexp_replace(regexp_replace(regexp_replace(
      col("text"), "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
    val html = concat(
      lit("<html><body><p>"), esc, lit("</p>"),
      lit("<a href=\"https://peer"), (col("doc_id") % 20).cast("string"),
      lit(".example.net/d/"), id, lit("?b=2&amp;a=1\">Peer &amp; friend</a>"),
      lit("<a href=\"/abs/"), (col("doc_id") % 5).cast("string"), lit("\">abs</a>"),
      lit("<a href=\"rel/"), (col("doc_id") % 3).cast("string"), lit(".html\">rel</a>"),
      lit("<a href=\"../up.html\">up</a>"),
      lit("<a href=\"?q="), (col("doc_id") % 7).cast("string"), lit("\">q</a>"),
      lit("<script>var a = '<a href=\"https://evil.example/x\">no</a>';</script>"),
      lit("<a name=\"x\">anchor only</a></body></html>"))
    val base = concat(lit("https://base"), (col("doc_id") % 11).cast("string"),
      lit(".example.org/dir/page"), id, lit(".html"))
    (html, base)
  }

  // X59 — out-link extraction + RFC 3986 resolution (the step between
  // the crawl front door and the URL frontier / host graph): pages
  // synthesized from real columns carry one link per resolution class —
  // absolute (entity-encoded query), root-relative, path-relative,
  // dot-segment, query-only — plus a script-embedded decoy and an
  // href-less anchor that must NOT surface. Spark runs the real kernel
  // chain (HtmlLinksExpr → UrlResolveExpr); DuckDB states the
  // closed-form expected frontier (the x50 derived-input pattern).
  q("x59_out_links",
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id AS VARCHAR) AS ids,
      |    CAST(doc_id % 20 AS VARCHAR) AS p, CAST(doc_id % 5 AS VARCHAR) AS m,
      |    CAST(doc_id % 3 AS VARCHAR) AS r, CAST(doc_id % 7 AS VARCHAR) AS sq,
      |    CAST(doc_id % 11 AS VARCHAR) AS b
      |  FROM documents)
      |SELECT doc_id, ord, url, anchor FROM (
      |  SELECT doc_id, 0 AS ord,
      |    'https://peer' || p || '.example.net/d/' || ids || '?b=2&a=1' AS url,
      |    'Peer & friend' AS anchor FROM g
      |  UNION ALL SELECT doc_id, 1,
      |    'https://base' || b || '.example.org/abs/' || m, 'abs' FROM g
      |  UNION ALL SELECT doc_id, 2,
      |    'https://base' || b || '.example.org/dir/rel/' || r || '.html', 'rel' FROM g
      |  UNION ALL SELECT doc_id, 3,
      |    'https://base' || b || '.example.org/up.html', 'up' FROM g
      |  UNION ALL SELECT doc_id, 4,
      |    'https://base' || b || '.example.org/dir/page' || ids || '.html?q=' || sq,
      |    'q' FROM g)
      |ORDER BY doc_id, ord""".stripMargin) { (s, dir) =>
    val (html, base) = crawlLinkPage
    Tables.documents(s, dir)
      .select(col("doc_id"),
        posexplode(graft.ext.Extract.resolvedLinks(html, base)).as(Seq("ord", "l")))
      .select(col("doc_id"), col("ord"),
        col("l.url").as("url"), col("l.anchor").as("anchor"))
      .ordered("doc_id", "ord")
  }

  // X62 — anchor-text profiles (the off-page signal: anchor words
  // describe the TARGET; retrieval/quality joins them per host): the
  // x59 pages → resolved links → per-target-host top-3 anchor terms,
  // counts fused through the BoundedTopK map-side k-buffer. Every term
  // in the fixture ties on count within its host, so a pass also pins
  // the aggregate's exact tie order (count desc, term BINARY asc — '&'
  // sorts before letters).
  q("x62_anchor_text",
    """WITH g AS (SELECT doc_id % 20 AS p, doc_id % 11 AS b FROM documents),
      |pc AS (SELECT p, COUNT(*) AS c FROM g GROUP BY 1),
      |bc AS (SELECT b, COUNT(*) AS c FROM g GROUP BY 1)
      |SELECT host, term, n, rk FROM (
      |  SELECT 'peer' || CAST(p AS VARCHAR) || '.example.net' AS host,
      |         t.term, c AS n, t.rk
      |  FROM pc, (VALUES ('&', 1), ('friend', 2), ('peer', 3)) t(term, rk)
      |  UNION ALL
      |  SELECT 'base' || CAST(b AS VARCHAR) || '.example.org',
      |         t.term, c, t.rk
      |  FROM bc, (VALUES ('abs', 1), ('q', 2), ('rel', 3)) t(term, rk))
      |ORDER BY host, rk""".stripMargin) { (s, dir) =>
    val (html, base) = crawlLinkPage
    val links = Tables.documents(s, dir)
      .select(explode(graft.ext.Extract.resolvedLinks(html, base)).as("l"))
      .select(graft.functions.UrlExpressions.urlParts(col("l.url"))
          .getField("host").as("host"),
        col("l.anchor").as("anchor"))
    graft.ext.Graph.anchorTerms(links, "host", "anchor", k = 3)
      .withColumnRenamed("target", "host")
      .ordered("host", "rk")
  }

  // X62B — the anchor profile CONSUMED as a host score
  // ([[graft.ext.Graph.anchorScore]]): weighted anchor-mass fraction
  // over each target's top-k profile (k=3, x62's pinned tie order —
  // the base hosts carry a 4th term that must be CUT for the closed
  // form to hold, so the pass pins the k cap inside the score path
  // too), in the (id, rank) shape HostPrior / the frontier take.
  // Lexicon weights are binary-exact (1.0 / 0.25 / −0.5) and per-host
  // term counts equal, so the double sum is exact in any partition
  // order and the oracle's closed form hash-matches; unknown terms
  // ('&', 'abs', 'rel') weigh 0 — the coalesce path fires as well.
  q("x62b_anchor_score",
    """WITH g AS (SELECT doc_id % 20 AS p, doc_id % 11 AS b FROM documents),
      |pc AS (SELECT p, COUNT(*) AS c FROM g GROUP BY 1),
      |bc AS (SELECT b, COUNT(*) AS c FROM g GROUP BY 1)
      |SELECT id, rank FROM (
      |  SELECT 'peer' || CAST(p AS VARCHAR) || '.example.net' AS id,
      |         (1.0 * c + 0.25 * c) / (3 * c) AS rank FROM pc
      |  UNION ALL
      |  SELECT 'base' || CAST(b AS VARCHAR) || '.example.org',
      |         (-0.5 * c) / (3 * c) FROM bc)
      |ORDER BY id""".stripMargin) { (s, dir) =>
    val (html, base) = crawlLinkPage
    val links = Tables.documents(s, dir)
      .select(explode(graft.ext.Extract.resolvedLinks(html, base)).as("l"))
      .select(graft.functions.UrlExpressions.urlParts(col("l.url"))
          .getField("host").as("host"),
        col("l.anchor").as("anchor"))
    graft.ext.Graph.anchorScore(links, "host", "anchor",
        Map("friend" -> 1.0, "peer" -> 0.25, "q" -> -0.5), k = 3)
      .ordered("id")
  }

  // X60 — host-graph PageRank (Page et al. 1999), the domain-quality
  // centrality a crawl curation joins onto every page before sampling.
  // The graph derives deterministically from real ids (hosts h0–h49;
  // h40–h49 never link out → genuine dangling mass), Spark runs
  // [[graft.ext.Graph.pageRank]]'s 10 power-iteration rounds, and the
  // oracle re-derives the SAME rounds as an unrolled CTE chain (the
  // x20 recursive-closure precedent) under the shared determinism
  // contract: each round's rank and every contribution term quantize
  // through the literal same IEEE `FLOOR(x*1e9+0.5)/1e9`, every
  // cross-partition sum through DECIMAL(30,12), so both engines
  // iterate on identical values and the final doubles hash-match
  // exactly.
  q("x60_host_pagerank", pageRankOracle(10)) { (s, dir) =>
    val edges = hostGraphEdges(s, dir)
    val pr = graft.ext.Graph.pageRank(edges, iterations = 10, damping = 0.85)
    graft.ext.Graph.degrees(edges)
      .join(pr, Seq("id"))
      .select(col("id").as("host"), col("out_deg"), col("in_deg"), col("rank"))
      .ordered("host")
  }

  // X60B — PageRank against the PERSISTED edge store
  // ([[graft.ext.Graph.writeEdgeStore]] → [[pageRankFromStore]]): the
  // same rounds as x60 but the edges come from the bucketed
  // `_edges_src`/`_edges_dst` catalog tables (built once per scale
  // dir, the seen-store memo discipline), read with no exchange above
  // the scan (GraphSpec plan-asserts) and nothing edge-sized resident
  // in memory. Oracle = x60's identical unrolled twin — the store
  // changes the physical layout, never a value; rows/hash break if
  // the store dedup, either layout, or the loop's store path drifts.
  q("x60b_pagerank_stored", pageRankOracle(10)) { (s, dir) =>
    val prefix = edgeStoreFor(s, dir)
    val pr = graft.ext.Graph.pageRankFromStore(s, prefix, iterations = 10,
      damping = 0.85)
    graft.ext.Graph.degreesFromStore(s, prefix)
      .join(pr, Seq("id"))
      .select(col("id").as("host"), col("out_deg"), col("in_deg"), col("rank"))
      .ordered("host")
  }

  // X63 — HITS hubs/authorities (Kleinberg 1999) on the x60 host
  // graph: the mutual-reinforcement pair PageRank conflates (hub =
  // seed-list/aggregator quality, authority = endorsement quality).
  // Five rounds, not ten: each round costs a fixed job-dispatch floor
  // (the x60 note) and round 2 already exercises every algebraic path
  // (both normalizations, zero-in-degree and zero-out-degree nodes) —
  // more rounds add convergence, not coverage. The oracle unrolls the
  // identical rounds with the shared floor-quantization consensus.
  q("x63_host_hits", hitsOracle(5)) { (s, dir) =>
    graft.ext.Graph.hits(hostGraphEdges(s, dir), iterations = 5)
      .select(col("id").as("host"), col("hub"), col("auth"))
      .ordered("host")
  }

  // X64 — crawl-frontier construction end to end
  // ([[graft.ext.Frontier.fromPages]]): pages → links → resolve →
  // normalize → scheme gate → blocklist → host PageRank → seen-URL
  // anti-join → per-host politeness cap. Every gate is proven to FIRE
  // (the x54 discipline): each page carries a `javascript:` href
  // (dies at normalize), a blocked-domain link (dies at the domain
  // gate), a tracking-param twin (merges into its clean URL at
  // normalize+dedup), and a relative self-link (resolves to the page's
  // own URL and dies at the seen anti-join) — the oracle simply omits
  // them all, so any gate failing to fire breaks rows or hash. The
  // link structure reproduces the x60 graph, so the PageRank rounds
  // reuse the same unrolled-CTE core (five rounds — x60 already pins
  // ten; this gate pins the COMPOSITION, and each round is a fixed
  // job-dispatch cost); the cap's oracle is the textbook
  // per-host `row_number() <= k` twin of stratifiedTake's
  // critical-bucket engine.
  /** The x64 crawled-pages fixture: one page per documents row with
    * doc_id % 50 < 40, each carrying three item links (the x60 graph
    * reproduced page-side), a tracking-param twin, a `javascript:`
    * href, a blocked-domain link, and a relative self-link — every
    * frontier gate proven to fire. Shared by x64/x64b/x64c (`where`
    * narrows to a crawl batch). */
  private def frontierFixturePages(s: SparkSession, dir: String,
      where: Column = lit(true)): DataFrame = {
    val id = col("doc_id").cast("string")
    val sk = (col("doc_id") % 50).cast("string")
    def item(j: Int) = Seq(
      lit("<a href=\"https://h"), ((col("doc_id") * 7 + j) % 50).cast("string"),
      lit(s".example/item"), id, lit(s"-$j\">i$j</a>"))
    val html = concat(Seq(lit("<html><body>")) ++
      item(1) ++ item(2) ++ item(3) ++
      Seq(
        // tracking-param twin of item 1 — merges at normalize
        lit("<a href=\"https://h"), ((col("doc_id") * 7 + 1) % 50).cast("string"),
        lit(".example/item"), id, lit("-1?utm_source=track\">dup</a>"),
        lit("<a href=\"javascript:void(0)\">js</a>"),
        lit("<a href=\"https://spam.blocked.example/x"), id, lit("\">spam</a>"),
        lit("<a href=\"/page"), id, lit("\">self</a>"),
        lit("</body></html>")): _*)
    val pageUrl = concat(lit("https://h"), sk, lit(".example/page"), id)
    Tables.documents(s, dir)
      .filter(col("doc_id") % 50 < 40 && where)
      .select(pageUrl.as("url"), html.as("html"))
  }

  /** x64c's SECOND crawl batch (odd doc pages): the x64 fixture shape
    * PLUS a link to the previous (even) doc's page URL — a URL the
    * first batch CRAWLED, so it survives every local gate and must die
    * at the cumulative seen store (for odd doc_id%50 ∈ 1..39 the
    * previous doc is always in batch 1). */
  private def frontierBatch2Pages(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id").cast("string")
    val sk = (col("doc_id") % 50).cast("string")
    val prevId = (col("doc_id") - 1).cast("string")
    val prevSk = ((col("doc_id") - 1) % 50).cast("string")
    def item(j: Int) = Seq(
      lit("<a href=\"https://h"), ((col("doc_id") * 7 + j) % 50).cast("string"),
      lit(s".example/item"), id, lit(s"-$j\">i$j</a>"))
    val html = concat(Seq(lit("<html><body>")) ++
      item(1) ++ item(2) ++ item(3) ++
      Seq(
        lit("<a href=\"https://h"), prevSk, lit(".example/page"), prevId,
        lit("\">prev</a>"),
        lit("<a href=\"javascript:void(0)\">js</a>"),
        lit("<a href=\"https://spam.blocked.example/x"), id, lit("\">spam</a>"),
        lit("<a href=\"/page"), id, lit("\">self</a>"),
        lit("</body></html>")): _*)
    Tables.documents(s, dir)
      .filter(col("doc_id") % 50 < 40 && col("doc_id") % 2 === 1)
      .select(concat(lit("https://h"), sk, lit(".example/page"), id).as("url"),
        html.as("html"))
  }

  /** The x64c two-batch cumulative crawl state (memoized per scale
    * dir): batch 1 (even doc pages) processed through the REAL
    * production step — [[graft.ext.Frontier.fromPagesCumulative]]
    * folds its host edges into the graph store (its frontier output is
    * discarded; the fold and rank run eagerly at build), then
    * [[graft.ext.Frontier.appendSeenStore]] records its page URLs —
    * exactly [[graft.streaming.DocumentIngest.frontierProcessBatch]]'s
    * sequence. Returns (seenTable, graphStorePrefix). */
  private val cumulMemo = scala.collection.concurrent.TrieMap.empty[String, (String, String)]
  private def cumulStateFor(s: SparkSession, dir: String): (String, String) =
    cumulMemo.getOrElseUpdate(dir, {
      val h = Integer.toHexString(dir.hashCode)
      val seen = s"graft_cumseen_$h"
      val graph = s"graft_cumgraph_$h"
      // fresh JVM may inherit tables from an earlier run — rebuild
      graft.store.Bucketing.dropWithLocation(s, s"${graph}_edges_src")
      graft.store.Bucketing.dropWithLocation(s, s"${graph}_edges_dst")
      s.sql(s"DROP TABLE IF EXISTS $seen")
      val batch1 = frontierFixturePages(s, dir, col("doc_id") % 2 === 0)
      val _ = graft.ext.Frontier.fromPagesCumulative(batch1, "url", "html",
        graph, blockedDomains = Seq("blocked.example"), perHostCap = 10,
        seed = "graft-frontier-v1", prIterations = 5, buckets = 8)
      graft.ext.Frontier.writeSeenStore(batch1.select(col("url")), "url",
        seen, buckets = 8)
      (seen, graph)
    })

  /** The x64b cumulative seen store, built once per scale dir (the
    * rollupMemo discipline): a prior crawl batch already fetched the
    * item-1 URL of every EVEN doc page — written through the real
    * [[graft.ext.Frontier.writeSeenStore]] (normalize → bucket on url)
    * plus an [[graft.ext.Frontier.appendSeenStore]] replay of the same
    * urls, which must be a no-op (append idempotency exercised on the
    * oracle path, not just in FrontierSpec). */
  /** The x60b persisted host-graph edge store, built once per scale
    * dir through the real [[graft.ext.Graph.writeEdgeStore]]. */
  private val edgeStoreMemo = scala.collection.concurrent.TrieMap.empty[String, String]
  private def edgeStoreFor(s: SparkSession, dir: String): String =
    edgeStoreMemo.getOrElseUpdate(dir, {
      val t = "graft_hostgraph_" + Integer.toHexString(dir.hashCode)
      graft.ext.Graph.writeEdgeStore(hostGraphEdges(s, dir), t, buckets = 8)
      t
    })

  private val seenStoreMemo = scala.collection.concurrent.TrieMap.empty[String, String]
  private def seenStoreFor(s: SparkSession, dir: String): String =
    seenStoreMemo.getOrElseUpdate(dir, {
      val t = "graft_seen_" + Integer.toHexString(dir.hashCode)
      val urls = Tables.documents(s, dir)
        .filter(col("doc_id") % 50 < 40 && col("doc_id") % 2 === 0)
        .select(concat(lit("https://h"),
          ((col("doc_id") * 7 + 1) % 50).cast("string"),
          lit(".example/item"), col("doc_id").cast("string"), lit("-1"))
          .as("url"))
      graft.ext.Frontier.writeSeenStore(urls, "url", t, buckets = 8)
      graft.ext.Frontier.appendSeenStore(urls, "url", t, buckets = 8)
      t
    })

  q("x64_crawl_frontier",
    s"""WITH pages AS (
      |  SELECT doc_id, doc_id % 50 AS sk FROM documents WHERE doc_id % 50 < 40),
      |e0 AS MATERIALIZED (
      |  SELECT DISTINCT 'h' || CAST(sk AS VARCHAR) || '.example' AS src,
      |         'h' || CAST((doc_id * 7 + j) % 50 AS VARCHAR) || '.example' AS dst
      |  FROM pages, UNNEST([1, 2, 3]) AS t(j)
      |  WHERE sk <> (doc_id * 7 + j) % 50),
      |${pageRankRoundsCte(5)}cand AS (
      |  SELECT DISTINCT
      |    'h' || CAST((doc_id * 7 + j) % 50 AS VARCHAR) || '.example' AS host,
      |    'https://h' || CAST((doc_id * 7 + j) % 50 AS VARCHAR) || '.example/item'
      |      || CAST(doc_id AS VARCHAR) || '-' || CAST(j AS VARCHAR) AS url
      |  FROM pages, UNNEST([1, 2, 3]) AS t(j)),
      |ranked AS (
      |  SELECT c.host, c.url, COALESCE(f.rank, 0.0) AS rank
      |  FROM cand c LEFT JOIN fin f ON f.id = c.host),
      |capped AS (
      |  SELECT host, url, rank,
      |    row_number() OVER (PARTITION BY host
      |      ORDER BY md5(url || ':' || 'graft-frontier-v1'), url) AS rk
      |  FROM ranked)
      |SELECT host, url, rank FROM capped WHERE rk <= 10
      |ORDER BY host, url""".stripMargin) { (s, dir) =>
    graft.ext.Frontier.fromPages(frontierFixturePages(s, dir), "url", "html",
        blockedDomains = Seq("blocked.example"), perHostCap = 10,
        seed = "graft-frontier-v1", prIterations = 5)
      .ordered("host", "url")
  }

  // X64B — the frontier against the CUMULATIVE seen-URL store
  // ([[graft.ext.Frontier.writeSeenStore]] / `fromPages(seenTable)`):
  // same fixture and gates as x64, but a PRIOR crawl batch already
  // fetched the item-1 URL of every even doc page — those candidates
  // must now die at the store anti-join (the store is bucketed on url
  // and read without an exchange; FrontierSpec plan-asserts), and the
  // politeness cap re-draws over the survivors, so both rows AND
  // ranks-per-rk shift vs x64 if the store path fails in any way. The
  // oracle carries x64's CTE chain plus the seen set as an exclusion
  // before capping.
  q("x64b_frontier_seen_store",
    s"""WITH pages AS (
      |  SELECT doc_id, doc_id % 50 AS sk FROM documents WHERE doc_id % 50 < 40),
      |e0 AS MATERIALIZED (
      |  SELECT DISTINCT 'h' || CAST(sk AS VARCHAR) || '.example' AS src,
      |         'h' || CAST((doc_id * 7 + j) % 50 AS VARCHAR) || '.example' AS dst
      |  FROM pages, UNNEST([1, 2, 3]) AS t(j)
      |  WHERE sk <> (doc_id * 7 + j) % 50),
      |${pageRankRoundsCte(5)}seen AS (
      |  SELECT 'https://h' || CAST((doc_id * 7 + 1) % 50 AS VARCHAR)
      |    || '.example/item' || CAST(doc_id AS VARCHAR) || '-1' AS url
      |  FROM pages WHERE doc_id % 2 = 0),
      |cand AS (
      |  SELECT DISTINCT
      |    'h' || CAST((doc_id * 7 + j) % 50 AS VARCHAR) || '.example' AS host,
      |    'https://h' || CAST((doc_id * 7 + j) % 50 AS VARCHAR) || '.example/item'
      |      || CAST(doc_id AS VARCHAR) || '-' || CAST(j AS VARCHAR) AS url
      |  FROM pages, UNNEST([1, 2, 3]) AS t(j)),
      |ranked AS (
      |  SELECT c.host, c.url, COALESCE(f.rank, 0.0) AS rank
      |  FROM cand c LEFT JOIN fin f ON f.id = c.host
      |  WHERE c.url NOT IN (SELECT url FROM seen)),
      |capped AS (
      |  SELECT host, url, rank,
      |    row_number() OVER (PARTITION BY host
      |      ORDER BY md5(url || ':' || 'graft-frontier-v1'), url) AS rk
      |  FROM ranked)
      |SELECT host, url, rank FROM capped WHERE rk <= 10
      |ORDER BY host, url""".stripMargin) { (s, dir) =>
    graft.ext.Frontier.fromPages(frontierFixturePages(s, dir), "url", "html",
        blockedDomains = Seq("blocked.example"), perHostCap = 10,
        seed = "graft-frontier-v1", prIterations = 5,
        seenTable = Some(seenStoreFor(s, dir)))
      .ordered("host", "url")
  }

  // X64D — robots COMPLIANCE inside the frontier
  // ([[graft.ext.Frontier.RobotsGate]] → gate 6.5 of frontierCore):
  // the x64 fixture plus per-host robots files for the EVEN hosts —
  // `Disallow: /item*-2` kills every j=2 candidate targeting an even
  // host (wildcard match, scheduled-URL compliance), EXCEPT doc 4's
  // (`Allow: /item4-2$` is longer, pinning RFC 9309 longest-match +
  // the $ anchor inside the composed pipeline); odd hosts have NO
  // robots row and must keep all candidates (the no-file default).
  // Disallowed URLs die BEFORE the politeness cap, so survivor draws
  // re-rank — rows AND hashes shift if the gate misfires in either
  // direction. PageRank is unchanged (robots governs fetch
  // scheduling, not the endorsement graph).
  q("x64d_frontier_robots",
    s"""WITH pages AS (
      |  SELECT doc_id, doc_id % 50 AS sk FROM documents WHERE doc_id % 50 < 40),
      |e0 AS MATERIALIZED (
      |  SELECT DISTINCT 'h' || CAST(sk AS VARCHAR) || '.example' AS src,
      |         'h' || CAST((doc_id * 7 + j) % 50 AS VARCHAR) || '.example' AS dst
      |  FROM pages, UNNEST([1, 2, 3]) AS t(j)
      |  WHERE sk <> (doc_id * 7 + j) % 50),
      |${pageRankRoundsCte(5)}cand AS (
      |  SELECT DISTINCT
      |    'h' || CAST((doc_id * 7 + j) % 50 AS VARCHAR) || '.example' AS host,
      |    'https://h' || CAST((doc_id * 7 + j) % 50 AS VARCHAR) || '.example/item'
      |      || CAST(doc_id AS VARCHAR) || '-' || CAST(j AS VARCHAR) AS url
      |  FROM pages, UNNEST([1, 2, 3]) AS t(j)
      |  WHERE NOT ((doc_id * 7 + j) % 2 = 0 AND j = 2 AND doc_id <> 4)),
      |ranked AS (
      |  SELECT c.host, c.url, COALESCE(f.rank, 0.0) AS rank
      |  FROM cand c LEFT JOIN fin f ON f.id = c.host),
      |capped AS (
      |  SELECT host, url, rank,
      |    row_number() OVER (PARTITION BY host
      |      ORDER BY md5(url || ':' || 'graft-frontier-v1'), url) AS rk
      |  FROM ranked)
      |SELECT host, url, rank FROM capped WHERE rk <= 10
      |ORDER BY host, url""".stripMargin) { (s, dir) =>
    val robots = Tables.documents(s, dir)
      .select((col("doc_id") % 50).as("m")).distinct()
      .filter(col("m") % 2 === 0)
      .select(
        concat(lit("https://h"), col("m").cast("string"),
          lit(".example/robots.txt")).as("rurl"),
        lit("User-agent: *\nDisallow: /item*-2\nAllow: /item4-2$\n").as("rtxt"))
    graft.ext.Frontier.fromPages(frontierFixturePages(s, dir), "url", "html",
        blockedDomains = Seq("blocked.example"), perHostCap = 10,
        seed = "graft-frontier-v1", prIterations = 5,
        robotsGate = Some(graft.ext.Frontier.RobotsGate(robots, "rurl", "rtxt")))
      .ordered("host", "url")
  }

  // X64C — the CUMULATIVE crawl cycle end to end, two batches: batch 1
  // (even doc pages) already processed through the production step
  // (edge fold + seen append — [[cumulStateFor]]), and the gate runs
  // batch 2 (odd pages) through [[graft.ext.Frontier
  // .fromPagesCumulative]]: its edges fold into the SAME store, its
  // host priorities come from PageRank over the UNION graph (batch-2's
  // own graph alone would rank differently — wrong rank column breaks
  // the hash), and each odd page plants a link to the PREVIOUS even
  // page's URL, which survives every local gate and must die at the
  // cumulative seen store (rows break if it leaks through). The oracle
  // re-derives the union edge set (item edges from BOTH batches +
  // batch-2's prev-page edges), runs the shared unrolled PageRank, and
  // caps batch-2's item candidates.
  q("x64c_cumulative_crawl",
    s"""WITH pages AS (
      |  SELECT doc_id, doc_id % 50 AS sk FROM documents WHERE doc_id % 50 < 40),
      |e0 AS MATERIALIZED (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT 'h' || CAST(sk AS VARCHAR) || '.example' AS src,
      |           'h' || CAST((doc_id * 7 + j) % 50 AS VARCHAR) || '.example' AS dst
      |    FROM pages, UNNEST([1, 2, 3]) AS t(j)
      |    WHERE sk <> (doc_id * 7 + j) % 50
      |    UNION ALL
      |    SELECT 'h' || CAST(sk AS VARCHAR) || '.example',
      |           'h' || CAST((doc_id - 1) % 50 AS VARCHAR) || '.example'
      |    FROM pages WHERE doc_id % 2 = 1) u
      |  WHERE src <> dst),
      |${pageRankRoundsCte(5)}cand AS (
      |  SELECT DISTINCT
      |    'h' || CAST((doc_id * 7 + j) % 50 AS VARCHAR) || '.example' AS host,
      |    'https://h' || CAST((doc_id * 7 + j) % 50 AS VARCHAR) || '.example/item'
      |      || CAST(doc_id AS VARCHAR) || '-' || CAST(j AS VARCHAR) AS url
      |  FROM pages, UNNEST([1, 2, 3]) AS t(j) WHERE doc_id % 2 = 1),
      |ranked AS (
      |  SELECT c.host, c.url, COALESCE(f.rank, 0.0) AS rank
      |  FROM cand c LEFT JOIN fin f ON f.id = c.host),
      |capped AS (
      |  SELECT host, url, rank,
      |    row_number() OVER (PARTITION BY host
      |      ORDER BY md5(url || ':' || 'graft-frontier-v1'), url) AS rk
      |  FROM ranked)
      |SELECT host, url, rank FROM capped WHERE rk <= 10
      |ORDER BY host, url""".stripMargin) { (s, dir) =>
    val (seen, graph) = cumulStateFor(s, dir)
    graft.ext.Frontier.fromPagesCumulative(frontierBatch2Pages(s, dir),
        "url", "html", graph, blockedDomains = Seq("blocked.example"),
        perHostCap = 10, seed = "graft-frontier-v1", prIterations = 5,
        seenTable = Some(seen), buckets = 8)
      .ordered("host", "url")
  }

  // X65 — sitemap-driven frontier seeding end to end
  // ([[graft.ext.Frontier.seedsFromRobots]] over [[graft.ext.Robots
  // .sitemaps]]): one robots.txt per derived host, each carrying five
  // Sitemap lines of which three must DIE (blocked domain, ftp scheme,
  // tracking-param twin of the absolute submission) and one must
  // RESOLVE (relative against the robots URL — lenient-lexer path) —
  // the x54/x64 every-gate-fires discipline. The oracle emits the two
  // surviving urls per host arithmetically; any gate failing to fire
  // (or the Sitemap lexer splitting user-agent groups — RobotsSpec
  // pins that separately) breaks rows or hash.
  q("x65_sitemap_seeds",
    """WITH hosts AS (
      |  SELECT DISTINCT doc_id % 50 AS k FROM documents WHERE doc_id % 50 < 40),
      |u AS (
      |  SELECT 'h' || CAST(k AS VARCHAR) || '.example' AS host,
      |         'https://h' || CAST(k AS VARCHAR) || '.example/sitemap.xml' AS url
      |  FROM hosts
      |  UNION ALL
      |  SELECT 'h' || CAST(k AS VARCHAR) || '.example',
      |         'https://h' || CAST(k AS VARCHAR) || '.example/maps/news.xml'
      |  FROM hosts)
      |SELECT host, url FROM u ORDER BY host, url""".stripMargin) { (s, dir) =>
    val k = (col("doc_id") % 50).cast("string")
    val hostUrl = concat(lit("https://h"), k, lit(".example"))
    val robots = Tables.documents(s, dir)
      .filter(col("doc_id") % 50 < 40)
      .select(k.as("k"), hostUrl.as("hu")).distinct()
      .select(concat(col("hu"), lit("/robots.txt")).as("url"),
        concat(
          lit("User-agent: *\nDisallow: /private/\nSitemap: "),
          col("hu"), lit("/sitemap.xml   # index\nSitemap: /maps/news.xml\n"),
          lit("Sitemap: https://spam.blocked.example/sm"), col("k"),
          lit(".xml\nsitemap: ftp://h"), col("k"),
          lit(".example/x.xml\nSitemap: "), col("hu"),
          lit("/sitemap.xml?utm_source=t\n")).as("txt"))
    graft.ext.Frontier.seedsFromRobots(robots, "url", "txt",
        blockedDomains = Seq("blocked.example"))
      .ordered("host", "url")
  }

  // X66 — sitemap CONTENT parsing closing the robots → sitemap →
  // page-URL seed loop ([[graft.ext.Sitemap.parseEntries]] →
  // [[graft.ext.Frontier.seedsFromSitemaps]]): per derived host THREE
  // fetched payloads — a <urlset> (GZIPPED for even hosts — pins the
  // magic-byte sniff + inflate path; identical output either way), a
  // <sitemapindex> (children surface as kind='sitemap' recursion
  // markers), and a plain-TEXT sitemap (the protocol's third form).
  // Every gate planted to fire (the x65 discipline): a blocked-domain
  // loc and an ftp loc die per file; a tracking-param twin AND the
  // text file's repeat of /p1 merge into one row keeping the MAX
  // lastmod; a relative loc resolves against the sitemap's own URL
  // (CDATA-wrapped in the urlset, bare in the index); &amp; in a loc
  // entity-decodes before normalization. The oracle states the
  // closed-form survivors.
  q("x66_sitemap_entries",
    """WITH hosts AS (
      |  SELECT DISTINCT doc_id % 50 AS k FROM documents WHERE doc_id % 50 < 40),
      |hu AS (
      |  SELECT 'h' || CAST(k AS VARCHAR) || '.example' AS host,
      |         'https://h' || CAST(k AS VARCHAR) || '.example' AS base
      |  FROM hosts),
      |u AS (
      |  SELECT host, base || '/p1' AS url, 'url' AS kind,
      |         '2026-02-01' AS lastmod FROM hu
      |  UNION ALL SELECT host, base || '/p2', 'url', CAST(NULL AS VARCHAR) FROM hu
      |  UNION ALL SELECT host, base || '/q?a=1&b=2', 'url', NULL FROM hu
      |  UNION ALL SELECT host, base || '/t1', 'url', NULL FROM hu
      |  UNION ALL SELECT host, base || '/maps/a.xml', 'sitemap', '2026-03-01' FROM hu
      |  UNION ALL SELECT host, base || '/maps/b.xml', 'sitemap', NULL FROM hu)
      |SELECT host, url, kind, lastmod FROM u
      |ORDER BY host, kind, url""".stripMargin) { (s, dir) =>
    val hosts = Tables.documents(s, dir)
      .filter(col("doc_id") % 50 < 40)
      .select((col("doc_id") % 50).as("ki")).distinct()
    val k = col("ki").cast("string")
    val hu = concat(lit("https://h"), k, lit(".example"))
    val urlsetXml = concat(
      lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
        "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n"),
      lit("  <url><loc> "), hu, lit("/p1 </loc><lastmod>2026-01-05</lastmod></url>\n"),
      lit("  <url><loc><![CDATA[/p2]]></loc></url>\n"),
      lit("  <url><loc>"), hu, lit("/p1?utm_source=x</loc><lastmod>2026-02-01</lastmod></url>\n"),
      lit("  <url><loc>https://spam.blocked.example/s"), k, lit("</loc></url>\n"),
      lit("  <url><loc>ftp://h"), k, lit(".example/f</loc></url>\n"),
      lit("  <url><loc>"), hu, lit("/q?a=1&amp;b=2</loc></url>\n"),
      lit("</urlset>\n"))
    val idxXml = concat(
      lit("<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"),
      lit("<sitemap><loc>"), hu, lit("/maps/a.xml</loc>" +
        "<lastmod>2026-03-01</lastmod></sitemap>"),
      lit("<sitemap><loc>maps/b.xml</loc></sitemap>"),
      lit("<sitemap><loc>https://spam.blocked.example/sm"), k, lit(".xml</loc></sitemap>"),
      lit("</sitemapindex>"))
    val txt = concat(hu, lit("/t1\n"), hu, lit("/p1\n"))
    val fetched = hosts.select(
        concat(hu, lit("/sitemap.xml")).as("url"),
        when(col("ki") % 2 === 0,
            graft.ext.Warc.gzipBytes(urlsetXml.cast("binary")))
          .otherwise(urlsetXml.cast("binary")).as("payload"))
      .unionByName(hosts.select(
        concat(hu, lit("/sitemap_index.xml")).as("url"),
        idxXml.cast("binary").as("payload")))
      .unionByName(hosts.select(
        concat(hu, lit("/urls.txt")).as("url"),
        txt.cast("binary").as("payload")))
    graft.ext.Frontier.seedsFromSitemaps(fetched, "url", "payload",
        blockedDomains = Seq("blocked.example"))
      .ordered("host", "kind", "url")
  }

  // X68 — conditional recrawl from sitemap lastmod claims
  // ([[graft.ext.Frontier.recrawlCandidates]]): entries whose lastmod
  // post-dates the crawl log's recorded fetch get re-enqueued. Gates
  // planted per class: older-date-only lastmod (parses, no recrawl),
  // newer timestamp (recrawls — only where the page IS in the log),
  // NULL lastmod (no claim), a tracking-param twin in the LOG (must
  // normalize-merge onto the entry url), and a duplicate log row with
  // an earlier fetched_at (max() must win or rows duplicate/flip).
  q("x68_recrawl",
    """WITH gen AS (
      |  SELECT doc_id, doc_id % 50 AS k FROM documents WHERE doc_id % 50 < 40)
      |SELECT 'h' || CAST(k AS VARCHAR) || '.example' AS host,
      |  'https://h' || CAST(k AS VARCHAR) || '.example/p'
      |    || CAST(doc_id AS VARCHAR) AS url,
      |  TIMESTAMP '2026-06-15 12:00:00' AS lastmod_ts,
      |  TIMESTAMP '2026-05-01 00:00:00' AS fetched_at
      |FROM gen
      |WHERE doc_id % 3 = 1 AND doc_id % 2 = 0
      |ORDER BY url""".stripMargin) { (s, dir) =>
    val k = (col("doc_id") % 50).cast("string")
    val url = concat(lit("https://h"), k, lit(".example/p"),
      col("doc_id").cast("string"))
    val m3 = col("doc_id") % 3
    val entries = Tables.documents(s, dir)
      .filter(col("doc_id") % 50 < 40)
      .select(url.as("u"),
        when(m3 === 0, "2026-04-01")
          .when(m3 === 1, "2026-06-15 12:00:00")
          .otherwise(lit(null).cast("string")).as("lastmod"))
    val log = Tables.documents(s, dir)
      .filter(col("doc_id") % 50 < 40 && col("doc_id") % 2 === 0)
      .select(concat(url, lit("?utm_source=t")).as("lu"),
        lit("2026-05-01 00:00:00").cast("timestamp").as("fa"))
      .unionByName(Tables.documents(s, dir)
        .filter(col("doc_id") % 50 < 40 && col("doc_id") % 2 === 0)
        .select(url.as("lu"),
          lit("2026-01-01 00:00:00").cast("timestamp").as("fa")))
    graft.ext.Frontier.recrawlCandidates(entries, "u", "lastmod",
        log, "lu", "fa")
      .ordered("url")
  }

  // X69 — executable per-host fetch schedule
  // ([[graft.ext.Frontier.fetchSchedule]]) over a capped frontier:
  // slots follow the politeness cap's seeded-draw order and offsets
  // multiply the host's crawl delay (default where absent) — the
  // textbook row_number × delay twin, with mixed present/null delays
  // planted so both branches fire.
  q("x69_fetch_schedule",
    """WITH f AS (
      |  SELECT 'h' || CAST(doc_id % 50 AS VARCHAR) || '.example' AS host,
      |    'https://h' || CAST(doc_id % 50 AS VARCHAR) || '.example/p'
      |      || CAST(doc_id AS VARCHAR) AS url,
      |    CASE WHEN doc_id % 50 % 2 = 0 THEN 2.5 END AS crawl_delay
      |  FROM documents WHERE doc_id % 50 < 40),
      |r AS (
      |  SELECT host, url, crawl_delay,
      |    row_number() OVER (PARTITION BY host
      |      ORDER BY md5(url || ':' || 'graft-sched-v1'), url) AS slot
      |  FROM f)
      |SELECT host, url, crawl_delay, slot,
      |  (slot - 1) * COALESCE(crawl_delay, 1.0) AS fetch_offset_s
      |FROM r ORDER BY host, slot""".stripMargin) { (s, dir) =>
    val k = (col("doc_id") % 50).cast("string")
    val frontier = Tables.documents(s, dir)
      .filter(col("doc_id") % 50 < 40)
      .select(concat(lit("h"), k, lit(".example")).as("host"),
        concat(lit("https://h"), k, lit(".example/p"),
          col("doc_id").cast("string")).as("url"),
        when(col("doc_id") % 50 % 2 === 0, 2.5).as("crawl_delay"))
    graft.ext.Frontier.fetchSchedule(frontier, "graft-sched-v1")
      .ordered("host", "slot")
  }

  // X61 — WET (extracted-text) conversion records: the cheap on-ramp
  // of the crawl family (CommonCrawl's *.warc.wet.gz sidecar). Wire
  // bytes carry a warcinfo record THEN the conversion record per doc —
  // a pass pins both the record-type filter (warcinfo must not surface
  // as a document) and the length-framed UTF-8 payload round-trip
  // through the real [[graft.ext.Warc.wetTexts]] reader.
  q("x61_wet_conversion",
    """SELECT doc_id,
      |  'https://example.org/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
      |  COALESCE(text, '') AS text
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val id = col("doc_id").cast("string")
    val txt = coalesce(col("text"), lit(""))
    val info = lit("WARC/1.0\r\nWARC-Type: warcinfo" +
      "\r\nContent-Type: application/warc-fields" +
      "\r\nContent-Length: 16\r\n\r\nsoftware: graft\n\r\n\r\n")
    val conv = concat(
      lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: https://example.org/doc/"),
      id,
      lit("\r\nWARC-Date: 2026-08-14T00:00:00Z" +
        "\r\nContent-Type: text/plain\r\nContent-Length: "),
      octet_length(txt).cast("string"), lit("\r\n\r\n"), txt, lit("\r\n\r\n"))
    val rows = Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(graft.ext.Warc.records(concat(info, conv).cast("binary"))).as("r"))
      .select(
        col("doc_id").cast("string").as("path"),
        lit(0L).as("idx"),
        coalesce(element_at(col("r.headers"), "WARC-Type"), lit("")).as("warc_type"),
        coalesce(element_at(col("r.headers"), "WARC-Target-URI"), lit("")).as("target_uri"),
        coalesce(element_at(col("r.headers"), "WARC-Date"), lit("")).as("warc_date"),
        coalesce(element_at(col("r.headers"), "Content-Type"), lit("")).as("content_type"),
        coalesce(element_at(col("r.headers"), "Content-Length"), lit("0"))
          .cast("long").as("content_length"),
        col("r.payload").as("payload"))
      .as[graft.ext.Warc.WarcRow]
    graft.ext.Warc.wetTexts(rows)
      .select(col("path").cast("long").as("doc_id"), col("target_uri"), col("text"))
      .ordered("doc_id")
  }

  // X25 — temperature-weighted domain mixture (alpha = 0.5): per-lang
  // quota ∝ √count via integer-exact weights (floor(√n·10⁶) then pure
  // integer quota arithmetic — bit-identical across engines), members
  // drawn in seeded-hash order. The flattening move of GPT-3/Gopher
  // corpus mixing, reproducible.
  q("x25_mixture_sample",
    s"""WITH cnt AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
       |w AS (SELECT lang, n,
       |        CAST(FLOOR(SQRT(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS wi
       |      FROM cnt),
       |q AS (SELECT lang, LEAST(n, (120 * wi) // (SELECT SUM(wi) FROM w)) AS quota
       |      FROM w),
       |r AS (SELECT lang, doc_id,
       |        row_number() OVER (PARTITION BY lang
       |          ORDER BY $splitDrawSql, doc_id) AS rk
       |      FROM documents)
       |SELECT r.lang, r.doc_id FROM r JOIN q USING (lang)
       |WHERE rk <= quota ORDER BY lang, doc_id""".stripMargin) { (s, dir) =>
    graft.ext.Sampling.mixtureTake(Tables.documents(s, dir), Seq("lang"),
        col("doc_id"), SplitSeed, alpha = 0.5, totalN = 120)
      .select("lang", "doc_id")
      .ordered("lang", "doc_id")
  }

  // X26 — SemDeDup semantic deduplication (rows-only: the k-means
  // quantizer has no portable SQL twin; SemDedupSpec proves precision,
  // blocked-recall vs brute-force pairs, and keep-one-per-component).
  // Kept rows + their cell so the output is auditable.
  q("x26_semantic_dedup") { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    // quantizer fitted ONCE per scale dir (the ivfIndex memo precedent —
    // in production the k-means model is index metadata, not query work)
    val assigned = semCellMemo.getOrElseUpdate(dir,
      graft.ext.Ivf.build(emb, k = 8).assigned.cache())
    val pairs = graft.ext.Similarity.semanticDupPairsFromCells(assigned, threshold = 0.4)
    graft.ext.Dedup.dropDuplicateClusters(emb, "vec_id", pairs)
      .select(col("vec_id"), col("label"))
      .ordered("vec_id")
  }

  // X26b — SemDeDup's VERIFY stage oracle-checked end-to-end: the
  // within-cell cosine pairs + connected-component closure + keep-min
  // resolution (exactly x26's machinery — semanticDupPairsFromCells →
  // connectedComponents → clusterStats) run over a DETERMINISTIC cell
  // assignment: the stored `label` column plays the fitted quantizer,
  // the production "assignment persisted as index metadata" shape. Only
  // the k-means candidate stage itself stays rows-only (x26;
  // SemDedupSpec pins its precision/recall). The x2b/x3b/x5c + x20
  // pattern composed: cosine verdicts AND the closure vs the oracle.
  q("x26b_semantic_verify",
    """WITH RECURSIVE pairs AS (
      |  SELECT a.vec_id AS id1, b.vec_id AS id2
      |  FROM embeddings a JOIN embeddings b
      |    ON a.label = b.label AND a.vec_id < b.vec_id
      |  WHERE list_sum(list_transform(range(1, len(a.embedding) + 1),
      |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
      |    >= 0.3),
      |edges AS (
      |  SELECT id1 AS src, id2 AS dst FROM pairs
      |  UNION SELECT id2, id1 FROM pairs),
      |reach AS (
      |  SELECT src AS id, src AS lbl FROM edges
      |  UNION
      |  SELECT e.src AS id, r.lbl FROM edges e JOIN reach r ON r.id = e.dst),
      |comp AS (SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id)
      |SELECT cluster_id, COUNT(*) AS n_docs, MIN(id) AS keep_id, MAX(id) AS max_id
      |FROM comp GROUP BY 1 ORDER BY cluster_id""".stripMargin) { (s, dir) =>
    val cells = Tables.embeddings(s, dir).withColumn("cell", col("label"))
    val pairs = graft.ext.Similarity.semanticDupPairsFromCells(cells, threshold = 0.3)
    graft.ext.Dedup.clusterStats(graft.ext.Dedup.connectedComponents(pairs))
      .ordered("cluster_id")
  }

  // X27 — CCNet-style n-gram-LM perplexity scoring at the n=2 default:
  // train add-α bigram counts on the corpus, score every doc's avg
  // negative log-likelihood and perplexity under them. Per-gram
  // log-probs are rounded to 9 decimals and decimal-summed
  // (order-independent), so the oracle running the identical
  // formulation hash-matches. (LangModelSpec pins n=3 closed-form.)
  q("x27_lm_perplexity",
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      |big AS (
      |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
      |  FROM toks, UNNEST(range(1, len(t))) AS g(i)),
      |uni AS (SELECT w1, COUNT(*)::DOUBLE AS c1 FROM big GROUP BY 1),
      |bi AS (SELECT w1, w2, COUNT(*)::DOUBLE AS c12 FROM big GROUP BY 1, 2),
      |v AS (SELECT COUNT(DISTINCT w)::DOUBLE AS vsz
      |      FROM (SELECT UNNEST(t) AS w FROM toks)),
      |terms AS (
      |  SELECT b.doc_id,
      |    CAST(ROUND(LN((bi.c12 + 0.1) / (uni.c1 + 0.1 * v.vsz)), 9)
      |         AS DECIMAL(28,10)) AS term
      |  FROM big b JOIN bi ON b.w1 = bi.w1 AND b.w2 = bi.w2
      |             JOIN uni ON b.w1 = uni.w1
      |             CROSS JOIN v)
      |SELECT doc_id, COUNT(*) AS n_grams,
      |  ROUND(CAST(-SUM(term) AS DOUBLE) / COUNT(*), 6) AS avg_nll,
      |  ROUND(EXP(CAST(-SUM(term) AS DOUBLE) / COUNT(*)), 6) AS ppl
      |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    lmScored(s, dir).ordered("doc_id")
  }

  // X27b — the same CCNet filter at n = 3 (the module is n-generic; the
  // reference CCNet filter is a 5-gram model — this pins the
  // generalized gram builder against an independent trigram oracle:
  // context counts, add-α backoff event space, and the decimal NLL sum
  // all re-derived in SQL for ctx = 2 tokens).
  q("x27b_lm_trigram",
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      |tri AS (
      |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
      |  FROM toks, UNNEST(range(1, len(t) - 1)) AS g(i)),
      |ctxc AS (SELECT w1, w2, COUNT(*)::DOUBLE AS c2 FROM tri GROUP BY 1, 2),
      |tric AS (SELECT w1, w2, w3, COUNT(*)::DOUBLE AS c3 FROM tri GROUP BY 1, 2, 3),
      |v AS (SELECT COUNT(DISTINCT w)::DOUBLE AS vsz
      |      FROM (SELECT UNNEST(t) AS w FROM toks)),
      |terms AS (
      |  SELECT b.doc_id,
      |    CAST(ROUND(LN((tric.c3 + 0.1) / (ctxc.c2 + 0.1 * v.vsz)), 9)
      |         AS DECIMAL(28,10)) AS term
      |  FROM tri b
      |  JOIN tric ON b.w1 = tric.w1 AND b.w2 = tric.w2 AND b.w3 = tric.w3
      |  JOIN ctxc ON b.w1 = ctxc.w1 AND b.w2 = ctxc.w2
      |  CROSS JOIN v)
      |SELECT doc_id, COUNT(*) AS n_grams,
      |  ROUND(CAST(-SUM(term) AS DOUBLE) / COUNT(*), 6) AS avg_nll,
      |  ROUND(EXP(CAST(-SUM(term) AS DOUBLE) / COUNT(*)), 6) AS ppl
      |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val model = lmMemo.getOrElseUpdate(dir + "#3",
      graft.ext.LangModel.train(docs, "doc_id", "text", n = 3))
    graft.ext.LangModel.score(docs, model, "doc_id", "text", alpha = 0.1)
      .ordered("doc_id")
  }

  // X27c — the CCNet head/middle/tail perplexity split (§4.3 of the
  // recipe): tercile thresholds from ONE percentile agg over the
  // 6-rounded ppl scores (a5 pins percentile parity), labels by CASE.
  // Counts per bucket + ppl band edges, hash-exact.
  q("x27c_ccnet_split",
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      |big AS (
      |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
      |  FROM toks, UNNEST(range(1, len(t))) AS g(i)),
      |uni AS (SELECT w1, COUNT(*)::DOUBLE AS c1 FROM big GROUP BY 1),
      |bi AS (SELECT w1, w2, COUNT(*)::DOUBLE AS c12 FROM big GROUP BY 1, 2),
      |v AS (SELECT COUNT(DISTINCT w)::DOUBLE AS vsz
      |      FROM (SELECT UNNEST(t) AS w FROM toks)),
      |terms AS (
      |  SELECT b.doc_id,
      |    CAST(ROUND(LN((bi.c12 + 0.1) / (uni.c1 + 0.1 * v.vsz)), 9)
      |         AS DECIMAL(28,10)) AS term
      |  FROM big b JOIN bi ON b.w1 = bi.w1 AND b.w2 = bi.w2
      |             JOIN uni ON b.w1 = uni.w1
      |             CROSS JOIN v),
      |scored AS (
      |  SELECT doc_id,
      |    ROUND(EXP(CAST(-SUM(term) AS DOUBLE) / COUNT(*)), 6) AS ppl
      |  FROM terms GROUP BY doc_id),
      |cuts AS (
      |  SELECT quantile_cont(ppl, CAST(1 AS DOUBLE)/3) AS t_head,
      |         quantile_cont(ppl, 1 - CAST(1 AS DOUBLE)/3) AS t_tail
      |  FROM scored),
      |labeled AS (
      |  SELECT d.doc_id, s.ppl,
      |    CASE WHEN s.ppl IS NULL THEN 'unscored'
      |         WHEN s.ppl <= c.t_head THEN 'head'
      |         WHEN s.ppl > c.t_tail THEN 'tail'
      |         ELSE 'middle' END AS bucket
      |  FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
      |  CROSS JOIN cuts c)
      |SELECT bucket, COUNT(*) AS n,
      |  ROUND(MIN(ppl), 6) AS min_ppl, ROUND(MAX(ppl), 6) AS max_ppl
      |FROM labeled GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    graft.ext.LangModel.perplexitySplitScored(
        docs.select(col("doc_id")), lmScored(s, dir), "doc_id")
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        round(min(col("ppl")), 6).as("min_ppl"),
        round(max(col("ppl")), 6).as("max_ppl"))
      .ordered("bucket")
  }

  // X28 — BM25 top-k lexical retrieval over the inverted postings
  // index: Lucene-form idf, Robertson k1=1.2 b=0.75, per-term
  // contributions decimal-summed so the ranking (and its ties) is
  // engine-independent.
  q("x28_bm25_topk",
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      |words AS (SELECT doc_id, UNNEST(t) AS term FROM toks),
      |dl AS (SELECT doc_id, COUNT(*)::DOUBLE AS dl FROM words GROUP BY 1),
      |stats AS (SELECT COUNT(*)::DOUBLE AS n_docs, AVG(dl) AS avgdl FROM dl),
      |tf AS (
      |  SELECT doc_id, term, COUNT(*)::DOUBLE AS tf FROM words
      |  WHERE term IN ('data', 'dup', 'spark') GROUP BY 1, 2),
      |dfreq AS (SELECT term, COUNT(*)::DOUBLE AS df FROM tf GROUP BY 1),
      |contrib AS (
      |  SELECT tf.doc_id,
      |    CAST(ROUND(
      |      LN((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0) *
      |      (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)),
      |    9) AS DECIMAL(28,10)) AS c
      |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats)
      |SELECT doc_id, ROUND(CAST(SUM(c) AS DOUBLE), 6) AS score
      |FROM contrib GROUP BY doc_id
      |ORDER BY SUM(c) DESC, doc_id LIMIT 25""".stripMargin) { (s, dir) =>
    // single-query serving off the memoized stored index (filtered-df
    // == index-df identity keeps the oracle unchanged)
    graft.ext.Retrieval.bm25TopKFromIndex(lexIndex(s, dir), "doc_id",
      queryTerms = Seq("data", "dup", "spark"), k = 25)
  }

  // X30 — document-ingest cleaning, batch twin (DocumentIngestSpec pins
  // stream == batch on the same rows): normalized-content dedup keeping
  // the first arrival, token-count gates, Gopher top-2-gram/dup-3-gram
  // gates (UNROUNDED comparisons — both engines compare identical IEEE
  // doubles), PII redaction (identity on this corpus: no digits/@).
  q("x30_clean_ingest",
    """WITH keyed AS (
      |  SELECT doc_id, text,
      |         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS k
      |  FROM documents),
      |first AS (
      |  SELECT doc_id, text FROM keyed
      |  QUALIFY row_number() OVER (PARTITION BY k ORDER BY doc_id) = 1),
      |toks AS (
      |  SELECT doc_id, text, length(text) AS nc,
      |         regexp_split_to_array(trim(lower(text)), '\s+') AS l,
      |         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
      |  FROM first),
      |g2 AS (
      |  SELECT doc_id, l[i] || ' ' || l[i+1] AS g
      |  FROM toks, UNNEST(generate_series(1, len(l)-1)) AS t(i)),
      |c2 AS (SELECT doc_id, g, COUNT(*) AS cnt FROM g2 GROUP BY 1, 2),
      |m2 AS (SELECT doc_id, MAX(cnt) AS top_cnt FROM c2 GROUP BY 1),
      |t2 AS (
      |  SELECT c2.doc_id, m2.top_cnt, MAX(c2.g) AS top_gram
      |  FROM c2 JOIN m2 ON c2.doc_id = m2.doc_id AND c2.cnt = m2.top_cnt
      |  GROUP BY 1, 2),
      |g3 AS (
      |  SELECT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS g
      |  FROM toks, UNNEST(generate_series(1, len(l)-2)) AS t(i)),
      |c3 AS (SELECT doc_id, g, COUNT(*) AS cnt FROM g3 GROUP BY 1, 2),
      |s3 AS (
      |  SELECT doc_id,
      |         SUM(CASE WHEN cnt > 1 THEN cnt * length(g) ELSE 0 END) AS dup_chars
      |  FROM c3 GROUP BY 1)
      |SELECT tk.doc_id, tk.text, tk.n_tokens
      |FROM toks tk
      |JOIN t2 ON t2.doc_id = tk.doc_id
      |LEFT JOIN s3 ON s3.doc_id = tk.doc_id
      |WHERE tk.n_tokens BETWEEN 5 AND 100000
      |  AND t2.top_cnt * length(t2.top_gram) / CAST(tk.nc AS DOUBLE) <= 0.20
      |  AND COALESCE(s3.dup_chars, 0) / CAST(tk.nc AS DOUBLE) <= 0.18
      |ORDER BY tk.doc_id""".stripMargin) { (s, dir) =>
    graft.streaming.DocumentIngest.cleanStream(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("text"),
            to_timestamp(col("doc_id")).as("ts")),
        "doc_id", "text", "ts", lateness = "10 minutes")
      .select(col("doc_id"), col("text"), col("n_tokens").cast("long").as("n_tokens"))
      .ordered("doc_id")
  }

  // X31 — BPE tokenizer induction + corpus tokenization (rows-only: the
  // iterative learner has no SQL twin; BpeSpec pins the distributed
  // merges to a pure-Scala reference of the Sennrich algorithm). The
  // merge list is fitted ONCE per scale dir (offline model fitting, the
  // classifierMemo precedent); the measured query is the corpus-scale
  // part — tokenize via the broadcast segment table and count subwords.
  q("x31_bpe_tokenize") { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val (merges, vocab) = bpeMemo.getOrElseUpdate(dir, {
      val v = graft.ext.Bpe.wordFreqs(docs, "text").cache()
      // batched learner: bit-identical list (BpeSpec pins it), a
      // fraction of the driver rounds
      (graft.ext.Bpe.learnMergesFromVocabBatched(v, 20).merges, v)
    })
    val seg = graft.ext.Bpe.segmentTable(vocab, merges)
    graft.ext.Bpe.tokenize(docs, "doc_id", "text", seg)
      .groupBy("subword").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("subword"))
      .limit(50)
  }

  // X31B — BYTE-LEVEL BPE (GPT-2-style: [[graft.ext.Bpe.byteWords]]
  // regex pre-tokenization + bytes_to_unicode base alphabet — no OOV
  // by construction; the SHARED batched merge loop). Rows-only (the
  // learner has no SQL twin; BpeSpec pins the whole fit bit-exact
  // against a pure-Scala reference on UTF-8-heavy fixtures and the
  // exact round-trip). Output: top-50 subwords of the byte-level
  // tokenized corpus under 20 learned merges — space-folded 'Ġ'
  // symbols and case-preserving spellings ride the hash.
  q("x31b_bpe_bytes") { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val (merges, vocab) = bpeByteMemo.getOrElseUpdate(dir, {
      val v = graft.ext.Bpe.byteWordFreqs(docs, "text").cache()
      (graft.ext.Bpe.learnByteMergesFromVocabBatched(v, 20).merges, v)
    })
    val seg = graft.ext.Bpe.segmentTableBytes(vocab, merges)
    graft.ext.Bpe.tokenizeBytes(docs, "doc_id", "text", seg)
      .groupBy("subword").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("subword"))
      .limit(50)
  }

  // X31C — token IDS + exact detokenization ([[graft.ext.Bpe
  // .tokenizeBytesToIds]] → [[graft.ext.Bpe.detokenizeIds]]): the
  // tensor-ready id stream under the stable GPT-2-shape vocab (bytes =
  // their own ids, merges by rank), round-tripped back to text
  // DISTRIBUTED (one aggregation + one codegen decode — no driver
  // loop). The oracle is the conservation law the id path must
  // preserve: detokenized text == the source text, byte-exact, for
  // every doc — stated in SQL as the documents table itself. A vocab
  // miss (-1), a dropped token, or an order bug breaks the hash.
  q("x31c_bpe_ids_roundtrip",
    """SELECT doc_id, COALESCE(text, '') AS text
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
    val (merges, vocab) = bpeByteMemo.getOrElseUpdate(dir, {
      val v = graft.ext.Bpe.byteWordFreqs(docs, "text").cache()
      (graft.ext.Bpe.learnByteMergesFromVocabBatched(v, 20).merges, v)
    })
    // fused tokenizer kernel — row-exact twin of the segment-table
    // join path (BpeSpec pin); no vocab-sized broadcast
    val toks = graft.ext.Bpe.tokenizeBytesToIdsFused(docs, "doc_id", "text", merges)
    val detok = graft.ext.Bpe.detokenizeIds(toks, "doc_id", merges)
    // an empty-text doc emits no tokens and so no detok row — restore
    // it as the empty string (the conservation law covers it too)
    docs.select(col("doc_id"))
      .join(detok, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .ordered("doc_id")
  }

  // X31D — SPECIAL-TOKEN round-trip ([[graft.ext.Bpe
  // .tokenizeBytesToIdsWithSpecials]] → [[detokenizeIdsWithSpecials]]):
  // documents wrapped in HF added_tokens-style specials — bos + a
  // MID-TEXT separator + eot — tokenized with the specials ATOMIC
  // (each occurrence one token with the declared id) and round-tripped
  // back. Oracle = the constructed text itself (the conservation law,
  // x31c's shape) PLUS the atomicity witness: n_special counts tokens
  // with special ids, exactly 3 per doc — if the specials fell through
  // to byte-level tokenization the round-trip would still pass (ASCII
  // decodes identically), but n_special would read 0. A torn UTF-8 run
  // at a special boundary, a non-atomic match, or a detok splice bug
  // each break text or count.
  q("x31d_special_tokens_roundtrip",
    """SELECT doc_id,
      |  '<|graftbos|>' || COALESCE(text, '') || '<|graftsep|>'
      |    || substr(COALESCE(text, ''), 1, 10) || '<|grafteot|>' AS text,
      |  CAST(3 AS BIGINT) AS n_special
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
    val (merges, vocab) = bpeByteMemo.getOrElseUpdate(dir, {
      val v = graft.ext.Bpe.byteWordFreqs(docs, "text").cache()
      (graft.ext.Bpe.learnByteMergesFromVocabBatched(v, 20).merges, v)
    })
    val specials = Seq("<|graftbos|>" -> 500000, "<|graftsep|>" -> 500001,
      "<|grafteot|>" -> 500002)
    val wrapped = docs.select(col("doc_id"),
      concat(lit("<|graftbos|>"), col("text"), lit("<|graftsep|>"),
        substring(col("text"), 1, 10), lit("<|grafteot|>")).as("text"))
    // fused specials-aware tokenizer kernel — no corpus-sized
    // segment-table broadcast; the substr piece's cut words are OOV
    // and segment differently from the join path, but the declared
    // output is invariant to segmentation (detok is byte-exact for any
    // merge-product stream and ordinary ids never reach the special
    // range) — BpeSpec pins both laws on an OOV corpus
    val toks = graft.ext.Bpe.tokenizeBytesToIdsWithSpecialsFused(
      wrapped, "doc_id", "text", merges, graft.ext.Bpe.byteVocab(merges), specials)
    val nSpec = toks.filter(col("token_id") >= 500000)
      .groupBy("doc_id").agg(count(lit(1)).as("n_special"))
    graft.ext.Bpe.detokenizeIdsWithSpecials(toks, "doc_id",
        graft.ext.Bpe.byteVocab(merges), specials)
      .join(nSpec, Seq("doc_id"))
      .select(col("doc_id"), col("text"), col("n_special"))
      .ordered("doc_id")
  }

  // X90 — the training-export LAST MILE composed end to end (rows-only
  // — the BPE token counts have no SQL twin; every stage is
  // individually oracle- or spec-gated): documents → byte-level BPE
  // token ids (x31b/x31c machinery) → per-doc token counts → a short-doc
  // quality floor → deterministic shard layout + parquet export with
  // the checksummed MANIFEST ([[graft.ext.Export.writeShards]]) → the
  // audit a loader runs ([[graft.ext.Export.auditShards]]) folded into
  // the output as a must-be-true column. Output = the manifest itself
  // (shard, n_docs, n_tokens, checksum) — deterministic given the
  // learned tokenizer, rows ∝ corpus/tokensPerShard (linear in SF);
  // any nondeterminism in the chain (layout, checksum, audit) flips
  // the dump-to-dump comparison the driver's rows-only protocol makes.
  q("x90_training_export") { (s, dir) =>
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
    val (merges, vocab) = bpeByteMemo.getOrElseUpdate(dir, {
      val v = graft.ext.Bpe.byteWordFreqs(docs, "text").cache()
      (graft.ext.Bpe.learnByteMergesFromVocabBatched(v, 20).merges, v)
    })
    // token COUNTS as a pure column kernel (no explode/join/agg at
    // all — BpeSpec pins equality with the materialized path)
    val counted = graft.ext.Bpe.tokenCountsBytesFused(docs, "doc_id", "text", merges)
      .filter(col("ntok") >= 10) // the short-doc quality floor
    val out = trainingExportDirMemo.getOrElseUpdate(dir,
      java.nio.file.Files.createTempDirectory("graft-trainexp").toString)
    val manifest = graft.ext.Export.writeShards(counted, "doc_id", "ntok",
      out, tokensPerShard = 16384)
    val auditClean = graft.ext.Export
      .auditShards(s, out, "doc_id", "ntok").isEmpty
    manifest.withColumn("audit_clean", lit(auditClean)).ordered("shard")
  }

  // X91 — MATERIALIZED packed training sequences ([[graft.ext.Packing
  // .packTokenIds]] over [[graft.ext.Bpe.tokenizeBytesToIds]]'s
  // stream + the x18 packContiguous placement): the tensor the loader
  // reads — fixed 256-token sequences, docs contiguous. Rows-only
  // (ids have no SQL twin; PackingSpec pins the conservation law —
  // flattened sequences == the token stream in layout order — and the
  // exact-length invariant). Output: one row per sequence with its
  // length and an order-sensitive id checksum; any packing bug (a
  // dropped token, a shifted boundary, an order flip) moves the hash.
  q("x91_packed_sequences") { (s, dir) =>
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
    val (merges, vocab) = bpeByteMemo.getOrElseUpdate(dir, {
      val v = graft.ext.Bpe.byteWordFreqs(docs, "text").cache()
      (graft.ext.Bpe.learnByteMergesFromVocabBatched(v, 20).merges, v)
    })
    // fused tokenizer + count kernels (BpeSpec-pinned row-exact twins
    // of the segment-table join path; counts equal toks.groupBy.count)
    val toks = graft.ext.Bpe.tokenizeBytesToIdsFused(docs, "doc_id", "text", merges)
    val counts = graft.ext.Bpe.tokenCountsBytesFused(docs, "doc_id", "text", merges)
    val packing = graft.ext.Packing.packContiguous(
      counts, "ntok", 256L, Seq(col("doc_id")))
    graft.ext.Packing.packTokenIds(toks, "doc_id", packing, 256L)
      .select(col("seq"), col("n"), xxhash64(col("token_ids")).as("ids_hash"))
      .ordered("seq")
  }

  // X93 — BINARY indexed token shards ([[graft.ext.Export
  // .writeTokenBin]] → [[auditTokenBin]] → [[readTokenBin]]): the
  // mmap-ready .bin/.idx artifact a GPT-style loader consumes, off the
  // real BPE id stream. Rows-only (raw bin bytes have no SQL twin;
  // ExportSpec pins round-trip/tamper): output = the per-shard
  // manifest (docs, tokens, bytes, WRITER-side sha1) with the audit
  // (landed-bytes sha1 recompute) and the positioned-read conservation
  // (Σ tokens fetched through the index == Σ manifest) folded in as
  // must-be-true columns — deterministic given the learned tokenizer,
  // byte-identical across invocations (seeded layout + content-ordered
  // writer + AtomicSink).
  q("x93_token_bin_export") { (s, dir) =>
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
    val (merges, vocab) = bpeByteMemo.getOrElseUpdate(dir, {
      val v = graft.ext.Bpe.byteWordFreqs(docs, "text").cache()
      (graft.ext.Bpe.learnByteMergesFromVocabBatched(v, 20).merges, v)
    })
    // fused tokenizer + count kernels (BpeSpec-pinned row-exact): one
    // kernel pass for the bin write, one pure-column pass for the
    // layout counts — no segment-table broadcast, no count re-tokenize
    val toks = graft.ext.Bpe.tokenizeBytesToIdsFused(docs, "doc_id", "text", merges)
    val out = tokenBinDirMemo.getOrElseUpdate(dir,
      java.nio.file.Files.createTempDirectory("graft-tokbin").toString)
    val manifest = graft.ext.Export.writeTokenBin(toks, "doc_id", out,
      tokensPerShard = 16384,
      docCounts = graft.ext.Bpe.tokenCountsBytesFused(docs, "doc_id", "text", merges))
    // the audit (streams every landed bin) and the positioned-read
    // witness are INDEPENDENT jobs over the final state — overlap them
    // (guide §2.6: the scheduler runs concurrent jobs; the audit's
    // straggler tail backfills with the readback's tasks)
    val auditF = scala.concurrent.Future(
      graft.ext.Export.auditTokenBin(s, out).isEmpty)(
      scala.concurrent.ExecutionContext.global)
    // positioned-read witness on a 1-in-17 slice (the x77 pattern):
    // fetch cost must stay ∝ requested docs, and the fetched token
    // counts must equal the index's claim for exactly those docs —
    // both sums in ONE job over ONE idx scan (the claim rides the
    // read kernel)
    val slice = s.read.parquet(s"$out/idx").filter(col("doc_id") % 17 === 0)
    val rb = graft.ext.Export.readTokenBin(slice, "doc_id", out,
        dtype = "int32", // this invocation's own writeTokenBin default
        claimCol = "n_claimed")
      .agg(coalesce(sum(size(col("token_ids"))), lit(0)).cast("long"),
        coalesce(sum(col("n_claimed")), lit(0L))).head
    val (fetched, claimed) = (rb.getLong(0), rb.getLong(1))
    val auditClean = scala.concurrent.Await.result(
      auditF, scala.concurrent.duration.Duration.Inf)
    manifest.withColumn("audit_clean", lit(auditClean))
      .withColumn("readback_conserved", lit(fetched == claimed && claimed > 0))
      .ordered("shard")
  }
  private val tokenBinDirMemo = scala.collection.concurrent.TrieMap.empty[String, String]

  // X93C — EPOCH-SHUFFLED read plan over the binary export
  // ([[graft.ext.Export.epochShufflePlan]]): a trainer's shuffled
  // epoch as a seeded BLOCK permutation (fixed token windows,
  // within-block order preserved) so the fetch still coalesces to
  // ~one IO per block instead of one per document. Rows-only
  // (ExportSpec pins the permutation/coalescing laws); output = one
  // row per shard (docs, blocks) with the witnesses folded in:
  // epoch_pos is a DENSE permutation, the same seed replays
  // identically, a different seed visits differently, and the fetch
  // THROUGH the shuffled plan conserves the index's token claim.
  q("x93c_epoch_shuffle") { (s, dir) =>
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
    val toks = docs.select(col("doc_id"),
        posexplode(filter(split(col("text"), "\\s+"), w => w =!= ""))
          .as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos"), lit(0).as("subpos"),
        length(col("w")).cast("int").as("token_id"))
    val out = epochBinDirMemo.getOrElseUpdate(dir,
      java.nio.file.Files.createTempDirectory("graft-epochbin").toString)
    // counts as a pure column on the base frame (docs with zero words
    // are absent from the exploded token stream — filter to match)
    val wsCounts = docs.select(col("doc_id"),
        size(filter(split(col("text"), "\\s+"), w => w =!= "")).cast("long").as("ntok"))
      .filter(col("ntok") > 0)
    graft.ext.Export.writeTokenBin(toks, "doc_id", out, tokensPerShard = 8192,
      docCounts = wsCounts)
    val idx = s.read.parquet(s"$out/idx").localCheckpoint(true)
    def plan(seed: Long) = graft.ext.Export
      .epochShufflePlan(idx, blockTokens = 2048, epochSeed = seed)
    val p7 = plan(7L).localCheckpoint(true)
    // witness-job folds (same checks, fewer driver round-trips): doc
    // count + token claim in ONE aggregation over the checkpointed
    // index; the same-seed and cross-seed comparisons in ONE job via a
    // three-way join (a mismatch count of 0 ⇔ the old isEmpty test)
    val idxStats = idx.agg(count(lit(1)),
      coalesce(sum(col("n_tokens")), lit(0L))).head
    val nDocs = idxStats.getLong(0)
    val claimed = idxStats.getLong(1)
    val dense = p7.select(countDistinct(col("epoch_pos")),
      max(col("epoch_pos"))).head
    val denseOk = dense.getLong(0) == nDocs && dense.getLong(1) == nDocs - 1
    val cmp = p7.select(col("doc_id"), col("epoch_pos"))
      .join(plan(7L).select(col("doc_id"), col("epoch_pos").as("p2")), "doc_id")
      .join(plan(11L).select(col("doc_id"), col("epoch_pos").as("p3")), "doc_id")
      .agg(
        coalesce(sum(when(col("epoch_pos") =!= col("p2"), 1L)
          .otherwise(0L)), lit(0L)),
        coalesce(sum(when(col("epoch_pos") =!= col("p3"), 1L)
          .otherwise(0L)), lit(0L))).head
    val deterministic = cmp.getLong(0) == 0
    val divergent = cmp.getLong(1) > 0
    val fetched = graft.ext.Export.readTokenBin(p7, "doc_id", out,
        dtype = "int32") // this invocation's own writeTokenBin default
      .agg(coalesce(sum(size(col("token_ids"))), lit(0)).cast("long"))
      .head.getLong(0)
    p7.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("block")).as("n_blocks"))
      .withColumn("dense_permutation", lit(denseOk))
      .withColumn("same_seed_identical", lit(deterministic))
      .withColumn("cross_seed_divergent", lit(divergent))
      .withColumn("readback_conserved", lit(fetched == claimed && claimed > 0))
      .ordered("shard")
  }
  private val epochBinDirMemo = scala.collection.concurrent.TrieMap.empty[String, String]

  // X93B — INCREMENTAL binary export ([[graft.ext.Export
  // .appendTokenBin]]): the daily-batch last mile — base export on a
  // third of the corpus, then TWO append batches, off the real BPE id
  // stream. Rows-only (x93's rationale; ExportSpec pins file identity
  // and replay): output = the FOLDED per-shard manifest with the
  // must-be-true witnesses — audit clean over the union,
  // untouched-shard sha1s carried unchanged from the base manifest,
  // positioned-read conservation through the unioned idx, and a
  // replayed batch appending NOTHING (the ingest replay discipline).
  // Fresh directory per invocation: the append path is stateful by
  // design, so the gate builds its own history every run.
  q("x93b_token_bin_append") { (s, dir) =>
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
    val (merges, vocab) = bpeByteMemo.getOrElseUpdate(dir, {
      val v = graft.ext.Bpe.byteWordFreqs(docs, "text").cache()
      (graft.ext.Bpe.learnByteMergesFromVocabBatched(v, 20).merges, v)
    })
    // one FUSED tokenize pass (BpeSpec-pinned row-exact) serves the
    // base write + both appends + replay
    val toks = graft.ext.Bpe
      .tokenizeBytesToIdsFused(docs, "doc_id", "text", merges)
      .localCheckpoint(true)
    val out = java.nio.file.Files
      .createTempDirectory("graft-tokbin-app").toString
    val base = graft.ext.Export.writeTokenBin(
      toks.filter(col("doc_id") % 3 === 0), "doc_id", out, 16384)
    val baseShas = base.select(col("shard"), col("sha1"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val d1 = graft.ext.Export.appendTokenBin(
      toks.filter(col("doc_id") % 3 === 1), "doc_id", out, 16384)
    val d2 = graft.ext.Export.appendTokenBin(
      toks.filter(col("doc_id") % 3 === 2), "doc_id", out, 16384)
    val touched = (d1.select("shard").collect() ++ d2.select("shard").collect())
      .map(_.getLong(0)).toSet
    // ONE collect of the shard-count-sized folded manifest serves the
    // sha witness, the readback dtype, AND the declared output's base
    // frame (as local rows) — formerly a checkpoint job + a collect +
    // a re-read
    val foldedDf = s.read.parquet(s"$out/_manifest")
    val foldedRows = foldedDf.collect()
    val folded = s.createDataFrame(
      java.util.Arrays.asList(foldedRows: _*), foldedDf.schema)
    def fld(r: org.apache.spark.sql.Row, n: String) = r.fieldIndex(n)
    val foldedShas = foldedRows
      .map(r => r.getLong(fld(r, "shard")) -> r.getString(fld(r, "sha1"))).toMap
    val untouchedOk = baseShas.forall { case (sh, sha) =>
      touched.contains(sh) || foldedShas.get(sh).contains(sha) }
    // audit and positioned-read witness are independent jobs over the
    // final state — overlap them (guide §2.6, the x93 note)
    val auditF = scala.concurrent.Future(
      graft.ext.Export.auditTokenBin(s, out).isEmpty)(
      scala.concurrent.ExecutionContext.global)
    val slice = s.read.parquet(s"$out/idx").filter(col("doc_id") % 17 === 0)
    // fetched + claimed in ONE job over ONE idx scan (the x93 shape)
    val rb = graft.ext.Export.readTokenBin(slice, "doc_id", out,
        dtype = foldedRows.head.getString(fld(foldedRows.head, "dtype")),
        claimCol = "n_claimed")
      .agg(coalesce(sum(size(col("token_ids"))), lit(0)).cast("long"),
        coalesce(sum(col("n_claimed")), lit(0L))).head
    val (fetched, claimed) = (rb.getLong(0), rb.getLong(1))
    val auditClean = scala.concurrent.Await.result(
      auditF, scala.concurrent.duration.Duration.Inf)
    val replayNoop = graft.ext.Export.appendTokenBin(
      toks.filter(col("doc_id") % 3 === 2), "doc_id", out, 16384).isEmpty
    folded.withColumn("audit_clean", lit(auditClean))
      .withColumn("untouched_identical", lit(untouchedOk))
      .withColumn("readback_conserved", lit(fetched == claimed && claimed > 0))
      .withColumn("replay_noop", lit(replayNoop))
      .ordered("shard")
  }

  // X91B — packed sequences ORACLE-EXACT (the r17 verdict's #6: the
  // placement is deterministic, so DuckDB replays [[graft.ext.Packing
  // .packContiguous]]'s cumulative layout + [[packTokenIds]]'s
  // global-position → sequence math with a window and integer
  // division). Token stream = whitespace tokens with id = char length
  // (a per-token integer both engines compute identically — the gate
  // is the PLACEMENT, not id semantics; the real-BPE composition stays
  // gated by x91/x31c). Output per sequence: length + an
  // order-WEIGHTED id checksum (Σ id·k over in-sequence rank k) — a
  // dropped token, shifted boundary, or order flip all move it.
  q("x91b_packed_placement_oracle",
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(COALESCE(text, ''), '\s+'),
      |      w -> w <> '') AS ws
      |  FROM documents),
      |placed AS (
      |  SELECT doc_id, ws,
      |    CAST(SUM(len(ws)) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      - len(ws) AS tok_start
      |  FROM toks WHERE len(ws) > 0),
      |tok AS (
      |  SELECT tok_start,
      |    UNNEST(range(0, len(ws))) AS j,
      |    UNNEST(list_transform(range(1, len(ws) + 1),
      |      i -> length(ws[i]))) AS tid
      |  FROM placed),
      |ranked AS (
      |  SELECT CAST(FLOOR((tok_start + j) / 64) AS BIGINT) AS seq,
      |    CAST(tid AS BIGINT) AS tid,
      |    ROW_NUMBER() OVER (PARTITION BY CAST(FLOOR((tok_start + j) / 64) AS BIGINT)
      |      ORDER BY tok_start + j) AS k
      |  FROM tok),
      |docspan AS (
      |  SELECT tok_start,
      |    UNNEST(range(CAST(FLOOR(tok_start / 64) AS BIGINT),
      |      CAST(FLOOR((tok_start + len(ws) - 1) / 64) AS BIGINT) + 1)) AS seq
      |  FROM placed),
      |bnd AS (
      |  SELECT seq, COUNT(*) AS n_docs,
      |    CAST(SUM(GREATEST(tok_start - seq * 64, 0)) AS BIGINT) AS bsum
      |  FROM docspan GROUP BY seq)
      |SELECT r.seq, r.n, r.ids_csum, b.n_docs, b.bsum FROM (
      |  SELECT seq, COUNT(*) AS n, CAST(SUM(tid * k) AS BIGINT) AS ids_csum
      |  FROM ranked GROUP BY seq) r
      |JOIN bnd b USING (seq) ORDER BY seq""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
    val words = docs.select(col("doc_id"),
        posexplode(filter(split(col("text"), "\\s+"), w => w =!= ""))
          .as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos"), lit(0).as("subpos"),
        length(col("w")).cast("int").as("token_id"))
    val counts = words.groupBy("doc_id").agg(count(lit(1)).as("ntok"))
    // the placement feeds BOTH the boundaries branch and packTokenIds —
    // lazy checkpoint so the cumsum layout runs once inside the final
    // action instead of once per branch (corpus-sized work at scale;
    // lazy = no extra materialization job at gate scale)
    val packing = graft.ext.Packing.packContiguous(
        counts, "ntok", 64L, Seq(col("doc_id")))
      .localCheckpoint(false)
    val bounds = graft.ext.Packing.sequenceDocBoundaries(packing, "doc_id", 64L)
      .select(col("seq"), col("n_docs"),
        aggregate(col("boundaries"), lit(0L), (a, x) => a + x).as("bsum"))
    graft.ext.Packing.packTokenIds(words, "doc_id", packing, 64L)
      .select(col("seq"), col("n").cast("long").as("n"),
        aggregate(
          transform(col("token_ids"),
            (x, i) => x.cast("long") * (i.cast("long") + 1)),
          lit(0L), (a, x) => a + x).as("ids_csum"))
      .join(bounds, Seq("seq"))
      .ordered("seq")
  }

  // X48 — unigram-LM (SentencePiece-style) tokenizer induction +
  // application, the second tokenizer family next to BPE (rows-only:
  // the EM fit has no SQL twin; UnigramLmSpec pins the whole fit
  // bit-exact against an independent pure-Scala reference and proves
  // partition-order invariance). Output: the 50 most frequent pieces
  // of the tokenized corpus under a 300-piece model — deterministic
  // because the fit is (exact integer counts, total tie rules).
  q("x48_unigram_tokenize") { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val (model, vocab) = unigramMemo.getOrElseUpdate(dir, {
      val v = graft.ext.Bpe.wordFreqs(docs, "text").cache()
      (graft.ext.UnigramLm.fit(v, targetSize = 300, seedSize = 1000,
        maxPieceLen = 6), v)
    })
    val seg = graft.ext.UnigramLm.segmentTable(vocab, model)
    graft.ext.UnigramLm.tokenize(docs, "doc_id", "text", seg, model)
      .groupBy("subword").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("subword"))
      .limit(50)
  }

  // X29 — trained quality classifier (rows-only: the GD training loop
  // has no SQL twin; QualityClassifierSpec proves holdout accuracy ≥0.8
  // and partition-order-invariant training). Label = a token-count
  // comparison (the corpus's lang column is text-independent, hence
  // unlearnable); train on the %5≠0 split, score the held-out fifth —
  // the GPT-3-recipe "classifier filter" stage end to end.
  q("x29_quality_classifier") { (s, dir) =>
    val t = split(trim(lower(col("text"))), "\\s+")
    val docs = Tables.documents(s, dir).withColumn("y",
      (size(filter(t, x => x === "data")) > size(filter(t, x => x === "the")))
        .cast("int"))
    // model trained ONCE per scale dir (the ivfIndex memo precedent:
    // training is amortized setup — in production the model is fitted
    // offline; the per-query work is the corpus-wide scoring join)
    val m = classifierMemo.getOrElseUpdate(dir,
      graft.ext.QualityClassifier.train(
        docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", "y",
        dim = 1024, iters = 60, lr = 200.0, lrIntercept = 1.0))
    graft.ext.QualityClassifier.score(
        docs.filter(col("doc_id") % 5 === 0), m, "doc_id", "text")
      .select(col("doc_id"), round(col("score"), 6).as("score"))
      .ordered("doc_id")
  }

  // X29b — classifier INFERENCE oracle (the x36c/x26b precedent:
  // oracle the deterministic stage of an engine-specific pipeline).
  // x29's trained scorer has no SQL twin (GD training + xxhash64
  // features), but the scoring math does: hash tokens into the
  // portable md5-prefix bucket space, take weights as a pinned
  // closed-form function of the hex prefix, and run the EXACT score
  // discipline (L1-normalized counts, 9-decimal rounded margin terms,
  // exact decimal sum, sigmoid) — DuckDB re-derives it end to end.
  q("x29b_score_oracle",
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents),
      |w AS (SELECT doc_id, UNNEST(t) AS tok FROM toks),
      |n AS (SELECT doc_id, COUNT(*)::DOUBLE AS nn FROM w GROUP BY 1),
      |b AS (SELECT doc_id, substr(md5(tok), 1, 4) AS bucket, COUNT(*)::DOUBLE AS c
      |      FROM w GROUP BY 1, 2),
      |t AS (
      |  SELECT b.doc_id,
      |    CAST(ROUND(((ascii(substr(bucket, 1, 1)) * 31
      |                 + ascii(substr(bucket, 2, 1)) * 7) % 13 - 6) / 8.0
      |               * c / nn, 9) AS DECIMAL(28,10)) AS term
      |  FROM b JOIN n USING (doc_id))
      |SELECT doc_id,
      |  ROUND(1.0 / (1.0 + EXP(-(CAST(SUM(term) AS DOUBLE) + (-0.25)))), 6) AS score
      |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val wOf = (b: Column) =>
      ((ascii(substring(b, 1, 1)) * 31 + ascii(substring(b, 2, 1)) * 7) % 13 - 6) / lit(8.0)
    graft.ext.QualityClassifier.scorePortable(
        Tables.documents(s, dir), "doc_id", "text", wOf, intercept = -0.25)
      .select(col("doc_id"), round(col("score"), 6).as("score"))
      .ordered("doc_id")
  }

  // X32 — hybrid retrieval: BM25 candidates for the query terms fused
  // with brute-force cosine candidates for the query vector (vec_id 0;
  // doc_id and vec_id share the corpus id space) by reciprocal rank,
  // k0 = 60. Rank lists, per-list contributions, and the decimal fusion
  // sum are all engine-portable, so the oracle runs the identical
  // formulation end to end — candidate generation included.
  q("x32_hybrid_rrf",
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      |words AS (SELECT doc_id, UNNEST(t) AS term FROM toks),
      |dl AS (SELECT doc_id, COUNT(*)::DOUBLE AS dl FROM words GROUP BY 1),
      |stats AS (SELECT COUNT(*)::DOUBLE AS n_docs, AVG(dl) AS avgdl FROM dl),
      |tf AS (
      |  SELECT doc_id, term, COUNT(*)::DOUBLE AS tf FROM words
      |  WHERE term IN ('data', 'dup', 'spark') GROUP BY 1, 2),
      |dfreq AS (SELECT term, COUNT(*)::DOUBLE AS df FROM tf GROUP BY 1),
      |contrib AS (
      |  SELECT tf.doc_id,
      |    CAST(ROUND(
      |      LN((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0) *
      |      (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)),
      |    9) AS DECIMAL(28,10)) AS c
      |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
      |lex AS (
      |  SELECT doc_id, rnk FROM (
      |    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY SUM(c) DESC, doc_id) AS rnk
      |    FROM contrib GROUP BY doc_id)
      |  WHERE rnk <= 50),
      |qv AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
      |cosd AS (
      |  SELECT c.vec_id AS doc_id,
      |    list_sum(list_transform(range(1, len(qv.embedding) + 1),
      |      i -> CAST(qv.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(qv.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
      |    AS cos
      |  FROM embeddings c CROSS JOIN qv WHERE c.vec_id <> 0),
      |sem AS (
      |  SELECT doc_id, rnk FROM (
      |    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS rnk
      |    FROM cosd)
      |  WHERE rnk <= 50),
      |fused AS (
      |  SELECT doc_id, CAST(ROUND(CAST(1.0 AS DOUBLE) / (60 + rnk), 9)
      |                      AS DECIMAL(28,10)) AS c
      |  FROM (SELECT * FROM lex UNION ALL SELECT * FROM sem))
      |SELECT doc_id, ROUND(CAST(SUM(c) AS DOUBLE), 6) AS rrf
      |FROM fused GROUP BY doc_id
      |ORDER BY SUM(c) DESC, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    val ann = graft.ext.Similarity.bruteForceTopK(
      emb.filter(col("vec_id") === 0), emb, k = 50)
    // lexical side off the memoized stored index (inline bm25's
    // filtered df == index df for the query terms, so the oracle is
    // unchanged; the corpus text is not re-exploded per query)
    graft.ext.Retrieval.hybridTopKFromIndex(lexIndex(s, dir), "doc_id",
      Seq("data", "dup", "spark"), ann, k = 20, perList = 50)
  }

  // X38 — BATCHED multi-query BM25: a 25-query eval battery (every 20th
  // doc's first 4 tokens play its query) ranked top-5 each in ONE plan —
  // postings ⋈ (query_id, term), rank partitioned by query — not a
  // driver loop. RetrievalSpec pins bm25TopKBatch ≡ the per-query
  // bm25TopK loop; this gate pins the values against DuckDB.
  q("x38_bm25_batch",
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      |words AS (SELECT doc_id, UNNEST(t) AS term FROM toks),
      |dl AS (SELECT doc_id, COUNT(*)::DOUBLE AS dl FROM words GROUP BY 1),
      |stats AS (SELECT COUNT(*)::DOUBLE AS n_docs, AVG(dl) AS avgdl FROM dl),
      |tf AS (SELECT doc_id, term, COUNT(*)::DOUBLE AS tf FROM words GROUP BY 1, 2),
      |dfreq AS (SELECT term, COUNT(*)::DOUBLE AS df FROM tf GROUP BY 1),
      |qt AS (
      |  SELECT DISTINCT doc_id AS query_id, UNNEST(t[1:4]) AS term
      |  FROM toks WHERE doc_id % 20 = 0),
      |contrib AS (
      |  SELECT qt.query_id, tf.doc_id,
      |    CAST(ROUND(
      |      LN((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0) *
      |      (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)),
      |    9) AS DECIMAL(28,10)) AS c
      |  FROM tf JOIN qt USING (term) JOIN dfreq USING (term)
      |       JOIN dl USING (doc_id) CROSS JOIN stats),
      |scored AS (
      |  SELECT query_id, doc_id, SUM(c) AS sc FROM contrib GROUP BY 1, 2)
      |SELECT query_id, doc_id, ROUND(CAST(sc AS DOUBLE), 6) AS score, rk
      |FROM (SELECT query_id, doc_id, sc,
      |        ROW_NUMBER() OVER (PARTITION BY query_id
      |          ORDER BY sc DESC, doc_id) AS rk
      |      FROM scored)
      |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val queries = docs.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("query_id"),
        explode(slice(split(trim(col("text")), "\\s+"), 1, 4)).as("term"))
    graft.ext.Retrieval.bm25TopKBatchFromIndex(lexIndex(s, dir), "doc_id",
        queries, k = 5)
      .ordered("query_id", "rk")
  }

  // X84 — HARD-NEGATIVE MINING ([[graft.ext.Retrieval.hardNegatives]]):
  // the x38 query-by-document battery's BM25 candidates, fetched 8
  // deep, minus each query's normalized-dup CLUSTER (the x1b/x30 key
  // — a disguised copy of the positive can never be mislabeled
  // negative) and minus the query doc itself, re-ranked 1..5 — the
  // DPR-style training-pair recipe as one distributed plan. The oracle
  // composes the x38 scoring consensus with the cluster anti-join;
  // a candidate leaking from the positive set, a wrong fetch depth, or
  // a re-rank off-by-one breaks the hash.
  q("x84_hard_negatives",
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      |words AS (SELECT doc_id, UNNEST(t) AS term FROM toks),
      |dl AS (SELECT doc_id, COUNT(*)::DOUBLE AS dl FROM words GROUP BY 1),
      |stats AS (SELECT COUNT(*)::DOUBLE AS n_docs, AVG(dl) AS avgdl FROM dl),
      |tf AS (SELECT doc_id, term, COUNT(*)::DOUBLE AS tf FROM words GROUP BY 1, 2),
      |dfreq AS (SELECT term, COUNT(*)::DOUBLE AS df FROM tf GROUP BY 1),
      |qt AS (
      |  SELECT DISTINCT doc_id AS query_id, UNNEST(t[1:4]) AS term
      |  FROM toks WHERE doc_id % 20 = 0),
      |contrib AS (
      |  SELECT qt.query_id, tf.doc_id,
      |    CAST(ROUND(
      |      LN((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0) *
      |      (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)),
      |    9) AS DECIMAL(28,10)) AS c
      |  FROM tf JOIN qt USING (term) JOIN dfreq USING (term)
      |       JOIN dl USING (doc_id) CROSS JOIN stats),
      |scored AS (
      |  SELECT query_id, doc_id, SUM(c) AS sc FROM contrib GROUP BY 1, 2),
      |cand AS (
      |  SELECT query_id, doc_id, sc,
      |         ROW_NUMBER() OVER (PARTITION BY query_id
      |           ORDER BY sc DESC, doc_id) AS rk
      |  FROM scored QUALIFY rk <= 8),
      |keyed AS (
      |  SELECT doc_id,
      |         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS ck
      |  FROM documents),
      |pos AS (
      |  SELECT q.doc_id AS query_id, d.doc_id AS pos_id
      |  FROM keyed q JOIN keyed d USING (ck) WHERE q.doc_id % 20 = 0),
      |neg AS (
      |  SELECT query_id, doc_id, sc, rk FROM cand
      |  WHERE doc_id <> query_id AND NOT EXISTS (
      |    SELECT 1 FROM pos
      |    WHERE pos.query_id = cand.query_id AND pos.pos_id = cand.doc_id))
      |SELECT query_id, doc_id, ROUND(CAST(sc AS DOUBLE), 6) AS score, neg_rank
      |FROM (SELECT query_id, doc_id, sc,
      |        ROW_NUMBER() OVER (PARTITION BY query_id
      |          ORDER BY rk) AS neg_rank FROM neg)
      |WHERE neg_rank <= 5 ORDER BY query_id, neg_rank""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val queries = docs.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("query_id"),
        explode(slice(split(trim(col("text")), "\\s+"), 1, 4)).as("term"))
    val ck = md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")))
    val keyed = docs.select(col("doc_id"), ck.as("ck"))
    val positives = keyed.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("query_id"), col("ck"))
      .join(keyed, "ck")
      .select(col("query_id"), col("doc_id").as("pos_id"))
    graft.ext.Retrieval.hardNegatives(lexIndex(s, dir), "doc_id",
        queries, positives, k = 5, fetchDepth = 8)
      .ordered("query_id", "neg_rank")
  }

  // X38b — BATCHED hybrid retrieval: the same 25-query battery fused
  // with each query's brute-force cosine candidates (its embedding
  // twin), RRF per query, top-10 each — one plan for lexical ranking,
  // semantic ranking, AND fusion across the whole battery.
  q("x38b_hybrid_batch",
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      |words AS (SELECT doc_id, UNNEST(t) AS term FROM toks),
      |dl AS (SELECT doc_id, COUNT(*)::DOUBLE AS dl FROM words GROUP BY 1),
      |stats AS (SELECT COUNT(*)::DOUBLE AS n_docs, AVG(dl) AS avgdl FROM dl),
      |tf AS (SELECT doc_id, term, COUNT(*)::DOUBLE AS tf FROM words GROUP BY 1, 2),
      |dfreq AS (SELECT term, COUNT(*)::DOUBLE AS df FROM tf GROUP BY 1),
      |qt AS (
      |  SELECT DISTINCT doc_id AS query_id, UNNEST(t[1:4]) AS term
      |  FROM toks WHERE doc_id % 20 = 0),
      |contrib AS (
      |  SELECT qt.query_id, tf.doc_id,
      |    CAST(ROUND(
      |      LN((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0) *
      |      (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)),
      |    9) AS DECIMAL(28,10)) AS c
      |  FROM tf JOIN qt USING (term) JOIN dfreq USING (term)
      |       JOIN dl USING (doc_id) CROSS JOIN stats),
      |scored AS (
      |  SELECT query_id, doc_id, SUM(c) AS sc FROM contrib GROUP BY 1, 2),
      |lex AS (
      |  SELECT query_id, doc_id, rnk FROM (
      |    SELECT query_id, doc_id,
      |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sc DESC, doc_id) AS rnk
      |    FROM scored) WHERE rnk <= 20),
      |qv AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id % 20 = 0),
      |cosd AS (
      |  SELECT qv.query_id, c.vec_id AS doc_id,
      |    list_sum(list_transform(range(1, len(qv.embedding) + 1),
      |      i -> CAST(qv.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(qv.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
      |    AS cos
      |  FROM embeddings c JOIN qv ON c.vec_id <> qv.query_id),
      |sem AS (
      |  SELECT query_id, doc_id, rnk FROM (
      |    SELECT query_id, doc_id,
      |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, doc_id) AS rnk
      |    FROM cosd) WHERE rnk <= 20),
      |fused AS (
      |  SELECT query_id, doc_id,
      |    CAST(ROUND(CAST(1.0 AS DOUBLE) / (60 + rnk), 9) AS DECIMAL(28,10)) AS c
      |  FROM (SELECT * FROM lex UNION ALL SELECT * FROM sem)),
      |agg AS (SELECT query_id, doc_id, SUM(c) AS rrfd FROM fused GROUP BY 1, 2)
      |SELECT query_id, doc_id, ROUND(CAST(rrfd AS DOUBLE), 6) AS rrf, rk
      |FROM (SELECT query_id, doc_id, rrfd,
      |        ROW_NUMBER() OVER (PARTITION BY query_id
      |          ORDER BY rrfd DESC, doc_id) AS rk
      |      FROM agg)
      |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val emb = Tables.embeddings(s, dir)
    val queries = docs.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("query_id"),
        explode(slice(split(trim(col("text")), "\\s+"), 1, 4)).as("term"))
    val ann = graft.ext.Similarity.bruteForceTopK(
      emb.filter(col("vec_id") % 20 === 0), emb, k = 20)
    graft.ext.Retrieval.hybridTopKBatchFromIndex(lexIndex(s, dir), "doc_id",
        queries, ann, k = 10, perList = 20)
      .ordered("query_id", "rk")
  }

  // X38c — the 100-TB serving shape END-TO-END: the same battery, but
  // every side reads a persisted index structure — lexical candidates
  // off the stored LexIndex, semantic candidates off the stored IVF-PQ
  // layout (coarse probe → partition-pruned ADC over code columns →
  // exact rerank), RRF-fused per query in one plan. Nothing touches
  // corpus text or raw float vectors outside the pruned fetches.
  // Rows-only by design (IVF probe sets are engine-specific);
  // RetrievalSpec pins recall@10 ≥ 0.8 vs the brute-force hybrid and
  // partition pruning on the ADC scan.
  q("x38c_hybrid_stored") { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val (model, _) = pqIndex(s, dir)
    val queries = docs.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("query_id"),
        explode(slice(split(trim(col("text")), "\\s+"), 1, 4)).as("term"))
    val qv = Tables.embeddings(s, dir).filter(col("vec_id") % 20 === 0)
    val ann = graft.ext.Pq.topKIvfPqFromIndex(qv, ivfPqLoaded(s, dir), model,
      k = 20, nprobe = 4, shortlist = 40)
    graft.ext.Retrieval.hybridTopKBatchFromIndex(lexIndex(s, dir), "doc_id",
        queries, ann, k = 10, perList = 20)
      .ordered("query_id", "rk")
  }

  // X40 — epoch-weighted upsampling (LLaMA-style fractional repeat
  // factors): each doc materializes floor(e) copies + one more decided
  // by a seeded per-(doc, copy) draw against the %08x threshold of
  // frac(e)·2^32 — fixed-width hex string compare == numeric compare,
  // so DuckDB replays the identical rule. Epoch values 0.5–3.5 cover
  // sub-1, integer, and fractional regimes; all are exact binary
  // doubles, so decimal-vs-double engine arithmetic cannot diverge.
  q("x40_repeat_weighted",
    s"""WITH e AS (
       |  SELECT doc_id, 0.5 + (doc_id % 5) * 0.75 AS ep FROM documents),
       |x AS (
       |  SELECT doc_id, ep, CAST(FLOOR(ep) AS INT) AS nf,
       |         GREATEST(CAST(CEIL(ep) AS INT) - 1, 0) AS emax FROM e),
       |copies AS (
       |  SELECT doc_id, ep, nf, i AS epoch
       |  FROM x, UNNEST(generate_series(0, emax)) AS t(i))
       |SELECT doc_id, epoch FROM copies
       |WHERE epoch < nf
       |   OR (epoch = nf AND
       |       substr(md5(CAST(doc_id AS VARCHAR) || '#' ||
       |                  CAST(epoch AS VARCHAR) || ':' || '$SplitSeed'), 1, 8)
       |       < printf('%08x',
       |           CAST(FLOOR((ep - FLOOR(ep)) * 4294967296) AS BIGINT)))
       |ORDER BY doc_id, epoch""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val epochs = lit(0.5) + (col("doc_id") % 5).cast("double") * 0.75
    graft.ext.Sampling.repeatWeighted(docs, col("doc_id"), SplitSeed, epochs)
      .select("doc_id", "epoch")
      .ordered("doc_id", "epoch")
  }

  // X41 — corpus snapshot diff (incremental curation): classify keys
  // added / removed / changed / unchanged between two snapshots via
  // content-hash full outer join. The new snapshot is built
  // deterministically from the old: every 13th doc removed, every 7th
  // rewritten, every 11th re-added under a shifted id.
  q("x41_snapshot_diff",
    """WITH oldc AS (
      |  SELECT doc_id, md5(CAST(text AS VARCHAR)) AS h FROM documents),
      |newbase AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 13 <> 0),
      |newadd AS (
      |  SELECT doc_id + 100000 AS doc_id, text FROM documents
      |  WHERE doc_id % 11 = 0),
      |newc AS (
      |  SELECT doc_id, md5(CAST(text AS VARCHAR)) AS h
      |  FROM (SELECT * FROM newbase UNION ALL SELECT * FROM newadd))
      |SELECT doc_id,
      |  CASE WHEN o.h IS NULL THEN 'added'
      |       WHEN n.h IS NULL THEN 'removed'
      |       WHEN o.h <> n.h THEN 'changed'
      |       ELSE 'unchanged' END AS status
      |FROM oldc o FULL OUTER JOIN newc n USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val newBase = docs.filter(col("doc_id") % 13 =!= 0)
      .withColumn("text", when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" v2"))).otherwise(col("text")))
    val newAdd = docs.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    graft.ext.Dedup.snapshotDiff(docs, newBase.unionByName(newAdd),
        "doc_id", Seq("text"))
      .ordered("doc_id")
  }

  // X39 — SEMANTIC decontamination: corpus vectors too close (cosine ≥
  // 0.3) to any held-out probe vector (vec_id % 41 = 0 plays the eval
  // battery, mirroring x21's probe split). Exact grams (x21/x35) miss
  // paraphrased leakage; this is the embedding-space gate a real
  // pipeline layers on top. Probe side broadcast, corpus pass map-only.
  q("x39_semantic_decontam",
    """WITH p AS (SELECT vec_id AS probe_id, embedding FROM embeddings
      |           WHERE vec_id % 41 = 0),
      |c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 41 <> 0),
      |hits AS (
      |  SELECT c.vec_id,
      |    list_sum(list_transform(range(1, len(c.embedding) + 1),
      |      i -> CAST(c.embedding[i] AS DOUBLE) * CAST(p.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(p.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
      |    AS cos
      |  FROM c CROSS JOIN p)
      |SELECT vec_id, COUNT(*) AS n_probes,
      |       ROUND(MAX(cos), 6) AS max_cos
      |FROM hits WHERE cos >= 0.3
      |GROUP BY vec_id ORDER BY vec_id""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    graft.ext.Similarity.semanticContamination(
        emb.filter(col("vec_id") % 41 =!= 0),
        emb.filter(col("vec_id") % 41 === 0), threshold = 0.3)
      .withColumn("max_cos", round(col("max_cos"), 6))
      .ordered("vec_id")
  }

  // X33 — token-budget corpus selection: keep the best-scoring docs
  // (stopword_ratio as the quality proxy — x9 pins it hash-exact) until
  // a 12k-token budget is spent. The oracle is the textbook GLOBAL
  // cumulative-sum window; the engine runs Sampling.tokenBudgetSelect's
  // bucketed threshold-finding plan (one metadata-sized bucket agg + a
  // window over ONLY the critical bucket) — same rows by construction.
  q("x33_token_budget",
    """WITH scored AS (
      |  SELECT doc_id,
      |    len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
      |    CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |         t -> list_contains(['the','a','of','and','to','is'], t))) AS DOUBLE)
      |      / len(regexp_split_to_array(trim(text), '\s+')) AS score
      |  FROM documents),
      |sel AS (
      |  SELECT doc_id, n_tokens, score,
      |    SUM(n_tokens) OVER (ORDER BY score DESC, doc_id
      |                        ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM scored)
      |SELECT doc_id, n_tokens, ROUND(score, 9) AS score
      |FROM sel WHERE cum <= 12000 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val feats = graft.ext.TextOps.qualityFeatures(col("text")).toMap
    val scored = Tables.documents(s, dir)
      .select(col("doc_id"),
        feats("n_tokens").cast("long").as("n_tokens"),
        feats("stopword_ratio").as("score"))
    graft.ext.Sampling.tokenBudgetSelect(scored, "doc_id", col("score"),
        col("n_tokens"), budget = 12000L)
      .select(col("doc_id"), col("n_tokens"), round(col("score"), 9).as("score"))
      .ordered("doc_id")
  }

  // X34 — per-document top-k TF-IDF keywords (corpus keyword
  // extraction / cluster labeling). (tf/dl)·ln(N/df) rounded to 9,
  // ties on term asc — a total order both engines replay exactly.
  q("x34_tfidf_topk",
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      |words AS (SELECT doc_id, UNNEST(t) AS term FROM toks),
      |post AS (SELECT doc_id, term, COUNT(*)::DOUBLE AS tf FROM words GROUP BY 1, 2),
      |dl AS (SELECT doc_id, COUNT(*)::DOUBLE AS dl FROM words GROUP BY 1),
      |n AS (SELECT COUNT(*)::DOUBLE AS n_docs FROM toks),
      |dfreq AS (SELECT term, COUNT(*)::DOUBLE AS df FROM post GROUP BY 1),
      |scored AS (
      |  SELECT p.doc_id, p.term,
      |         ROUND(p.tf / d.dl * LN(n.n_docs / f.df), 9) AS tfidf
      |  FROM post p JOIN dfreq f USING (term) JOIN dl d USING (doc_id) CROSS JOIN n),
      |rk AS (
      |  SELECT doc_id, term, tfidf,
      |         ROW_NUMBER() OVER (PARTITION BY doc_id
      |                            ORDER BY tfidf DESC, term) AS rk
      |  FROM scored)
      |SELECT doc_id, term, tfidf, rk FROM rk WHERE rk <= 5
      |ORDER BY doc_id, rk""".stripMargin) { (s, dir) =>
    // Scored off the memoized stored LexIndex (the x38/x42 amortized-
    // setup posture): tf/df/dl/N are the index's own tables, so the
    // keyword pass pays two joins + one window, never a corpus
    // re-explode (RetrievalSpec pins ≡ the inline tfidfTopK).
    graft.ext.Retrieval.tfidfTopKFromIndex(lexIndex(s, dir), "doc_id", k = 5)
      .select(col("doc_id"), col("term"), col("tfidf"), col("rk").cast("long").as("rk"))
      .ordered("doc_id", "rk")
  }

  // X35 — Bloom-prefiltered decontamination: same contract as x21 (and
  // the SAME oracle — no false negatives by Bloom contract, false
  // positives removed by the exact join), but the probe side crosses
  // the cluster as ONE ~1 MB filter instead of a full gram table. The
  // corpus-side drop happens in the scan stage, before any shuffle.
  // The probe filter is a persisted campaign artifact — built once per
  // scale dir (ivfIndex/classifierMemo precedent); the measured query is
  // the corpus-side prefiltered scan + exact join.
  q("x35_bloom_decontam",
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS l
      |  FROM documents),
      |grams AS (
      |  SELECT DISTINCT doc_id, array_to_string(l[i : i+2], ' ') AS g
      |  FROM toks, UNNEST(generate_series(1, len(l) - 2)) AS t(i)),
      |shared AS (
      |  SELECT c.doc_id AS id, COUNT(DISTINCT c.g) AS n_shared_grams,
      |         COUNT(DISTINCT p.doc_id) AS n_probes
      |  FROM grams c JOIN grams p ON c.g = p.g
      |  WHERE c.doc_id % 41 <> 0 AND p.doc_id % 41 = 0
      |  GROUP BY 1)
      |SELECT id, n_shared_grams, n_probes FROM shared
      |WHERE n_shared_grams >= 3 ORDER BY id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val probes = docs.filter(col("doc_id") % 41 === 0)
    // 2^20 bits = 128 KB literal: sized for the gate's ~3·10^5 probe
    // grams (fp ~2%, cleaned by the exact join); production campaigns
    // size up via the expectedItems/numBits knobs
    val bloom = bloomMemo.getOrElseUpdate(dir,
      graft.ext.Dedup.probeGramBloom(probes, "doc_id", "text", n = 3,
        expectedItems = 500000L, numBits = 1L << 20))
    graft.ext.Dedup.ngramContaminationBloom(
        docs.filter(col("doc_id") % 41 =!= 0), probes,
        "doc_id", "text", n = 3, minShared = 3, bloom = Some(bloom))
      .ordered("id")
  }

  // X36 — product-quantization ANN, the production two-stage shape: ADC
  // shortlist over the 32×-compressed code table (the scan never touches
  // a float vector) → exact cosine re-rank of the 50 survivors. Rows-only
  // (candidate sets are quantizer-specific, the x7 precedent); PqSpec
  // pins exact reconstruction at codewords, encode determinism, recall.
  q("x36_pq_ann") { (s, dir) =>
    val (model, enc) = pqIndex(s, dir)
    val emb = Tables.embeddings(s, dir)
    graft.ext.Pq.topKReranked(emb.filter(col("vec_id") < 10), enc, emb,
        model, k = 5, shortlist = 50)
      .withColumn("cos", round(col("cos"), 4))
      .ordered("query_id", "rk")
  }

  // X37 — corpus governance report: the curation dashboard a training
  // run reads before mixing — docs / whitespace tokens / mean quality
  // proxy per (source × lang) with CUBE subtotals (a7 pins ROLLUP; CUBE
  // exercises the full grouping-set lattice). Decimal token sums.
  q("x37_corpus_report",
    """SELECT source, lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DECIMAL(18,0)))
      |       AS BIGINT) AS n_tokens,
      |  ROUND(CAST(SUM(CAST(ROUND(
      |      CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |        t -> list_contains(['the','a','of','and','to','is'], t))) AS DOUBLE)
      |      / len(regexp_split_to_array(trim(text), '\s+')), 9) AS DECIMAL(18,10)))
      |    AS DOUBLE) / COUNT(*), 6) AS mean_stopword_ratio
      |FROM documents
      |GROUP BY CUBE(source, lang)
      |ORDER BY source NULLS FIRST, lang NULLS FIRST""".stripMargin) { (s, dir) =>
    // the mean is a DECIMAL sum of 9-rounded ratios over an exact count —
    // order-independent (a double AVG would be partial-agg-order-
    // sensitive at the last ulp), the established oracle discipline
    val feats = graft.ext.TextOps.qualityFeatures(col("text")).toMap
    Tables.documents(s, dir)
      .select(col("source"), col("lang"),
        feats("n_tokens").cast(org.apache.spark.sql.types.DecimalType(18, 0)).as("tk"),
        round(feats("stopword_ratio"), 9)
          .cast(org.apache.spark.sql.types.DecimalType(18, 10)).as("sr"))
      .cube("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tk")).cast("long").as("n_tokens"),
        round(sum(col("sr")).cast("double") / count(lit(1)), 6)
          .as("mean_stopword_ratio"))
      .ordered(col("source").asc_nulls_first, col("lang").asc_nulls_first)
  }

  // X36b — the composed IVF-PQ stored index (FAISS's IVFPQ shape):
  // coarse probe → partition-pruned ADC over the per-cell CODE table
  // (the scan projects codes+norm only, never float vectors) → exact
  // rerank fetch for the shortlist. Rows-only; PqSpec pins all-cells
  // probe == flat PQ rerank and the pruning.
  q("x36b_ivfpq_stored") { (s, dir) =>
    val (model, _) = pqIndex(s, dir)
    val emb = Tables.embeddings(s, dir)
    graft.ext.Pq.topKIvfPqFromIndex(emb.filter(col("vec_id") < 10),
        ivfPqLoaded(s, dir), model, k = 5, nprobe = 4, shortlist = 25)
      .withColumn("cos", round(col("cos"), 4))
      .ordered("query_id", "rk")
  }

  // X36c — ORACLE twin for the PQ ADC math (the x26b precedent of
  // oracling the deterministic stage of an engine-specific pipeline):
  // the learned stages (KMeans codebooks, argmin encode) are pinned to
  // closed-form constants — codebook[s][c][j] = ((31s+7c+3j) mod 13 − 6)/8
  // (exact binary fractions: every product/Σ against a float embedding
  // is exact or IEEE-identical across engines) and codes[s] =
  // vec_id·(s+1) mod 8 — so the asymmetric-distance computation itself
  // (per-subspace codeword dots, reconstruction norm, cosine, ranking)
  // is hash-exact against DuckDB.
  q("x36c_adc_oracle",
    """WITH enc AS (
      |  SELECT vec_id,
      |    list_transform(range(0, 8), s -> CAST((vec_id * (s + 1)) % 8 AS INT)) AS codes,
      |    sqrt(list_sum(list_transform(range(0, 8), s ->
      |      list_sum(list_transform(range(0, 8), j ->
      |        (CAST((((s*31 + ((vec_id * (s + 1)) % 8)*7 + j*3) % 13) - 6) AS DOUBLE) / 8.0) *
      |        (CAST((((s*31 + ((vec_id * (s + 1)) % 8)*7 + j*3) % 13) - 6) AS DOUBLE) / 8.0)))))) AS recon_norm
      |  FROM embeddings),
      |q AS (
      |  SELECT vec_id AS query_id, embedding,
      |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qn
      |  FROM embeddings WHERE vec_id < 8),
      |scored AS (
      |  SELECT q.query_id, e.vec_id AS neighbor_id,
      |    list_sum(list_transform(range(0, 8), s ->
      |      list_sum(list_transform(range(0, 8), j ->
      |        CAST(q.embedding[s*8 + j + 1] AS DOUBLE) *
      |        (CAST((((s*31 + e.codes[s+1]*7 + j*3) % 13) - 6) AS DOUBLE) / 8.0)))))
      |    / (q.qn * e.recon_norm) AS score
      |  FROM enc e JOIN q ON e.vec_id <> q.query_id)
      |SELECT query_id, neighbor_id, ROUND(score, 6) AS score, rk
      |FROM (SELECT query_id, neighbor_id, score,
      |        ROW_NUMBER() OVER (PARTITION BY query_id
      |          ORDER BY score DESC, neighbor_id) AS rk
      |      FROM scored)
      |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin) { (s, dir) =>
    val (m, dsub, ksub) = (8, 8, 8)
    val books = Array.tabulate(m, ksub, dsub)((sb, c, j) =>
      ((((sb * 31 + c * 7 + j * 3) % 13) - 6) / 8.0f))
    val model = graft.ext.Pq.Model(m, dsub, books)
    // ‖codeword‖² per (subspace, code): exact multiples of 1/64, so the
    // Σ order cannot matter — computed once driver-side (model-sized)
    val normSq: Array[Seq[Double]] = Array.tabulate(m, ksub)((sb, c) =>
      books(sb)(c).foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
      .map(_.toSeq)
    val emb = Tables.embeddings(s, dir)
    val codesCol = array((0 until m).map(sb =>
      ((col("vec_id") * (sb + 1)) % ksub).cast("int")): _*)
    val reconSq = (0 until m).map(sb =>
      element_at(typedLit(normSq(sb)), element_at(col("codes"), sb + 1) + 1))
      .reduce(_ + _)
    val enc = emb.withColumn("codes", codesCol)
      .withColumn("recon_norm", sqrt(reconSq))
    graft.ext.Pq.topK(emb.filter(col("vec_id") < 8), enc, model, k = 5)
      .ordered("query_id", "rk")
  }

  // Shared oracle fragment for the DSIR gates: per-doc hashed-ngram
  // importance weights with src0 as the target domain (the exact
  // arithmetic Dsir.fit/weights runs — md5-prefix buckets, add-one
  // smoothing, 9-decimal log-ratios summed as DECIMAL).
  private val dsirOracleCte =
    """tok AS (
      |  SELECT doc_id, source, regexp_split_to_array(trim(lower(text)), '\s+') AS w
      |  FROM documents),
      |gr AS (
      |  SELECT doc_id, source,
      |    unnest(list_concat(w, list_transform(range(1, len(w)),
      |      i -> w[i] || ' ' || w[i+1]))) AS g
      |  FROM tok),
      |bk AS (SELECT doc_id, source, substring(md5(g), 1, 4) AS bkt FROM gr),
      |tc AS (SELECT bkt, COUNT(*) AS ct FROM bk WHERE source = 'src0' GROUP BY 1),
      |rc AS (SELECT bkt, COUNT(*) AS cr FROM bk GROUP BY 1),
      |nn AS (SELECT CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS DOUBLE) AS nt,
      |              CAST(COUNT(*) AS DOUBLE) AS nr FROM bk),
      |ratios AS (
      |  SELECT bkt,
      |    CAST(ROUND(LN(((COALESCE(tc.ct, 0) + 1.0) * (nn.nr + 65536.0)) /
      |                  ((COALESCE(rc.cr, 0) + 1.0) * (nn.nt + 65536.0))), 9) AS DECIMAL(28,10)) AS lr
      |  FROM rc FULL JOIN tc USING (bkt) CROSS JOIN nn),
      |wts AS (
      |  SELECT doc_id, COUNT(*) AS n_grams, SUM(lr) AS w
      |  FROM bk JOIN ratios USING (bkt) GROUP BY doc_id)""".stripMargin

  // X42 — DSIR importance weights (Xie et al., arXiv 2302.03169):
  // hashed unigram+bigram bucket LMs (16-bit md5-prefix space), target
  // = the src0 domain, raw = the whole corpus; per-doc weight = decimal
  // sum of 9-rounded per-bucket log importance ratios. The model is two
  // ≤65536-row frames — fitting never shuffles documents, scoring is a
  // broadcast join + one per-doc sum.
  q("x42_dsir_weights",
    s"""WITH $dsirOracleCte
       |SELECT doc_id, n_grams,
       |  ROUND(CAST(w AS DOUBLE), 6) AS dsir_weight
       |FROM wts ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    graft.ext.Dsir.weights(dsirModel(s, dir), docs, "doc_id", "text")
      .select(col("doc_id"), col("n_grams"),
        round(col("weight_dec").cast("double"), 6).as("dsir_weight"))
      .ordered("doc_id")
  }

  // X42b — DSIR selection: the per-gram (length-normalized) importance
  // score feeds the scale-safe token-budget cut — "the 8k tokens that
  // look most like the target domain", the dedup→score→SELECT step of
  // the curation chain. Oracle runs the textbook global cumsum;
  // tokenBudgetSelect reproduces it with bounded shuffles (x33's
  // machinery, DSIR's score).
  q("x42b_dsir_select",
    s"""WITH $dsirOracleCte,
       |scored AS (
       |  SELECT doc_id,
       |    len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
       |    ROUND(CAST(w AS DOUBLE) / n_grams, 9) AS dsir_score
       |  FROM wts JOIN documents USING (doc_id)),
       |sel AS (
       |  SELECT doc_id, n_tokens, dsir_score,
       |    SUM(n_tokens) OVER (ORDER BY dsir_score DESC, doc_id
       |                        ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM scored)
       |SELECT doc_id, n_tokens, dsir_score
       |FROM sel WHERE cum <= 8000 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.ext.Sampling.tokenBudgetSelect(dsirScored(s, dir), "doc_id",
        col("dsir_score"), col("n_tokens"), budget = 8000L)
      .select(col("doc_id"), col("n_tokens"), col("dsir_score"))
      .ordered("doc_id")
  }

  // X43 — line-level exact dedup across documents (the RefinedWeb
  // "remove duplicated lines" pass): lines (8-token chunks, the x24
  // convention) occurring in ≥2 distinct docs are cut from every doc,
  // docs reassembled from surviving lines in order. One explode + one
  // hash agg + one line-keyed join + one by-doc reassembly agg — no
  // window, nothing all-pairs.
  q("x43_line_dedup",
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l FROM documents),
      |c AS (SELECT doc_id, l, CAST(CEIL(len(l) / 8.0) AS INT) AS nl FROM toks),
      |lines AS (
      |  SELECT doc_id, i, array_to_string(l[i*8+1 : i*8+8], ' ') AS line
      |  FROM c, UNNEST(generate_series(0, nl - 1)) AS t(i)),
      |dup AS (SELECT line FROM lines GROUP BY line
      |        HAVING COUNT(DISTINCT doc_id) >= 2),
      |k AS (SELECT doc_id, i, line,
      |        line IN (SELECT line FROM dup) AS d FROM lines)
      |SELECT doc_id, COUNT(*) AS n_lines,
      |  CAST(SUM(CASE WHEN d THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      |  COALESCE(string_agg(CASE WHEN NOT d THEN line END, ' ' ORDER BY i), '')
      |    AS clean_text
      |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.ext.Dedup.lineDedup(Tables.documents(s, dir), "doc_id", "text")
      .ordered("doc_id")
  }

  // X44 — per-domain caps: each source keeps its 5 best documents by
  // quality score (9-rounded stopword ratio), the ranked-selection
  // sibling of x15 (random quota) and x33 (global budget). The oracle
  // runs the textbook per-stratum row_number window; topPerStratum
  // reproduces it with score-bucket thresholds — no window ever
  // partitions the corpus by bare source.
  q("x44_domain_cap",
    """WITH scored AS (
      |  SELECT doc_id, source,
      |    ROUND(CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |         t -> list_contains(['the','a','of','and','to','is'], t))) AS DOUBLE)
      |      / len(regexp_split_to_array(trim(text), '\s+')), 9) AS score
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, source, score,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |                       ORDER BY score DESC, doc_id) AS rk
      |  FROM scored)
      |SELECT doc_id, source, score FROM r WHERE rk <= 5
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val feats = graft.ext.TextOps.qualityFeatures(col("text")).toMap
    val scored = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        round(feats("stopword_ratio"), 9).as("score"))
    graft.ext.Sampling.topPerStratum(scored, Seq("source"), col("score"),
        "doc_id", k = 5)
      .ordered("doc_id")
  }

  // X46 — per-source length quantiles through the compactor-stack
  // quantile sketch (QuantileSketches): the exact-percentile
  // WindowExec/buffering forms serialize every group value through the
  // exchange; the sketch crosses it as a bounded k·log(n/k) summary and
  // partials merge map-side like sum's. k=1024 ≥ every per-source count
  // at gate scale, the sketch's EXACT regime (no compaction anywhere,
  // `exact` = true), so the summary IS the sorted multiset and the
  // interpolated quantiles are hash-exact against DuckDB's
  // quantile_cont; the compaction regime's rank-error bound is
  // spec-verified (FunctionsSpec).
  q("x46_quantile_sketch",
    """SELECT source, COUNT(*) AS n,
      |  ROUND(quantile_cont(n_chars, 0.5), 4) AS p50,
      |  ROUND(quantile_cont(n_chars, 0.9), 4) AS p90,
      |  ROUND(quantile_cont(n_chars, 0.99), 4) AS p99
      |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val qs = graft.functions.QuantileSketches
    Tables.documents(s, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        qs.quantileSketch(col("n_chars").cast("double"), 1024).as("sk"))
      .select(col("source"), col("n"),
        qs.sketchQuantiles(col("sk"), Seq(0.5, 0.9, 0.99)).as("q"))
      .select(col("source"), col("n"),
        round(element_at(col("q"), 1), 4).as("p50"),
        round(element_at(col("q"), 2), 4).as("p90"),
        round(element_at(col("q"), 3), 4).as("p99"))
      .ordered("source")
  }

  // X46b — the sketch-rollup STORE: per-(source, lang) summary rows
  // persisted once (qsketchPartialsDir — the daily-partials job), the
  // report merges summaries per source and extracts quantiles without
  // re-touching documents — how "p50/p95 over a year of 100-TB days"
  // stays a summary-cost query. Exact partials over disjoint slices
  // merge bit-identically to the direct sketch (spec-pinned), so the
  // persisted path stays hash-exact against DuckDB's full-range
  // quantile_cont.
  q("x46b_sketch_rollup",
    """SELECT source,
      |  ROUND(quantile_cont(n_chars, 0.5), 4) AS p50,
      |  ROUND(quantile_cont(n_chars, 0.95), 4) AS p95
      |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val qs = graft.functions.QuantileSketches
    s.read.parquet(qsketchPartialsDir(s, dir))
      .groupBy("source")
      .agg(qs.quantileSketchMerge(col("sk"), 1024).as("sk"))
      .select(col("source"), qs.sketchQuantiles(col("sk"), Seq(0.5, 0.95)).as("q"))
      .select(col("source"),
        round(element_at(col("q"), 1), 4).as("p50"),
        round(element_at(col("q"), 2), 4).as("p95"))
      .ordered("source")
  }

  // X2c — INCREMENTAL near-dup: the daily batch (doc_id ≡ 0 mod 5)
  // probes a persisted MinHash band store of the rest of the corpus
  // (bandStorePrefix — built once, the x2 signatures as a stored
  // artifact, BUCKETED on the probe join keys so the store is scanned,
  // never shuffled, per batch). Nothing re-hashes stored documents;
  // stored shingles are read only for candidate ids. Signatures are
  // content-local, so the result is exactly the full-recompute pairs
  // touching the batch (ExtSpec pins the equality); candidate
  // generation is LSH (engine-specific) → rows-only, with the jaccard
  // verdict math oracle-anchored by x2b and the probe closure by x2d.
  q("x2c_incremental_neardups") { (s, dir) =>
    val batch = Tables.documents(s, dir).filter(col("doc_id") % 5 === 0)
    graft.ext.Dedup.incrementalNearDupsBucketed(s, batch, "doc_id", "text",
        bandStorePrefix(s, dir), shingleN = 3, numHashes = 64, bands = 16,
        threshold = 0.5)
      .select(col("id1"), col("id2"), round(col("jaccard"), 9).as("jaccard"))
      .ordered("id1", "id2")
  }

  // X2d — ORACLE TWIN of the incremental probe's deterministic CLOSURE
  // (the x26b/x36c precedent: pin the engine-specific assignment,
  // oracle everything after it). The LSH band assignment is pinned to a
  // portable rule — one band, bucket = doc_id / 10 — and the store is
  // the ENTIRE sliced corpus (so every batch id is a re-appended id and
  // the exclusion path is load-bearing: broken exclusion double-counts
  // batch shingles on the stored side and shifts every Jaccard). The
  // engine runs the same incrementalCandidateRows + verifyJaccardArrays
  // the x2c path uses; DuckDB re-derives batch-vs-store discovery,
  // within-batch discovery, the exclusion, and the Jaccard verdicts
  // from first principles. Threshold 0 keeps every candidate pair so
  // the whole closure is hash-compared, not just the near-dup tail.
  // Corpus slice doc_id % 100 < 30: runs of 30 CONSECUTIVE ids, so
  // every decade bucket in the slice is complete and all three probe
  // paths (cross, within-batch at (10d, 10d+5), re-appended exclusion)
  // stay load-bearing at 30% of the full-corpus verify cost.
  q("x2d_incremental_oracle",
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents),
      |slice AS (SELECT * FROM documents WHERE doc_id % 100 < 30),
      |sh AS (
      |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      |  FROM toks, UNNEST(generate_series(1, len(t)-2)) AS g(i)
      |  WHERE doc_id % 100 < 30),
      |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
      |cand AS (
      |  SELECT LEAST(n.doc_id, o.doc_id) AS id1,
      |         GREATEST(n.doc_id, o.doc_id) AS id2
      |  FROM slice n JOIN slice o
      |    ON n.doc_id // 10 = o.doc_id // 10
      |  WHERE n.doc_id % 5 = 0 AND o.doc_id % 5 <> 0
      |  UNION
      |  SELECT a.doc_id AS id1, b.doc_id AS id2
      |  FROM slice a JOIN slice b
      |    ON a.doc_id // 10 = b.doc_id // 10 AND a.doc_id < b.doc_id
      |  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 = 0),
      |inter AS (
      |  SELECT c.id1, c.id2, COUNT(*) AS ni
      |  FROM cand c
      |  JOIN sh s1 ON s1.doc_id = c.id1
      |  JOIN sh s2 ON s2.doc_id = c.id2 AND s2.s = s1.s
      |  GROUP BY 1, 2)
      |SELECT c.id1, c.id2,
      |  ROUND(COALESCE(i.ni, 0)::DOUBLE / (z1.sz + z2.sz - COALESCE(i.ni, 0)), 6)
      |    AS jaccard
      |FROM cand c
      |LEFT JOIN inter i ON i.id1 = c.id1 AND i.id2 = c.id2
      |JOIN sizes z1 ON z1.doc_id = c.id1
      |JOIN sizes z2 ON z2.doc_id = c.id2
      |ORDER BY c.id1, c.id2""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir).filter(col("doc_id") % 100 < 30)
    val pinnedBands = (d: DataFrame) => d.select(
      col("doc_id").as("id"), lit(0).as("band"),
      floor(col("doc_id") / 10).cast("long").as("bucket"))
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val newRows = graft.ext.Dedup.shingleRows(batch, "doc_id", "text", 3)
    val newIds = batch.select(col("doc_id").as("id"))
    val (cand0, _) = graft.ext.Dedup.incrementalCandidateRows(
      pinnedBands(batch), newRows, newIds,
      pinnedBands(docs), // full slice as store: every batch id re-appended
      graft.ext.Dedup.shingleRows(docs, "doc_id", "text", 3))
    // The verify stage references both frames multiple times —
    // materialize once (the incrementalProbe persist discipline;
    // checkpoint because a gate can't unpersist after returning), and
    // derive the rows from the CHECKPOINTED candidates: checkpointing
    // the tuple's rows frame instead re-ran candidate discovery inside
    // the rows job (the r19 #6 finding — localCheckpoint is invisible
    // to the plan cache, unlike x2c's persist; store-sized work at
    // production scale, though at sf0.1 the remaining 0.8 s is per-job
    // floor across the probe's ~4 shuffle stages — lazy-checkpoint and
    // single-action variants measured inside the same noise band, so
    // the gate keeps the simple eager discipline and the r20 SURVEY
    // documents the floor). Runs the SAME sorted-array kernel as the
    // x2c probe, so the oracle anchors the code path the incremental
    // pipeline actually executes.
    val cand = cand0.localCheckpoint(true)
    val rows = graft.ext.Dedup.incrementalRowsFor(cand, newRows, newIds,
        graft.ext.Dedup.shingleRows(docs, "doc_id", "text", 3))
      .localCheckpoint(true)
    graft.ext.Dedup.verifyJaccardArrays(cand, rows)
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
      .ordered("id1", "id2")
  }
}
