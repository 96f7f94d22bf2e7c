package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ext.{QualityClassifier, TextOps}

/** Streaming document ingest: the training-data cleaning pipeline
  * applied AT THE EDGE, as documents arrive, instead of as a batch pass
  * over the landed corpus. Everything here is deliberately built from
  * the stateless column-expression forms of the ext operators —
  * repetition gates ([[TextOps.ngramRepetitionCols]]), C4-ish length /
  * quality heuristics, PII redaction, and classifier scoring
  * ([[QualityClassifier.scoreCol]], the weight map as a plan literal) —
  * so the only streaming STATE in the whole pipeline is the
  * within-watermark content dedup, whose size is bounded by the
  * lateness horizon, never the corpus.
  *
  * Scale story at 100 TB/day: gates drop documents inside the scan of
  * each micro-batch (no shuffle before the drop — the cheapest place to
  * kill a document is before it moves), the dedup state holds only the
  * lateness window × arrival rate, and the landed store receives
  * already-clean, already-redacted documents partitioned by arrival
  * date. Benchmark decontamination ALSO runs at the edge when the probe
  * battery is fixed ([[DecontamGate]]: the probe grams ride along as one
  * Bloom-filter literal — stateless). Cross-document work that genuinely
  * needs the corpus (MinHash near-dups, SemDeDup) stays in the batch
  * layer over the landed store — same split as [[Ingest.dedupStream]]
  * vs [[graft.ext.Dedup.exact]].
  */
object DocumentIngest {

  /** Gate thresholds; defaults follow the batch pipeline's. */
  /** Benchmark-decontamination gate for the edge: drop an arriving doc
    * when ≥ `minShared` of its distinct word n-grams hit the probe-set
    * Bloom filter ([[graft.ext.Dedup.probeGramBloom]] — a fixed
    * campaign artifact, so the gate is STATELESS: the filter rides the
    * plan as a literal, no stream-side state, no join. Bloom false
    * positives can only over-count by the fp rate — size the filter for
    * the probe battery; false negatives don't exist, so nothing
    * contaminated slips through that the exact batch pass would catch
    * at the same `minShared`. */
  final case class DecontamGate(bloom: Array[Byte], n: Int, minShared: Int)

  /** Language gate for the edge: keep documents whose trained-langid
    * prediction (over the standard `prefixChars` prefix, the marker
    * heuristic as no-signal fallback) is in `allow`. Stateless like
    * every other gate — the model rides the plan inside one
    * [[graft.ext.LangId.langIdCol]] kernel, no join, no shuffle. */
  final case class LangGate(model: graft.ext.LangId.Model,
      allow: Set[String], prefixChars: Int = 160)

  final case class CleanConfig(
      minTokens: Int = 5,
      maxTokens: Int = 100000,
      repetition: TextOps.RepetitionThresholds = TextOps.RepetitionThresholds(),
      classifier: Option[QualityClassifier.Model] = None,
      minScore: Double = 0.5,
      redactPii: Boolean = true,
      decontam: Option[DecontamGate] = None,
      langGate: Option[LangGate] = None,
      /** Unicode normalization form applied to the text BEFORE the
        * dedup key and every gate ("NFC"/"NFKC"/…; None = off) — so
        * composed and decomposed spellings of one document dedup to
        * one ([[TextOps.normalizeUnicode]]). */
      normalizeForm: Option[String] = None)

  /** The normalized content key used for streaming dedup — identical to
    * the batch x1b normalized-dedup key, so stream-deduped and
    * batch-deduped corpora agree on what "the same document" means. */
  def contentKey(textCol: Column): Column =
    md5(trim(regexp_replace(lower(textCol), "[^a-z0-9]+", " ")))

  /** Quality/gate columns for one document — all pure expressions.
    * Returns (columns to attach, keep predicate). */
  def gateColumns(textCol: Column, cfg: CleanConfig): (Seq[(String, Column)], Column) = {
    val nTok = TextOps.tokenCount(textCol)
    // single-scalar fold finishes: the keep predicate references each
    // fold column exactly ONCE, so filter pushdown substitutes exactly
    // one copy of each fold into the filter (the struct form cost a
    // second full rep-2 fold per row — see TextOps.topNgramCharMass)
    val cols = Seq(
      "n_tokens" -> nTok,
      "_top2chars" -> TextOps.topNgramCharMass(textCol, 2),
      "_dup3chars" -> TextOps.dupNgramCharMass(textCol, 3),
      "_nc" -> length(textCol).cast("double")) ++
      cfg.classifier.map(m => "quality_score" -> QualityClassifier.scoreCol(textCol, m)) ++
      cfg.langGate.map { g =>
        "lang_pred" -> graft.ext.LangId.langIdCol(
          substring(textCol, 1, g.prefixChars), g.model,
          fallback = TextOps.langId(textCol))
      } ++
      cfg.decontam.map { d =>
        // distinct grams hitting the probe Bloom filter — same gram
        // shape + xxhash64 key as Dedup.shingleRows, so the count
        // agrees with the batch contamination scan's n_shared_grams
        // (up to the filter's fp rate, which only raises it)
        "_contam" -> size(filter(
          array_distinct(TextOps.wordNgrams(textCol, d.n)),
          g => graft.functions.BloomFunctions.mightContain(lit(d.bloom), xxhash64(g))))
      }
    val top2 = when(col("_nc") > 0, col("_top2chars") / col("_nc")).otherwise(lit(0.0))
    val dup3 = when(col("_nc") > 0, col("_dup3chars") / col("_nc")).otherwise(lit(0.0))
    val keep = col("n_tokens") >= cfg.minTokens &&
      col("n_tokens") <= cfg.maxTokens &&
      top2 <= cfg.repetition.maxTop2GramCharFrac &&
      dup3 <= cfg.repetition.maxDup3GramCharFrac &&
      cfg.classifier.fold(lit(true))(_ => col("quality_score") >= cfg.minScore) &&
      cfg.langGate.fold(lit(true))(g =>
        col("lang_pred").isInCollection(g.allow.toSeq.sorted)) &&
      cfg.decontam.fold(lit(true))(d => col("_contam") < d.minShared)
    (cols, keep)
  }

  /** Clean a document stream: watermarked content dedup → stateless
    * gates → PII redaction. Works identically on a batch frame (the
    * dedup falls back to plain dropDuplicates) — the spec pins
    * stream == batch on the same data. Output: the input columns with
    * `text` redacted, plus `n_tokens` (and `quality_score` /
    * `lang_pred` when a classifier / language gate is configured). */
  def cleanStream(stream: DataFrame, idCol: String, textCol: String,
      tsCol: String, lateness: String, cfg: CleanConfig = CleanConfig()): DataFrame = {
    // unicode normalization FIRST (when configured): the dedup key,
    // every gate, and the landed text all see the normalized form
    val src = cfg.normalizeForm.fold(stream)(f =>
      stream.withColumn(textCol, TextOps.normalizeUnicode(col(textCol), f)))
    val keyed = src.withColumn("_ck", contentKey(col(textCol)))
    // Gate columns are attached BELOW the dedup exchange and the keep
    // predicate applied above it: the filter semantics are unchanged
    // (gates still judge only dedup survivors), but the CPU-dense fold
    // expressions evaluate in the pre-shuffle map stage at full scan
    // parallelism. Evaluated above the window they land in the post-
    // shuffle stage, which AQE coalesces to a handful of partitions for
    // a small-bytes text shuffle — measured on x30 at sf0.1: the two
    // repetition folds ran near-serial, 1.18 s vs 0.75 s for this shape.
    val (cols, keep) = gateColumns(col(textCol), cfg)
    val gated = cols.foldLeft(keyed) { case (d, (n, c)) => d.withColumn(n, c) }
    val deduped =
      if (stream.isStreaming)
        gated.withWatermark(tsCol, lateness)
          .dropDuplicatesWithinWatermark(Seq("_ck"))
      else {
        // batch twin of first-arrival: keep the earliest (ts, id) row
        // per content key — deterministic, unlike dropDuplicates
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("_ck").orderBy(col(tsCol), col(idCol))
        gated.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn")
      }
    val kept = deduped.filter(keep)
      .drop("_ck", "_top2chars", "_dup3chars", "_nc", "_contam")
    if (cfg.redactPii)
      kept.withColumn(textCol, TextOps.piiRedact(col(textCol)))
    else kept
  }

  /** Crawl-edge front door, HTML form: derive the `textCol` that
    * [[cleanStream]] consumes from raw page HTML — one stateless
    * projection ([[graft.ext.Extract.mainText]] is a single kernel +
    * column algebra), so it composes with the streaming pipeline
    * without adding state, and pages whose extraction is empty (pure
    * chrome) die before the dedup exchange. Batch frames take the same
    * entry point; the spec pins stream ≡ batch through the composed
    * extract→clean pipeline. */
  def extractHtml(df: DataFrame, htmlCol: String, textCol: String,
      maxLinkDensity: Double = 1.0 / 3.0, minChars: Int = 10): DataFrame =
    extractHtml(df, htmlCol, textCol,
      graft.ext.Extract.ExtractPolicy.Simple(maxLinkDensity, minChars))

  /** [[extractHtml]] under a declared [[graft.ext.Extract.ExtractPolicy]]
    * — the configuration seam that keeps the streaming front door and
    * the batch pipeline running the SAME extractor (contextual jusText
    * or induced-stopword refinement included) instead of drifting. */
  def extractHtml(df: DataFrame, htmlCol: String, textCol: String,
      policy: graft.ext.Extract.ExtractPolicy): DataFrame =
    df.withColumn(textCol, graft.ext.Extract.extract(col(htmlCol), policy))
      .filter(col(textCol) =!= "")

  /** Crawl-edge front door, WARC form: explode capture blobs into
    * records (stateless generator — [[graft.ext.Warc.records]]), keep
    * 200 HTML responses, extract. Output: the input columns plus
    * `record_idx`, `target_uri`, and the extracted `textCol`. The
    * production file path ([[graft.ext.Warc.read]]) lands records as
    * parquet that streams through here via the normal file source. */
  def extractWarc(df: DataFrame, blobCol: String, textCol: String,
      maxLinkDensity: Double = 1.0 / 3.0, minChars: Int = 10): DataFrame =
    extractWarc(df, blobCol, textCol,
      graft.ext.Extract.ExtractPolicy.Simple(maxLinkDensity, minChars))

  /** [[extractWarc]] under a declared policy (see [[extractHtml]]),
    * with pluggable content decoders — [[graft.ext.Warc.defaultDecoders]]
    * (zstd, whose library ships with Spark itself) unless told
    * otherwise; records whose `Content-Encoding` neither the built-in
    * kernel (gzip/deflate) nor a supplied decoder handles are excluded
    * rather than polluting the corpus as compressed bytes. */
  def extractWarc(df: DataFrame, blobCol: String, textCol: String,
      policy: graft.ext.Extract.ExtractPolicy): DataFrame =
    extractWarc(df, blobCol, textCol, policy, graft.ext.Warc.defaultDecoders)

  def extractWarc(df: DataFrame, blobCol: String, textCol: String,
      policy: graft.ext.Extract.ExtractPolicy,
      decoders: Seq[graft.ext.Warc.ContentDecoder]): DataFrame = {
    import graft.ext.Warc
    val decMap: Map[String, Warc.ContentDecoder] =
      decoders.flatMap(d => d.encodings.map(_.toLowerCase -> d)).toMap
    val enc = trim(lower(coalesce(
      Warc.httpHeader(col("_r.payload"), "Content-Encoding"), lit("identity"))))
    val extraHandled =
      if (decMap.isEmpty) lit(false) else enc.isin(decMap.keys.toSeq: _*)
    val rec = df.select(col("*"),
        posexplode(Warc.records(col(blobCol))).as(Seq("record_idx", "_r")))
      .filter(element_at(col("_r.headers"), "WARC-Type") === "response" &&
        Warc.httpStatus(col("_r.payload")) === 200 &&
        // the HTTP Content-Type, not the WARC one: a 200 image/JSON
        // response must not flow into the text extractor as mojibake
        Warc.isHtmlResponse(col("_r.payload")) &&
        // a body NO decoder (kernel or supplied) can inflate must die
        // here, not pollute the corpus as compressed bytes
        (Warc.isDecodableEncoding(col("_r.payload")) || extraHandled))
      .withColumn("target_uri",
        coalesce(element_at(col("_r.headers"), "WARC-Target-URI"), lit("")))
    // de-chunk + inflate + supplied decoders + charset decode as ONE
    // fused kernel per row (Warc.httpBodyText — the composed column
    // form re-ran the inflate at every _body reference, ~3 decompresses
    // per record on the production reader path)
    rec.withColumn(textCol, graft.ext.Extract.extract(
        Warc.httpBodyText(col("_r.payload"), decoders), policy))
      .filter(col(textCol) =!= "")
      .drop("_r").drop(blobCol)
  }

  /** [[extractWarc]] over ALREADY-SPLIT record rows — the shape the
    * streaming `warc` source emits (`readStream.format("warc")`:
    * [[graft.sources.WarcMicroBatchStream]]), one row per WARC record
    * with `warc_type`/`payload` as flat columns. Same gate chain and
    * the same fused extract kernel as the blob path, so streaming
    * ingestion straight off `.warc.gz` drops ≡ the landed-parquet
    * batch pipeline (DocumentIngestSpec pins the equivalence across
    * AvailableNow triggers) — one full copy of the corpus removed from
    * the ingest path. The `warc_type === "response"` gate is a pushed
    * filter here: non-response records never allocate payloads inside
    * the reader. Output: input columns minus `payloadCol`, plus
    * `textCol`; empty extractions drop (the [[extractHtml]]
    * convention). */
  /** The 200-HTML-response gate chain + decoded RAW HTML over
    * ALREADY-SPLIT record rows (the streaming/batch `warc` source's
    * flat shape) — the record-rows twin of [[graft.ext.Warc
    * .htmlResponses]]: keeps rows whose HTTP layer is a decodable 200
    * HTML response and adds `htmlCol` (the de-chunked, inflated,
    * charset-decoded body — ONE fused kernel). The `warc_type`
    * equality is a PUSHED filter against the `warc` source: excluded
    * records never allocate payloads in the reader. Use this when the
    * consumer needs the HTML ITSELF (the frontier's link extraction);
    * [[extractWarcRecords]] layers the text-extraction policy on top. */
  def warcPages(df: DataFrame, htmlCol: String = "html",
      payloadCol: String = "payload", typeCol: String = "warc_type",
      decoders: Seq[graft.ext.Warc.ContentDecoder] = graft.ext.Warc.defaultDecoders): DataFrame = {
    import graft.ext.Warc
    val decMap: Map[String, Warc.ContentDecoder] =
      decoders.flatMap(d => d.encodings.map(_.toLowerCase -> d)).toMap
    val enc = trim(lower(coalesce(
      Warc.httpHeader(col(payloadCol), "Content-Encoding"), lit("identity"))))
    val extraHandled =
      if (decMap.isEmpty) lit(false) else enc.isin(decMap.keys.toSeq: _*)
    df.filter(col(typeCol) === "response" &&
        Warc.httpStatus(col(payloadCol)) === 200 &&
        Warc.isHtmlResponse(col(payloadCol)) &&
        (Warc.isDecodableEncoding(col(payloadCol)) || extraHandled))
      .withColumn(htmlCol, Warc.httpBodyText(col(payloadCol), decoders))
      .drop(payloadCol)
  }

  def extractWarcRecords(df: DataFrame, textCol: String,
      payloadCol: String = "payload", typeCol: String = "warc_type",
      policy: graft.ext.Extract.ExtractPolicy = graft.ext.Extract.ExtractPolicy.Simple(),
      decoders: Seq[graft.ext.Warc.ContentDecoder] = graft.ext.Warc.defaultDecoders): DataFrame =
    // projection collapse fuses extract(httpBodyText(payload)) back
    // into one kernel chain — the intermediate column costs nothing
    warcPages(df, "__graft_html", payloadCol, typeCol, decoders)
      .withColumn(textCol,
        graft.ext.Extract.extract(col("__graft_html"), policy))
      .filter(col(textCol) =!= "")
      .drop("__graft_html")

  /** Drain a directory of document parquet into a cleaned, day-
    * partitioned store — the document twin of [[Ingest.runAvailableNow]]
    * (deterministic AvailableNow semantics over the real streaming
    * path: incremental state, watermark, checkpoint). */
  def runAvailableNow(spark: org.apache.spark.sql.SparkSession, srcDir: String,
      outDir: String, checkpointDir: String, idCol: String, textCol: String,
      tsCol: String, lateness: String = "10 minutes",
      cfg: CleanConfig = CleanConfig()): Unit = {
    val src = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir)
    val q = cleanStream(src, idCol, textCol, tsCol, lateness, cfg)
      .withColumn("date", to_date(col(tsCol)))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("date")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming NEAR-dup maintenance — the corpus-history complement of
    * [[cleanStream]]'s watermark-bounded exact dedup: every micro-batch
    * is (1) probed against the persisted bucketed MinHash band store
    * ([[graft.ext.Dedup.incrementalNearDupsBucketed]] — within-batch
    * pairs AND pairs against everything ever ingested, at batch cost),
    * then (2) folded into the store
    * ([[graft.ext.Dedup.appendBandStoreBucketed]] — delta cost, nothing
    * re-hashes), with discovered pairs appended to `pairsDir` tagged by
    * micro-batch. The first batch bootstraps the store. This is how a
    * 100-TB ingest keeps corpus-wide near-dup knowledge current without
    * unbounded streaming state: the "state" is the band store on disk,
    * and per-batch cost is governed by the same rows-per-band exponent
    * as the batch pipeline. Run [[graft.ext.Dedup.compactBandStore]] on
    * a maintenance cadence to restore the one-file-per-bucket layout.
    *
    * PRECONDITION: batch ids must be globally unique across the stream
    * (route through [[cleanStream]]'s exact dedup or
    * [[graft.ext.Dedup.snapshotDiff]]'s `added` set first) — the store
    * append inherits [[graft.ext.Dedup.appendBandStore]]'s disjoint-ids
    * contract.
    *
    * Replay safety (exactly-once effects): per-batch started/done
    * markers live in the CHECKPOINT's filesystem (Hadoop FS API, so a
    * remote `hdfs://`/`s3a://` checkpoint dir works — a local
    * `java.io.File` check would silently never fire there). `done`
    * makes a re-delivered batch a no-op. A crash mid-batch leaves
    * `started` without `done`; the retry then SCRUBS the batch's ids
    * from the store ([[graft.ext.Dedup.deleteFromBandStore]] — removes
    * a possibly-partial append, preserving the disjoint-ids contract)
    * and re-runs. Pairs are written per-batch with OVERWRITE into
    * `pairsDir/batch_id=<n>`, so a retry replaces rather than
    * duplicates; read the output with `spark.read.parquet(pairsDir)`
    * (partition discovery yields the `batch_id` column). */
  def nearDupMaintenance(spark: org.apache.spark.sql.SparkSession,
      srcDir: String, pairsDir: String, checkpointDir: String,
      tablePrefix: String, idCol: String, textCol: String,
      buckets: Int = 32, shingleN: Int = 3, numHashes: Int = 96,
      bands: Int = 32, threshold: Double = 0.5,
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    val reader = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val src = reader.parquet(srcDir)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        nearDupProcessBatch(batch, batchId, pairsDir, checkpointDir,
          tablePrefix, idCol, textCol, buckets, shingleN, numHashes,
          bands, threshold)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** One micro-batch of [[nearDupMaintenance]] — package-visible so the
    * torn-append recovery path is directly testable (a completed
    * AvailableNow checkpoint never re-delivers a batch, so the crash
    * window can't be reached through the streaming entry point). */
  private[graft] def nearDupProcessBatch(batch: DataFrame, batchId: Long,
      pairsDir: String, checkpointDir: String, tablePrefix: String,
      idCol: String, textCol: String, buckets: Int, shingleN: Int,
      numHashes: Int, bands: Int, threshold: Double): Unit = {
    val s = batch.sparkSession
    val markers = new org.apache.hadoop.fs.Path(
      s"$checkpointDir/graft_band_batches")
    val fs = markers.getFileSystem(s.sparkContext.hadoopConfiguration)
    val started = new org.apache.hadoop.fs.Path(markers, s"$batchId.started")
    val done = new org.apache.hadoop.fs.Path(markers, s"$batchId.done")
    if (!fs.exists(done) && !batch.isEmpty) {
      val d = graft.ext.Dedup
      // recovery-aware: a compaction/delete crash leaves the live name
      // absent with the data under _old — restore it rather than
      // re-bootstrapping from this batch (which would silently discard
      // all cumulative near-dup state)
      val storeExists = graft.ext.Dedup.recoverBandStore(s, tablePrefix)
      if (storeExists && fs.exists(started)) {
        // torn previous attempt: the append may have landed partially —
        // scrub this batch's ids before re-running
        d.deleteFromBandStore(s, tablePrefix, batch.select(col(idCol)), buckets)
      }
      fs.mkdirs(markers)
      fs.create(started, true).close()
      val pairs =
        if (!storeExists) {
          d.writeBandStoreBucketed(batch, idCol, textCol, tablePrefix,
            buckets, shingleN, numHashes, bands)
          d.minhashNearDups(batch, idCol, textCol, shingleN, numHashes,
            bands, threshold)
        } else {
          val p = d.incrementalNearDupsBucketed(s, batch, idCol, textCol,
            tablePrefix, shingleN, numHashes, bands, threshold)
          d.appendBandStoreBucketed(batch, idCol, textCol, tablePrefix,
            buckets, shingleN, numHashes, bands)
          p
        }
      pairs.write.mode("overwrite")
        .parquet(s"$pairsDir/batch_id=$batchId")
      fs.create(done, true).close(): Unit
    }
  }

  /** Streaming crawl-frontier maintenance — the crawl loop's state
    * keeper, shaped like [[nearDupMaintenance]] but with SIMPLER replay
    * bookkeeping because every effect is already idempotent: each
    * micro-batch of crawled pages (1) produces its prioritized frontier
    * via [[graft.ext.Frontier.fromPages]] anti-joined against the
    * CUMULATIVE seen-URL store (so batch N's frontier excludes
    * everything batches 1..N-1 fetched, at candidate cost — the store
    * is bucketed on url and never re-shuffled), written with OVERWRITE
    * into `frontierDir/batch_id=<n>`; then (2) folds its own page URLs
    * into the store ([[graft.ext.Frontier.appendSeenStore]] — an
    * anti-join inside the append writes only genuinely new urls, so a
    * re-delivered or torn batch re-appends nothing). No started/done
    * markers are needed: a retry overwrites its own frontier output,
    * and a store append that already landed changes nothing — and if
    * the crash fell between frontier write and store append, the
    * re-run's frontier is identical because [[graft.ext.Frontier
    * .fromPages]] anti-joins the batch's own pages regardless. The
    * first batch bootstraps the store. Run
    * [[graft.ext.Frontier.compactSeenStore]] on a maintenance cadence.
    */
  def frontierMaintenance(spark: org.apache.spark.sql.SparkSession,
      srcDir: String, frontierDir: String, checkpointDir: String,
      seenTable: String, urlCol: String = "url", htmlCol: String = "html",
      blockedDomains: Seq[String] = Nil, perHostCap: Int = 100,
      seed: String = "graft-frontier-v1", prIterations: Int = 10,
      buckets: Int = 32, maxFilesPerTrigger: Option[Int] = None,
      graphStorePrefix: Option[String] = None,
      compactEvery: Option[Int] = None,
      rankEvery: Int = 1,
      robotsTable: Option[String] = None,
      robotsAgent: String = "*"): Unit = {
    val reader = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val src = reader.parquet(srcDir)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        frontierProcessBatch(batch, batchId, frontierDir, seenTable,
          urlCol, htmlCol, blockedDomains, perHostCap, seed, prIterations,
          buckets, graphStorePrefix, compactEvery, rankEvery,
          robotsTable, robotsAgent)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** [[frontierMaintenance]] fed STRAIGHT from `.warc.gz` drops — the
    * fully composed crawl loop with no landed-parquet copy: the
    * streaming `warc` source consumes each trigger's new archive
    * files ([[graft.sources.WarcMicroBatchStream]] — file-position
    * checkpointing, `warc_type` filter pushed so non-response records
    * never allocate payloads), [[warcPages]] turns 200-HTML responses
    * into (target_uri, html) page rows, and every micro-batch runs the
    * same [[frontierProcessBatch]] protocol (seen-store fold, edge
    * fold, rank cadence, robots gate, replay markers). A fetcher that
    * archives through [[graft.ext.Warc.writeRecords]] and drops the
    * files here closes the crawl cycle end-to-end in WARC. */
  def frontierMaintenanceWarc(spark: org.apache.spark.sql.SparkSession,
      warcGlob: String, frontierDir: String, checkpointDir: String,
      seenTable: String, blockedDomains: Seq[String] = Nil,
      perHostCap: Int = 100, seed: String = "graft-frontier-v1",
      prIterations: Int = 10, buckets: Int = 32,
      graphStorePrefix: Option[String] = None,
      compactEvery: Option[Int] = None,
      rankEvery: Int = 1,
      robotsTable: Option[String] = None,
      robotsAgent: String = "*",
      decoders: Seq[graft.ext.Warc.ContentDecoder] = graft.ext.Warc.defaultDecoders,
      maxFilesPerTrigger: Option[Int] = None,
      maxBytesPerTrigger: Option[Long] = None,
      logCompactInterval: Option[Int] = None,
      maxFileAge: Option[String] = None): Unit = {
    val reader = spark.readStream.format("warc")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    maxBytesPerTrigger.foreach(n => reader.option("maxBytesPerTrigger", n))
    logCompactInterval.foreach(n => reader.option("logCompactInterval", n))
    maxFileAge.foreach(a => reader.option("maxFileAge", a))
    val src = reader.load(warcGlob)
    val pages = warcPages(src, decoders = decoders)
      .select(col("target_uri").as("url"), col("html"))
    val q = pages.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        frontierProcessBatch(batch, batchId, frontierDir, seenTable,
          "url", "html", blockedDomains, perHostCap, seed, prIterations,
          buckets, graphStorePrefix, compactEvery, rankEvery,
          robotsTable, robotsAgent)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming ARCHIVE-SIDECAR maintenance — the crawl loop's artifact
    * completion (CommonCrawl publishes exactly this set next to every
    * crawl): each micro-batch of `.warc.gz` drops derives its sidecars
    * exactly once, batch-addressed so replay is a no-op:
    *
    *   - WET (`wet/batch_id=<n>`): `conversion` records carrying the
    *     200-HTML responses' extracted main text ([[graft.ext.Extract
    *     .mainText]] over the fused body decode) — downstream text
    *     consumers never re-pay the HTML parse;
    *   - WAT (`wat/batch_id=<n>`): [[graft.ext.Warc.writeWatRecords]]
    *     metadata envelopes — link-graph/seed consumers read these,
    *     ~1/5 the response bytes;
    *   - capture index (`cdx/batch_id=<n>`, parquet): one row per
    *     record keyed by its [[graft.ext.UrlOps.surtKey]] urlkey and
    *     SORTED by it, so a site-scoped query over the accumulated
    *     index range-prunes to its own row groups.
    *
    * The responses themselves stay where they landed — sidecars never
    * copy payload bytes. The batch persists for its three derivations
    * (one source scan, not three) and unpersists before the commit. */
  def sidecarMaintenance(spark: org.apache.spark.sql.SparkSession,
      warcGlob: String, outDir: String, checkpointDir: String,
      decoders: Seq[graft.ext.Warc.ContentDecoder] = graft.ext.Warc.defaultDecoders,
      maxFilesPerTrigger: Option[Int] = None,
      cdxTable: Option[String] = None,
      buckets: Int = 32,
      compactEvery: Option[Int] = None,
      maxBytesPerTrigger: Option[Long] = None,
      logCompactInterval: Option[Int] = None,
      maxFileAge: Option[String] = None,
      rangeLayoutDir: Option[String] = None)
      : Unit = {
    val reader = spark.readStream.format("warc")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    maxBytesPerTrigger.foreach(n => reader.option("maxBytesPerTrigger", n))
    logCompactInterval.foreach(n => reader.option("logCompactInterval", n))
    maxFileAge.foreach(a => reader.option("maxFileAge", a))
    val src = reader.load(warcGlob)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sidecarProcessBatch(batch, batchId, outDir, decoders,
          cdxTable, buckets, compactEvery, rangeLayoutDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private[graft] def sidecarProcessBatch(batch: DataFrame, batchId: Long,
      outDir: String, decoders: Seq[graft.ext.Warc.ContentDecoder],
      cdxTable: Option[String] = None, buckets: Int = 32,
      compactEvery: Option[Int] = None,
      rangeLayoutDir: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    batch.persist()
    try {
      val recs = batch.as[graft.ext.Warc.WarcRow]
      val texts = graft.ext.Warc.htmlResponses(recs, decoders)
        .withColumn("text", graft.ext.Extract.mainText(col("html")))
      graft.ext.Warc.writeWet(texts, "target_uri", "warc_date", "text",
        s"$outDir/wet/batch_id=$batchId")
      graft.ext.Warc.writeWatRecords(recs, s"$outDir/wat/batch_id=$batchId",
        decoders)
      val cdx = batch.select(
        graft.ext.UrlOps.surtKey(col("target_uri")).as("urlkey"),
        col("target_uri"), col("warc_date"), col("warc_type"),
        col("content_type"), col("content_length"),
        col("path"), col("idx"))
      cdxTable match {
        case Some(t) =>
          // accumulated SERVING store: urlkey-bucketed+sorted catalog
          // table ([[graft.ext.CdxStore]]) — site queries range-prune
          // over ONE table instead of listing every batch_id dir; the
          // append is anti-joined on full row identity, so a replayed
          // batch appends nothing
          graft.ext.CdxStore.append(cdx, t, buckets)
          compactEvery.filter(n => n > 0 && (batchId + 1) % n == 0)
            .foreach(_ => graft.ext.CdxStore.compact(spark, t, buckets))
          // read-optimized serving layout, maintained INCREMENTALLY:
          // every batch refreshes only the blocks its keys intersect
          // ([[graft.ext.CdxStore.refreshRangeLayout]] — first batch
          // publishes the full layout). Per-batch, not per-compaction:
          // an incremental publish must cover EVERY append since the
          // previous one, and the batch in hand is exactly that delta —
          // a cadence would need delta accumulation across batches. A
          // replayed batch re-publishes identical block content
          // (append() already folded nothing) — wasteful, never wrong.
          rangeLayoutDir.foreach(d =>
            graft.ext.CdxStore.refreshRangeLayout(spark, t, d, cdx))
        case None =>
          cdx.sort("urlkey") // batch-sized; zone maps prune site ranges
            .write.mode("overwrite").parquet(s"$outDir/cdx/batch_id=$batchId")
      }
    } finally batch.unpersist(blocking = false)
  }

  /** Streaming DEDUPING-ARCHIVE maintenance — the storage-side twin of
    * [[sidecarMaintenance]]: each micro-batch of raw `.warc.gz` drops
    * RE-ARCHIVES deduped ([[graft.ext.Warc
    * .writeRecordsDedupedIncremental]] — content unchanged since ANY
    * earlier batch stores as a payload-free revisit of the ORIGINAL
    * capture, via the persistent bucketed digest store) into
    * `outDir/warc/batch_id=<n>`, and folds the batch's linkage index,
    * urlkey-keyed, into a [[graft.ext.CdxStore]] — so the accumulated
    * archive serves site-scoped, revisit-resolved, as-of-capable
    * queries ([[graft.ext.CdxStore.serveLatestCaptures]]) the moment a
    * batch lands. Replay discipline: batch-addressed output dirs, the
    * batch_id-scoped digest view (a replayed batch re-produces
    * byte-identical archives), and the store appends are anti-joined —
    * every effect idempotent, no markers needed. */
  def dedupArchiveMaintenance(spark: org.apache.spark.sql.SparkSession,
      warcGlob: String, outDir: String, checkpointDir: String,
      digestTable: String, cdxTable: String, buckets: Int = 32,
      compactEvery: Option[Int] = None,
      maxFilesPerTrigger: Option[Int] = None,
      maxBytesPerTrigger: Option[Long] = None,
      logCompactInterval: Option[Int] = None,
      maxFileAge: Option[String] = None): Unit = {
    val reader = spark.readStream.format("warc")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    maxBytesPerTrigger.foreach(n => reader.option("maxBytesPerTrigger", n))
    logCompactInterval.foreach(n => reader.option("logCompactInterval", n))
    maxFileAge.foreach(a => reader.option("maxFileAge", a))
    val src = reader.load(warcGlob)
      .filter(col("warc_type") === "response") // pushed to the reader
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dedupArchiveProcessBatch(batch, batchId, outDir, digestTable,
          cdxTable, buckets, compactEvery)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private[graft] def dedupArchiveProcessBatch(batch: DataFrame,
      batchId: Long, outDir: String, digestTable: String, cdxTable: String,
      buckets: Int, compactEvery: Option[Int]): Unit = {
    if (!batch.isEmpty) {
      val s = batch.sparkSession
      val idx = graft.ext.Warc.writeRecordsDedupedIncremental(
        batch.select(col("target_uri").as("uri"),
          col("warc_date").as("ts"), col("payload")),
        "uri", "ts", "payload", s"$outDir/warc/batch_id=$batchId",
        digestTable, batchId, buckets)
      graft.ext.CdxStore.append(
        idx.toDF().withColumn("urlkey",
          graft.ext.UrlOps.surtKey(col("target_uri"))),
        cdxTable, buckets)
      compactEvery.filter(n => n > 0 && (batchId + 1) % n == 0).foreach { _ =>
        graft.ext.Warc.compactDigestStore(s, digestTable, buckets)
        graft.ext.CdxStore.compact(s, cdxTable, buckets)
      }
    }
  }

  /** Streaming SEED maintenance — the crawl-bootstrap complement of
    * [[frontierMaintenance]]: micro-batches of FETCHED governance
    * resources (robots.txt bodies and sitemap payloads, tagged by a
    * kind column: `"robots"` | `"sitemap"`) become (1) SITEMAP FETCH
    * TARGETS — robots `Sitemap:` lines ([[graft.ext.Frontier
    * .seedsFromRobots]]) plus `<sitemapindex>` children — written to
    * `sitemapTargetsDir/batch_id=<n>` for the fetcher's next pass (the
    * protocol's recursion, driven by this loop, so a cyclic index
    * cannot hang anything), and (2) PAGE SEEDS — `<urlset>`/plain-text
    * entries ([[graft.ext.Frontier.seedsFromSitemaps]]) — written to
    * `seedsDir/batch_id=<n>`. A cumulative SEEDED-URL store (the
    * seen-store machinery, bucketed on url) makes the loop idempotent
    * and non-repeating: every emitted URL folds into the store and
    * candidates anti-join against it, so a re-fetched robots file or a
    * sitemap served twice emits nothing new, and replay is a no-op
    * (outputs overwrite their own batch directory; the store append is
    * anti-joined). NOTE the seeded store is DISTINCT from the crawl's
    * seen store — "already scheduled" and "already fetched" are
    * different facts; the frontier loop applies the latter. */
  def seedMaintenance(spark: org.apache.spark.sql.SparkSession,
      srcDir: String, seedsDir: String, sitemapTargetsDir: String,
      checkpointDir: String, seededTable: String,
      urlCol: String = "url", payloadCol: String = "payload",
      kindCol: String = "kind", blockedDomains: Seq[String] = Nil,
      buckets: Int = 32, maxFilesPerTrigger: Option[Int] = None,
      robotsTable: Option[String] = None,
      robotsAgent: String = "*"): Unit = {
    val reader = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val src = reader.parquet(srcDir)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        seedProcessBatch(batch, batchId, seedsDir, sitemapTargetsDir,
          checkpointDir, seededTable, urlCol, payloadCol, kindCol,
          blockedDomains, buckets, robotsTable, robotsAgent)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** One micro-batch of [[seedMaintenance]] — package-visible so the
    * replay contract is directly testable. Replay protocol (the
    * nearDupProcessBatch marker discipline, with the fold derived from
    * the PERSISTED outputs): compute + write outputs gated against the
    * store, mark `done`, then fold the batch's OWN OUTPUT FILES into
    * the seeded store (anti-joined = idempotent). A replay of a `done`
    * batch skips the compute — it must NOT re-gate against a store
    * that now contains its own emissions (that would overwrite the
    * outputs with empties) — and just re-applies the fold from disk,
    * which also heals a crash that fell between `done` and the fold. */
  private[graft] def seedProcessBatch(batch: DataFrame, batchId: Long,
      seedsDir: String, sitemapTargetsDir: String, checkpointDir: String,
      seededTable: String, urlCol: String, payloadCol: String,
      kindCol: String, blockedDomains: Seq[String], buckets: Int,
      robotsTable: Option[String] = None,
      robotsAgent: String = "*"): Unit = {
    if (!batch.isEmpty) {
      val s = batch.sparkSession
      val markers = new org.apache.hadoop.fs.Path(
        s"$checkpointDir/graft_seed_batches")
      val fs = markers.getFileSystem(s.sparkContext.hadoopConfiguration)
      val done = new org.apache.hadoop.fs.Path(markers, s"$batchId.done")
      val targetsOut = s"$sitemapTargetsDir/batch_id=$batchId"
      val seedsOut = s"$seedsDir/batch_id=$batchId"
      if (!fs.exists(done)) {
        val store =
          if (graft.store.Bucketing.recoverCompacted(s, seededTable))
            Some(seededTable)
          else None
        // robots rows → sitemap fetch targets (gated + store-deduped)
        val robots = batch.filter(col(kindCol) === "robots")
          .select(col(urlCol).as("_rurl"),
            col(payloadCol).cast("string").as("_rtxt"))
        val fromRobots = graft.ext.Frontier.seedsFromRobots(robots,
          "_rurl", "_rtxt", blockedDomains, seenTable = store)
        // sitemap rows → page seeds + child-sitemap targets. The page
        // side anti-joins the store inside seedsFromSitemaps; children
        // are deduped against the store HERE (its kind-aware gate keeps
        // them by design — the CRAWL seen store must not kill sitemap
        // fetches, but the SEEDED store must not re-schedule them)
        // robots compliance on page seeds from the cumulative robots
        // store, when one is named — robots fetched by ANY batch (incl.
        // THIS one, folded below in batch order by the caller's robots
        // maintenance) govern page scheduling
        val gate = robotsTable
          .filter(t => graft.store.Bucketing.recoverCompacted(s, t))
          .map { t =>
            val rules = graft.ext.Robots.latestRobots(s, t)
              .select(concat(lit("https://"), col("host"),
                lit("/robots.txt")).as("rurl"), col("txt"))
            graft.ext.Frontier.RobotsGate(rules, "rurl", "txt", robotsAgent)
          }
        val entries = graft.ext.Frontier.seedsFromSitemaps(
          batch.filter(col(kindCol) === "sitemap"),
          urlCol, payloadCol, blockedDomains, seenTable = store,
          robotsGate = gate)
        val pages = entries.filter(col("kind") === "url")
          .select(col("host"), col("url"), col("lastmod"))
        val children = entries.filter(col("kind") === "sitemap")
          .select(col("host"), col("url"))
        val childrenFresh = store.fold(children)(t =>
          graft.ext.Frontier.freshAgainstStore(children, t))
        fromRobots.unionByName(childrenFresh).distinct()
          .write.mode("overwrite").parquet(targetsOut)
        pages.write.mode("overwrite").parquet(seedsOut)
        fs.mkdirs(markers)
        fs.create(done, true).close(): Unit
      }
      // fold the batch's PERSISTED outputs into the seeded store —
      // idempotent (anti-joined), and running it unconditionally heals
      // a crash between the done marker and the fold. An all-empty
      // output can land as a schema-less directory (AQE writes zero
      // part files for an empty frame) — read as empty, not as error.
      def urlsOf(path: String): DataFrame =
        try s.read.parquet(path).select(col("url"))
        catch { case _: org.apache.spark.sql.AnalysisException =>
          s.range(0).select(lit("").as("url")) }
      graft.ext.Frontier.appendSeenStore(
        urlsOf(targetsOut).unionByName(urlsOf(seedsOut)),
        "url", seededTable, buckets)
    }
  }

  /** One micro-batch of [[frontierMaintenance]] — package-visible so
    * the replay/idempotency contract is directly testable. With
    * `graphStorePrefix` the batch's host edges ALSO fold into the
    * persistent edge store and the frontier ranks against the whole
    * crawl's graph ([[graft.ext.Frontier.fromPagesCumulative]]);
    * replay stays a no-op because the edge fold is anti-joined. */
  private[graft] def frontierProcessBatch(batch: DataFrame, batchId: Long,
      frontierDir: String, seenTable: String, urlCol: String,
      htmlCol: String, blockedDomains: Seq[String], perHostCap: Int,
      seed: String, prIterations: Int, buckets: Int,
      graphStorePrefix: Option[String] = None,
      compactEvery: Option[Int] = None,
      rankEvery: Int = 1,
      robotsTable: Option[String] = None,
      robotsAgent: String = "*"): Unit = {
    if (!batch.isEmpty) {
      val s = batch.sparkSession
      // recovery-aware existence check (Bucketing.recoverCompacted):
      // after a compactSeenStore crash the live name can be absent with
      // the complete copy under _compacting — a bare tableExists here
      // would run this batch storeless AND appendSeenStore would then
      // re-bootstrap, discarding the cumulative seen-URL state
      val store =
        if (graft.store.Bucketing.recoverCompacted(s, seenTable)) Some(seenTable)
        else None
      // robots COMPLIANCE from the cumulative robots store (when one is
      // named and exists): robots fetched by ANY earlier batch govern
      // this batch's scheduling — the latest fetch per host wins
      val gate = robotsTable
        .filter(t => graft.store.Bucketing.recoverCompacted(s, t))
        .map { t =>
          val rules = graft.ext.Robots.latestRobots(s, t)
            .select(concat(lit("https://"), col("host"),
              lit("/robots.txt")).as("rurl"), col("txt"))
          graft.ext.Frontier.RobotsGate(rules, "rurl", "txt", robotsAgent)
        }
      val frontier = graphStorePrefix match {
        case Some(g) =>
          // rank cadence: recompute PageRank (and refresh the persisted
          // snapshot) every `rankEvery` batches; between recomputes the
          // frontier ranks from the snapshot — edges still fold every
          // batch, and a missing/torn snapshot forces a recompute
          graft.ext.Frontier.fromPagesCumulative(batch, urlCol, htmlCol, g,
            blockedDomains, perHostCap, seed, prIterations,
            seenTable = store, buckets = buckets,
            robotsGate = gate,
            rankSnapshotTable = if (rankEvery > 1) Some(s"${g}_ranks") else None,
            recomputeRanks = rankEvery <= 1 || batchId % rankEvery == 0)
        case None =>
          graft.ext.Frontier.fromPages(batch, urlCol, htmlCol, blockedDomains,
            perHostCap, seed, prIterations, seenTable = store,
            robotsGate = gate)
      }
      frontier.write.mode("overwrite").parquet(s"$frontierDir/batch_id=$batchId")
      graft.ext.Frontier.appendSeenStore(batch.select(col(urlCol)), urlCol,
        seenTable, buckets)
      // maintenance cadence: every N batches fold the per-batch append
      // files back to one per bucket. Compaction swaps through the
      // crash-safe rename-aside protocol (Bucketing.compactSwap), and
      // the recovery-aware existence checks above repair a mid-swap
      // crash on replay — state is never rebuilt from one batch.
      compactEvery.filter(n => n > 0 && (batchId + 1) % n == 0).foreach { _ =>
        graft.ext.Frontier.compactSeenStore(s, seenTable, buckets)
        graphStorePrefix.foreach(g =>
          graft.ext.Graph.compactEdgeStore(s, g, buckets))
      }
    }
  }
}
