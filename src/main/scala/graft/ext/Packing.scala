package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document chunking and sequence packing — the layout stage of a
  * training-data pipeline: long documents are split into overlapping
  * token windows, and the corpus is packed into fixed-token-budget
  * training sequences.
  *
  * Reference scope: outside the reference's monitoring surface; part of
  * the training-pipeline extension scoped in alongside dedup/ANN
  * (BASELINE.json north-star).
  *
  * Scale design:
  *  - [[chunk]] is a pure declarative explode: chunk count and bounds
  *    are arithmetic on the token count, chunks materialize via
  *    `posexplode(transform(sequence(...)))` inside codegen — no UDF,
  *    no state, embarrassingly parallel.
  *  - [[packContiguous]] is the GPT-style pack-and-split layout: lay
  *    tokens out contiguously in a deterministic order and cut every
  *    `budget` tokens. Each sequence is EXACTLY full (no padding waste);
  *    a document may straddle a cut. Per-doc placement is one window
  *    cumsum — at scale, partition the window by a shard key so no
  *    global sort exists (mirrors Sampling.shuffledFiles sharding).
  *  - [[packFirstFitDecreasing]] is the no-split alternative (each doc
  *    lands whole in one bin): classic FFD, run independently per
  *    deterministic hash bucket via `flatMapGroups`. State is one open
  *    bin list per bucket, bounded by bucket size — choose enough
  *    buckets that a bucket's docs fit an executor, which also bounds
  *    the sort. FFD within a bucket wastes at most what the bucket
  *    boundary itself wastes; bucket count trades packing tightness for
  *    parallelism.
  */
object Packing {

  /** Split into token windows of `window` tokens advancing by `stride`
    * (= window - overlap). The last chunk may be short; documents with
    * ≤ `window` tokens yield exactly one chunk. Pure codegen explode. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"bad chunk geometry window=$window stride=$stride")
    val toks = split(trim(col(textCol)), "\\s+")
    val n = size(toks)
    // chunks start at 0, stride, 2*stride, ...; the last start is the
    // greatest multiple of stride < n that still adds new tokens:
    // nChunks = 1 + ceil((n - window)/stride) when n > window, else 1
    val nChunks = when(n <= window, lit(1))
      .otherwise(ceil((n - lit(window)).cast("double") / stride).cast("int") + 1)
    df.select(col(idCol), toks.as("__toks"), nChunks.as("__nc"))
      .select(col(idCol), posexplode(transform(sequence(lit(0), col("__nc") - 1),
        i => struct(
          array_join(slice(col("__toks"), i * lit(stride) + 1, lit(window)), " ")
            .as("chunk_text"),
          least(size(col("__toks")) - i * lit(stride), lit(window)).as("chunk_tokens")))))
      .select(col(idCol), col("pos").as("chunk_id"),
        col("col.chunk_text"), col("col.chunk_tokens"))
  }

  /** Sentence split for natural-boundary chunking: break after
    * terminal punctuation runs followed by whitespace. Array column;
    * empty/whitespace-only sentences never emitted. */
  def sentences(textCol: Column): Column =
    filter(split(trim(textCol), "(?<=[.!?])\\s+"), s => trim(s) =!= "")

  /** Natural-boundary chunking: greedily group CONSECUTIVE sentences
    * into chunks whose whitespace-token sum stays ≤ `maxTokens`; a
    * sentence that would overflow starts the next chunk, and a single
    * over-budget sentence becomes its own chunk (never split
    * mid-sentence — that is [[chunk]]'s job). The standard layout for
    * embedding/RAG corpora where windows must not cut sentences.
    *
    * The greedy scan is one `aggregate` fold over the sentence array —
    * inherently sequential PER DOCUMENT, embarrassingly parallel
    * across documents; no explode, no window, no shuffle (the
    * jusText-context scan pattern). `sentCol` is any array<string>
    * column — [[sentences]] for punctuated text, or a caller-derived
    * split. Output: (idCol, chunk_id, chunk_text, chunk_tokens,
    * n_sentences). */
  def chunkBySentences(df: DataFrame, idCol: String, sentCol: Column,
      maxTokens: Int): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val z = struct(
      array().cast("array<array<string>>").as("chunks"),
      array().cast("array<string>").as("cur"),
      lit(0).as("curTok"))
    val folded = aggregate(sentCol, z, (st, s) => {
      val t = size(split(s, "\\s+"))
      val cur = st.getField("cur")
      val curTok = st.getField("curTok")
      when(curTok > 0 && curTok + t > maxTokens,
        struct(
          concat(st.getField("chunks"), array(cur)).as("chunks"),
          array(s).as("cur"), t.as("curTok")))
        .otherwise(struct(
          st.getField("chunks").as("chunks"),
          concat(cur, array(s)).as("cur"), (curTok + t).as("curTok")))
    }, st => when(size(st.getField("cur")) > 0,
      concat(st.getField("chunks"), array(st.getField("cur"))))
      .otherwise(st.getField("chunks")))
    df.select(col(idCol), posexplode(folded).as(Seq("chunk_id", "sents")))
      .select(col(idCol), col("chunk_id"),
        array_join(col("sents"), " ").as("chunk_text"),
        aggregate(col("sents"), lit(0),
          (a, s) => a + size(split(s, "\\s+"))).as("chunk_tokens"),
        size(col("sents")).as("n_sentences"))
  }

  /** GPT-style contiguous packing: tokens of all documents are laid out
    * end-to-end in `orderBy` order and cut into sequences of exactly
    * `budget` tokens. Returns per-document placement:
    * `seq_first`/`seq_last` (0-based sequence ids the doc's tokens land
    * in), `offset` (token offset inside seq_first), `n_seqs`.
    *
    * One cumulative-sum window. `partitionCols` (optional) shards the
    * layout so each shard packs independently — the 100-TB path where no
    * global-ordered window exists; sequence ids are then per-shard.
    *
    * VALVE on the default: without `partitionCols` the window is
    * single-partition (every row through one task) — fine for the
    * bounded corpora the global layout exists for, a scale-killer
    * callable by accident past that. Rather than pay an extra count
    * job, a `row_number()` in the SAME window spec as the cumsum (one
    * WindowExec, zero extra pass, and — unlike a running `count()`
    * aggregate, which measured ~25% on the x91 gate — no second
    * aggregate buffer) raises loudly the moment row `maxGlobalRows + 1`
    * streams through, naming the sharded path. The sharded variant is
    * unguarded — its partitions are the caller's explicit scale
    * decision. */
  def packContiguous(df: DataFrame, ntokCol: String, budget: Long,
      orderBy: Seq[Column], partitionCols: Seq[Column] = Nil,
      maxGlobalRows: Long = 5000000L): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w0 = if (partitionCols.isEmpty) Window.orderBy(orderBy: _*)
             else Window.partitionBy(partitionCols: _*).orderBy(orderBy: _*)
    val w = w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val upto = sum(col(ntokCol).cast("long")).over(w)
    val before = upto - col(ntokCol)
    val tokStart =
      if (partitionCols.nonEmpty) before
      else when(row_number().over(w0) > lit(maxGlobalRows),
          raise_error(lit(s"packContiguous without partitionCols lays the " +
            s"whole corpus through ONE task's global window; input exceeds " +
            s"maxGlobalRows=$maxGlobalRows. Shard with partitionCols " +
            s"(sequence ids become per-shard) or raise the valve explicitly.")))
        .otherwise(before)
    df.withColumn("tok_start", tokStart)
      .withColumn("seq_first", (col("tok_start") / budget).cast("long"))
      .withColumn("seq_last",
        when(col(ntokCol) > 0, ((col("tok_start") + col(ntokCol) - 1) / budget).cast("long"))
          .otherwise((col("tok_start") / budget).cast("long")))
      .withColumn("offset", (col("tok_start") % budget).cast("long"))
      .withColumn("n_seqs", col("seq_last") - col("seq_first") + 1)
  }

  /** MATERIALIZED fixed-length training sequences — the tensor the
    * loader actually reads, produced from the token stream + the
    * [[packContiguous]] placement: every token's GLOBAL position is
    * its doc's `tok_start` plus its within-doc index, sequence id =
    * position / budget, and each sequence aggregates its tokens in
    * position order. Returns (seq, token_ids, n) with n == budget for
    * every sequence except the final partial one.
    *
    * `tokens` is the (idCol, pos, subpos, token_id) shape
    * ([[Bpe.tokenizeBytesToIds]]); `packing` is [[packContiguous]]'s
    * output over the SAME docs' counts. Shapes: one within-doc window
    * (doc-partitioned — bounded by doc length, never corpus-ordered),
    * one doc-keyed join, one hash aggregation per sequence; a sequence
    * holds exactly `budget` ints. With a sharded packing
    * (`partitionCols`) pass the shard columns as `extraKeys` so
    * sequences stay per-shard. */
  def packTokenIds(tokens: DataFrame, idCol: String, packing: DataFrame,
      budget: Long, extraKeys: Seq[String] = Nil): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"), col("subpos"))
    val placed = tokens
      .withColumn("__i", row_number().over(w).cast("long") - 1)
      .join(packing.select((idCol +: extraKeys).map(col) :+
        col("tok_start"): _*), Seq(idCol) ++ extraKeys)
      .withColumn("__g", col("tok_start") + col("__i"))
    placed
      .groupBy((extraKeys.map(col) :+ (col("__g") / budget).cast("long").as("seq")): _*)
      .agg(transform(
          array_sort(collect_list(struct(col("__g"), col("token_id")))),
          _.getField("token_id")).as("token_ids"))
      .withColumn("n", size(col("token_ids")))
  }

  /** Per-sequence DOCUMENT BOUNDARIES — the attention-mask metadata a
    * trainer needs next to [[packTokenIds]]'s token arrays: packed
    * sequences concatenate unrelated documents, and a block-diagonal
    * attention mask (tokens attend within their own document only)
    * needs, per sequence, the offsets where each document's tokens
    * begin. Returns `(seq, n_docs, doc_ids, boundaries)` — `doc_ids`
    * in layout order, `boundaries(i)` the in-sequence token offset
    * where `doc_ids(i)` starts (a document spilling in from the
    * previous sequence starts at 0). Derived from the PLACEMENT frame
    * alone — no token join, rows ∝ Σ n_seqs: one explode over each
    * doc's sequence range + one per-sequence aggregation. With a
    * sharded packing pass the shard columns as `extraKeys`. */
  def sequenceDocBoundaries(packing: DataFrame, idCol: String, budget: Long,
      extraKeys: Seq[String] = Nil): DataFrame = {
    require(budget > 0, "budget must be positive")
    packing
      .select((extraKeys.map(col) :+ col(idCol) :+ col("tok_start") :+
        explode(sequence(col("seq_first"), col("seq_last"))).as("seq")): _*)
      .withColumn("off",
        greatest(col("tok_start") - col("seq") * budget, lit(0L)))
      .groupBy((extraKeys.map(col) :+ col("seq")): _*)
      .agg(count(lit(1)).cast("long").as("n_docs"),
        transform(sort_array(collect_list(struct(col("off"), col(idCol)))),
          _.getField(idCol)).as("doc_ids"),
        sort_array(collect_list(col("off"))).as("boundaries"))
  }

  final case class PackedDoc(bucket: Int, bin: Int, id: Long, n_tokens: Int)

  /** First-fit-decreasing bin packing, whole documents only (no doc
    * spans two bins). Deterministic: bucket = seeded hash of the id
    * (Sampling.drawHex leading bits), docs sorted (tokens desc, id) per
    * bucket, classic FFD fold. Docs exceeding the budget get a bin of
    * their own (callers truncate or chunk first — see [[chunk]]).
    * Bin ids are (bucket, bin) pairs; bins never cross buckets. */
  def packFirstFitDecreasing(df: DataFrame, idCol: String, ntokCol: String,
      budget: Int, buckets: Int, seed: String = "graft-pack-v1"): Dataset[PackedDoc] = {
    require(budget > 0 && buckets > 0 && buckets <= 0x10000,
      s"budget must be positive and buckets in (0, 65536], got $budget/$buckets")
    val spark = df.sparkSession
    import spark.implicits._
    // long intermediate: prefix·buckets overflows int at buckets > 2^15
    // (the shuffledFiles overflow, same expression)
    val bucket = (conv(substring(Sampling.drawHex(col(idCol), seed), 1, 4), 16, 10)
      .cast("long") * buckets / lit(0x10000L)).cast("int")
    df.select(bucket.as("bucket"), col(idCol).cast("long").as("id"),
        col(ntokCol).cast("int").as("n"))
      .as[(Int, Long, Int)]
      .groupByKey(_._1)
      .flatMapGroups { (bkt, it) =>
        val docs = it.toArray.sortBy { case (_, id, n) => (-n, id) }
        // open-bin fills; FFD scans bins in id order (first fit)
        val fills = scala.collection.mutable.ArrayBuffer.empty[Int]
        docs.iterator.map { case (_, id, n) =>
          var i = 0
          while (i < fills.length && fills(i) + n > budget) i += 1
          if (i == fills.length) fills += 0
          fills(i) += n
          PackedDoc(bkt, i, id, n)
        }
      }
  }
}
