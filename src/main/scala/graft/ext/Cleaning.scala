package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composable cleaning pipeline (north-star x13 as a library
  * surface): language gate → token-length gate → optional quality
  * gates → blocked near-dup drop → survival stats. Every stage is a
  * DataFrame→DataFrame transform, so the whole configured pipeline
  * stays ONE Catalyst plan — filters fuse into the scan, the only
  * shuffles are the dedup stage's (block-keyed pair join) and the
  * final stats aggregate.
  *
  * At 100 TB the order is the cost model: cheap codegen'd gates
  * (langId, token count, ratios) run first and shrink the corpus
  * before the pair-generating dedup ever sees a row.
  */
object Cleaning {

  /** One knob per stage; `None`/`NaN`-free defaults mirror the common
    * web-corpus clean (keep English, 20-200 tokens, drop ≥0.8-Jaccard
    * near-dups within a source block, keep the lowest doc id). */
  final case class Config(
      lang: Option[String] = Some("en"),
      minTokens: Int = 20,
      maxTokens: Int = 200,
      /** e.g. Some(("stopword_ratio", 0.05)) keeps rows with ratio ≥ min. */
      minQuality: Option[(String, Double)] = None,
      /** Gopher repetition gates (top-2-gram / dup-3-gram char mass) —
        * shuffle-free folds, still stage-1 cost. */
      repetition: Option[TextOps.RepetitionThresholds] = None,
      /** Trained model gates (round-5 scorers). The classifier gate is
        * a plan-literal fold (codegen, stage-1 cost); the perplexity
        * gate joins the model counts — run it after the cheap gates. */
      classifier: Option[(QualityClassifier.Model, Double)] = None,
      maxPerplexity: Option[(LangModel.NGramModel, Double)] = None,
      /** Benchmark-decontamination gate: drop docs with ≥ minShared
        * distinct n-grams hitting the probe-set Bloom filter
        * ([[graft.streaming.DocumentIngest.DecontamGate]] — the same
        * stateless artifact the streaming edge uses; stage-1 cost: a
        * literal probe, no join). */
      decontam: Option[graft.streaming.DocumentIngest.DecontamGate] = None,
      /** Link-graph host prior ([[HostPrior]]): keep documents whose
        * host scores ≥ the floor in a (id, rank) host frame —
        * [[Graph.pageRank]], the [[Graph.hits]] authority side, or any
        * anchor-derived score. The signal the graph family computes
        * finally GATES the corpus instead of sitting unconsumed. */
      hostPrior: Option[HostPrior] = None,
      jaccardThreshold: Double = 0.8,
      blockCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text")

  /** Host-prior gate config: `ranks` is host-dimension-sized (one row
    * per host — broadcast onto the corpus, never shuffling it);
    * `hostCol` names the docs column carrying the host; a host ABSENT
    * from `ranks` keeps its documents when `keepUnranked` (a new host
    * has no endorsement signal yet — fail-open matches the robots/
    * canonical discipline) and drops them otherwise (closed-world
    * curation against a finished crawl's graph). */
  final case class HostPrior(
      ranks: DataFrame,
      hostCol: String,
      minRank: Double,
      keepUnranked: Boolean = true)

  /** Stage 1-2: the cheap, fully-codegen'd gates. */
  def gate(docs: DataFrame, cfg: Config): DataFrame = {
    val t = col(cfg.textCol)
    val langed = cfg.lang.fold(docs)(l =>
      docs.filter(TextOps.langId(t) === l))
    val sized = langed.filter(
      TextOps.tokenCount(t).between(cfg.minTokens, cfg.maxTokens))
    val qualed = cfg.minQuality.fold(sized) { case (feature, min) =>
      val f = (TextOps.qualityFeatures(t).toMap +
          ("compression_ratio" -> TextOps.compressionRatio(t)))
        .getOrElse(feature, throw new IllegalArgumentException(
          s"unknown quality feature '$feature'"))
      sized.filter(f >= min)
    }
    val repd = cfg.repetition.fold(qualed) { th =>
      // single-scalar fold finishes, referenced ONCE each: filter
      // pushdown substitutes exactly one fold copy per gate (the
      // struct form cost a second rep-2 fold per row — see
      // TextOps.topNgramCharMass)
      qualed
        .withColumn("_top2chars", TextOps.topNgramCharMass(t, 2))
        .withColumn("_dup3chars", TextOps.dupNgramCharMass(t, 3))
        .withColumn("_nc", length(t).cast("double"))
        .filter(
          (col("_nc") <= 0 ||
            col("_top2chars") / col("_nc") <= th.maxTop2GramCharFrac) &&
          (col("_nc") <= 0 ||
            col("_dup3chars") / col("_nc") <= th.maxDup3GramCharFrac))
        .drop("_top2chars", "_dup3chars", "_nc")
    }
    val decond = cfg.decontam.fold(repd) { d =>
      repd.filter(size(filter(
        array_distinct(TextOps.wordNgrams(t, d.n)),
        g => graft.functions.BloomFunctions.mightContain(lit(d.bloom), xxhash64(g))))
        < d.minShared)
    }
    val classed = cfg.classifier.fold(decond) { case (m, min) =>
      decond.filter(QualityClassifier.scoreCol(t, m) >= min)
    }
    // host prior AFTER the row-local gates (they shrink the corpus
    // first) — a broadcast join against the host-dimension rank frame,
    // so the corpus side never shuffles for this stage
    val hosted = cfg.hostPrior.fold(classed) { hp =>
      val r = hp.ranks.select(col("id").as(hp.hostCol),
        col("rank").as("_hp_rank"))
      classed.join(broadcast(r), Seq(hp.hostCol), "left")
        .filter(
          if (hp.keepUnranked) col("_hp_rank").isNull || col("_hp_rank") >= hp.minRank
          else coalesce(col("_hp_rank"), lit(Double.NegativeInfinity)) >= hp.minRank)
        .drop("_hp_rank")
    }
    cfg.maxPerplexity.fold(hosted) { case (m, maxPpl) =>
      LangModel.perplexityFilter(hosted, m, cfg.idCol, cfg.textCol, maxPpl)
    }
  }

  /** Stage 3: drop the higher-id member of every ≥threshold near-dup
    * pair inside a block (deterministic keeper = lowest id). */
  def dropNearDups(docs: DataFrame, cfg: Config): DataFrame = {
    val drops = Dedup.wordJaccardPairs(docs, cfg.idCol, cfg.textCol,
        cfg.blockCol, cfg.jaccardThreshold)
      .select(col("id2").as(cfg.idCol)).distinct()
    docs.join(drops, Seq(cfg.idCol), "left_anti")
  }

  /** The full pipeline: surviving documents (all input columns). */
  def clean(docs: DataFrame, cfg: Config = Config()): DataFrame =
    dropNearDups(gate(docs, cfg), cfg)

  /** Per-block survival report: (block, n_raw, n_kept). */
  def survivalStats(raw: DataFrame, cleaned: DataFrame, cfg: Config = Config()): DataFrame = {
    val r = raw.groupBy(col(cfg.blockCol))
      .agg(countDistinct(col(cfg.idCol)).as("n_raw"))
    val k = cleaned.groupBy(col(cfg.blockCol))
      .agg(countDistinct(col(cfg.idCol)).as("n_kept"))
    r.join(k, Seq(cfg.blockCol), "left").na.fill(0, Seq("n_kept"))
  }
}
