package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting / shuffling for training-data
  * pipelines (BASELINE.json north-star: a 100-TB corpus needs its
  * train/val/test split, stratified subsamples, and a reproducible
  * training order — all WITHOUT a random() that differs per run, per
  * partition, or per engine).
  *
  * Reference scope: the reference (rearview, /root/reference/README.md:6)
  * has no sampling surface — this module is part of the
  * training-pipeline extension the survey scopes in alongside dedup/ANN.
  *
  * Design for 100 TB:
  *  - Everything keys off `md5(key || seed)` — a pure codegen'd column
  *    expression. The SPLIT is therefore shuffle-free: a row's bucket is
  *    a function of its own bytes, so 1000 executors decide locally, and
  *    the same row lands in the same bucket on every run, every engine,
  *    every cluster size. (Adding/removing OTHER rows never moves a row
  *    between buckets — unlike ntile/percent_rank splits.)
  *  - Fraction thresholds are compared LEXICOGRAPHICALLY on the hex
  *    digest. md5 hex is uniform over [0, 2^128); the threshold for
  *    fraction f is the 32-hex-digit integer floor(f·2^128). String
  *    compare on fixed-width lowercase hex == numeric compare, and it is
  *    exactly portable SQL (the DuckDB oracle runs the same literals) —
  *    no conv()/hash() that differ across engines.
  *  - Stratified exact-N sampling never ranks a whole stratum in one
  *    task: the draw's leading 16 bits bucket each row (a prefix, so
  *    bucket order == draw order), a metadata-sized aggregation finds
  *    the one critical bucket per stratum where the quota lands, whole
  *    buckets below it keep with a broadcast flag, and only the
  *    critical sliver (≈ stratum/65536 rows) pays a ranking window —
  *    partitioned by (stratum, bucket), never bare strata. With 5–20
  *    large domains at 100 TB this is the difference between one task
  *    per domain and full parallelism.
  *  - The global shuffle for training order is rank over the hash — a
  *    range exchange at scale. The scale path `shuffledFiles` avoids the
  *    global sort: repartition by hash bucket + sortWithinPartitions,
  *    giving a deterministic total order (bucket, hash) with no range
  *    sampling pass, which is how you'd lay out 100 TB of shuffled
  *    training shards.
  */
object Sampling {

  /** floor(f · 2^128) as a 32-char lowercase hex literal — the
    * lexicographic threshold on an md5 hex digest for fraction f. */
  def hexThreshold(f: Double): String = {
    require(f >= 0.0 && f <= 1.0, s"fraction $f out of [0,1]")
    val full = BigInt(1) << 128
    val t = (BigDecimal(full) * BigDecimal(f)).toBigInt.min(full - 1).max(BigInt(0))
    f"$t%032x"
  }

  /** The deterministic per-row draw: md5 of the key column salted with
    * the seed. Uniform on [0, 2^128) as a hex string; pure codegen.
    *
    * A NULL key fails loudly: every sampling operator routes through
    * this draw, and a null draw would otherwise fall out of the
    * bucket joins and `<` filters SILENTLY — rows vanishing from
    * splits/samples/shuffles in a way that depends on which arm of
    * which operator touched them, while the documented row_number
    * oracle forms would have ranked them. Sampling keys are ids; a
    * null id is an upstream bug this surfaces, not data to route. */
  def drawHex(key: Column, seed: String): Column =
    md5(concat(
      when(key.isNotNull, key.cast("string"))
        .otherwise(raise_error(lit(
          "Sampling.drawHex: NULL sampling key — null draws would " +
            "silently drop rows from samples; fix or filter upstream"))),
      lit(":"), lit(seed)))

  /** Assign each row a split label from cumulative fraction cuts.
    * `fractions` maps label -> fraction; labels are assigned in the
    * given order (use a Seq to control it); fractions must sum to 1.
    * Shuffle-free: one CASE WHEN over the hash.
    *
    * LEAKAGE-SAFE GROUP SPLITS: the key chooses the atomicity unit.
    * Keyed on a row id, near-duplicate documents can straddle
    * train/test; keyed on the GROUP that carries the duplication —
    * the registered domain ([[graft.ext.UrlOps.urlDomain]]) for web
    * corpora, a cluster id after dedup — every member lands in the
    * SAME split by construction (the split is a pure function of the
    * key), which is the standard contamination-safe protocol. Fraction
    * targets then hold over GROUPS, not rows; x72 pins the domain
    * form. */
  def splitColumn(key: Column, seed: String, fractions: Seq[(String, Double)]): Column = {
    val sum = fractions.map(_._2).sum
    require(math.abs(sum - 1.0) < 1e-9, s"fractions sum to $sum, want 1.0")
    val d = drawHex(key, seed)
    val cuts = fractions.scanLeft(0.0)(_ + _._2).tail // cumulative
    // last label is the ELSE arm so float dust in the last cut can't
    // leave rows unlabeled
    val whens = fractions.init.zip(cuts.init).foldLeft(Option.empty[Column]) {
      case (acc, ((label, _), cum)) =>
        val cond = d < lit(hexThreshold(cum))
        Some(acc.fold(when(cond, lit(label)))(_.when(cond, lit(label))))
    }
    whens.fold(lit(fractions.last._1))(_.otherwise(lit(fractions.last._1)))
  }

  /** Keep a deterministic `fraction` of rows (hash-Bernoulli). */
  def sampleFraction(key: Column, seed: String, fraction: Double): Column =
    drawHex(key, seed) < lit(hexThreshold(fraction))

  /** Exactly-N-per-stratum sample: keep each stratum's first n rows in
    * seeded-hash order — a reproducible uniform draw without
    * replacement. Scale shape: see [[takeQuotaPerStratum]] (no window
    * ever partitions the corpus by bare strata). */
  def stratifiedTake(df: DataFrame, strata: Seq[String], key: Column,
      seed: String, n: Int): DataFrame =
    takeQuotaPerStratum(df, strata, key, seed, lit(n.toLong))

  /** Keep each stratum's first `quotaCol` rows in seeded-draw order
    * (draw asc, key asc) — the shared engine behind [[stratifiedTake]]
    * and [[mixtureTake]], shaped for 100 TB with a handful of large
    * domains:
    *   1. bucket each row by the draw's leading 16 bits (a PREFIX of
    *      the draw, so bucket asc == draw asc — a pure per-row
    *      expression, no shuffle);
    *   2. one hash aggregation (map-side partials) → per-(stratum,
    *      bucket) counts — ≤ |strata|·65536 rows, METADATA-sized;
    *   3. a running count over that tiny frame (window partitioned by
    *      stratum over ≤65536 rows, NOT the corpus) finds the single
    *      CRITICAL bucket per stratum where the quota lands → one row
    *      per stratum, broadcast;
    *   4. rows in buckets below the critical keep on the broadcast
    *      flag alone (map-only); only the critical sliver
    *      (≈ stratum/65536 rows) pays a ranking window, partitioned by
    *      (strata, bucket) — never bare strata over the corpus.
    * Strata under quota have no critical bucket (null flag ⇒ keep all);
    * a zero quota makes the FIRST bucket critical with zero headroom
    * (⇒ keep none). Result is EXACTLY the textbook per-stratum
    * `row_number() <= quota` answer — the oracle runs that form. */
  private[ext] def takeQuotaPerStratum(df: DataFrame, strata: Seq[String],
      key: Column, seed: String, quotaCol: Column): DataFrame =
    takeQuotaByDraw(df, strata, drawHex(key, seed), key, quotaCol)

  /** [[stratifiedTake]] under a caller-supplied PRIORITY: each stratum
    * keeps its `n` best rows by (priority DESC, seeded draw, key) —
    * the frontier's page-rank-ordered politeness cap. `priority` is a
    * [0,1] double on the 1e-9 grid (the [[graft.ext.Graph]] rank
    * contract) — ENFORCED: null raises, out-of-range clamps to the
    * nearest bound. It folds into the draw as a fixed-width 8-hex prefix
    * of (1e9 − priority·1e9), so draw asc == priority desc and the
    * critical-bucket engine applies unchanged — corpus-safe, no
    * per-stratum window over the data. Equal priorities fall back to
    * the seeded uniform draw (exactly [[stratifiedTake]]'s order). */
  def prioritizedTake(df: DataFrame, strata: Seq[String], priority: Column,
      key: Column, seed: String, n: Int): DataFrame = {
    // enforce the [0,1] contract rather than document it: a NULL
    // priority would hash to a null bucket that sorts FIRST (best),
    // and p > 1 would go negative — hex() then emits 16
    // two's-complement chars whose 8-char lpad TRUNCATION sorts the
    // best rows LAST. Fail loudly on null (the drawHex discipline),
    // clamp float dust into the grid.
    val p = when(priority.isNull, raise_error(lit(
        "Sampling.prioritizedTake: NULL priority — null buckets would " +
          "silently sort first; fix or filter upstream")).cast("double"))
      .otherwise(least(greatest(priority.cast("double"), lit(0.0)), lit(1.0)))
    val pHex = lpad(hex(
      lit(1000000000L) - round(p * 1e9).cast("long")), 8, "0")
    takeQuotaByDraw(df, strata, concat(pHex, drawHex(key, seed)), key,
      lit(n.toLong))
  }

  /** CLUSTER-BALANCED sampling — diversity-preserving selection over an
    * EMBEDDING column (the "cluster-then-sample" curation move,
    * SemDeDup's diversification cousin): a seeded k-means quantizer
    * ([[Ivf.build]] — the same cells the ANN index uses) partitions the
    * corpus into `cells` semantic modes, then [[stratifiedTake]] keeps
    * `perCell` per mode under the seeded draw — a dominant mode
    * (boilerplate cluster, one over-crawled topic) can never fill the
    * budget that a uniform sample would hand it. Under-populated cells
    * keep everything. Returns the corpus columns + `cell`. Scale: the
    * quantizer fit is one MLlib job over vectors; the take is the
    * critical-bucket engine — per-cell exactness with no corpus-wide
    * windows.
    *
    * Determinism caveat, stated rather than papered over: GIVEN the
    * kmeans seed and a fixed input layout the whole selection is
    * reproducible, but MLlib's k-means aggregates are not
    * partitioning-invariant — re-laying-out the corpus can move cell
    * boundaries and therefore the sample (unlike every hash-draw
    * sampler above, whose draws are pure row functions). Pin the
    * input layout (read the same files the same way) when exact
    * reproducibility across runs matters. */
  def clusterBalancedTake(corpus: DataFrame, idCol: String, vecCol: String,
      cells: Int, perCell: Int, seed: String,
      kmeansSeed: Long = 42L): DataFrame = {
    val assigned = Ivf.build(corpus.select(col(idCol), col(vecCol)),
      cells, kmeansSeed, idCol, vecCol).assigned
    stratifiedTake(
      corpus.join(assigned.select(col(idCol), col("cell")), Seq(idCol)),
      Seq("cell"), col(idCol), seed, perCell)
  }

  /** The critical-bucket quota engine over an arbitrary fixed-width
    * hex draw (bucket = the draw's leading 16 bits, so any draw whose
    * PREFIX is monotone in the desired order works). */
  private[ext] def takeQuotaByDraw(df: DataFrame, strata: Seq[String],
      d: Column, key: Column, quotaCol: Column): DataFrame = {
    val scols = strata.map(col)
    val withB = df.withColumn("__bkt", conv(substring(d, 1, 4), 16, 10).cast("long"))
    val counts = withB.groupBy(scols :+ col("__bkt"): _*).agg(count(lit(1)).as("__c"))
    // running count strictly below each bucket, in draw order — a
    // window over the metadata frame only
    val wAsc = Window.partitionBy(scols: _*).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = counts
      .withColumn("__below", coalesce(sum(col("__c")).over(wAsc), lit(0L)))
      .withColumn("__q", quotaCol)
    // the one bucket per stratum where the running count crosses the
    // quota (monotone ⇒ unique); absent ⇔ the stratum is under quota
    val crit = cum
      .filter(col("__below") <= col("__q") && col("__below") + col("__c") > col("__q"))
      .select(strata.map(s => col(s).as(s"__s_$s")) ++ Seq(
        col("__bkt").as("__critb"), col("__below").as("__cbelow"),
        col("__q").as("__cq")): _*)
    // no broadcast hint: with few large domains crit is a handful of
    // rows and AQE broadcasts it; with millions of tiny strata a forced
    // broadcast would be the bottleneck (the bloom-join precedent)
    val joinCond = strata.map(s => col(s) <=> col(s"__s_$s")).reduce(_ && _)
    val joined = withB.join(crit, joinCond, "left")
    // whole-kept buckets: broadcast flag only — no window touches them
    val wholeKept = joined.filter(col("__critb").isNull || col("__bkt") < col("__critb"))
    // the critical sliver pays the only per-row ranking window
    val wCrit = Window.partitionBy(scols :+ col("__bkt"): _*).orderBy(d, key)
    val critKept = joined.filter(col("__bkt") === col("__critb"))
      .withColumn("__rk", row_number().over(wCrit))
      .filter(col("__cbelow") + col("__rk") <= col("__cq"))
    val orig = df.columns.map(col)
    wholeKept.select(orig: _*).union(critKept.select(orig: _*))
  }

  /** Reproducible global shuffle order: the 1-based rank of every row
    * under (draw asc, key asc) — WITHOUT a global sort or a
    * single-partition ranking window. The draw's leading 16 bits bucket
    * each row (prefix ⇒ bucket asc == draw asc); one metadata-sized
    * aggregation counts rows per bucket; the running count strictly
    * below each bucket broadcasts (≤65536 rows); global rank = that
    * offset + the row's rank INSIDE its bucket — a window partitioned
    * by bucket, so the biggest partition is ≈ corpus/65536 and ranking
    * runs 65536-way parallel. Identical output to
    * `row_number() OVER (ORDER BY draw, key)` — the oracle runs that
    * form. [[shuffledFiles]] remains the write-path twin (no rank
    * column, just bucket-ordered shards). */
  def shuffledOrder(df: DataFrame, key: Column, seed: String): DataFrame = {
    val d = drawHex(key, seed)
    val withB = df.withColumn("__bkt", conv(substring(d, 1, 4), 16, 10).cast("long"))
    val counts = withB.groupBy(col("__bkt")).agg(count(lit(1)).as("__c"))
    val wAsc = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1) // metadata frame only
    val below = counts
      .withColumn("__below", coalesce(sum(col("__c")).over(wAsc), lit(0L)))
      .select(col("__bkt"), col("__below"))
    val wIn = Window.partitionBy(col("__bkt")).orderBy(d, key)
    withB.join(broadcast(below), "__bkt")
      .withColumn("shuffle_rank", col("__below") + row_number().over(wIn))
      .drop("__bkt", "__below")
  }

  /** Temperature-weighted domain mixture: sample ~`totalN` docs with
    * per-stratum quotas ∝ count^alpha — alpha < 1 flattens the natural
    * distribution (upsamples tail domains/languages relative to their
    * share), the standard pre-training mixture move (GPT-3 §2.2,
    * Gopher/MassiveText table 2 use exactly this shape).
    *
    * Exactness discipline (the quota must be bit-identical across
    * engines): weight_s = floor(count_s^alpha · 10^6) as an INTEGER, so
    * the only float op is pow on an integer count — IEEE-identical
    * everywhere — and the quota is integer arithmetic from there:
    * quota_s = min(count_s, totalN · w_s ÷ Σw) with integer division.
    * Members are taken per stratum in seeded-hash order (uniform without
    * replacement, reproducible) via [[takeQuotaPerStratum]] — no window
    * ever partitions the corpus by bare strata. Strata counts are a
    * driver-side collect bounded by the number of domains, never data
    * volume. */
  def mixtureTake(df: DataFrame, strata: Seq[String], key: Column,
      seed: String, alpha: Double, totalN: Long): DataFrame = {
    val scols = strata.map(col)
    val counts = df.groupBy(scols: _*).agg(count(lit(1)).as("__n")).collect()
    val weights = counts.map { r =>
      val n = r.getLong(r.length - 1)
      // sqrt is IEEE correctly-rounded (pow is not) — use it when it IS
      // the power so the integer weight is bit-identical across engines
      val p = if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha)
      val w = math.floor(p * 1e6).toLong
      (r.toSeq.init, n, w)
    }
    val wSum = weights.map(_._3).sum
    val quotas = weights.map { case (k, n, w) =>
      // BigInt intermediate: totalN·w reaches ~1e23 at the 100-TB design
      // point (w = floor(n^alpha·1e6) ≈ 1e15 for a 1e9-doc stratum) —
      // Long arithmetic wraps negative and the negative quota would make
      // takeQuotaPerStratum's keep-all arm fire, silently OVER-sampling
      // the stratum. Same integer division, exact at every scale.
      (k, math.min(n, (BigInt(totalN) * w / wSum).toLong))
    }.toMap
    val quota = quotas.foldLeft(lit(0L)) { case (acc, (k, q)) =>
      when(strata.zip(k).map { case (s, v) => col(s) <=> lit(v) }.reduce(_ && _), lit(q))
        .otherwise(acc)
    }
    takeQuotaPerStratum(df, strata, key, seed, quota)
  }

  /** Epoch-weighted upsampling — the data-mixing move where a source is
    * repeated a FRACTIONAL number of times per training epoch (LLaMA's
    * "Wikipedia ×2.45"-style table): every row materializes
    * floor(epochs) copies plus one more with probability
    * frac(epochs), decided by a seeded per-(row, copy) draw — so the
    * realized corpus is deterministic, engine-independent, and stable
    * under corpus growth (each row decides alone).
    *
    * Mechanics: copies explode from a sequence (pure codegen, no
    * shuffle); the fractional copy keeps iff the draw's first 8 hex
    * chars compare below the threshold `%08x`-formatted from
    * floor(frac·2^32) — fixed-width lowercase hex, so string compare ==
    * numeric compare and the identical rule runs in portable SQL (the
    * x14 hexThreshold discipline at per-row-threshold granularity).
    * Returns the input columns plus `epoch` (0-based copy index). */
  def repeatWeighted(df: DataFrame, key: Column, seed: String,
      epochsCol: Column): DataFrame = {
    val nFull = floor(epochsCol).cast("int")
    val frac = epochsCol - floor(epochsCol)
    val thr = format_string("%08x", floor(frac * lit(4294967296.0)).cast("long"))
    df.withColumn("epoch",
        explode(sequence(lit(0), greatest(ceil(epochsCol).cast("int") - 1, lit(0)))))
      .filter(col("epoch") < nFull ||
        (col("epoch") === nFull &&
          substring(drawHex(concat(key.cast("string"), lit("#"), col("epoch")), seed),
            1, 8) < thr))
  }

  /** Scale path for writing shuffled training shards: assign each row a
    * deterministic shard = hash-prefix bucket, repartition by shard, sort
    * within each shard by the hash. Concatenating shards 0..n-1 yields
    * EXACTLY the [[shuffledOrder]] order (the shard id is the draw's
    * most-significant bits), but no stage needs a global sort or its
    * range-sampling job. */
  def shuffledFiles(df: DataFrame, key: Column, seed: String, shards: Int): DataFrame = {
    require(shards > 0 && shards <= 0x10000, s"shards $shards out of (0, 65536]")
    val d = drawHex(key, seed)
    // bucket by the draw's leading 16 bits so bucket order == draw order.
    // LONG intermediate: prefix·shards reaches 2^31 at the allowed
    // shards = 65536, and an int multiply wraps half the corpus to
    // negative shard ids (or throws under ANSI).
    val bucket = ((conv(substring(d, 1, 4), 16, 10).cast("long") * shards) / lit(0x10000L)).cast("int")
    df.withColumn("shard", bucket)
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), d, key)
  }

  /** Per-stratum top-k by SCORE — "keep each domain's k best documents"
    * (domain caps / per-source quality cuts), the ranked-selection
    * sibling of [[stratifiedTake]] (random per-stratum quota) and
    * [[tokenBudgetSelect]] (global score budget). Result is EXACTLY the
    * textbook `row_number() OVER (PARTITION BY strata ORDER BY score
    * DESC, id ASC) <= k` answer — the oracle runs that form — but no
    * window ever partitions the corpus by bare strata:
    *   1. bucket scores on a fixed grid (`floor(score·grid)`, monotone:
    *      a higher bucket strictly outscores a lower one, equal scores
    *      share a bucket);
    *   2. one hash aggregation → per-(stratum, bucket) counts —
    *      metadata-sized;
    *   3. a running count over that tiny frame, per stratum in bucket-
    *      DESC order, finds the single CRITICAL bucket where rank k
    *      lands (absent ⇔ the stratum is under quota: keep all);
    *   4. buckets above the critical keep whole on the joined flag
    *      (map-only); only the critical sliver pays a ranking window,
    *      partitioned by (strata, bucket).
    * Degenerate-bucket valve (the [[tokenBudgetSelect]] discipline):
    * a critical bucket holding more than `maxCriticalRows` rows
    * RECURSES on a refined score — the fractional score position
    * within the bucket while scores still vary, else the id's
    * normalized position (numeric ids; (score desc, id asc) is pure
    * id asc once scores are constant). Non-numeric ids with a
    * constant-score oversized bucket raise a loud per-row error
    * instead of silently planning a stratum-sized window. Scores must
    * be non-null and non-NaN. */
  def topPerStratum(df: DataFrame, strata: Seq[String], scoreCol: Column,
      idCol: String, k: Int, grid: Double = 1000.0,
      maxCriticalRows: Long = 4000000L): DataFrame = {
    val out = df.columns
    rankQuotaPerStratum(
        df.withColumn("__score", scoreCol.cast("double"))
          .withColumn("__rq", lit(k.toLong)),
        strata, idCol, grid, maxCriticalRows, 0)
      .select(out.map(col): _*)
  }

  /** [[topPerStratum]]'s engine: df carries `__score` (the ranking
    * score, refined per recursion level) and `__rq` (the remaining
    * per-stratum quota, constant within a stratum). The per-stratum
    * critical-bucket frame is COLLECTED once per level — bounded by the
    * number of strata, never data volume (the [[mixtureTake]]/
    * [[tokenBudgetSelect]] precedent) — so whether any stratum needs
    * the refinement recursion is a plan-time decision, and the
    * corpus-side join is against a broadcast-sized local relation. */
  private def rankQuotaPerStratum(df: DataFrame, strata: Seq[String],
      idCol: String, grid: Double, maxCriticalRows: Long,
      depth: Int): DataFrame = {
    val scols = strata.map(col)
    val idIsNumeric =
      df.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    val idPos =
      if (idIsNumeric) col(idCol).cast("double") else lit(null).cast("double")
    val withB = df.withColumn("__b", floor(col("__score") * grid).cast("long"))
    // per-(stratum, bucket) counts + the stats the valve needs —
    // metadata-sized (strata × occupied buckets)
    val perB = withB.groupBy(scols :+ col("__b"): _*).agg(
      count(lit(1)).as("__c"), max(col("__rq")).as("__q"),
      min(col("__score")).as("__smin"), max(col("__score")).as("__smax"),
      min(idPos).as("__imin"), max(idPos).as("__imax"))
    // rows in strictly-higher buckets, per stratum — window over the
    // metadata frame only, then one strata-bounded collect
    val wDesc = Window.partitionBy(scols: _*).orderBy(col("__b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val critFrame = perB
      .withColumn("__above", coalesce(sum(col("__c")).over(wDesc), lit(0L)))
      .filter(col("__above") <= col("__q") && col("__above") + col("__c") > col("__q"))
      .select(strata.map(s => col(s).as(s"__s_$s")) ++ Seq(
        col("__b").as("__critb"), col("__above").as("__cabove"),
        col("__c").as("__cn"), col("__q").as("__cq"),
        col("__smin").as("__csmin"), col("__smax").as("__csmax"),
        col("__imin").as("__cimin"), col("__imax").as("__cimax")): _*)
    val critLocal = critFrame.collect()
    if (critLocal.isEmpty) return df // every stratum under quota
    val oversizedStrata = critLocal.filter(_.getAs[Long]("__cn") > maxCriticalRows)
    oversizedStrata.find(r =>
        r.getAs[Double]("__csmin") == r.getAs[Double]("__csmax") && !idIsNumeric)
      .foreach { _ => throw new IllegalArgumentException(
        s"topPerStratum: a constant-score critical bucket exceeds " +
        s"maxCriticalRows=$maxCriticalRows and id '$idCol' is non-numeric " +
        "— raise grid to match score resolution or raise maxCriticalRows") }
    require(oversizedStrata.isEmpty || depth < 12,
      s"topPerStratum: bucket refinement did not converge after $depth " +
      "levels — ids are likely non-distinct; raise maxCriticalRows or grid")
    val spark = df.sparkSession
    val crit = spark.createDataFrame(
      java.util.Arrays.asList(critLocal: _*), critFrame.schema)
    val joinCond = strata.map(s => col(s) <=> col(s"__s_$s")).reduce(_ && _)
    val joined = withB.join(broadcast(crit), joinCond, "left")
    val outCols = df.columns.map(col)
    // under-quota strata (no critical bucket) and higher buckets keep
    // whole — no window touches them
    val wholeKept = joined.filter(col("__critb").isNull || col("__b") > col("__critb"))
    val critRows = joined.filter(col("__b") === col("__critb"))
    // the critical sliver pays the only per-row ranking window
    val wCrit = Window.partitionBy(scols :+ col("__b"): _*)
      .orderBy(col("__score").desc, col(idCol).asc)
    val ranked = critRows.filter(col("__cn") <= maxCriticalRows)
      .withColumn("__rk", row_number().over(wCrit))
      .filter(col("__cabove") + col("__rk") <= col("__cq"))
    val base = wholeKept.select(outCols: _*).union(ranked.select(outCols: _*))
    if (oversizedStrata.isEmpty) base
    else {
      // refined score: fractional in-bucket score position while scores
      // vary (an increasing affine map — order unchanged); the id's
      // normalized position once constant ((score desc, id asc) is pure
      // id asc there; double-rounding ties break on the id tiebreak)
      val refined = when(col("__csmin") =!= col("__csmax"),
          col("__score") * grid - col("__critb"))
        .otherwise(-((idPos - col("__cimin")) /
          greatest(col("__cimax") - col("__cimin"), lit(1.0))))
      val recursed = rankQuotaPerStratum(
        critRows.filter(col("__cn") > maxCriticalRows)
          .withColumn("__score", refined)
          .withColumn("__rq", col("__cq") - col("__cabove"))
          .select(outCols: _*),
        strata, idCol, math.max(grid, 1024.0), maxCriticalRows, depth + 1)
      base.union(recursed.select(outCols: _*))
    }
  }

  /** Token-budget corpus selection: keep documents in descending
    * `scoreCol` order (ties → ascending `idCol`) while the running token
    * total stays ≤ `budget` — "take the best B tokens", the curation
    * step between quality scoring and tokenization.
    *
    * Scale design: the textbook formulation is one GLOBAL cumulative-sum
    * window, which Spark executes on a single partition — fine for a
    * demo, fatal at 100 TB. This implementation finds the score
    * threshold with bounded shuffles instead:
    *   1. bucket scores on a fixed grid (`floor(score·grid)` — a pure
    *      per-row expression);
    *   2. one hash aggregation → per-bucket token totals (≤ grid+1 rows,
    *      METADATA-sized, independent of corpus size);
    *   3. cumulative totals over the tiny bucket frame (driver-scale
    *      window) find the one CRITICAL bucket where the budget lands:
    *      higher buckets are kept whole, lower buckets dropped whole —
    *      decided per-row with a broadcast join, no global order;
    *   4. only the critical bucket's rows (≈ corpus/grid, and only they)
    *      pay a cumulative window, partitioned BY BUCKET, offset by the
    *      tokens already spent above it.
    * Degenerate-bucket valve: when the critical bucket holds more than
    * `maxCriticalRows` rows (scores constant, or quantized coarser than
    * `grid`), step 4 would be a single-partition cumsum over ≈ the
    * corpus — instead the selection RECURSES into the bucket on a
    * refined score: the fractional score position within the bucket
    * (resolution ×grid per level) while scores still vary, or the id's
    * normalized position (numeric ids; (score desc, id asc) order is
    * pure id asc once scores are constant) — so each level splits the
    * oversized bucket grid-ways again. Non-numeric ids with a
    * constant-score oversized bucket fail loudly instead of silently
    * planning a corpus-sized single-partition window.
    *
    * Result is EXACTLY the global-cumsum answer (the oracle runs that
    * form): bucket boundaries respect score order, and within the
    * critical bucket the same (score desc, id asc) order applies. */
  def tokenBudgetSelect(df: DataFrame, idCol: String, scoreCol: Column,
      tokensCol: Column, budget: Long, grid: Double = 1000.0,
      maxCriticalRows: Long = 4000000L): DataFrame =
    budgetSelect(df, idCol, scoreCol, tokensCol, budget, grid, maxCriticalRows, 0)

  private def budgetSelect(df: DataFrame, idCol: String, scoreCol: Column,
      tokensCol: Column, budget: Long, grid: Double, maxCriticalRows: Long,
      depth: Int): DataFrame = {
    val withB = df.withColumn("__b", floor(scoreCol * grid).cast("long"))
      .withColumn("__tk", tokensCol.cast("long"))
    // id position stats only exist for numeric ids (decided statically —
    // an ANSI cast of a string id would throw even when the valve never
    // fires); non-numeric ids fall through to the loud failure below
    val idPos =
      if (df.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
        col(idCol).cast("double")
      else lit(null).cast("double")
    // per-bucket totals + the stats the valve needs — ≤ grid+1 rows,
    // METADATA-sized, collected once (the per-row keep/drop decision
    // below is then a pure filter against literals: no join at all)
    val perBucket = withB.groupBy(col("__b")).agg(
      sum(col("__tk")).as("__bt"), count(lit(1)).as("__n"),
      min(scoreCol.cast("double")).as("__smin"), max(scoreCol.cast("double")).as("__smax"),
      min(idPos).as("__imin"), max(idPos).as("__imax"))
    val wDesc = Window.orderBy(col("__b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val crit = perBucket
      .withColumn("__above", coalesce(sum(col("__bt")).over(wDesc), lit(0L)))
      .filter(col("__above") <= budget && col("__above") + col("__bt") > budget)
      .collect()
    if (crit.isEmpty) return df // budget covers every bucket whole
    val r = crit(0)
    val (cb, above, n) = (r.getLong(0), r.getLong(r.fieldIndex("__above")),
      r.getLong(r.fieldIndex("__n")))
    // buckets strictly above the critical keep whole — a map-only filter
    val wholeKept = withB.filter(col("__b") > cb).drop("__b", "__tk")
    val critRows = withB.filter(col("__b") === cb)
    val critKept =
      if (n <= maxCriticalRows) {
        // the critical sliver pays the only per-row cumulative sum,
        // offset by the tokens already spent in higher buckets
        val wIn = Window.partitionBy(col("__b"))
          .orderBy(scoreCol.desc, col(idCol).asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        critRows.withColumn("__cum", lit(above) + sum(col("__tk")).over(wIn))
          .filter(col("__cum") <= budget)
          .drop("__cum", "__b", "__tk")
      } else {
        require(depth < 12, s"tokenBudgetSelect: bucket refinement did not " +
          s"converge after $depth levels ($n rows still share a bucket) — " +
          "ids are likely non-distinct; raise maxCriticalRows or grid")
        val (smin, smax) = (r.getDouble(r.fieldIndex("__smin")),
          r.getDouble(r.fieldIndex("__smax")))
        val sliver = critRows.drop("__b", "__tk")
        // recursion levels refine on their own grid of ≥1024 — the
        // user's (possibly coarse) top-level grid only shapes level 0,
        // and a refinement factor of 1 would never converge
        val rgrid = math.max(grid, 1024.0)
        if (smin != smax) {
          // scores still vary inside the bucket: refine ×grid (an
          // increasing affine map, so in-bucket order is unchanged)
          budgetSelect(sliver, idCol, scoreCol * grid - lit(cb.toDouble),
            tokensCol, budget - above, rgrid, maxCriticalRows, depth + 1)
        } else df.schema(idCol).dataType match {
          case _: org.apache.spark.sql.types.NumericType =>
            // constant score ⇒ the order is pure id asc; split on the
            // id's normalized position (monotone ⇒ order-preserving;
            // double rounding ties are broken by the id tiebreak)
            val (imin, imax) = (r.getDouble(r.fieldIndex("__imin")),
              r.getDouble(r.fieldIndex("__imax")))
            val range = math.max(imax - imin, 1.0)
            budgetSelect(sliver, idCol,
              -((col(idCol).cast("double") - lit(imin)) / lit(range)),
              tokensCol, budget - above, rgrid, maxCriticalRows, depth + 1)
          case other =>
            throw new IllegalArgumentException(
              s"tokenBudgetSelect: constant-score critical bucket of $n rows " +
              s"(> maxCriticalRows=$maxCriticalRows) and id '$idCol' of " +
              s"non-numeric type $other cannot be subdivided — raise grid " +
              "to match score resolution or raise maxCriticalRows")
        }
      }
    wholeKept.union(critKept)
  }
}
