package graft

import org.apache.spark.sql.functions._

import graft.ext.Sampling
import graft.store.Tables

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val seed = "spec-seed"

  test("hexThreshold: boundary values and midpoint") {
    assert(Sampling.hexThreshold(0.0) == "0" * 32)
    assert(Sampling.hexThreshold(1.0) == "f" * 32)
    assert(Sampling.hexThreshold(0.5) == "8" + "0" * 31)
    // 0.8 * 16 = 12.8 -> 0xcccc... prefix
    assert(Sampling.hexThreshold(0.8).startsWith("cccccccc"))
  }

  test("split: total partition, stable under corpus growth, fractions near target") {
    val docs = Tables.documents(spark, dir)
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val split = docs.withColumn("split", Sampling.splitColumn(col("doc_id"), seed, fr))
    val total = docs.count()
    val byLabel = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byLabel.values.sum == total, "split must be a total partition")
    assert(byLabel.keySet == Set("train", "val", "test"))
    // uniformity: each bucket within 5 sigma of its binomial expectation
    fr.foreach { case (label, f) =>
      val exp = total * f
      val sigma = math.sqrt(total * f * (1 - f))
      assert(math.abs(byLabel(label) - exp) < 5 * sigma + 1,
        s"$label: ${byLabel(label)} vs expected $exp")
    }
    // growth stability: restricting the corpus must not move any row's
    // bucket (the property ntile/percent_rank splits DON'T have)
    val half = docs.filter(col("doc_id") % 2 === 0)
      .withColumn("split", Sampling.splitColumn(col("doc_id"), seed, fr))
    val fullOnHalf = split.filter(col("doc_id") % 2 === 0)
    assert(half.select("doc_id", "split").except(
      fullOnHalf.select("doc_id", "split")).isEmpty)
  }

  test("split plan is shuffle-free (no Exchange below the aggregate's own)") {
    val docs = Tables.documents(spark, dir)
    val labeled = docs.withColumn("split",
      Sampling.splitColumn(col("doc_id"), seed, Seq("a" -> 0.5, "b" -> 0.5)))
      .select("doc_id", "split")
    val plan = labeled.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"split should not shuffle:\n$plan")
  }

  test("stratifiedTake: exactly n per stratum, deterministic, a uniform-order draw") {
    val docs = Tables.documents(spark, dir)
    val s1 = Sampling.stratifiedTake(docs, Seq("lang"), col("doc_id"), seed, 4)
    val counts = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    val langSizes = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    langSizes.foreach { case (lang, size) =>
      assert(counts(lang) == math.min(4L, size), s"$lang: ${counts(lang)}")
    }
    val s2 = Sampling.stratifiedTake(docs, Seq("lang"), col("doc_id"), seed, 4)
    assert(s1.select("doc_id").except(s2.select("doc_id")).isEmpty, "must be deterministic")
    // different seed -> (almost surely) different draw
    val s3 = Sampling.stratifiedTake(docs, Seq("lang"), col("doc_id"), "other", 4)
    assert(s3.select("doc_id").except(s1.select("doc_id")).count() > 0)
  }

  test("stratifiedTake/mixtureTake: no window partitions the corpus by bare strata") {
    // the scale guarantee: the per-row RANKING window (row_number — the
    // one that sees corpus rows) must partition by (strata, __bkt) so
    // the biggest partition is ≈ stratum/65536; the only bare-strata
    // window is the running count (sum) over the metadata bucket frame
    val docs = Tables.documents(spark, dir)
    val windowRe = """Window \[(.*?)\], \[(.*?)\], \[(.*?)\]""".r
    for (df <- Seq(
        Sampling.stratifiedTake(docs, Seq("lang"), col("doc_id"), seed, 4),
        Sampling.mixtureTake(docs, Seq("lang"), col("doc_id"), seed, 0.5, 30L))) {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val windows = windowRe.findAllMatchIn(plan).toSeq
      assert(windows.nonEmpty, s"expected Window nodes in:\n$plan")
      windows.foreach { m =>
        val (exprs, part) = (m.group(1), m.group(2))
        if (exprs.contains("row_number"))
          assert(part.contains("__bkt"),
            s"ranking window must partition by the draw bucket, got [$part]:\n$plan")
      }
      // and the critical-sliver ranking window really exists
      assert(windows.exists(m =>
        m.group(1).contains("row_number") && m.group(2).contains("__bkt")))
    }
  }

  test("repeatWeighted: integer epochs exact, fractional epochs within binomial bounds, deterministic") {
    val docs = Tables.documents(spark, dir).select("doc_id")
    val n = docs.count()
    // integer epochs: exactly e copies per row, no draw involved
    val exact2 = Sampling.repeatWeighted(docs, col("doc_id"), seed, lit(2.0))
    assert(exact2.count() == 2 * n)
    assert(exact2.groupBy("doc_id").count().filter(col("count") =!= 2).count() == 0)
    // epochs 0: nothing survives
    assert(Sampling.repeatWeighted(docs, col("doc_id"), seed, lit(0.0)).count() == 0)
    // fractional: floor copies guaranteed + Bernoulli(frac) extras
    val e = 1.6
    val got = Sampling.repeatWeighted(docs, col("doc_id"), seed, lit(e)).count()
    val sigma = math.sqrt(n * 0.6 * 0.4)
    assert(math.abs(got - n * e) < 5 * sigma + 1, s"$got vs ${n * e}")
    val again = Sampling.repeatWeighted(docs, col("doc_id"), seed, lit(e)).count()
    assert(got == again, "same seed must realize the same corpus")
  }

  test("takeQuotaPerStratum property: random corpora == in-memory per-stratum draw reference") {
    // the bucket-threshold machinery vs the textbook semantics: for
    // every stratum keep its first min(n, |stratum|) rows under
    // (drawHex asc, key asc) — including strata smaller than n, empty
    // quota edge handled by mixtureTake's own oracle gate
    val rnd = new scala.util.Random(777)
    for (trial <- 1 to 8) {
      val nStrata = 1 + rnd.nextInt(6)
      val rows = (1L to (20 + rnd.nextInt(200))).map { id =>
        (id, s"s${rnd.nextInt(nStrata)}") }
      val n = 1 + rnd.nextInt(12)
      val df = rows.toDF("id", "grp").repartition(1 + rnd.nextInt(5))
      val got = Sampling.stratifiedTake(df, Seq("grp"), col("id"), seed, n)
        .select("id").as[Long].collect().sorted.toSeq
      def hex(id: Long) = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:$seed".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val expect = rows.groupBy(_._2).values.flatMap { grp =>
        grp.map(_._1).sortBy(id => (hex(id), id)).take(n)
      }.toSeq.sorted
      assert(got == expect, s"trial $trial n=$n strata=$nStrata")
    }
  }

  test("topPerStratum property: random scored corpora == in-memory ranked reference") {
    // the score-bucket machinery vs the textbook semantics: per stratum
    // keep the top-k under (score desc, id asc) — quantized scores
    // force heavy in-bucket ties, strata smaller than k keep whole
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 8) {
      val nStrata = 1 + rnd.nextInt(5)
      val quant = 1 + rnd.nextInt(20) // coarse → many exact ties
      val rows = (1L to (20 + rnd.nextInt(200))).map { id =>
        (id, s"s${rnd.nextInt(nStrata)}", rnd.nextInt(quant) / quant.toDouble) }
      val k = 1 + rnd.nextInt(12)
      val df = rows.toDF("id", "grp", "score").repartition(1 + rnd.nextInt(5))
      val got = Sampling.topPerStratum(df, Seq("grp"), col("score"), "id", k)
        .select("id").as[Long].collect().sorted.toSeq
      val expect = rows.groupBy(_._2).values.flatMap { grp =>
        grp.sortBy(r => (-r._3, r._1)).take(k).map(_._1)
      }.toSeq.sorted
      assert(got == expect, s"trial $trial k=$k strata=$nStrata quant=$quant")
    }
  }

  test("topPerStratum valve: constant scores recurse on id position; windows stay bucket-partitioned") {
    // every score identical ⇒ level-0 critical bucket IS each stratum;
    // with maxCriticalRows below the stratum size the valve must refine
    // on the id's normalized position instead of windowing the stratum
    val rows = (1L to 400L).map(id => (id, s"s${id % 3}", 0.5))
    val df = rows.toDF("id", "grp", "score").repartition(5)
    val got = Sampling.topPerStratum(df, Seq("grp"), col("score"), "id",
        k = 7, maxCriticalRows = 10L)
      .select("id").as[Long].collect().sorted.toSeq
    val expect = rows.groupBy(_._2).values.flatMap { grp =>
      grp.sortBy(r => (-r._3, r._1)).take(7).map(_._1) }.toSeq.sorted
    assert(got == expect)
    // plan guard: every per-row ranking window partitions by the score
    // bucket, never bare strata
    val sel = Sampling.topPerStratum(df, Seq("grp"), col("score"), "id",
      k = 7, maxCriticalRows = 10L)
    sel.collect()
    val windowRe = """Window \[(.*?)\], \[(.*?)\], \[(.*?)\]""".r
    val plan = sel.queryExecution.executedPlan.toString
    windowRe.findAllMatchIn(plan).foreach { m =>
      if (m.group(1).contains("row_number"))
        assert(m.group(2).contains("__b"),
          s"ranking window must partition by the score bucket, got [${m.group(2)}]:\n$plan")
    }
  }

  test("topPerStratum: non-numeric id with a constant-score oversized bucket fails loudly") {
    val rows = (1L to 100L).map(id => (s"doc$id", "only", 0.5))
    val df = rows.toDF("id", "grp", "score")
    val e = intercept[IllegalArgumentException] {
      Sampling.topPerStratum(df, Seq("grp"), col("score"), "id",
        k = 3, maxCriticalRows = 10L).collect()
    }
    assert(e.getMessage.contains("non-numeric"))
  }

  test("shuffledOrder: bucket-offset ranking == the textbook global window, and no global sort plans") {
    val docs = Tables.documents(spark, dir).select("doc_id")
    val got = Sampling.shuffledOrder(docs, col("doc_id"), seed)
    val textbook = docs.withColumn("shuffle_rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(Sampling.drawHex(col("doc_id"), seed), col("doc_id"))).cast("long"))
    assert(got.select("doc_id", "shuffle_rank")
      .except(textbook.select("doc_id", "shuffle_rank")).isEmpty)
    got.collect()
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("rangepartitioning"),
      s"global sort leaked into shuffledOrder:\n$plan")
    // the per-row ranking window partitions by the draw bucket
    """Window \[(.*?)\], \[(.*?)\], \[(.*?)\]""".r.findAllMatchIn(plan).foreach { m =>
      if (m.group(1).contains("row_number"))
        assert(m.group(2).contains("__bkt"), s"unpartitioned ranking window:\n$plan")
    }
  }

  test("shuffledFiles (bucket + local sort) concatenated == shuffledOrder (global sort)") {
    val docs = Tables.documents(spark, dir).select("doc_id")
    val global = Sampling.shuffledOrder(docs, col("doc_id"), seed)
      .orderBy("shuffle_rank").as[(Long, Long)].map(_._1).collect().toSeq
    // reconstruct the scale-path order: shards in shard-id order, rows in
    // their within-shard sorted order
    val sharded = Sampling.shuffledFiles(docs, col("doc_id"), seed, shards = 8)
    val byShard = sharded
      .withColumn("draw", Sampling.drawHex(col("doc_id"), seed))
      .select("shard", "draw", "doc_id")
      .as[(Int, String, Long)].collect().toSeq
      .sortBy { case (shard, draw, id) => (shard, draw, id) }
      .map(_._3)
    assert(byShard == global,
      "bucketed local-sort layout must reproduce the global shuffle order")
    // and the shard column really is the draw's leading bits: shard
    // boundaries never interleave in draw order
    val shardOfDraw = sharded.withColumn("draw", Sampling.drawHex(col("doc_id"), seed))
      .select("draw", "shard").as[(String, Int)].collect().toSeq.sortBy(_._1).map(_._2)
    assert(shardOfDraw == shardOfDraw.sorted, "shard ids must be monotone in draw order")
  }

  test("sampleFraction: deterministic subset of the fraction's size class") {
    val docs = Tables.documents(spark, dir)
    val total = docs.count()
    val kept = docs.filter(Sampling.sampleFraction(col("doc_id"), seed, 0.25)).count()
    val sigma = math.sqrt(total * 0.25 * 0.75)
    assert(math.abs(kept - total * 0.25) < 5 * sigma + 1, s"kept $kept of $total")
  }

  test("mixtureTake: √-temperature quotas, caps, reproducibility") {
    val docs = Tables.documents(spark, dir)
    val taken = Sampling.mixtureTake(docs, Seq("lang"), col("doc_id"), seed,
      alpha = 0.5, totalN = 30)
    val byLang = taken.groupBy("lang").count().as[(String, Long)].collect().toMap
    val natural = docs.groupBy("lang").count().as[(String, Long)].collect().toMap

    // quotas must equal the integer-exact formula
    val wi = natural.map { case (l, n) => l -> math.floor(math.sqrt(n.toDouble) * 1e6).toLong }
    val wSum = wi.values.sum
    natural.foreach { case (l, n) =>
      val quota = math.min(n, 30L * wi(l) / wSum)
      assert(byLang.getOrElse(l, 0L) == quota, s"lang $l: ${byLang.get(l)} vs quota $quota")
    }

    // alpha < 1 flattens: the minority stratum's sampled share must
    // exceed its natural share (that's the point of the temperature)
    val minority = natural.minBy(_._2)._1
    val sampledShare = byLang(minority).toDouble / byLang.values.sum
    val naturalShare = natural(minority).toDouble / natural.values.sum
    assert(sampledShare > naturalShare,
      s"alpha=0.5 must upsample the tail: $sampledShare vs $naturalShare")

    // reproducible: same seed → identical id set
    val again = Sampling.mixtureTake(docs, Seq("lang"), col("doc_id"), seed,
      alpha = 0.5, totalN = 30).select("doc_id").as[Long].collect().sorted
    assert(again.toSeq == taken.select("doc_id").as[Long].collect().sorted.toSeq)

    // alpha = 1 is proportional sampling (quota ∝ n up to rounding)
    val prop = Sampling.mixtureTake(docs, Seq("lang"), col("doc_id"), seed,
      alpha = 1.0, totalN = 30)
    val propByLang = prop.groupBy("lang").count().as[(String, Long)].collect().toMap
    natural.foreach { case (l, n) =>
      val expected = math.min(n, 30L * (n * 1000000L) / natural.values.map(_ * 1000000L).sum)
      assert(propByLang.getOrElse(l, 0L) == expected, s"alpha=1 lang $l")
    }
  }

  test("tokenBudgetSelect == global-cumsum reference, all budget regimes") {
    // scores chosen so buckets (grid=10) hold {whole-kept, critical,
    // dropped} and the critical bucket has in-bucket ties (score equal,
    // id breaks)
    val rows = Seq(
      (1L, 0.95, 10L), (2L, 0.91, 20L),            // bucket 9
      (3L, 0.55, 30L), (4L, 0.55, 25L), (5L, 0.52, 40L), // bucket 5
      (6L, 0.10, 100L), (7L, 0.05, 7L))            // buckets 1, 0
    val df = rows.toDF("id", "score", "tk")
    def reference(budget: Long): Seq[Long] = {
      var cum = 0L
      rows.sortBy { case (id, s, _) => (-s, id) }
        .flatMap { case (id, _, t) => cum += t; if (cum <= budget) Some(id) else None }
    }
    for (budget <- Seq(0L, 9L, 10L, 30L, 55L, 80L, 124L, 125L, 225L, 232L, 1000L)) {
      val got = Sampling.tokenBudgetSelect(df, "id", col("score"), col("tk"),
        budget, grid = 10.0).select("id").as[Long].collect().sorted.toSeq
      assert(got == reference(budget).sorted, s"budget=$budget")
    }
  }

  test("tokenBudgetSelect property: random corpora, budgets, and grids match the reference") {
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 12) {
      val n = 1 + rnd.nextInt(60)
      // coarse score values force heavy in- and cross-bucket ties
      val rows = (1L to n).map(id =>
        (id, rnd.nextInt(8) / 4.0, 1L + rnd.nextInt(30)))
      val budget = rnd.nextInt(1 + rows.map(_._3).sum.toInt).toLong
      val grid = Seq(1.0, 4.0, 1000.0)(rnd.nextInt(3))
      var cum = 0L
      val expect = rows.sortBy { case (id, s, _) => (-s, id) }
        .flatMap { case (id, _, t) => cum += t; if (cum <= budget) Some(id) else None }
        .sorted
      val got = Sampling.tokenBudgetSelect(
          rows.toDF("id", "score", "tk").repartition(1 + rnd.nextInt(7)),
          "id", col("score"), col("tk"), budget, grid)
        .select("id").as[Long].collect().sorted.toSeq
      assert(got == expect, s"trial $trial n=$n budget=$budget grid=$grid")
    }
  }

  test("tokenBudgetSelect valve: all-equal scores recurse on id position, no corpus-sized window") {
    // every row lands in ONE score bucket; with maxCriticalRows = 8 the
    // valve must recurse on the id's normalized position instead of
    // planning a single-partition cumsum over all 64 rows
    val rows = (1L to 64L).map(id => (id, 0.5, 3L))
    val df = rows.toDF("id", "score", "tk").repartition(5)
    for (budget <- Seq(0L, 10L, 57L, 96L, 97L, 191L, 192L, 500L)) {
      var cum = 0L
      val expect = rows.sortBy(_._1)
        .flatMap { case (id, _, t) => cum += t; if (cum <= budget) Some(id) else None }
      val sel = Sampling.tokenBudgetSelect(df, "id", col("score"), col("tk"),
        budget, grid = 10.0, maxCriticalRows = 8L)
      val got = sel.select("id").as[Long].collect().sorted.toSeq
      assert(got == expect, s"budget=$budget")
      // plan guard: any cumulative window must see ≤ maxCriticalRows
      // rows — i.e. every Window node in the final plan partitions by a
      // bucket column (never empty over the corpus branch). The
      // metadata windows run on collect()ed sub-plans, not this one.
      sel.collect()
      val plan = sel.queryExecution.executedPlan.toString
      """Window \[(.*?)\], \[(.*?)\], \[(.*?)\]""".r.findAllMatchIn(plan).foreach { m =>
        assert(m.group(2).contains("__b"),
          s"budget=$budget: unpartitioned corpus window leaked:\n$plan")
      }
    }
    // non-numeric id + constant-score oversized bucket: loud failure,
    // not a silent single-partition plan
    val sdf = (1 to 64).map(i => (f"doc_$i%03d", 0.5, 3L)).toDF("id", "score", "tk")
    val e = intercept[IllegalArgumentException] {
      Sampling.tokenBudgetSelect(sdf, "id", col("score"), col("tk"),
        budget = 50L, grid = 10.0, maxCriticalRows = 8L)
    }
    assert(e.getMessage.contains("cannot be subdivided"))
  }

  test("tokenBudgetSelect valve: coarsely-quantized scores refine score buckets before id") {
    // two distinct scores inside one grid-1 bucket: level-1 recursion
    // must separate them on the fractional score (resolution ×grid),
    // keeping the higher-score half first
    val rows = (1L to 40L).map(id => (id, if (id % 2 == 0) 0.58 else 0.51, 2L))
    val df = rows.toDF("id", "score", "tk").repartition(3)
    for (budget <- Seq(0L, 13L, 40L, 41L, 60L, 79L, 80L, 200L)) {
      var cum = 0L
      val expect = rows.sortBy { case (id, s, _) => (-s, id) }
        .flatMap { case (id, _, t) => cum += t; if (cum <= budget) Some(id) else None }
        .sorted
      val got = Sampling.tokenBudgetSelect(df, "id", col("score"), col("tk"),
          budget, grid = 1.0, maxCriticalRows = 8L)
        .select("id").as[Long].collect().sorted.toSeq
      assert(got == expect, s"budget=$budget")
    }
  }

  test("tokenBudgetSelect: result invariant to partitioning; only the critical bucket is windowed") {
    val docs = Tables.documents(spark, dir)
    val feats = graft.ext.TextOps.qualityFeatures(col("text")).toMap
    val scored = docs.select(col("doc_id"),
      feats("n_tokens").cast("long").as("n_tokens"),
      feats("stopword_ratio").as("score"))
    val a = Sampling.tokenBudgetSelect(scored, "doc_id", col("score"),
      col("n_tokens"), 1200L).select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.tokenBudgetSelect(scored.repartition(17), "doc_id",
      col("score"), col("n_tokens"), 1200L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
    // exactness vs the textbook single-window form
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val ref = scored.withColumn("cum", sum(col("n_tokens")).over(w))
      .filter(col("cum") <= 1200L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == ref)
  }

  test("prioritizedTake == textbook per-stratum row_number over (priority desc, draw, key); equal priorities == stratifiedTake") {
    val rows = (0 until 400).map { i =>
      val stratum = s"s${i % 5}"
      // grid-quantized priorities in [0,1] with planted ties
      val p = math.floor((i % 9) / 8.0 * 1e9 + 0.5) / 1e9
      (stratum, s"k$i", p)
    }.toDF("stratum", "key", "p")
    val got = Sampling.prioritizedTake(rows.repartition(13), Seq("stratum"),
        col("p"), col("key"), "seed-x", 10)
      .select("stratum", "key").as[(String, String)].collect().toSet
    // the textbook form this engine must equal exactly
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stratum"))
      .orderBy(col("p").desc, Sampling.drawHex(col("key"), "seed-x"), col("key"))
    val ref = rows.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select("stratum", "key").as[(String, String)].collect().toSet
    assert(got == ref && got.size == 50)
    // constant priority degenerates to the seeded uniform draw
    val flat = Sampling.prioritizedTake(rows, Seq("stratum"),
        lit(0.25), col("key"), "seed-x", 10)
      .select("stratum", "key").as[(String, String)].collect().toSet
    val uni = Sampling.stratifiedTake(rows, Seq("stratum"),
        col("key"), "seed-x", 10)
      .select("stratum", "key").as[(String, String)].collect().toSet
    assert(flat == uni)
  }

  test("prioritizedTake enforces the [0,1] contract: out-of-range clamps to the bound, NULL raises") {
    // priority 1.5 would encode NEGATIVE without the clamp — hex()'s
    // 16 two's-complement chars lpad-TRUNCATE to 'ffffffff…' and the
    // BEST row silently sorts last; clamped, it ties with priority 1.0
    // and must beat 0.2
    val rows = Seq(("s", "a", 1.5), ("s", "b", 0.2), ("s", "c", 1.0))
      .toDF("stratum", "key", "p")
    val kept = Sampling.prioritizedTake(rows, Seq("stratum"), col("p"),
        col("key"), "seed-y", 2)
      .select("key").as[String].collect().toSet
    assert(kept == Set("a", "c"), s"$kept")
    // negative priorities clamp to 0 (tie broken by the seeded draw),
    // never wrap around above the honest scores
    val neg = Seq(("s", "lo", -3.0), ("s", "hi", 0.9))
      .toDF("stratum", "key", "p")
    val keptNeg = Sampling.prioritizedTake(neg, Seq("stratum"), col("p"),
        col("key"), "seed-y", 1)
      .select("key").as[String].collect().toSeq
    assert(keptNeg == Seq("hi"))
    // NULL priority: loud failure (the drawHex discipline), not a
    // null bucket that sorts first
    val withNull = Seq(("s", "a", Some(0.5)), ("s", "b", None))
      .toDF("stratum", "key", "p")
    val ex = intercept[Exception] {
      Sampling.prioritizedTake(withNull, Seq("stratum"), col("p"),
        col("key"), "seed-y", 1).collect()
    }
    assert(ex.getMessage != null)
  }

  test("clusterBalancedTake: per-cell exactness, dominant mode capped, deterministic across partitionings") {
    import graft.store.Tables
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val got = Sampling.clusterBalancedTake(emb, "vec_id", "embedding",
      cells = 6, perCell = 15, seed = "cb-test")
    val perCell = got.groupBy("cell").count()
      .as[(Int, Long)].collect().toMap
    // per-cell counts: exactly min(perCell, |cell|)
    val sizes = graft.ext.Ivf.build(
        emb.select(col("vec_id"), col("embedding")), 6, 42L)
      .assigned.groupBy("cell").count().as[(Int, Long)].collect().toMap
    sizes.foreach { case (c, n) =>
      assert(perCell.getOrElse(c, 0L) == math.min(15L, n), s"cell $c") }
    // a dominant mode cannot fill the budget: no cell exceeds the cap
    assert(perCell.values.forall(_ <= 15))
    // deterministic for a FIXED input layout (MLlib k-means is not
    // partitioning-invariant — the documented caveat — so the
    // reproducibility contract is same-layout, same-seed)
    val again = Sampling.clusterBalancedTake(emb,
        "vec_id", "embedding", cells = 6, perCell = 15, seed = "cb-test")
      .select("vec_id").as[Long].collect().toSet
    assert(again == got.select("vec_id").as[Long].collect().toSet)
    // every selected row keeps its cell tag and cells cover the take
    assert(got.select("cell").distinct().count() == perCell.size)
  }
}
