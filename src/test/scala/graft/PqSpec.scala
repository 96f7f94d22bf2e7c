package graft

import org.apache.spark.sql.functions._

import graft.ext.{Pq, Similarity}
import graft.store.Tables

class PqSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("encode: codes in range, deterministic, repartition-invariant; 64x compression shape") {
    val emb = Tables.embeddings(spark, dir)
    val model = Pq.fit(emb, m = 4, ksub = 16)
    assert(model.dsub == 16 && model.codebooks.length == 4 &&
      model.codebooks.forall(_.length == 16))
    val enc = Pq.encode(emb, model)
      .select(col("vec_id"), col("codes"), col("recon_norm"))
    val a = enc.as[(Long, Seq[Int], Double)].collect().sortBy(_._1)
    assert(a.forall { case (_, codes, rn) =>
      codes.length == 4 && codes.forall(c => c >= 0 && c < 16) && rn > 0 })
    val b = Pq.encode(emb.repartition(13), model)
      .select(col("vec_id"), col("codes"), col("recon_norm"))
      .as[(Long, Seq[Int], Double)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("vectors AT codewords reconstruct exactly: ADC score == exact cosine") {
    // corpus = one synthetic vector per (subspace-aligned) codeword
    // combo: reconstruction is lossless, so ADC == brute cosine
    val emb = Tables.embeddings(spark, dir)
    val model = Pq.fit(emb, m = 4, ksub = 16)
    val planted = (0 until 16).map { c =>
      val v = (0 until 4).flatMap(s => model.codebooks(s)(c)).toArray
      (c.toLong + 1000L, v)
    }
    val corpus = planted.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 1000L)
    val enc = Pq.encode(corpus, model)
    // sanity: every planted vector encodes to its own codeword tuple
    val codes = enc.select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    assert((0 until 16).forall(c => codes(c + 1000L) == Seq(c, c, c, c)))
    val adc = Pq.topK(queries, enc, model, k = 15)
      .select("neighbor_id", "score").as[(Long, Double)].collect().toMap
    val brute = Similarity.bruteForceTopK(queries, corpus, k = 15)
      .select(col("neighbor_id"), round(col("cos"), 6).as("c"))
      .as[(Long, Double)].collect().toMap
    assert(adc.keySet == brute.keySet)
    adc.foreach { case (id, s) =>
      assert(math.abs(s - brute(id)) <= 2e-6, s"id $id: adc $s vs brute ${brute(id)}")
    }
  }

  test("ADC shortlist + exact rerank: recall@10 >= 0.8; finer quantizer never hurts ADC") {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(queries, emb, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def adcRecall(m: Int, ksub: Int): Double = {
      val model = Pq.fit(emb, m = m, ksub = ksub)
      val adc = Pq.topK(queries, Pq.encode(emb, model), model, k = 10)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = brute.map { case (q, ids) =>
        (adc.getOrElse(q, Set.empty) & ids).size.toDouble / ids.size }
      rs.sum / rs.size
    }
    // quantization error shrinks with more/finer subspaces
    val coarse = adcRecall(4, 16)
    val fine = adcRecall(8, 32)
    assert(fine >= coarse, s"finer quantizer regressed: $fine < $coarse")

    // the production path: ADC shortlist 50 → exact rerank top-10
    val model = Pq.fit(emb, m = 8, ksub = 32)
    val rer = Pq.topKReranked(queries, Pq.encode(emb, model), emb, model,
        k = 10, shortlist = 50)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = brute.map { case (q, ids) =>
      (rer.getOrElse(q, Set.empty) & ids).size.toDouble / ids.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"reranked mean recall@10 $mean")
  }

  test("IVF-PQ stored: all-cells probe == flat PQ rerank; nprobe prunes the cell scan") {
    val emb = Tables.embeddings(spark, dir)
    val ivf = graft.ext.Ivf.build(emb, k = 8)
    val model = Pq.fit(emb, m = 8, ksub = 32)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    Pq.writeIvfPq(ivf, model, tmp)

    val queries = emb.filter(col("vec_id") < 5)
    // probing EVERY cell makes the candidate set the whole corpus, so
    // the composed path must equal the flat shortlist+rerank exactly
    val composed = Pq.topKStoredIvfPq(queries, spark, tmp, model,
        k = 10, nprobe = 8, shortlist = 50)
      .select("query_id", "neighbor_id", "rk").as[(Long, Long, Int)]
      .collect().toSet
    val flat = Pq.topKReranked(queries, Pq.encode(emb, model), emb, model,
        k = 10, shortlist = 50)
      .select("query_id", "neighbor_id", "rk").as[(Long, Long, Int)]
      .collect().toSet
    assert(composed == flat,
      s"composed-only=${composed -- flat} flat-only=${flat -- composed}")

    // nprobe=2: 5 queries × 2 cells ⇒ at most 10 (≤ 8 distinct) cells;
    // the static IN filter must reach both scans (codes + rerank fetch)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val self = p match {
        case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("corpus")) => Seq(f)
        case _ => Nil
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self ++ kids.flatMap(scans)
    }
    val pruned = Pq.topKStoredIvfPq(queries, spark, tmp, model,
      k = 10, nprobe = 2, shortlist = 50)
    assert(pruned.select("query_id").distinct().count() == 5)
    val ss = scans(pruned.queryExecution.executedPlan)
    assert(ss.nonEmpty)
    ss.foreach { s =>
      assert(s.partitionFilters.exists(_.references.exists(_.name == "cell")),
        s"no cell partition filter in:\n$s")
    }
  }

  test("recall probe: reranked PQ clears the floor; corrupted codes are detected") {
    // Similarity.recallAtK as the PQ-side monitoring harness: shortlist
    // quality degrades invisibly (rerank is exact on whatever survives),
    // so the probe is what surfaces a stale/corrupt code table
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") % 10 === 0)
    val exact = graft.ext.Similarity.bruteForceTopK(queries, emb, k = 10)
    val model = Pq.fit(emb, m = 8, ksub = 32)
    val encoded = Pq.encode(emb, model)

    def meanRecall(enc: org.apache.spark.sql.DataFrame): Double =
      graft.ext.Similarity.recallAtK(
          Pq.topKReranked(queries, enc, emb, model, k = 10, shortlist = 50),
          exact, k = 10)
        .agg(avg(col("recall"))).as[Double].collect().head

    val healthy = meanRecall(encoded)
    // (0.75 floor on THIS wider query sample — the 0.8 contract above
    // uses the 20-query set; the probe's job is the detection margin)
    assert(healthy >= 0.75, s"healthy reranked recall@10 $healthy")

    // corrupt the code table (rotate every code) — the ADC shortlist
    // dereferences wrong codewords, and the probe must see it
    val corrupted = encoded.withColumn("codes",
      transform(col("codes"), c => pmod(c + 7, lit(32)).cast("int")))
    val corruptedRecall = meanRecall(corrupted)
    assert(corruptedRecall < healthy - 0.2,
      s"probe failed to detect corruption: healthy $healthy vs corrupted $corruptedRecall")
  }
}
