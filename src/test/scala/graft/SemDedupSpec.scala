package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity}
import graft.store.Tables

/** SemDeDup (k-means-blocked semantic dedup) invariants on the real
  * sf0.001 embeddings: pair precision is exact, blocked recall tracks
  * brute force, and the kept set is exactly one representative per
  * duplicate component plus every unpaired vector. */
class SemDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val Threshold = 0.4

  private lazy val emb = Tables.embeddings(spark, dir).cache()

  private lazy val brutePairs: Set[(Long, Long)] = {
    val a = emb.select(col("vec_id").as("id1"), col("embedding").as("v1"))
    val b = emb.select(col("vec_id").as("id2"), col("embedding").as("v2"))
    a.crossJoin(b).filter(col("id1") < col("id2"))
      .withColumn("cos", Similarity.cosine(col("v1"), col("v2")))
      .filter(col("cos") >= Threshold)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
  }

  private lazy val semPairs: Set[(Long, Long)] =
    Similarity.semanticDupPairs(emb, k = 8, threshold = Threshold)
      .select("id1", "id2").as[(Long, Long)].collect().toSet

  test("pair precision is exact: every emitted pair is a true cosine near-dup") {
    assert(brutePairs.nonEmpty, "test data should contain planted semantic dups")
    val extra = semPairs -- brutePairs
    assert(extra.isEmpty, s"false positives: $extra")
  }

  test("planted clustered corpus: recall ≥ 0.95 — SemDeDup's contract on clusterable data") {
    // 8 tight clusters of 25 vectors in 64-dim: within-cluster cos ≈
    // 0.99, cross-cluster ≈ 0. K-means recovers the clusters, so the
    // within-cell pair search sees every true near-dup pair.
    val rnd = new scala.util.Random(42)
    def unit(): Array[Float] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val data = (0 until 8).flatMap { c =>
      val center = unit()
      (0 until 25).map { i =>
        val noise = unit()
        val v = center.zip(noise).map { case (a, b) => a + 0.07f * b }
        ((c * 25 + i).toLong, v)
      }
    }
    val df = data.toDF("vec_id", "embedding")
    val thr = 0.9
    val a = df.select(col("vec_id").as("id1"), col("embedding").as("v1"))
    val b = df.select(col("vec_id").as("id2"), col("embedding").as("v2"))
    val truth = a.crossJoin(b).filter(col("id1") < col("id2"))
      .withColumn("cos", Similarity.cosine(col("v1"), col("v2")))
      .filter(col("cos") >= thr)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val found = Similarity.semanticDupPairs(df, k = 8, threshold = thr)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(truth.size > 100, s"planted corpus should be dup-dense (got ${truth.size})")
    val recall = (found & truth).size.toDouble / truth.size
    assert(recall >= 0.95, s"recall $recall (${found.size} found / ${truth.size} true)")
  }

  test("near-random corpus: blocked recall is partial by design, and documented") {
    // The sf0.001 embeddings are weakly clustered, so pairs at cos ≥
    // 0.4 often straddle cell boundaries — the SemDeDup trade (compare
    // only within cells) gives partial recall there. The bound proves
    // the blocking still finds a usable share without all-pairs cost.
    val recall = (semPairs & brutePairs).size.toDouble / brutePairs.size
    assert(recall >= 0.4, s"recall $recall (${semPairs.size} found / ${brutePairs.size} true)")
  }

  test("kept set = one representative per component + all unpaired vectors") {
    val kept = Similarity.semanticDedup(emb, k = 8, threshold = Threshold)
      .select("vec_id").as[Long].collect().toSet
    val all = emb.select("vec_id").as[Long].collect().toSet
    val pairsDf = Similarity.semanticDupPairs(emb, k = 8, threshold = Threshold)
    val comps = Dedup.connectedComponents(pairsDf)
      .select("id", "component").as[(Long, Long)].collect()
    val losers = comps.filter { case (id, c) => id != c }.map(_._1).toSet
    assert(kept == all -- losers)
    // exactly one kept member per component
    val byComp = comps.groupBy(_._2).values
    byComp.foreach { members =>
      assert(members.map(_._1).count(kept) == 1)
    }
    // determinism: same seed, same answer
    val kept2 = Similarity.semanticDedup(emb, k = 8, threshold = Threshold)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == kept2)
  }
}
