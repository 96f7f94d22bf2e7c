package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.functions._

import graft.ext.Ivf
import graft.store.Tables

/** IVF stored layout: the corpus is written clustered (partitioned) by
  * cell, and a stored-index query physically reads ONLY the probed
  * cells — partition pruning visible in the scan, results identical to
  * the in-memory index. */
class IvfStorageSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def corpusScans(p: SparkPlan): Seq[FileSourceScanExec] = {
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
    self ++ kids.flatMap(corpusScans)
  }

  test("stored index: per-cell layout, pruned scan, results == in-memory index") {
    val emb = Tables.embeddings(spark, dir)
    val idx = Ivf.build(emb, k = 8)
    val tmp = Files.createTempDirectory("graft-ivf").toString
    Ivf.write(idx, tmp)

    // layout: one directory per cell
    val cellDirs = new java.io.File(s"$tmp/corpus").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell=")).sorted
    assert(cellDirs.length == 8, cellDirs.mkString(","))

    // 2 queries × nprobe 2 ⇒ at most 4 of the 8 cells may be read
    val q = emb.filter(col("vec_id") < 2)
    val mem = Ivf.topK(q, idx, 5, nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val stored = Ivf.topKStored(q, spark, tmp, 5, nprobe = 2)
    val got = stored.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(got == mem, "stored-index results diverge from in-memory index")

    // the scan carries a partition filter on cell and lists only the
    // probed cells' directories
    val scans = corpusScans(stored.queryExecution.executedPlan)
    assert(scans.nonEmpty, stored.queryExecution.executedPlan.toString)
    scans.foreach { s =>
      assert(s.partitionFilters.exists(_.references.exists(_.name == "cell")),
        s"no cell partition filter in:\n$s")
      // drop DPP subquery filters (a bonus prune from the cell join) —
      // they can't be re-evaluated post-run; the static IN alone must prune
      val static = s.partitionFilters.filterNot(
        _.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
      val partsRead = s.relation.location.listFiles(static, s.dataFilters).size
      assert(partsRead <= 4, s"probe read $partsRead of 8 cells — pruning lost")
    }
  }

  test("round-trip: centroids and assignments survive write/read") {
    val emb = Tables.embeddings(spark, dir)
    val idx = Ivf.build(emb, k = 4)
    val tmp = Files.createTempDirectory("graft-ivf2").toString
    Ivf.write(idx, tmp)
    val back = Ivf.read(spark, tmp)
    assert(back.centroids.length == 4)
    idx.centroids.zip(back.centroids).foreach { case ((ci, cv), (bi, bv)) =>
      assert(ci == bi && cv.sameElements(bv))
    }
    assert(back.assigned.count() == idx.assigned.count())
    // per-cell counts identical
    val a = idx.assigned.groupBy("cell").count().as[(Int, Long)].collect().toMap
    val b = back.assigned.groupBy("cell").count().as[(Int, Long)].collect().toMap
    assert(a == b)
  }

  test("incremental growth: assign matches KMeans cells; appended vectors are findable") {
    val emb = Tables.embeddings(spark, dir)
    val idx = Ivf.build(emb, k = 4)
    // assign() must reproduce the quantizer's own cell choices exactly
    // (same nearest-centroid-by-L2 rule, ties to lowest cell)
    val re = Ivf.assign(emb, idx.centroids)
      .select(col("vec_id"), col("cell").as("re_cell"))
    val diff = idx.assigned.join(re, "vec_id")
      .filter(col("cell") =!= col("re_cell")).count()
    assert(diff == 0, s"$diff vectors re-assigned to a different cell")

    // shuffle-free: the argmin is a fold over a centroid-array literal,
    // so the assign plan is a pure map — no join, no window, no Exchange
    val plan = Ivf.assign(emb, idx.centroids)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assign must not shuffle:\n$plan")

    // grow a stored index: new vectors (copies of existing ones, offset
    // ids) land in their source's cell and are found by stored top-k
    val tmp = Files.createTempDirectory("graft-ivf3").toString
    Ivf.write(idx, tmp)
    val newVecs = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    Ivf.appendStored(spark, tmp, newVecs)
    val grown = spark.read.parquet(s"$tmp/corpus")
    assert(grown.count() == emb.count() + 5)
    // querying with an original vector must now surface its planted
    // twin (cosine 1.0) among the top neighbors
    val q = emb.filter(col("vec_id") === 0)
    val got = Ivf.topKStored(q, spark, tmp, k = 3, nprobe = 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(got.contains(100000L), s"planted twin missing from $got")
  }

  test("recall probe: healthy stored index clears the floor; scrambled placement is detected") {
    // the monitoring harness the appendStored docs defer to: sampled
    // brute-force ground truth vs the stored index, Similarity.recallAtK
    val emb = Tables.embeddings(spark, dir)
    val idx = Ivf.build(emb, k = 8)
    val queries = emb.filter(col("vec_id") % 10 === 0)
    val exact = graft.ext.Similarity.bruteForceTopK(queries, emb, k = 10)

    def meanRecall(path: String): Double =
      graft.ext.Similarity.recallAtK(
          Ivf.topKStored(queries, spark, path, k = 10, nprobe = 3), exact, k = 10)
        .agg(avg(col("recall"))).as[Double].collect().head

    val healthy = Files.createTempDirectory("graft-ivf-h").toString
    Ivf.write(idx, healthy)
    val healthyRecall = meanRecall(healthy)
    assert(healthyRecall >= 0.6, s"healthy recall@10 $healthyRecall")

    // a deliberately-degraded index: same centroids, but vectors placed
    // in cells UNCORRELATED with geometry (the failure mode quantizer
    // drift trends toward) — the probe must see the difference clearly
    val degraded = Files.createTempDirectory("graft-ivf-d").toString
    Ivf.write(Ivf.Index(idx.centroids,
      idx.assigned.withColumn("cell", pmod(col("vec_id"), lit(8)).cast("int"))), degraded)
    val degradedRecall = meanRecall(degraded)
    assert(degradedRecall < healthyRecall - 0.2,
      s"probe failed to detect degradation: healthy $healthyRecall vs degraded $degradedRecall")
  }
}
