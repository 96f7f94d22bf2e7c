package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiler for the x2c bucketed probe (judge item r9 #1):
  * builds the bucketed band store at the gate's operating point, runs
  * the probe warm, and prints stage timings + the executed plans of the
  * candidate/rows frames. Not part of any gate. */
object DebugX2c {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.store.Tables.documents(spark, dir)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val prefix = "debug_x2c"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("writeBandStoreBucketed") {
      graft.ext.Dedup.writeBandStoreBucketed(
        docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", prefix,
        buckets = 32, shingleN = 3, numHashes = 64, bands = 16)
    }
    def probe(): Long = graft.ext.Dedup.incrementalNearDupsBucketed(
      spark, batch, "doc_id", "text", prefix,
      shingleN = 3, numHashes = 64, bands = 16, threshold = 0.5).count()
    t("probe cold")(probe())
    t("probe warm 1")(probe())
    t("probe warm 2")(probe())
    // piecewise: newRows/newBands vs candidate join vs verify
    val newRows = graft.ext.Dedup.shingleRows(batch, "doc_id", "text", 3).persist()
    t("newRows count")(newRows.count())
    val newBands = graft.ext.Dedup.lshBuckets(
      graft.ext.Dedup.minhashSignature(newRows, 64), 64, 16).persist()
    t("newBands count")(newBands.count())
    val newIds = batch.select(col("doc_id").as("id")).distinct()
    val (cand, rows) = graft.ext.Dedup.incrementalCandidateRows(
      newBands, newRows, newIds,
      spark.table(s"${prefix}_bands"), spark.table(s"${prefix}_shingles"))
    val candP = cand.persist()
    t("cand count")(candP.count())
    t("cand count warm")(candP.count())
    val rowsP = rows.persist()
    t("rows count")(rowsP.count())
    t("verify (arrays)")(graft.ext.Dedup.verifyJaccardArrays(candP, rowsP)
      .filter(col("jaccard") >= 0.5).count())
    t("verify (exploded)")(graft.ext.Dedup.verifyJaccard(candP, rowsP)
      .filter(col("jaccard") >= 0.5).count())
    println("==== cand plan ====")
    println(cand.queryExecution.executedPlan.toString.take(6000))
    println("==== rows plan ====")
    println(rows.queryExecution.executedPlan.toString.take(6000))
  }
}
