package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratchpad main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    import graft.ext.Dedup
    val docs = graft.store.Tables.documents(spark, dir)

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val rows = time("shingleRows persist+count") {
      val r = Dedup.shingleRows(docs, "doc_id", "text", 3).persist()
      println("  rows=" + r.count()); r
    }
    val sig = time("signature96") {
      val s = Dedup.minhashSignature(rows, 96).persist()
      println("  sigs=" + s.count()); s
    }
    val cand = time("bands+candidates") {
      val c = Dedup.candidatePairs(Dedup.lshBuckets(sig, 96, 32)).persist()
      println("  cands=" + c.count()); c
    }
    time("verify") {
      println("  verified=" + Dedup.verifyJaccard(cand, rows)
        .filter(col("jaccard") >= 0.5).count())
    }
    spark.stop()
  }
}
