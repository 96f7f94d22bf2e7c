package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-timer for the x93 export chain: times each leg
  * (tokenize, layout, bin write, audit, readback) so optimization
  * targets the real cost. Not library surface. */
object TimeExport {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.store.Tables.cacheEnabled = true
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val docs = graft.store.Tables.documents(spark, dir)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
    docs.write.format("noop").mode("overwrite").save()

    val (merges, vocab) = {
      val v = graft.ext.Bpe.byteWordFreqs(docs, "text").cache()
      (graft.ext.Bpe.learnByteMergesFromVocabBatched(v, 20).merges, v)
    }
    val seg = time("segmentTable (first)") {
      val s = graft.ext.Bpe.segmentTableBytes(vocab, merges)
      s.count(); s
    }
    for (r <- 1 to 3) {
      val toks = time(s"tokenizeBytesToIds r$r") {
        val t = graft.ext.Bpe.tokenizeBytesToIds(docs, "doc_id", "text", seg, merges)
        t.write.format("noop").mode("overwrite").save(); t
      }
      println(s"  tokens: ${toks.count()}")
      val out = java.nio.file.Files.createTempDirectory("graft-timeexp").toString
      time(s"writeTokenBin groupBy-counts r$r") {
        graft.ext.Export.writeTokenBin(toks, "doc_id", out, 16384)
      }
      time(s"writeTokenBin word-counts r$r") {
        graft.ext.Export.writeTokenBin(toks, "doc_id", out, 16384,
          docCounts = graft.ext.Bpe.tokenCountsBytes(docs, "doc_id", "text", seg))
      }
      time(s"auditTokenBin r$r") {
        assert(graft.ext.Export.auditTokenBin(spark, out).isEmpty)
      }
      time(s"readback slice r$r") {
        val slice = spark.read.parquet(s"$out/idx").filter(col("doc_id") % 17 === 0)
        graft.ext.Export.readTokenBin(slice, "doc_id", out)
          .agg(coalesce(sum(size(col("token_ids"))), lit(0)).cast("long")).head.getLong(0)
      }
      // x93b shape: appends
      val out2 = java.nio.file.Files.createTempDirectory("graft-timeexp2").toString
      val toksCp = time(s"localCheckpoint(toks) r$r") {
        toks.localCheckpoint(true)
      }
      time(s"base write (1/3) r$r") {
        graft.ext.Export.writeTokenBin(
          toksCp.filter(col("doc_id") % 3 === 0), "doc_id", out2, 16384)
      }
      time(s"append 2/3 r$r") {
        graft.ext.Export.appendTokenBin(
          toksCp.filter(col("doc_id") % 3 === 1), "doc_id", out2, 16384)
      }
      time(s"append 3/3 r$r") {
        graft.ext.Export.appendTokenBin(
          toksCp.filter(col("doc_id") % 3 === 2), "doc_id", out2, 16384)
      }
      time(s"replay append r$r") {
        graft.ext.Export.appendTokenBin(
          toksCp.filter(col("doc_id") % 3 === 2), "doc_id", out2, 16384)
      }
    }
    spark.stop()
  }
}
