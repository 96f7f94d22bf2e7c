package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.store.Tables
import graft.streaming.Ingest

class IngestSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("ST7: AvailableNow streaming rollup matches the batch rollup for closed windows") {
    val tmp = Files.createTempDirectory("graft-ingest")
    val out = s"$tmp/rollup"
    Ingest.runAvailableNow(spark, dir, out, s"$tmp/ckpt")

    val streamed = spark.read.parquet(out)
    assert(streamed.count() > 0)

    // batch twin of the same rollup
    val batch = Tables.metricStore(spark, dir)
      .groupBy(col("metric"), date_trunc("minute", col("ts")).as("ts"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_v"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v"))

    // append-mode + watermark withholds windows newer than
    // max(ts) - lateness: the streaming analogue of P5's trailing-bucket
    // trim. Every emitted row must match its batch twin exactly…
    val joined = streamed.as("s").join(batch.as("b"), Seq("metric", "ts"))
    assert(joined.count() == streamed.count(), "streamed row missing from batch rollup")
    val mismatched = joined.filter(
      col("s.n") =!= col("b.n") || col("s.sum_v") =!= col("b.sum_v") ||
        col("s.min_v") =!= col("b.min_v") || col("s.max_v") =!= col("b.max_v"))
    assert(mismatched.count() == 0)

    // …and only the watermark-held tail may be absent.
    val maxTs = batch.agg(max(col("ts"))).head.getTimestamp(0).getTime
    val missing = batch.join(streamed, Seq("metric", "ts"), "left_anti")
    val tooOldMissing = missing.filter(col("ts") < lit(new java.sql.Timestamp(maxTs - 10 * 60000L)))
    assert(tooOldMissing.count() == 0, "closed window missing from streamed rollup")
  }

  test("ST2/ST3: restart from checkpoint is idempotent (no duplicate windows)") {
    val tmp = Files.createTempDirectory("graft-ingest2")
    val out = s"$tmp/rollup"
    Ingest.runAvailableNow(spark, dir, out, s"$tmp/ckpt")
    val n1 = spark.read.parquet(out).count()
    // second run with same checkpoint: no new input → no new rows
    Ingest.runAvailableNow(spark, dir, out, s"$tmp/ckpt")
    val n2 = spark.read.parquet(out).count()
    assert(n1 == n2)
  }
}
