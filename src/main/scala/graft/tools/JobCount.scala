package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only job profiler: runs named registry queries (warm) and
  * prints per-job wall durations — locates fixed job-dispatch floors
  * in the iterative gates (x60/x64 family). Not library surface. */
object JobCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.store.Tables.cacheEnabled = true
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .orElse(js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
          .getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, site) = starts.getOrDefault(je.jobId, (0L, "?"))
        jobs.add((je.jobId, System.nanoTime() - t0, site))
      }
    })
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      force(fn(spark, dir)) // warm
      force(fn(spark, dir)) // warm 2
      jobs.clear()
      val t0 = System.nanoTime()
      force(fn(spark, dir))
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      val snap = jobs.toArray(Array.empty[(Int, Long, String)]).sortBy(_._1)
      println(f"\n== $name: $total%.3f s, ${snap.length} jobs ==")
      snap.foreach { case (id, d, site) =>
        println(f"  job $id%3d  ${d / 1e9}%.3f s  $site") }
    }
    spark.stop()
  }
}
