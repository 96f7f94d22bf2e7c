package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiler main: breaks a registry query's wall time into
  * driver phases (build, analysis, optimization, physical planning)
  * vs execution, to locate the fixed per-query overhead on tiny
  * queries. Usage: runMain graft.ProfileOverhead q1 q2 … [reps=5].
  * Not part of the library surface. */
object ProfileOverhead {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.store.Tables.cacheEnabled = true
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      var (bBuild, bExec, bTot) = (Double.MaxValue, Double.MaxValue, Double.MaxValue)
      var phases = Map.empty[String, Long]
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        val build = (t1 - t0) / 1e9; val exec = (t2 - t1) / 1e9
        if (build + exec < bTot) {
          bTot = build + exec; bBuild = build; bExec = exec
          phases = df.queryExecution.tracker.phases.map { case (k, v) =>
            k -> (v.endTimeMs - v.startTimeMs)
          }
        }
      }
      println(f"$name%-28s total=${bTot}%.3f build=${bBuild}%.3f exec=${bExec}%.3f phasesMs=${phases.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(",")}")
    }
    spark.stop()
  }
}
