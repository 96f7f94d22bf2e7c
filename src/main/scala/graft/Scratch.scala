package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratchpad main: prints the physical plan of the named
  * registry queries (all-pushdown sanity check), or the entry smoke
  * when no args are given. Not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.isEmpty) {
      val df = SparkEntry.entry(spark)
      df.show(20, truncate = false)
      println(s"entry rows = ${df.count()}")
    } else args.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
