package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Queries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The canonical rearview E1 hot path: clip a monitor window out of the
    * metric store, reduce per series, threshold → verdict row per series.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    graft.store.Tables.metricStore(spark, dir)
      .filter(col("ts").between(lit("2024-01-15 00:00:00"), lit("2024-01-15 12:00:00")))
      .groupBy("metric")
      .agg(avg(col("value")).as("observed"), count(lit(1)).as("n_points"))
      .withColumn("verdict", when(col("observed") < 30, "failed").otherwise("success"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(Queries.all.map(d => d.name -> d.fn): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    scala.collection.immutable.ListMap(
      Queries.all.flatMap(d => d.oracle.map(d.name -> _)): _*)
}
