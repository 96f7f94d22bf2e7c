package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table access layer over the driver-provided parquet directories
  * (TESTDATA.md). One scan definition per table so every query gets the
  * same pruned, pushdown-friendly source.
  *
  * At 100 TB the equivalent store would be partitioned
  * `(date, bucket(metric, N))` and sorted within partitions by
  * `(metric, ts)` (SURVEY §4.4); here the driver ships single parquet
  * files, so the scale story lives in keeping every reader a plain
  * `spark.read.parquet` that Catalyst can prune — no collects, no schema
  * inference, no csv.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** `events.ts` is nanosecond-precision parquet, which Spark's reader
    * rejects ([PARQUET_TYPE_ILLEGAL]). Read it as raw long ns (legacy
    * conf) and truncate to micros with integer division — the same
    * truncation DuckDB applies reading ns into its µs TIMESTAMP, so the
    * two engines see identical timestamps. (Double division would lose
    * precision: 2024 epoch-ns ≈ 1.7e18 > 2^53.) */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** The long-format metric store: `(metric, ts, value)`.
    *
    * Plays the role Graphite played for the reference (README.md:6): the
    * `events` stream is exposed as one series per event type under the
    * `events.` namespace — the shape every SeriesOps operator consumes.
    * The projection happens before any filter/agg so Catalyst pushes the
    * `event_type`/`ts` predicates into the parquet scan.
    */
  def metricStore(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      concat(lit("events."), col("event_type")).as("metric"),
      col("ts"),
      col("value"))

  /** Metric store with a deeper path (`events.<type>.u<user bucket>`),
    * used by path-manipulation operators (aliasByNode, deep globs). */
  def metricStoreDeep(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      concat(lit("events."), col("event_type"), lit(".u"), col("user_id") % 10).as("metric"),
      col("ts"),
      col("value"))
}
