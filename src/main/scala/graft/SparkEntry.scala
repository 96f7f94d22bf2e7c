package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Queries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The canonical rearview E1 hot path, run exactly as a stored monitor
    * would: string targets through the TargetLang parser, the safe
    * monitor DSL compiled to a Column, window clipped by `to_date`
    * (backtest, ST8), one declarative plan end to end.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val spec = graft.model.MonitorSpec(
      id = 1, name = "flagship",
      targets = Seq("summarize(events.{click,view,purchase,signup,error}, \"1h\", \"sum\")"),
      minutes = 720,
      toDate = Some(java.sql.Timestamp.valueOf("2024-01-15 12:00:00")),
      cronExpr = "*/5 * * * *",
      monitorExpr = "mean > 30 && count > 0")
    graft.engine.Planner.plan(spark,
      graft.store.MetricSource.events(spark, dir), spec,
      java.sql.Timestamp.valueOf("2024-01-15 12:00:00"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(Queries.all.map(d => d.name -> d.fn): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    scala.collection.immutable.ListMap(
      Queries.all.flatMap(d => d.oracle.map(th => d.name -> th())): _*)
}
