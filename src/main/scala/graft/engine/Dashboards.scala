package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Application/dashboard tree operations (SURVEY §1.1): the reference
  * groups monitors into hierarchical applications using a
  * materialized-path `ancestry` string column — "1/5/9" = ancestor ids
  * root-first (reference db/schema.rb:16-27 + the ancestry gem,
  * Gemfile.lock:158).
  *
  * Materialized paths make every tree query a prefix predicate — no
  * recursion, no iterative joins, and the prefix filter is
  * pushdown-friendly: exactly the right encoding for tree metadata in
  * a columnar store.
  *
  * Expected schema: (id: Long, name: String, ancestry: String?) where
  * null ancestry = root.
  */
object Dashboards {

  /** Path of a node itself: its ancestry plus its own id. */
  def selfPath(id: Column, ancestry: Column): Column =
    when(ancestry.isNull, id.cast("string"))
      .otherwise(concat(ancestry, lit("/"), id.cast("string")))

  def depth(ancestry: Column): Column =
    when(ancestry.isNull, lit(0)).otherwise(size(split(ancestry, "/")))

  def rootId(id: Column, ancestry: Column): Column =
    when(ancestry.isNull, id)
      .otherwise(element_at(split(ancestry, "/"), 1).cast("long"))

  def parentId(ancestry: Column): Column =
    when(ancestry.isNull, lit(null).cast("long"))
      .otherwise(element_at(split(ancestry, "/"), -1).cast("long"))

  /** Strict descendants of `nodePath` (e.g. "1/5"): ancestry equals the
    * path or extends it — a prefix match, not a scan of the tree. */
  def descendants(apps: DataFrame, nodePath: String): DataFrame =
    apps.filter(col("ancestry") === nodePath ||
      col("ancestry").startsWith(nodePath + "/"))

  /** Subtree = node + descendants, by node id (resolves the path first;
    * the lookup side is one row, kept as a cheap local collect). */
  def subtree(apps: DataFrame, nodeId: Long): DataFrame = {
    val path = apps.filter(col("id") === nodeId)
      .select(selfPath(col("id"), col("ancestry"))).collect()
      .headOption.map(_.getString(0))
      .getOrElse(return apps.limit(0))
    apps.filter(col("id") === nodeId).unionByName(descendants(apps, path))
  }

  /** Ancestor ids of each row as an array column (for explode-joins). */
  def ancestorIds(ancestry: Column): Column =
    when(ancestry.isNull, array().cast("array<long>"))
      .otherwise(transform(split(ancestry, "/"), _.cast("long")))

  /** Per-subtree monitor rollup: every job counts toward its app AND
    * each ancestor app — one explode + aggregate, no recursion. */
  def jobCountsPerSubtree(apps: DataFrame, jobs: DataFrame): DataFrame = {
    val appAndAncestors = apps.select(col("id").as("app_id"),
      explode(concat(ancestorIds(col("ancestry")), array(col("id")))).as("subtree_root"))
    jobs.join(appAndAncestors, "app_id")
      .groupBy(col("subtree_root").as("app_id"))
      .agg(count(lit(1)).as("n_jobs_in_subtree"))
  }
}
