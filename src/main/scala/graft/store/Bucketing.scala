package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support (SURVEY §4.4 / prompt: "bucketing for
  * co-located joins"): write both sides of a recurring large join
  * bucketed + sorted on the join key and the shuffle disappears from
  * every subsequent join — at 100 TB this converts the nightly
  * fact-to-fact join from a full network shuffle into a local
  * merge per bucket.
  *
  * Spark only reads bucket metadata through the catalog, so these are
  * `saveAsTable` tables (parquet under `spark.sql.warehouse.dir`), not
  * bare paths.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit = {
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the observable proof that a join ran co-located. Structural check
    * (node types, not plan-string text), recursing through AQE wrapper
    * nodes whose subplans hang off fields rather than `children`. */
  def isShuffleFree(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def hasShuffle(p: SparkPlan): Boolean = p match {
      case _: ShuffleExchangeLike => true
      case a: AdaptiveSparkPlanExec => hasShuffle(a.executedPlan)
      case q: QueryStageExec => hasShuffle(q.plan)
      case other => other.children.exists(hasShuffle)
    }
    !hasShuffle(df.queryExecution.executedPlan)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Crash-safe compaction swap protocol, shared by every bucketed
    * catalog store (Frontier seen store, Graph edge store, Dedup band
    * store when compacted): `writeTmp` builds the complete replacement
    * under `<table>_compacting`, then the swap is rename-aside →
    * rename-in → drop-aside, so at NO point is the live name absent
    * while the only complete copy sits under a name nobody reads — the
    * failure the old drop-then-rename protocol had (a crash between
    * drop and rename left the live name missing; a later
    * `tableExists`-guarded append then silently re-bootstrapped the
    * store from one batch, discarding all cumulative state). Crash
    * windows and their recovery ([[recoverCompacted]]):
    *  - during `writeTmp`: live intact, `_compacting` partial — the
    *    next compaction drops and rewrites it; appends are unaffected.
    *  - between rename-aside and rename-in: live absent, `_retired` =
    *    old data, `_compacting` = COMPLETE new data → recovery renames
    *    `_compacting` in and drops `_retired`.
    *  - between rename-in and drop-aside: live intact, `_retired`
    *    orphan → recovery (or the next compaction) drops it. */
  def compactSwap(spark: SparkSession, table: String)
      (writeTmp: String => Unit): Unit = {
    require(recoverCompacted(spark, table), s"no such store: $table")
    replaceTable(spark, table)(writeTmp)
  }

  /** The swap core of [[compactSwap]], usable when the live table may
    * not exist yet (snapshot writers): build under `_compacting`,
    * rename any live copy aside, rename the new one in, drop the
    * aside. Same crash windows and [[recoverCompacted]] repair. */
  def replaceTable(spark: SparkSession, table: String)
      (writeTmp: String => Unit): Unit = {
    val tmp = s"${table}_compacting"
    val retired = s"${table}_retired"
    recoverCompacted(spark, table): Unit // repair any prior crash first
    dropWithLocation(spark, tmp)
    writeTmp(tmp)
    if (spark.catalog.tableExists(table))
      spark.sql(s"ALTER TABLE `$table` RENAME TO `$retired`")
    spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
    dropWithLocation(spark, retired)
  }

  /** Recover from a compaction crash, then report whether `table`
    * exists. EVERY store read/append path that guards on existence must
    * come through here (not bare `tableExists`): after a crash inside
    * [[compactSwap]]'s rename window the live name is absent but the
    * complete compacted copy sits at `<table>_compacting` — a bare
    * existence check would re-bootstrap the store from the current
    * batch and silently discard all cumulative state. */
  def recoverCompacted(spark: SparkSession, table: String): Boolean = {
    val tmp = s"${table}_compacting"
    val retired = s"${table}_retired"
    if (spark.catalog.tableExists(table)) {
      // swap completed (or never ran); a leftover aside is an orphan
      if (spark.catalog.tableExists(retired)) dropWithLocation(spark, retired)
      true
    } else if (spark.catalog.tableExists(tmp) &&
        spark.catalog.tableExists(retired)) {
      // `_retired` is the PROOF the copy is complete: rename-aside only
      // runs after writeTmp finished, so live-absent + retired-present
      // pins the crash between the two renames — rename the complete
      // copy in. Without the proof (live absent, tmp present, NO
      // retired) the tmp may be a PARTIAL first write
      // ([[replaceTable]] with no prior live never renames aside) —
      // trusting it would serve a truncated store as live. Drop it and
      // report absent; the caller recomputes/bootstraps, the safe
      // direction.
      spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
      dropWithLocation(spark, retired)
      true
    } else {
      if (spark.catalog.tableExists(tmp)) dropWithLocation(spark, tmp)
      false
    }
  }

  /** Drop `table` AND clear its orphaned warehouse location, if any.
    * With the default in-memory catalog the table registration dies
    * with the JVM but the warehouse directory survives, so the next
    * session's `saveAsTable` fails with LOCATION_ALREADY_EXISTS even in
    * Overwrite mode. Production (a persistent metastore) never hits
    * this; the local posture needs the cleanup before a fresh write.
    * Only managed default-database locations are handled (the only kind
    * this library writes). Hadoop-FS, not java.io: the warehouse dir
    * may be a remote URI (hdfs://, s3a://) — a File-based cleanup would
    * silently no-op there and the failure this exists to prevent would
    * still occur (the Ingest/DocumentIngest precedent). */
  def dropWithLocation(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true): Unit
  }
}
