package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only micro-timer: decomposes the x65 seed chain into cumulative
  * sub-plans to locate where its wall time lives. Not library surface. */
object TimeParts {
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

    def time(name: String)(df: => DataFrame): Unit = {
      val d = df
      d.write.format("noop").mode("overwrite").save() // warm
      var best = Double.MaxValue
      for (_ <- 1 to 5) {
        val t0 = System.nanoTime()
        d.write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$name%-28s $best%.3f s")
    }

    val k = (col("doc_id") % 50).cast("string")
    val hostUrl = concat(lit("https://h"), k, lit(".example"))
    def base = graft.store.Tables.documents(spark, dir)
      .filter(col("doc_id") % 50 < 40)
      .select(k.as("k"), hostUrl.as("hu"))
    def robots = base.distinct()
      .select(concat(col("hu"), lit("/robots.txt")).as("url"),
        concat(
          lit("User-agent: *\nDisallow: /private/\nSitemap: "),
          col("hu"), lit("/sitemap.xml   # index\nSitemap: /maps/news.xml\n"),
          lit("Sitemap: https://spam.blocked.example/sm"), col("k"),
          lit(".xml\nsitemap: ftp://h"), col("k"),
          lit(".example/x.xml\nSitemap: "), col("hu"),
          lit("/sitemap.xml?utm_source=t\n")).as("txt"))
    def scheme(u: org.apache.spark.sql.Column) =
      graft.functions.UrlExpressions.urlParts(u).getField("scheme")
    def hostc(u: org.apache.spark.sql.Column) =
      graft.functions.UrlExpressions.urlParts(u).getField("host")

    time("scan+select")(base)
    time("fixture distinct")(base.distinct())
    time("robots txt built")(robots)
    time("+explode sitemaps")(robots.select(col("url").as("_base"),
      explode(graft.ext.Robots.sitemaps(col("txt"))).as("_s")))
    time("+resolve+normalize")(robots.select(col("url").as("_base"),
        explode(graft.ext.Robots.sitemaps(col("txt"))).as("_s"))
      .select(graft.ext.UrlOps.normalizeUrl(
        graft.ext.UrlOps.resolveUrl(col("_base"), col("_s"))).as("url"))
      .filter(col("url").isNotNull))
    time("+scheme+block filters")(robots.select(col("url").as("_base"),
        explode(graft.ext.Robots.sitemaps(col("txt"))).as("_s"))
      .select(graft.ext.UrlOps.normalizeUrl(
        graft.ext.UrlOps.resolveUrl(col("_base"), col("_s"))).as("url"))
      .filter(col("url").isNotNull)
      .filter(scheme(col("url")).isin("http", "https"))
      .filter(!coalesce(graft.ext.UrlOps.domainBlocked(col("url"),
        Seq("blocked.example")), lit(false))))
    time("full seedsFromRobots")(
      graft.ext.Frontier.seedsFromRobots(robots, "url", "txt",
        blockedDomains = Seq("blocked.example")))
    time("x65 via registry")(
      graft.SparkEntry.queries("x65_sitemap_seeds")(spark, dir))

    // variants: where does the filter cost come from?
    def exploded = robots.select(col("url").as("_base"),
        explode(graft.ext.Robots.sitemaps(col("txt"))).as("_s"))
      .select(graft.ext.UrlOps.normalizeUrl(
        graft.ext.UrlOps.resolveUrl(col("_base"), col("_s"))).as("url"))
      .filter(col("url").isNotNull)
    def gates(d: DataFrame): DataFrame = d
      .filter(scheme(col("url")).isin("http", "https"))
      .filter(!coalesce(graft.ext.UrlOps.domainBlocked(col("url"),
        Seq("blocked.example")), lit(false)))
      .distinct()
      .select(hostc(col("url")).as("host"), col("url"))
    time("variant: ckpt barrier")(gates(exploded.localCheckpoint(true)))
    time("variant: one-projection")(
      robots.select(col("url").as("_base"),
          explode(graft.ext.Robots.sitemaps(col("txt"))).as("_s"))
        .select(graft.ext.UrlOps.urlParts(
          graft.ext.UrlOps.resolveUrl(col("_base"), col("_s"))).head._2))
    time("variant: gates no distinct")(
      exploded
        .filter(scheme(col("url")).isin("http", "https"))
        .filter(!coalesce(graft.ext.UrlOps.domainBlocked(col("url"),
          Seq("blocked.example")), lit(false))))
    time("variant: single filter")(
      exploded.filter(scheme(col("url")).isin("http", "https")))

    // -- x64c phase decomposition --------------------------------------
    def timeAct(name: String)(f: => Unit): Unit = {
      f // warm
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$name%-28s $best%.3f s")
    }
    // build the same cumulative state x64c uses (batch-1 processed)
    val qx = graft.SparkEntry.queries
    timeAct("x64c full")(
      qx("x64c_cumulative_crawl")(spark, dir)
        .write.format("noop").mode("overwrite").save())
    // isolate PageRank-from-store on the same graph store
    val h = Integer.toHexString(dir.hashCode)
    timeAct("pageRankFromStore 5it")(
      graft.ext.Graph.pageRankFromStore(spark, s"graft_cumgraph_$h", 5)
        .write.format("noop").mode("overwrite").save())
    timeAct("pagerank batch-graph 5it")(
      graft.ext.Graph.pageRank(
        spark.table(s"graft_cumgraph_${h}_edges_src"), 5)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
