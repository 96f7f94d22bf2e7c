package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crawl-frontier construction — the composition that turns a batch of
  * crawled pages into the next batch of fetch targets, every stage one
  * of the library's own gates:
  *
  *   1. out-links + RFC 3986 resolution ([[Extract.resolvedLinks]]);
  *   2. URL normalization ([[UrlOps.normalizeUrl]] — tracking params,
  *      default ports, fragments; `javascript:`/`mailto:` refs die
  *      here because they never parse as `scheme://host`);
  *   3. scheme gate (http/https only — ftp et al. are parseable but
  *      not fetchable by this pipeline);
  *   4. domain blocklist ([[UrlOps.domainBlocked]], registered-domain
  *      semantics);
  *   5. host-graph PageRank over the SAME batch's link structure
  *      ([[Graph.pageRank]]) as the per-host priority;
  *   6. URL dedup + already-crawled anti-join — the batch's own page
  *      URLs always, plus the CUMULATIVE seen-URL store when one is
  *      given ([[writeSeenStore]]/[[appendSeenStore]]: a bucketed
  *      catalog table keyed on the normalized url, so the anti-join
  *      reads the store pre-partitioned and exchanges only the
  *      candidate side);
  *   7. per-host politeness cap ([[Sampling.stratifiedTake]] in
  *      seeded-draw order — intra-host priority is deliberately a
  *      reproducible draw, the standard choice when no per-URL signal
  *      exists yet; the critical-bucket engine keeps the cap
  *      window-free over the corpus).
  *
  * Scale shape: one pass over pages produces the link set; everything
  * downstream is keyed exchanges on url/host; the PageRank rounds are
  * [[Graph.pageRank]]'s checkpointed iteration; no stage is
  * page-count × link-count. Reference: crawl scheduling is outside
  * livingsocial/rearview's scope (README.md:6 delegates all metric
  * math to Graphite) — this is extension surface for the crawl-corpus
  * mandate, composing the reference-shaped gates end to end.
  */
object Frontier {

  /** The frontier's robots-compliance input: per-domain robots.txt
    * rows (`robotsUrlCol` = the robots file's own URL — its host keys
    * the join; `txtCol` = the file body) plus the user-agent the rules
    * are selected for. Domain-dimension-sized, so the gate join
    * broadcasts (the [[withCrawlDelay]] shape). */
  final case class RobotsGate(robots: DataFrame, robotsUrlCol: String,
      txtCol: String, agent: String = "*")

  /** The prioritized frontier: (host, url, rank) — `rank` the host's
    * PageRank in this batch's link graph (0.0 for a host the graph
    * never ranked), at most `perHostCap` URLs per host.
    *
    * `seenTable`, when given, names a cumulative seen-URL store
    * ([[writeSeenStore]]) and candidates already in it are
    * anti-joined away IN ADDITION to the batch's own page URLs — the
    * production crawl loop: each batch's frontier excludes everything
    * any earlier batch fetched, at candidate cost (the store is never
    * re-scanned into memory or re-shuffled; see [[freshAgainstStore]]).
    *
    * `hostRanks`, when given, is an external (id, rank) host-score
    * frame used INSTEAD of the batch-graph PageRank — the cumulative
    * crawl loop ranks against the WHOLE crawl's endorsement structure
    * ([[Graph.pageRankFromStore]] over an [[Graph.appendEdgeStore]]-fed
    * store; see [[graft.streaming.DocumentIngest.frontierMaintenance]])
    * rather than one batch's, so a host's priority reflects every
    * batch that ever linked to it. */
  def fromPages(pages: DataFrame, urlCol: String, htmlCol: String,
      blockedDomains: Seq[String] = Nil, perHostCap: Int = 100,
      seed: String = "graft-frontier-v1", prIterations: Int = 10,
      seenTable: Option[String] = None,
      hostRanks: Option[DataFrame] = None,
      robotsGate: Option[RobotsGate] = None,
      pageLevelOrdering: Boolean = false): DataFrame =
    frontierCore(pages, urlCol, htmlCol, blockedDomains, perHostCap, seed,
      seenTable, robotsGate,
      // gate 5b (opt-in): page-level PageRank over the batch's page
      // graph — candidates are dangling receivers of link mass, so
      // never-crawled URLs get real priorities from who links to them.
      // Orders WITHIN hosts only (the cap's host quotas are rank-
      // independent); subject to the same MaxNodes grid guard, which
      // is why host level stays the default (a full-crawl page graph
      // can exceed it; per-batch page graphs do not). Output gains a
      // `prank` column.
      pageScoreOf = if (!pageLevelOrdering) None else Some { allowed =>
        val edges = Graph.hostEdges(
          allowed.select(UrlOps.normalizeUrl(col("_page")).as("src"),
            col("url").as("dst")),
          "src", "dst")
        // empty-graph probe rides pageRank's own layout checkpoint
        // (Graph.pageRankIfNonEmpty) — a bare edges.isEmpty paid a full
        // materialization of the link subtree before pageRank re-ran it
        Graph.pageRankIfNonEmpty(edges, prIterations).getOrElse(
          edges.sparkSession.emptyDataFrame
            .select(lit("").as("id"), lit(0.0).as("rank")).limit(0))
      },
      rankOf = allowed => hostRanks.getOrElse {
        // the batch's own endorsement structure ranks the hosts. A
        // batch whose links never cross hosts has NO endorsement graph
        // (hostEdges drops self-loops) — every host then ranks 0.0 via
        // the left join in the core rather than tripping pageRank's
        // empty-graph guard. The probe rides the layout checkpoint
        // (see pageScoreOf above — measured 0.58 s/gate for the bare
        // isEmpty at sf0.1).
        val edges = Graph.hostEdges(
          allowed.select(host(col("_page")).as("src"), host(col("url")).as("dst")),
          "src", "dst")
        Graph.pageRankIfNonEmpty(edges, prIterations).getOrElse(
          edges.sparkSession.emptyDataFrame
            .select(lit("").as("id"), lit(0.0).as("rank")).limit(0))
      })

  /** The CUMULATIVE crawl step: one pass of the batch's link kernels
    * feeds BOTH the persistent host-graph store
    * ([[Graph.appendEdgeStore]] — idempotent fold of this batch's
    * edges) and the frontier, whose host priority is
    * [[Graph.pageRankFromStore]] over the WHOLE crawl's accumulated
    * endorsement structure — batch N's frontier ranks a host by every
    * batch that ever linked to it, not just this one. Fully idempotent
    * under replay: the edge fold is a no-op on re-delivery, so the
    * store-derived ranks — and therefore the frontier — reproduce.
    *
    * Cost shape: the rank recompute is per batch BY DEFAULT; at very
    * high batch rates run it on a CADENCE instead — `rankSnapshotTable`
    * names a persisted [[Graph.writeRankSnapshot]] store, and
    * `recomputeRanks = false` serves host priorities from it (edges
    * STILL fold every batch — the graph store never goes stale, only
    * the derived ranks do, with staleness bounded by the caller's
    * cadence; crawl priorities are heuristic, so bounded staleness is
    * the standard trade). A recompute batch writes the snapshot and
    * ranks against the freshly-written table, so recompute and
    * between-batches read ranks from the IDENTICAL source (bitwise —
    * the spec's contract). A missing/torn snapshot forces a recompute
    * regardless of the flag — the safe default. */
  def fromPagesCumulative(pages: DataFrame, urlCol: String, htmlCol: String,
      graphStorePrefix: String, blockedDomains: Seq[String] = Nil,
      perHostCap: Int = 100, seed: String = "graft-frontier-v1",
      prIterations: Int = 10, seenTable: Option[String] = None,
      buckets: Int = 32,
      robotsGate: Option[RobotsGate] = None,
      rankSnapshotTable: Option[String] = None,
      recomputeRanks: Boolean = true): DataFrame =
    frontierCore(pages, urlCol, htmlCol, blockedDomains, perHostCap, seed,
      seenTable, robotsGate, allowed => {
        val spark = pages.sparkSession
        Graph.appendEdgeStore(
          Graph.hostEdges(
            allowed.select(host(col("_page")).as("src"),
              host(col("url")).as("dst")), "src", "dst"),
          graphStorePrefix, buckets)
        val served = if (!recomputeRanks)
          rankSnapshotTable.flatMap(Graph.readRankSnapshot(spark, _))
        else None
        served.getOrElse {
          val ranks = Graph.pageRankFromStore(spark, graphStorePrefix,
            prIterations)
          rankSnapshotTable match {
            case Some(t) =>
              Graph.writeRankSnapshot(ranks, t, buckets)
              Graph.readRankSnapshot(spark, t).get
            case None => ranks
          }
        }
      })

  private def host(u: Column): Column =
    graft.functions.UrlExpressions.urlParts(u).getField("host")
  private def scheme(u: Column): Column =
    graft.functions.UrlExpressions.urlParts(u).getField("scheme")

  /** Gates 1–4 + 6–7 of the frontier; `rankOf` supplies gate 5's host
    * priority from the materialized link set; `robotsGate`, when
    * given, adds gate 6.5 — robots.txt COMPLIANCE: a compliant crawler
    * must not SCHEDULE a disallowed URL, so the filter sits on the
    * fresh candidates before the politeness cap (a disallowed URL must
    * not consume a cap slot either). Per-host rules parse ONCE on the
    * domain-dimension robots frame and broadcast; candidates evaluate
    * one [[Robots.allowed]] kernel call against their host's merged
    * rule array (rule merge is order-independent — RFC 9309 decides by
    * longest-match, not file order). A host with no robots row is
    * allowed (the RFC's no-file default). */
  private def frontierCore(pages: DataFrame, urlCol: String, htmlCol: String,
      blockedDomains: Seq[String], perHostCap: Int, seed: String,
      seenTable: Option[String], robotsGate: Option[RobotsGate],
      rankOf: DataFrame => DataFrame,
      pageScoreOf: Option[DataFrame => DataFrame] = None): DataFrame = {
    // 1+2: resolve every href against its page, normalize, drop the
    // unparseable (relative-only bases, javascript:, mailto:, …)
    val links = pages
      .select(col(urlCol).as("_page"),
        explode(Extract.resolvedLinks(col(htmlCol), col(urlCol))).as("l"))
      .select(col("_page"), UrlOps.normalizeUrl(col("l.url")).as("url"))
      .filter(col("url").isNotNull)
    // 3+4: fetchable schemes, governed domains. Materialized ONCE: the
    // kernel-heavy extract→resolve→normalize chain above feeds three
    // consumers (edges, the fresh-URL set, and through them the cap's
    // multi-reference critical-bucket engine) — without this and the
    // `ranked` checkpoint every consumer re-parses every page
    // (measured: the x64 gate dropped 8.0 s → 3.4 s at sf0.1, the
    // remainder being the PageRank rounds themselves). Lazy persist
    // rather than an eager checkpoint: the two consumers run in
    // SEQUENTIAL jobs (the graph build first, the fresh/rank job
    // later), so the first fills the cache and the standalone
    // materialization job disappears — safe here, unlike `ranked`
    // below, whose four references share ONE job and must find the
    // frame already materialized.
    val allowed = links
      .filter(scheme(col("url")).isin("http", "https"))
      .filter(if (blockedDomains.isEmpty) lit(true)
        else !coalesce(UrlOps.domainBlocked(col("url"), blockedDomains), lit(false)))
      .persist()

    // 5: host priority
    val ranks = rankOf(allowed)

    // 6: fresh URLs only — this batch's own pages, then the cumulative
    // store (both anti-joins key on the already-hash-partitioned url,
    // and the store side's bucket layout matches, so no new exchange
    // enters the plan here beyond the candidate distinct's own)
    val crawled = pages
      .select(UrlOps.normalizeUrl(col(urlCol)).as("url"))
      .filter(col("url").isNotNull).distinct()
    val freshBatch = allowed.select(col("url")).distinct()
      .join(crawled, Seq("url"), "left_anti")
    val fresh0 = seenTable.fold(freshBatch)(t => freshAgainstStore(freshBatch, t))

    // 6.5: robots compliance — disallowed URLs must neither be
    // scheduled nor consume politeness-cap slots
    val fresh = robotsGate.fold(fresh0) { rg =>
      val rules = rg.robots
        .select(host(col(rg.robotsUrlCol)).as("_rh"),
          Robots.rulesFor(col(rg.txtCol), lit(rg.agent)).as("_rules"))
        .filter(col("_rh").isNotNull)
        // one merged rule array per host (duplicate robots rows are a
        // data defect but must not duplicate candidates through the
        // join; decide() is longest-match, so concat order is moot)
        .groupBy("_rh").agg(flatten(collect_list(col("_rules"))).as("_rules"))
      val parts = graft.functions.UrlExpressions.urlParts(col("url"))
      fresh0
        .withColumn("_rh", host(col("url")))
        .join(broadcast(rules), Seq("_rh"), "left")
        .filter(col("_rules").isNull ||
          Robots.allowed(
            Robots.matchTarget(parts.getField("path"), parts.getField("query")),
            col("_rules")))
        .drop("_rh", "_rules")
    }

    // 7: rank join + politeness cap (ranked is checkpointed because the
    // cap engine references it four ways and the rank join broadcasts —
    // a broadcast join is not an exchange, so ReuseExchange does NOT
    // dedupe it: measured r14, dropping this checkpoint re-ran the
    // whole ranks subtree per reference and cost +0.5-1 s per gate).
    // The optional page-level priority (`pageScoreOf` — gate 5b) joins
    // BEFORE the checkpoint for the same reason: the cap engine's four
    // references must not re-run the page-rank subtree.
    val hostRanked = fresh
      .withColumn("host", host(col("url")))
      .join(ranks.select(col("id").as("host"), col("rank")), Seq("host"), "left")
      .select(col("host"), col("url"), coalesce(col("rank"), lit(0.0)).as("rank"))
    val ranked = pageScoreOf.fold(hostRanked) { ps =>
      hostRanked.join(
          ps(allowed).select(col("id").as("url"), col("rank").as("prank")),
          Seq("url"), "left")
        .select(col("host"), col("url"), col("rank"),
          coalesce(col("prank"), lit(0.0)).as("prank"))
    }.localCheckpoint(true)
    // the eager checkpoint above is the LAST reader of `allowed`:
    // release the cached relation now — Dataset.persist registers in
    // the session CacheManager, which no GC ever cleans, and
    // frontierCore runs once per streaming micro-batch (a long-running
    // frontierMaintenance stream would otherwise accumulate one cached
    // relation per batch, unbounded)
    allowed.unpersist(blocking = false)
    if (pageScoreOf.isEmpty)
      Sampling.stratifiedTake(ranked, Seq("host"), col("url"), seed, perHostCap)
    else
      // within-host ordering by PAGE priority: hosts and per-host cap
      // counts are untouched (the stratum engine is unchanged); which
      // URLs win a host's slots changes, best page rank first, seeded
      // draw on ties — the within-host scheduling signal a host-level
      // rank cannot provide
      Sampling.prioritizedTake(ranked, Seq("host"), col("prank"),
        col("url"), seed, perHostCap)
  }

  /** Sitemap-driven frontier seeding: (host, url) fetch targets from
    * the `Sitemap:` lines of per-domain robots.txt rows
    * ([[Robots.sitemaps]]) — the crawl bootstrap path that needs no
    * prior link graph (a new host enters the crawl through its robots
    * file before any page of it was fetched). Same gate chain as
    * [[fromPages]] candidates: resolve against the robots URL
    * (sitemaps.org requires absolute URLs, but relative survives a
    * lenient lexer), normalize, http(s) only, blocklist, dedup, and
    * the cumulative seen store when given. One explode + keyed
    * distinct — per-DOMAIN input, so corpus-scale cost is robots-file
    * count, not page count. */
  def seedsFromRobots(robots: DataFrame, robotsUrlCol: String,
      txtCol: String, blockedDomains: Seq[String] = Nil,
      seenTable: Option[String] = None): DataFrame = {
    val sm = robots
      .select(col(robotsUrlCol).as("_base"),
        explode(Robots.sitemaps(col(txtCol))).as("_s"))
      .select(UrlOps.normalizeUrl(
        UrlOps.resolveUrl(col("_base"), col("_s"))).as("url"))
      .filter(col("url").isNotNull)
      .filter(scheme(col("url")).isin("http", "https"))
      .filter(if (blockedDomains.isEmpty) lit(true)
        else !coalesce(UrlOps.domainBlocked(col("url"), blockedDomains), lit(false)))
      .distinct()
    seenTable.fold(sm)(t => freshAgainstStore(sm, t))
      .select(host(col("url")).as("host"), col("url"))
  }

  /** Sitemap-CONTENT frontier seeding — the step after
    * [[seedsFromRobots]] in the bootstrap loop: robots surfaced the
    * sitemap URLs, the fetcher brought their payloads back, and this
    * turns the payloads into fetch targets. `fetched` carries one row
    * per fetched sitemap: its URL (`sitemapUrlCol`) and raw payload
    * bytes (`payloadCol` — gzip/XML/plain-text handled by
    * [[Sitemap.parseEntries]]). Output: (host, url, kind, lastmod) —
    * kind `"url"` rows are PAGE fetch targets, kind `"sitemap"` rows
    * are `<sitemapindex>` children, i.e. MORE sitemaps to fetch (feed
    * them back through the fetcher and this function — the protocol's
    * one level of recursion, driven by the caller's loop so a cyclic
    * index cannot hang the pipeline).
    *
    * Same gate chain as every frontier candidate: resolve against the
    * sitemap's own URL (the protocol requires absolute `<loc>`s, but
    * relative survives a lenient lexer), normalize, http(s) only,
    * blocklist; URL twins that normalization merges keep their MAX
    * `lastmod` (the freshest claim wins — recrawl scheduling reads
    * this); the cumulative seen store, when given, anti-joins PAGE
    * candidates only (index children are sitemap fetches, not page
    * crawls) via one left join so the parse runs once, with the store
    * side read on its bucket layout. Per-SITEMAP input: corpus cost
    * scales with sitemap count (50k-URL protocol cap per file), never
    * page count. */
  def seedsFromSitemaps(fetched: DataFrame, sitemapUrlCol: String,
      payloadCol: String, blockedDomains: Seq[String] = Nil,
      seenTable: Option[String] = None,
      robotsGate: Option[RobotsGate] = None): DataFrame = {
    val entries = fetched
      .select(col(sitemapUrlCol).as("_base"),
        explode(Sitemap.entries(col(payloadCol))).as("_e"))
      .select(col("_e.kind").as("kind"),
        UrlOps.normalizeUrl(
          UrlOps.resolveUrl(col("_base"), col("_e.loc"))).as("url"),
        col("_e.lastmod").as("lastmod"))
      .filter(col("url").isNotNull)
      .filter(scheme(col("url")).isin("http", "https"))
      .filter(if (blockedDomains.isEmpty) lit(true)
        else !coalesce(UrlOps.domainBlocked(col("url"), blockedDomains), lit(false)))
      .groupBy(col("kind"), col("url"))
      .agg(max(col("lastmod")).as("lastmod"))
    // robots compliance on PAGE candidates (kind-aware like the seen
    // gate: index children are sitemap fetches, which robots rules on
    // page paths do not govern — a sitemap URL itself was already
    // vetted by whoever scheduled its fetch). Same broadcast shape as
    // frontierCore's gate 6.5; a sitemap listing a disallowed URL is
    // routine (sitemaps and robots drift independently), and a
    // compliant crawler must not schedule it.
    val robotsGated = robotsGate.fold(entries) { rg =>
      val rules = rg.robots
        .select(host(col(rg.robotsUrlCol)).as("_rh"),
          Robots.rulesFor(col(rg.txtCol), lit(rg.agent)).as("_rules"))
        .filter(col("_rh").isNotNull)
        .groupBy("_rh").agg(flatten(collect_list(col("_rules"))).as("_rules"))
      val parts = graft.functions.UrlExpressions.urlParts(col("url"))
      entries
        .withColumn("_rh", host(col("url")))
        .join(broadcast(rules), Seq("_rh"), "left")
        .filter(col("kind") === "sitemap" || col("_rules").isNull ||
          Robots.allowed(
            Robots.matchTarget(parts.getField("path"), parts.getField("query")),
            col("_rules")))
        .drop("_rh", "_rules")
    }
    val gated = seenTable.fold(robotsGated) { t =>
      // left join + kind-aware filter instead of an anti-join branch
      // per kind: ONE pass over the parsed entries, store side still
      // on its bucket layout
      robotsGated.join(
          robotsGated.sparkSession.table(t).withColumn("_seen", lit(true)),
          Seq("url"), "left")
        .filter(col("kind") === "sitemap" || col("_seen").isNull)
        .drop("_seen")
    }
    gated.select(host(col("url")).as("host"), col("url"), col("kind"),
      col("lastmod"))
  }

  /** Conditional-recrawl gate — what a crawl does with sitemap
    * `lastmod` claims after the bootstrap: pages ALREADY fetched whose
    * sitemap entry now claims a modification NEWER than the recorded
    * fetch time get re-enqueued (the new-page side is
    * [[seedsFromSitemaps]]' seen-store anti-join; this is its
    * complement over the intersection). `entries` carries sitemap
    * output (`urlCol`, `lastmodCol` — W3C datetime, date-only or full
    * timestamp, parsed null-safe: an unparseable or absent lastmod is
    * NO claim, so no recrawl); `crawlLog` carries (url, fetched_at
    * TIMESTAMP). URLs normalize on both sides so the join compares
    * like with like. One keyed equi-join; output (host, url,
    * lastmod_ts, fetched_at) — per-sitemap-entry cost. */
  def recrawlCandidates(entries: DataFrame, urlCol: String,
      lastmodCol: String, crawlLog: DataFrame, logUrlCol: String,
      fetchedAtCol: String): DataFrame = {
    val e = entries.select(
      UrlOps.normalizeUrl(col(urlCol)).as("url"),
      // try_: an unparseable lastmod is NO claim, not a pass-killer
      // (ANSI to_timestamp throws on real-crawl junk dates)
      try_to_timestamp(col(lastmodCol)).as("lastmod_ts"))
      .filter(col("url").isNotNull && col("lastmod_ts").isNotNull)
    val log = crawlLog.select(
      UrlOps.normalizeUrl(col(logUrlCol)).as("url"),
      col(fetchedAtCol).cast("timestamp").as("fetched_at"))
      .filter(col("url").isNotNull)
      .groupBy("url").agg(max(col("fetched_at")).as("fetched_at"))
    e.join(log, Seq("url"))
      .filter(col("lastmod_ts") > col("fetched_at"))
      .select(host(col("url")).as("host"), col("url"),
        col("lastmod_ts"), col("fetched_at"))
  }

  /** Executable per-host fetch schedule over a CAPPED frontier:
    * within each host, fetches run in the same seeded-draw order the
    * politeness cap used (md5(url:seed) asc, url asc — reproducible),
    * and successive fetches offset by the host's crawl delay:
    * `fetch_offset_s = (slot - 1) × coalesce(crawl_delay,
    * defaultDelaySeconds)`. Input is the (host, url, rank[,
    * crawl_delay]) frontier — ALREADY capped at `perHostCap` rows per
    * host, so the per-host ranking window is cap-bounded, never
    * corpus-sized (the one place this library uses a bare per-host
    * window, and only because the cap bounds it). Output adds `slot`
    * and `fetch_offset_s` — the scheduler's dispatch plan. */
  def fetchSchedule(frontier: DataFrame, seed: String,
      defaultDelaySeconds: Double = 1.0): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host"))
      .orderBy(md5(concat(col("url"), lit(":"), lit(seed))), col("url"))
    val delay =
      if (frontier.columns.contains("crawl_delay"))
        coalesce(col("crawl_delay").cast("double"), lit(defaultDelaySeconds))
      else lit(defaultDelaySeconds)
    frontier
      .withColumn("slot", row_number().over(w))
      .withColumn("fetch_offset_s", (col("slot") - 1) * delay)
  }

  /** Attach each frontier host's `Crawl-delay` (seconds) from its
    * robots row — (host, url, rank) → (host, url, rank, crawl_delay),
    * the fetch scheduler's rate input next to the priority. Robots
    * rows are domain-dimension-sized, so the join broadcasts; a host
    * with no robots row (or none setting a delay) carries null and
    * the scheduler applies its own default. Duplicate robots rows for
    * one host merge to the MAXIMUM delay ([[Robots.parseCrawlDelay]]'s
    * politest-read convention). */
  def withCrawlDelay(frontier: DataFrame, robots: DataFrame,
      robotsUrlCol: String, txtCol: String,
      agent: String = "*"): DataFrame = {
    val delays = robots
      .select(host(col(robotsUrlCol)).as("host"),
        Robots.crawlDelay(col(txtCol), lit(agent)).as("crawl_delay"))
      .filter(col("host").isNotNull)
      .groupBy("host").agg(max(col("crawl_delay")).as("crawl_delay"))
    frontier.join(broadcast(delays), Seq("host"), "left")
  }

  // -- cumulative crawl-state (seen-URL) store ----------------------------

  /** Normalize + dedup a URL column into the store's (url) shape. */
  private def normalizedUrls(urls: DataFrame, urlCol: String): DataFrame =
    urls.select(UrlOps.normalizeUrl(col(urlCol)).as("url"))
      .filter(col("url").isNotNull).distinct()

  /** Create (or recreate) the cumulative seen-URL store: a catalog
    * table `table` with a single `url` column, bucketed AND sorted on
    * `url` with one file per bucket — the layout that lets every later
    * frontier anti-join read the store pre-partitioned on exactly its
    * join key ([[graft.ext.Dedup.writeBandStoreBucketed]] discipline;
    * `repartition(buckets, url)` before the write keeps it one file
    * per bucket so the scan reports the sort order). URLs are
    * normalized with the same [[UrlOps.normalizeUrl]] the frontier
    * applies to candidates, so the join compares like with like. */
  def writeSeenStore(urls: DataFrame, urlCol: String, table: String,
      buckets: Int = 32): Unit = {
    graft.store.Bucketing.dropWithLocation(urls.sparkSession, table)
    normalizedUrls(urls, urlCol)
      .repartition(buckets, col("url"))
      .write.mode("overwrite")
      .bucketBy(buckets, "url").sortBy("url")
      .format("parquet").saveAsTable(table)
  }

  /** Fold a crawled batch into the store at batch cost: normalize,
    * anti-join against the store (only genuinely NEW urls are
    * written — re-appending an already-seen URL is a no-op, which
    * makes the whole maintenance loop IDEMPOTENT under streaming
    * retries: no disjointness precondition, no scrub-on-crash), then
    * parquet-append per-bucket files. Creates the store when absent.
    * Appends accumulate small per-bucket files; fold them back to one
    * file per bucket with [[compactSeenStore]] on a maintenance
    * cadence. */
  def appendSeenStore(urls: DataFrame, urlCol: String, table: String,
      buckets: Int = 32): Unit = {
    val spark = urls.sparkSession
    // recovery-aware existence check: after a compaction crash the live
    // name can be absent while the complete copy sits at `_compacting` —
    // a bare tableExists would re-bootstrap from this batch alone and
    // silently discard all cumulative seen-URL state
    if (!graft.store.Bucketing.recoverCompacted(spark, table)) {
      writeSeenStore(urls, urlCol, table, buckets)
    } else {
      val delta = freshAgainstStore(normalizedUrls(urls, urlCol), table).persist()
      try {
        // steady-state fast path: a replayed batch appends nothing, and
        // the isEmpty probe beats an empty bucketed write's commit
        if (!delta.isEmpty)
          delta.repartition(buckets, col("url"))
            .write.mode("append")
            .bucketBy(buckets, "url").sortBy("url")
            .format("parquet").saveAsTable(table)
      } finally {
        delta.unpersist()
        ()
      }
    }
  }

  /** Rewrite the store to one file per bucket (appends leave one file
    * per batch per bucket; scan cost and open-file overhead grow with
    * batch count until compacted). The swap is the crash-safe
    * rename-aside protocol ([[graft.store.Bucketing.compactSwap]]): a
    * crash at any point either leaves the live table intact or leaves a
    * complete copy that [[graft.store.Bucketing.recoverCompacted]] —
    * which [[appendSeenStore]] and every guarded read run — renames
    * back in, so cumulative seen-URL state is never silently rebuilt
    * from one batch. */
  def compactSeenStore(spark: org.apache.spark.sql.SparkSession,
      table: String, buckets: Int = 32): Unit =
    graft.store.Bucketing.compactSwap(spark, table) { tmp =>
      spark.table(table).distinct()
        .repartition(buckets, col("url"))
        .write.mode("overwrite")
        .bucketBy(buckets, "url").sortBy("url")
        .format("parquet").saveAsTable(tmp)
    }

  /** The store-side anti-join, package-visible so the plan contract is
    * directly assertable: the stored scan must reach its join with NO
    * Exchange above it (the bucket layout IS the join distribution);
    * only `candidates` — batch-sized — shuffles. */
  private[graft] def freshAgainstStore(candidates: DataFrame,
      seenTable: String): DataFrame =
    candidates.join(candidates.sparkSession.table(seenTable),
      Seq("url"), "left_anti")
}
