package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Host-graph analytics for crawl curation — the link-structure signals
  * a large-scale corpus pipeline derives once per crawl and joins onto
  * every page: PageRank-style centrality for domain quality weighting
  * (the reference crawl curation literature — and CommonCrawl's own
  * published host ranking — weight domains by centrality before
  * sampling), plus the degree statistics the frontier scheduler and
  * spam gates key on.
  *
  * The graph arrives as an EDGE LIST DataFrame (`src`, `dst` string or
  * integral columns) — typically `Extract.resolvedLinks` →
  * `UrlOps.urlDomain` → [[hostEdges]] — and every operator here is
  * declarative DataFrame algebra:
  *
  *  - [[pageRank]] runs the power iteration as k joined-aggregate
  *    rounds, each `localCheckpoint`ed (the [[Dedup.connectedComponents]]
  *    plan-growth discipline). Per round the only shuffles are the
  *    rank join on `src` and the contribution aggregation on `dst` —
  *    both keyed exchanges, never all-pairs, and the edge side is
  *    hash-repartitioned ONCE up front and reused by every round's
  *    join (AQE cannot re-plan away a reuse the layout already
  *    provides). Dangling mass (nodes with no out-edges) joins back as
  *    a broadcast one-row aggregate, not a driver collect.
  *
  * Determinism contract (the suite's oracle discipline): every
  * cross-partition reduction — per-node contribution sums and the
  * dangling-mass total — goes through `DECIMAL(30,12)` so it is exact
  * and partition-order independent, and each round's rank is itself
  * quantized through `DECIMAL(30,12)` so both engines iterate on
  * IDENTICAL values (12 fractional digits keeps every term at ≤ 15
  * significant digits for rank-scale values — inside the region where
  * a shortest-repr and a binary double→decimal rounding agree — while
  * the quantization error, 1e-12/round, is orders below PageRank's own
  * power-iteration convergence error).
  *
  * At 100 TB the host graph is million-node/billion-edge scale: edges
  * and ranks are both hash-partitioned frames, per-round state is one
  * (id, rank) row per node, and no step materializes anything
  * node-count-squared. Reference behavior: livingsocial/rearview
  * delegates graph-shaped analytics entirely (README.md:6,20 — metric
  * math lives in Graphite); this module is extension surface for the
  * training-data pipeline mandate, not a reference port.
  */
object Graph {

  private val Dec = "decimal(30,12)"
  private val Grid = 1e12

  /** Quantize a non-negative double to the 1e-12 grid with PURE IEEE
    * arithmetic — `floor(x·1e12 + 0.5) / 1e12` — the cross-engine
    * consensus value both sides of the oracle iterate on. The earlier
    * decimal-cast form (`CAST(x AS DECIMAL(30,12))`) was NOT a
    * consensus: Spark rounds the double's shortest decimal repr
    * (HALF_UP on `BigDecimal.decimal`), DuckDB rounds the binary
    * value — a double within an ulp of a grid half-point quantizes
    * differently (observed: 30/1500 cells at 5 rounds). Here every
    * operation (multiply, add, floor, divide) is IEEE-defined on the
    * binary value, so equal input doubles give equal outputs in any
    * conforming engine; values are ≤ 1, so x·1e12 stays far inside
    * 2^53 and the floor is exact. */
  private def quant(c: Column): Column = floor(c * Grid + lit(0.5)) / Grid

  /** Exact, order-invariant sum: each term grid-quantized (after which
    * the DECIMAL(30,12) cast is itself consensus — a grid-centered
    * double is ≥ 400× an ulp away from any half-point), then summed as
    * decimal. */
  private def dsum(c: Column): Column =
    sum(quant(c).cast(Dec)).cast("double")

  /** Distinct (src, dst) host edges from resolved link rows, self-loops
    * dropped — the standard host-graph reduction (a page linking its
    * own host is navigation, not endorsement). */
  def hostEdges(links: DataFrame, srcCol: String, dstCol: String): DataFrame =
    links.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .distinct()

  /** Per-node degree stats: (id, out_deg, in_deg) over the node set
    * src ∪ dst (a dangling host has out_deg 0, a source-only host
    * in_deg 0). Two partial-aggregated exchanges, one join. */
  def degrees(edges: DataFrame): DataFrame = {
    val out = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("out_deg"))
    val in = edges.groupBy(col("dst").as("id")).agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("id"), "full_outer")
      .select(col("id"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  /** Per-target anchor-text profile — the classic off-page signal
    * (anchor text describes the TARGET better than the target's own
    * words; retrieval and quality systems join it per host): top-k
    * anchor terms per link target by (count desc, term binary asc).
    * One counting exchange, then the top-k FUSED into the second hash
    * aggregation ([[graft.functions.TopKAggregate.BoundedTopK]] — ≤ k
    * entries per (target × partition) cross the exchange, never a
    * target's whole vocabulary). Returns (target, term, n, rk). */
  def anchorTerms(links: DataFrame, targetCol: String, anchorCol: String,
      k: Int = 8): DataFrame =
    links
      .select(col(targetCol).as("target"),
        explode(split(lower(trim(col(anchorCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("target"), col("term")).agg(count(lit(1)).as("n"))
      .groupBy(col("target"))
      .agg(graft.functions.TopKAggregate.boundedTopK(
        col("n").cast("double"), col("term"), k).as("top"))
      .select(col("target"), posexplode(col("top")))
      .select(col("target"), col("col.term").as("term"),
        col("col.score").cast("long").as("n"),
        (col("pos") + 1).cast("int").as("rk"))

  /** Fixed-iteration PageRank (Page et al. 1999) over a simple directed
    * graph: duplicate edge rows collapse, ranks start uniform at 1/N,
    * and each round computes
    * `rank' = (1-d)/N + d * (Σ_in rank/outdeg + dangling/N)`
    * with dangling mass redistributed uniformly, so Σ rank = 1 is
    * invariant (up to the documented 1e-12 quantization). Returns
    * (id, rank) — one row per node in src ∪ dst.
    *
    * Iteration count is FIXED rather than converged-to-epsilon: the
    * oracle twin must run the identical rounds, and at curation scale
    * a bounded, predictable job count beats a data-dependent one (10
    * rounds ranks hosts to well under typical sampling granularity).
    */
  def pageRank(edges: DataFrame, iterations: Int = 10,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "iterations must be positive")
    require(damping > 0 && damping < 1, "damping must be in (0,1)")
    val spark = edges.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt

    // edge layout built once, reused by every round's src-keyed join
    val e = edges.select(col("src"), col("dst")).distinct()
      .repartition(parts, col("src"))
      .localCheckpoint(true)
    val outDeg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("out_deg"))
    val nodes = e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
      .distinct()
      .join(outDeg, Seq("id"), "left")
      .select(col("id"), coalesce(col("out_deg"), lit(0L)).as("out_deg"))
      .repartition(parts, col("id"))
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "empty graph")
    val base = (1.0 - damping) / n

    var ranks = nodes.select(col("id"), col("out_deg"),
      quant(lit(1.0 / n)).as("rank"))
      .localCheckpoint(true)
    var round = 0
    while (round < iterations) {
      val contribs = e
        .join(ranks.filter(col("out_deg") > 0)
          .select(col("id").as("src"), (col("rank") / col("out_deg")).as("c")), "src")
        .groupBy(col("dst").as("id")).agg(dsum(col("c")).as("in_sum"))
      // dangling mass: one-row aggregate, broadcast onto every node
      val dangling = ranks.filter(col("out_deg") === 0)
        .agg(coalesce(dsum(col("rank")), lit(0.0)).as("_dm"))
      ranks = ranks
        .join(contribs, Seq("id"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"), col("out_deg"),
          quant(lit(base) + lit(damping) *
            (coalesce(col("in_sum"), lit(0.0)) + col("_dm") / lit(n.toDouble)))
            .as("rank"))
      // per-round eager checkpoint: each round references the previous
      // ranks THREE times (contribs / dangling / main) — without
      // materialization the subtree re-expands per reference and the
      // lineage grows multiplicatively (the connectedComponents
      // discipline; measured: relying on ReuseExchange across unchecked
      // rounds is NOT faster, and the per-round job dispatch is the
      // irreducible small-graph floor — see the x60 note)
      ranks = ranks.localCheckpoint(true)
      round += 1
    }
    ranks.select(col("id"), col("rank"))
  }

  /** Fixed-iteration HITS (Kleinberg 1999): authority = Σ hub over
    * in-edges, hub = Σ authority over out-edges (the mutual
    * reinforcement that separates good HUBS — link directories,
    * aggregators — from good AUTHORITIES, which PageRank alone
    * conflates; a crawl curation uses the hub side to find seed lists
    * and the authority side as a quality prior). Each half-round
    * L1-normalizes (scores sum to 1 — keeps the iteration stable and
    * the scales comparable) and quantizes through the same
    * DECIMAL(30,12) consensus as [[pageRank]], so the oracle twin
    * iterates on identical values. Same shuffle shape per round:
    * keyed join + aggregation, normalizer as a broadcast one-row
    * aggregate, `localCheckpoint` once per round. Returns
    * (id, hub, auth). */
  def hits(edges: DataFrame, iterations: Int = 10): DataFrame = {
    require(iterations >= 1, "iterations must be positive")
    val spark = edges.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val e = edges.select(col("src"), col("dst")).distinct()
      .repartition(parts, col("src"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
      .distinct()
      .repartition(parts, col("id"))
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "empty graph")

    var scores = nodes.select(col("id"),
      quant(lit(1.0 / n)).as("hub"), quant(lit(1.0 / n)).as("auth"))
      .localCheckpoint(true)
    var round = 0
    while (round < iterations) {
      // authority update from current hubs, L1-normalized
      val aRaw = e.join(scores.select(col("id").as("src"), col("hub")), "src")
        .groupBy(col("dst").as("id")).agg(dsum(col("hub")).as("raw"))
      val aAll = nodes.join(aRaw, Seq("id"), "left")
        .select(col("id"), coalesce(col("raw"), lit(0.0)).as("raw"))
      val auth = aAll.crossJoin(broadcast(aAll.agg(dsum(col("raw")).as("_s"))))
        .select(col("id"), quant(col("raw") / col("_s")).as("auth"))
      // hub update from the NEW authorities (classic HITS ordering)
      val hRaw = e.join(auth.select(col("id").as("dst"), col("auth")), "dst")
        .groupBy(col("src").as("id")).agg(dsum(col("auth")).as("raw"))
      val hAll = nodes.join(hRaw, Seq("id"), "left")
        .select(col("id"), coalesce(col("raw"), lit(0.0)).as("raw"))
      val hub = hAll.crossJoin(broadcast(hAll.agg(dsum(col("raw")).as("_s"))))
        .select(col("id"), quant(col("raw") / col("_s")).as("hub"))
      scores = hub.join(auth, Seq("id"))
        .select(col("id"), col("hub"), col("auth"))
        .localCheckpoint(true)
      round += 1
    }
    scores
  }
}
