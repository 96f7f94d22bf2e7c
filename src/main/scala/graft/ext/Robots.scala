package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt parsing + URL matching (REP, RFC 9309 with the Google
  * wildcard extensions) — crawl-compliance refiltering: a curation
  * pass over an already-landed crawl re-checks each URL against its
  * domain's robots rules (policies change between crawl and training;
  * RefinedWeb/C4-class pipelines re-gate).
  *
  * Two kernels, shaped for the domain↔URL cardinality split:
  *
  *  - [[rulesFor]] parses a robots.txt ONCE PER DOMAIN into the rule
  *    array applicable to one user-agent (the matching group per RFC
  *    9309 §2.2.1: the longest case-insensitive product-token match,
  *    `*` group as fallback; multiple matching groups merge);
  *  - [[allowed]] decides one PATH against that rule array (evaluated
  *    per URL after a domain join — rules ride the row as a small
  *    array, robots files are KB-sized): longest-pattern-match wins,
  *    allow wins ties, no match ⇒ allowed (RFC 9309 §2.2.2).
  *
  * Pattern semantics: literal prefix match with `*` (any chars) and a
  * terminal `$` end anchor — the Google/RFC 9309 extension set. The
  * 100-TB shape: rules per registered domain are index metadata
  * (thousands of rows); URLs join them by [[UrlOps.urlDomain]] and the
  * decision is one fold per row, no shuffle beyond the domain join. */
object Robots {

  val RuleSchema: StructType = StructType(Seq(
    StructField("allow", BooleanType, nullable = false),
    StructField("pattern", StringType, nullable = false)))

  // -- parsing ------------------------------------------------------------

  private final case class Group(agents: List[String],
      rules: List[(Boolean, String)], delay: Option[Double])

  /** The groups of `txt` that apply to `agent` — group selection per
    * RFC 9309 §2.2.1: longest case-insensitive product-token prefix
    * match beats `*`; ALL groups at the winning specificity merge. */
  private def selectGroups(txt: String, agent: String): Seq[Group] = {
    // one pass: group lines into (agents, rules) blocks; a User-agent
    // line after rules starts a NEW group (RFC 9309 line grouping)
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var agents = List.empty[String]
    var rules = List.empty[(Boolean, String)]
    var delay = Option.empty[Double]
    var inRules = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents.reverse, rules.reverse, delay)
      agents = Nil; rules = Nil; delay = None; inRules = false
    }
    txt.split("\r?\n").foreach { raw =>
      val line = raw.indexOf('#') match {
        case -1 => raw.trim
        case h => raw.substring(0, h).trim
      }
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) flush()
            agents = value :: agents
          case "allow" if agents.nonEmpty =>
            inRules = true
            if (value.nonEmpty) rules = (true, value) :: rules
          case "disallow" if agents.nonEmpty =>
            inRules = true
            // empty Disallow means "allow all" — contributes no rule
            if (value.nonEmpty) rules = (false, value) :: rules
          case "crawl-delay" if agents.nonEmpty =>
            inRules = true
            // non-standard but ubiquitous; seconds, fractional allowed.
            // A later line overrides; unparsable/negative is ignored
            scala.util.Try(value.toDouble).toOption
              .filter(d => d >= 0 && !d.isNaN && !d.isInfinite)
              .foreach(d => delay = Some(d))
          case _ => () // Sitemap: & unknown directives are NOT group
          // members (RFC 9309 §2.2.4 "other records") — they must not
          // split `User-agent: a` ⟨Sitemap⟩ `User-agent: b` into two
          // groups, which would silently drop b's rules for agent a
        }
      }
    }
    flush()
    val a = agent.toLowerCase
    def spec(g: Group): Int = g.agents.map { ga =>
      val gl = ga.toLowerCase
      if (gl == "*") 0
      else if (a == gl || a.startsWith(gl)) gl.length
      else -1
    }.max
    val best = groups.map(spec).foldLeft(-1)(math.max)
    if (best < 0) Seq.empty
    else groups.filter(g => spec(g) == best).toSeq
  }

  /** The (allow, pattern) rules of `txt` that apply to `agent`. */
  def parseRules(txt: String, agent: String): Array[(Boolean, String)] =
    selectGroups(txt, agent).flatMap(_.rules).toArray

  /** The `Crawl-delay` (seconds) applying to `agent`, if any — GROUP
    * scoped like allow/disallow (unlike `Sitemap:`), non-standard but
    * honored by most crawlers as the per-host politeness floor. When
    * several groups merge at the winning specificity, the MAXIMUM of
    * their delays wins — the conservative (politest) read. */
  def parseCrawlDelay(txt: String, agent: String): Option[Double] = {
    val ds = selectGroups(txt, agent).flatMap(_.delay)
    if (ds.isEmpty) None else Some(ds.max)
  }

  /** The `Sitemap:` directive values of `txt`, in file order. Per RFC
    * 9309 §2.2.4 sitemaps are NON-group records (they apply regardless
    * of user-agent and regardless of position relative to any group —
    * [[parseRules]] already lexes past them without splitting groups),
    * so extraction is agent-free. Values are absolute URLs by the
    * sitemaps.org cross-submission rule; returned verbatim (trimmed,
    * comments stripped) — resolution/normalization is the frontier's
    * job ([[Frontier.seedsFromRobots]]). */
  def parseSitemaps(txt: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    txt.split("\r?\n").foreach { raw =>
      val line = raw.indexOf('#') match {
        case -1 => raw.trim
        case h => raw.substring(0, h).trim
      }
      val colon = line.indexOf(':')
      if (colon > 0 && line.substring(0, colon).trim.toLowerCase == "sitemap") {
        val v = line.substring(colon + 1).trim
        if (v.nonEmpty) out += v
      }
    }
    out.toArray
  }

  /** Google/RFC-9309 pattern match: literal chars, `*` = any run,
    * terminal `$` = end anchor; patterns match from the path START. */
  def matches(path: String, pattern: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val segs = p.split("\\*", -1)
    if (!path.startsWith(segs(0))) return false
    var pos = segs(0).length
    if (!anchored || segs.length == 1) {
      // greedy earliest-match of the remaining segments in order
      var i = 1
      while (i < segs.length) {
        val at = path.indexOf(segs(i), pos)
        if (at < 0) return false
        pos = at + segs(i).length
        i += 1
      }
      // '$' with no '*': the literal must BE the whole path
      !anchored || pos == path.length
    } else {
      // anchored with wildcards: the LAST segment must sit at the path
      // END (earliest-match would reject '*.php$' on '/a.php.php'),
      // middle segments match greedily before it
      var i = 1
      while (i < segs.length - 1) {
        val at = path.indexOf(segs(i), pos)
        if (at < 0) return false
        pos = at + segs(i).length
        i += 1
      }
      val last = segs(segs.length - 1)
      path.length - last.length >= pos && path.endsWith(last)
    }
  }

  /** Decision per RFC 9309 §2.2.2: among matching rules the LONGEST
    * pattern wins; at equal length, allow wins; no match ⇒ allowed. */
  def decide(path: String, rules: Iterator[(Boolean, String)]): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rules.foreach { case (allow, pattern) =>
      if (matches(path, pattern)) {
        val l = pattern.length
        if (l > bestLen || (l == bestLen && allow && !bestAllow)) {
          bestLen = l; bestAllow = allow
        }
      }
    }
    bestAllow
  }

  // -- expressions --------------------------------------------------------

  final case class RobotsRulesExpr(txt: Expression, agentExpr: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def left: Expression = txt
    override def right: Expression = agentExpr
    override def inputTypes = Seq(StringType, StringType)
    override def dataType: DataType = ArrayType(RuleSchema, containsNull = false)
    // deterministic pure function: literal robots+agent (the x53/x54
    // shape) constant-folds to a rule-array literal at PLAN time
    // instead of re-parsing the file per row
    override def foldable: Boolean = txt.foldable && agentExpr.foldable
    override def prettyName: String = "graft_robots_rules"

    def parseRow(t: UTF8String, a: UTF8String): ArrayData =
      new GenericArrayData(Robots.parseRules(t.toString, a.toString).map {
        case (allow, p) =>
          new GenericInternalRow(Array[Any](allow, UTF8String.fromString(p))): Any
      })

    override def nullSafeEval(t: Any, a: Any): Any =
      parseRow(t.asInstanceOf[UTF8String], a.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (t, a) => {
        val ref = ctx.addReferenceObj("robots", this, classOf[RobotsRulesExpr].getName)
        s"${ev.value} = $ref.parseRow($t, $a);"
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(txt = newLeft, agentExpr = newRight)
  }

  final case class RobotsCrawlDelayExpr(txt: Expression, agentExpr: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def left: Expression = txt
    override def right: Expression = agentExpr
    override def inputTypes = Seq(StringType, StringType)
    override def dataType: DataType =
      org.apache.spark.sql.types.DoubleType
    override def foldable: Boolean = txt.foldable && agentExpr.foldable
    override def prettyName: String = "graft_robots_crawl_delay"

    // -1.0 = no applicable delay; the Column wrapper maps it to null
    // (a primitive sentinel keeps the kernel codegen-simple)
    def delayRow(t: UTF8String, a: UTF8String): Double =
      Robots.parseCrawlDelay(t.toString, a.toString).getOrElse(-1.0)

    override def nullSafeEval(t: Any, a: Any): Any =
      delayRow(t.asInstanceOf[UTF8String], a.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (t, a) => {
        val ref = ctx.addReferenceObj("robots", this, classOf[RobotsCrawlDelayExpr].getName)
        s"${ev.value} = $ref.delayRow($t, $a);"
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(txt = newLeft, agentExpr = newRight)
  }

  final case class RobotsSitemapsExpr(txt: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with ExpectsInputTypes {
    override def child: Expression = txt
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def foldable: Boolean = txt.foldable
    override def prettyName: String = "graft_robots_sitemaps"

    def parseRow(t: UTF8String): ArrayData =
      new GenericArrayData(
        Robots.parseSitemaps(t.toString).map(UTF8String.fromString(_): Any))

    override def nullSafeEval(t: Any): Any =
      parseRow(t.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t => {
        val ref = ctx.addReferenceObj("robots", this, classOf[RobotsSitemapsExpr].getName)
        s"${ev.value} = $ref.parseRow($t);"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(txt = newChild)
  }

  final case class RobotsAllowedExpr(path: Expression, rules: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def left: Expression = path
    override def right: Expression = rules
    override def inputTypes = Seq(StringType, ArrayType(RuleSchema))
    override def dataType: DataType = BooleanType
    override def foldable: Boolean = path.foldable && rules.foldable
    override def prettyName: String = "graft_robots_allowed"

    def decideRow(p: UTF8String, rs: ArrayData): Boolean = {
      val n = rs.numElements()
      // RFC 9309: an empty path is matched as "/" — without this,
      // "https://blocked.example" (no trailing slash) slips a
      // full-site "Disallow: /"
      val target = { val s = p.toString; if (s.isEmpty) "/" else s }
      Robots.decide(target, (0 until n).iterator.map { i =>
        val r = rs.getStruct(i, 2)
        (r.getBoolean(0), r.getUTF8String(1).toString)
      })
    }

    override def nullSafeEval(p: Any, rs: Any): Any =
      decideRow(p.asInstanceOf[UTF8String], rs.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (p, rs) => {
        val ref = ctx.addReferenceObj("robots", this, classOf[RobotsAllowedExpr].getName)
        s"${ev.value} = $ref.decideRow($p, $rs);"
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(path = newLeft, rules = newRight)
  }

  // -- Column API ---------------------------------------------------------

  /** array<struct<allow, pattern>> applicable to `agent` — run once per
    * DOMAIN row, never per URL (literal inputs constant-fold at plan
    * time; see the expression's `foldable`). */
  def rulesFor(robotsTxt: Column, agent: Column): Column =
    ColumnBridge.column(RobotsRulesExpr(
      ColumnBridge.expr(robotsTxt), ColumnBridge.expr(agent)))

  /** TRUE when the match target is fetchable under `rules`. Pass
    * [[matchTarget]] (path + query) when rules may target query
    * strings — Google semantics match `path?query`, and a bare-path
    * caller can never fire a wildcard `?sessionid=` disallow rule. An
    * empty target matches as "/". */
  def allowed(target: Column, rules: Column): Column =
    ColumnBridge.column(RobotsAllowedExpr(
      ColumnBridge.expr(target), ColumnBridge.expr(rules)))

  /** `Crawl-delay` seconds applying to `agent` (null when the file
    * sets none for the matching group) — the per-host politeness floor
    * a fetch scheduler multiplies into its rate plan. Run once per
    * DOMAIN row, like [[rulesFor]]. */
  def crawlDelay(robotsTxt: Column, agent: Column): Column = {
    val raw = ColumnBridge.column(RobotsCrawlDelayExpr(
      ColumnBridge.expr(robotsTxt), ColumnBridge.expr(agent)))
    when(raw >= 0, raw)
  }

  /** array<string> of the robots file's `Sitemap:` URLs (agent-free —
    * non-group records per RFC 9309 §2.2.4). One kernel call per
    * DOMAIN row; feed [[Frontier.seedsFromRobots]]. */
  def sitemaps(robotsTxt: Column): Column =
    ColumnBridge.column(RobotsSitemapsExpr(ColumnBridge.expr(robotsTxt)))

  /** The RFC-9309 match target of a parsed URL: `path?query` when a
    * query exists, else the path; empty path becomes "/". Feed
    * [[graft.ext.UrlOps.urlParts]]'s `path`/`query` fields in. */
  def matchTarget(path: Column, query: Column): Column = {
    val p = when(path.isNull || path === "", "/").otherwise(path)
    when(query.isNull, p).otherwise(concat(p, lit("?"), query))
  }

  // -- persisted robots store ----------------------------------------------

  private def hostOf(u: Column): Column =
    graft.functions.UrlExpressions.urlParts(u).getField("host")

  private def storeRows(robots: org.apache.spark.sql.DataFrame,
      urlCol: String, txtCol: String, fetchedAtCol: String) =
    robots.select(hostOf(col(urlCol)).as("host"),
        col(txtCol).cast("string").as("txt"),
        col(fetchedAtCol).cast("timestamp").as("fetched_at"))
      .filter(col("host").isNotNull)

  /** Create (or recreate) the cumulative ROBOTS store: a catalog table
    * of (host, txt, fetched_at) rows bucketed+sorted on host — the
    * per-host governance dimension a long-running crawl accumulates so
    * that robots fetched in batch 1 govern pages scheduled in batch
    * 50 ([[graft.streaming.DocumentIngest.frontierMaintenance]]'s
    * `robotsTable`). Unlike the seen/edge stores this one is
    * VERSIONED, not append-only-set-like: robots files CHANGE, so
    * appends just add rows and every reader takes the LATEST per host
    * ([[latestRobots]] — max (fetched_at, txt), deterministic under
    * exact-duplicate replays); [[compactRobotsStore]] folds history
    * back to one row per host. */
  def writeRobotsStore(robots: org.apache.spark.sql.DataFrame,
      urlCol: String, txtCol: String, fetchedAtCol: String,
      table: String, buckets: Int = 32): Unit = {
    graft.store.Bucketing.dropWithLocation(robots.sparkSession, table)
    storeRows(robots, urlCol, txtCol, fetchedAtCol)
      .repartition(buckets, col("host"))
      .write.mode("overwrite")
      .bucketBy(buckets, "host").sortBy("host")
      .format("parquet").saveAsTable(table)
  }

  /** Fold a batch of fetched robots files in (append rows; latest per
    * host wins at read). Replay-safe: re-appending identical rows
    * cannot change [[latestRobots]]' max. Creates the store when
    * absent; recovery-aware like every store bootstrap. */
  def appendRobotsStore(robots: org.apache.spark.sql.DataFrame,
      urlCol: String, txtCol: String, fetchedAtCol: String,
      table: String, buckets: Int = 32): Unit = {
    val spark = robots.sparkSession
    if (!graft.store.Bucketing.recoverCompacted(spark, table))
      writeRobotsStore(robots, urlCol, txtCol, fetchedAtCol, table, buckets)
    else
      storeRows(robots, urlCol, txtCol, fetchedAtCol)
        .repartition(buckets, col("host"))
        .write.mode("append")
        .bucketBy(buckets, "host").sortBy("host")
        .format("parquet").saveAsTable(table)
  }

  /** The store's CURRENT view: one (host, txt, fetched_at) row per
    * host — the newest fetch, ties broken on txt (deterministic when a
    * replay appended exact duplicates). The aggregation runs on the
    * store's own bucket layout, so no exchange precedes it. */
  def latestRobots(spark: org.apache.spark.sql.SparkSession,
      table: String): org.apache.spark.sql.DataFrame =
    spark.table(table)
      .groupBy(col("host"))
      .agg(max(struct(col("fetched_at"), col("txt"))).as("_m"))
      .select(col("host"), col("_m.txt").as("txt"),
        col("_m.fetched_at").as("fetched_at"))

  /** Fold version history to one row per host (the crash-safe
    * [[graft.store.Bucketing.compactSwap]] protocol). */
  def compactRobotsStore(spark: org.apache.spark.sql.SparkSession,
      table: String, buckets: Int = 32): Unit =
    graft.store.Bucketing.compactSwap(spark, table) { tmp =>
      latestRobots(spark, table)
        .repartition(buckets, col("host"))
        .write.mode("overwrite")
        .bucketBy(buckets, "host").sortBy("host")
        .format("parquet").saveAsTable(tmp)
    }
}
