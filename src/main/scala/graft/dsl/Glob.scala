package graft.dsl

/** Graphite metric-path glob compiler (S2).
  *
  * A rearview `metrics` target names series with Graphite path globs
  * (`stats.web.*.latency`, `events.{click,view}`, `host[0-9]`) — the
  * reference delegates expansion to Graphite (README.md:6). We compile
  * the glob once, driver-side, into
  *   (a) an anchored regex for `metric rlike rx`, and
  *   (b) a literal prefix for partition pruning: at 100 TB the metric
  *       store is partitioned by metric shard, and `startsWith(prefix)`
  *       lets Catalyst prune partitions before the regex runs.
  */
final case class CompiledGlob(regex: String, literalPrefix: String) {
  def matches(s: String): Boolean = s.matches(regex)
}

object Glob {
  def compile(glob: String): CompiledGlob = {
    val rx = new StringBuilder
    var i = 0
    var inBrace = false
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => rx ++= "[^.]*" // Graphite * does not cross path segments
        case '?' => rx ++= "[^.]"
        case '{' => rx += '('; inBrace = true
        case '}' => rx += ')'; inBrace = false
        case ',' if inBrace => rx += '|'
        case '[' =>
          // character class passes through verbatim up to ']'
          val end = glob.indexOf(']', i)
          if (end < 0) { rx ++= "\\["; }
          else { rx ++= glob.substring(i, end + 1); i = end }
        case c if "\\^$.|+()".indexOf(c.toInt) >= 0 => rx += '\\' += c
        case c => rx += c
      }
      i += 1
    }
    CompiledGlob("^" + rx.result() + "$", literalPrefix(glob))
  }

  /** Longest leading run of literal characters — the partition-pruning
    * handle (`stats.web.*` → `stats.web.`). */
  private def literalPrefix(glob: String): String = {
    val cut = glob.indexWhere(c => "*?{[".indexOf(c.toInt) >= 0)
    if (cut < 0) glob else glob.substring(0, cut)
  }
}
