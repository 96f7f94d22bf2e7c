package graft.tools

/** Prints the registry arithmetic the docs state — `queries=<total>
  * oracle=<oracle-bearing> rows_only=<rest>` — straight from
  * [[graft.queries.Queries.all]], so README/SURVEY counts are
  * GENERATED, not hand-edited (they drifted twice: r7 #5, r9 #3).
  * `tools/update_counts.sh` runs this plus `sbt test` and rewrites the
  * stated counts in place; DocCountsSpec fails the build when the
  * stated query counts and the registry disagree. */
object Counts {
  def main(args: Array[String]): Unit = {
    val all = graft.queries.Queries.all
    val oracle = all.count(_.oracle.isDefined)
    println(s"queries=${all.size} oracle=$oracle rows_only=${all.size - oracle}")
  }
}
