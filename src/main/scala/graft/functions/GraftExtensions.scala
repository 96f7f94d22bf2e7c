package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the custom expressions, two ways:
  *
  *  1. [[GraftExtensions]] — a `SparkSessionExtensions` injector for
  *     `spark.sql.extensions=graft.functions.GraftExtensions` (the
  *     deployment path: every session in the cluster gets the
  *     functions at build time, usable from pure SQL).
  *  2. [[register]] — imperative registration into an existing
  *     session's FunctionRegistry (the notebook/test path).
  *
  * After either, `SELECT graft_dot(a.embedding, b.embedding)` works in
  * `spark.sql(...)` alongside the typed Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions.VectorExpressions", null, name, usage, "")

  val definitions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two float arrays (double)"),
      (es: Seq[Expression]) => VectorExpressions.DotProductFloat(es(0), es(1))),
    (FunctionIdentifier("graft_intersect_count"),
      info("graft_intersect_count",
        "graft_intersect_count(a, b) - |A inter B| of two sorted distinct long arrays"),
      (es: Seq[Expression]) => VectorExpressions.SortedIntersectCount(es(0), es(1))))

  /** Register into an already-built session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        ident.funcName, builder, "built-in")
    }
}
