package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

/** Column ⇄ Expression bridge for the graft custom expressions.
  *
  * Spark 4 moved `Column` to a ColumnNode representation and made the
  * converters `private[sql]`; a library adding native Catalyst
  * expressions needs exactly these two hops, so this one-file bridge
  * lives in the `org.apache.spark.sql` namespace (the standard
  * extension technique — no Spark internals are modified or copied).
  */
object ColumnBridge {
  def expr(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
  def column(e: Expression): Column = new Column(ExpressionColumnNode(e))
}
