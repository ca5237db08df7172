package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge.
  *
  * Spark 4 made `new Column(expr)` / `col.expr` internal
  * (`private[sql]` ExpressionUtils); extension libraries reach them by
  * living in an org.apache.spark.sql subpackage — the sanctioned
  * pattern for Catalyst-extending libraries until SPARK-49700-style
  * public APIs land.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
