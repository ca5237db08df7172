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

  /** Wrap a (resolved) logical plan as a DataFrame — the entry point a
    * custom whole-operator node (e.g. [[graft.plans.AsOfJoinNode]])
    * needs to join the Dataset world; `Dataset.ofRows` is private[sql]
    * in Spark 4.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Stable per-session identity for session-scoped registries
    * (`sessionUUID` lives on the classic session, not the sql-api
    * facade, in Spark 4).
    */
  def sessionId(spark: org.apache.spark.sql.SparkSession): String =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionUUID
}
