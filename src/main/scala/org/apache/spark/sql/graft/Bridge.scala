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

  /** Run `body` with a CLONED session SQLConf carrying `overrides` as
    * the thread's active conf — a per-call-scoped conf flip that never
    * mutates the session (concurrent queries keep their settings).
    * `SQLConf.withExistingConf` is `private[sql]`; this is the
    * sanctioned subpackage reach-through, same as the shims above.
    */
  def withConfOverride[T](spark: org.apache.spark.sql.SparkSession,
                          overrides: Map[String, String])(body: => T): T = {
    val cloned = spark.sessionState.conf.clone()
    overrides.foreach { case (k, v) => cloned.setConfString(k, v) }
    org.apache.spark.sql.internal.SQLConf.withExistingConf(cloned)(body)
  }

  /** The table a row-level-DML target scan wraps, if any.
    * `RowLevelOperationTable` (the relation Spark's MERGE/UPDATE/DELETE
    * rewrites plant as the target-read inside their WriteDelta query)
    * is `private[sql]` in Spark 4 — an analyzer rule that substitutes
    * computed reads for those relations (graft.sources.MorReadRule)
    * needs to see through the wrapper.
    */
  def rowLevelOperationTarget(t: org.apache.spark.sql.connector.catalog.Table)
      : Option[org.apache.spark.sql.connector.catalog.Table] = t match {
    case rl: org.apache.spark.sql.connector.write.RowLevelOperationTable =>
      Some(rl.table)
    case _ => None
  }
}
