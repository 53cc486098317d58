package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the classic Expression↔Column conversion, which Spark 4 keeps
  * `private[sql]` (Connect-compatible Column API). Custom native
  * expressions (graft.exprs.*) need exactly these two calls; placing the
  * bridge in this package is the standard extension-library technique. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Non-blocking read of an Observation's metrics (empty until the
    * observed action completes) — `getOrEmpty` is `private[sql]`. */
  def observationValues(o: Observation): Map[String, Any] = o.getOrEmpty

  /** Register a SQL function on an EXISTING session's function registry
    * (the `spark.sql.extensions` conf only applies to newly constructed
    * sessions; sessionState is `private[sql]`). */
  def registerFunction(session: SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression): Unit =
    session.asInstanceOf[classic.SparkSession].sessionState
      .functionRegistry.registerFunction(id, info, builder)
}
