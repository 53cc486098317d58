package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the classic Expression↔Column conversion, which Spark 4 keeps
  * `private[sql]` (Connect-compatible Column API). Custom native
  * expressions (graft.exprs.*) need exactly these two calls; placing the
  * bridge in this package is the standard extension-library technique. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Run the session analyzer over standalone expressions (resolves
    * UnresolvedFunction nodes so the result supports interpreted
    * `eval`) — used to compile a jq `walk(f)` body into a per-node
    * evaluable expression over a BoundReference. `sessionState` is
    * `private[sql]`, hence the bridge. */
  def analyzeExpressions(session: SparkSession,
      cols: Seq[Column]): Seq[Expression] = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.{OneRowRelation, Project}
    val ss = session.asInstanceOf[classic.SparkSession]
    // eagerly convert the ColumnNode trees (ExpressionUtils.expression
    // returns a LAZY wrapper only Dataset analysis unwraps), then run
    // the analyzer to resolve the remaining UnresolvedFunction nodes
    val converted = cols.map(c =>
      classic.ColumnNodeToExpressionConverter.apply(c.node))
    val plan = Project(converted.zipWithIndex.map { case (e, i) =>
      Alias(e, s"_c$i")() }, OneRowRelation())
    val analyzed = ss.sessionState.executePlan(plan).analyzed
    // RuntimeReplaceable nodes (try_variant_get, schema_of_variant, …)
    // only evaluate after the optimizer substitutes their replacement —
    // apply exactly that rule, not the full optimizer (which could
    // collapse the one-row scaffold around the BoundReference)
    val replaced =
      org.apache.spark.sql.catalyst.optimizer.ReplaceExpressions(analyzed)
    replaced.asInstanceOf[Project].projectList
      .map(_.asInstanceOf[Alias].child)
  }

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
