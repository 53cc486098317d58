package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** `argmax_long(value, ordering)`: the LONG `value` whose DOUBLE
  * `ordering` is maximal in the group; exact ordering ties break to the
  * SMALLEST value (deterministic across partitionings). Rows with a null
  * ordering are skipped; an all-null group evaluates to null.
  *
  * Why not `max_by(value, struct(ordering, -value))`: max_by's agg
  * buffer holds the ordering expression's type, and a STRUCT buffer
  * attribute is not UnsafeRow-mutable — HashAggregateExec refuses it and
  * the plan silently degrades to SortAggregate, which SORTS the entire
  * pre-aggregation relation. For the k-means fine-assignment this is the
  * n·k2 joined (point × candidate-centroid) relation: the 64× scale
  * probe measured 607 MB of sort spill and a 1.55×-of-linear byte step
  * from exactly that fallback. This aggregate's buffer is two mutable
  * primitives (long, double), so partial aggregation stays inside
  * whole-stage-codegen HashAggregate and the exchange carries one row
  * per group. */
case class ArgMaxByLong(value: Expression, ordering: Expression)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(value, ordering)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "argmax_long"

  override def checkInputDataTypes(): TypeCheckResult =
    if (value.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"argmax_long value must be BIGINT, got ${value.dataType.sql}")
    else if (ordering.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"argmax_long ordering must be DOUBLE, got ${ordering.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val bestVal = AttributeReference("bestVal", LongType)()
  private lazy val bestOrd = AttributeReference("bestOrd", DoubleType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bestVal, bestOrd)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(null, LongType), Literal(null, DoubleType))

  /** (candOrd, candVal) beats the current buffer: buffer empty, strictly
    * greater ordering, or equal ordering with a smaller value. */
  private def beats(candOrd: Expression, candVal: Expression,
      curOrd: Expression, curVal: Expression): Expression =
    Or(IsNull(curOrd),
      Or(GreaterThan(candOrd, curOrd),
        And(EqualTo(candOrd, curOrd), LessThan(candVal, curVal))))

  override lazy val updateExpressions: Seq[Expression] = {
    val take = And(IsNotNull(ordering),
      beats(ordering, value, bestOrd, bestVal))
    Seq(If(take, value, bestVal), If(take, ordering, bestOrd))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val take = And(IsNotNull(bestOrd.right),
      beats(bestOrd.right, bestVal.right, bestOrd.left, bestVal.left))
    Seq(
      If(take, bestVal.right, bestVal.left),
      If(take, bestOrd.right, bestOrd.left))
  }

  override lazy val evaluateExpression: Expression = bestVal

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArgMaxByLong =
    copy(value = newChildren(0), ordering = newChildren(1))
}

object ArgMaxByLong {
  def column(value: Column, ordering: Column): Column =
    GraftBridge.column(
      ArgMaxByLong(GraftBridge.expression(value),
        GraftBridge.expression(ordering)).toAggregateExpression())
}
