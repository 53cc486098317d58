package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector kernels for the similarity ops. The higher-order-function
  * formulation (`aggregate(zip_with(...))`) allocates an array object and
  * runs a lambda per element PER PAIR — the dominant cost of the candidate
  * re-rank stages. These expressions run the same arithmetic in a tight
  * primitive loop with ZERO allocation.
  *
  * Bit-exactness contract (the DuckDB oracles depend on it): accumulation
  * is sequential ascending, elements are widened to double before
  * multiplying, and cosine is `ab / (sqrt(aa) * sqrt(bb))` — exactly the
  * operation order of the Column formulation they replace. */
abstract class VectorBinaryExpr extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case o => throw new IllegalArgumentException(
      s"vector expression needs array<float|double>, got $o")
  }
  @transient protected lazy val leftFloat: Boolean = elemIsFloat(left)
  @transient protected lazy val rightFloat: Boolean = elemIsFloat(right)

  protected def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
}

/** Sequential-order dot product of two numeric arrays. */
case class DotExpr(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc = acc + elem(a, i, leftFloat) * elem(b, i, rightFloat); i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotExpr =
    copy(left = l, right = r)
}

/** Cosine similarity `dot / (sqrt(dot_aa) * sqrt(dot_bb))`, one fused pass. */
case class CosineSimExpr(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val x = elem(a, i, leftFloat)
      val y = elem(b, i, rightFloat)
      ab = ab + x * y
      aa = aa + x * x
      bb = bb + y * y
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
    copy(left = l, right = r)
}

object VectorExprs {
  import org.apache.spark.sql.GraftBridge.{column, expression}
  def dot(a: Column, b: Column): Column =
    column(DotExpr(expression(a), expression(b)))
  def cosine(a: Column, b: Column): Column =
    column(CosineSimExpr(expression(a), expression(b)))
}
