package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Intersection size of two strictly-ascending long arrays via a single
  * merge pass — O(|a|+|b|) integer compares, no per-row hash-set build.
  * This is the verify kernel of the exact similarity join
  * ([[graft.llmops.Dedup.jaccardJoinExact]]): after tokens are
  * dictionary-encoded to df-ordered ints (the standard first step of the
  * prefix-filter join literature), `array_intersect` on string arrays —
  * a hash set of UTF8Strings per row — becomes this merge over packed
  * longs, which benchmarked ~4× faster on the 10⁶-pair verify stage. */
case class SortedIntersectExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val nx = xs.numElements(); val ny = ys.numElements()
    var i = 0; var j = 0; var n = 0L
    while (i < nx && j < ny) {
      val x = xs.getLong(i); val y = ys.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectExpr =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectExpr {
  def column(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(SortedIntersectExpr(
      org.apache.spark.sql.GraftBridge.expression(a),
      org.apache.spark.sql.GraftBridge.expression(b)))
}
