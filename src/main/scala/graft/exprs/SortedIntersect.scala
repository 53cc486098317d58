package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Intersection size of two strictly-ascending integer arrays via a
  * single merge pass — O(|a|+|b|) integer compares, no per-row hash-set
  * build. This is the verify kernel of the exact similarity join
  * ([[graft.llmops.Dedup.jaccardJoinExact]]): after tokens are
  * dictionary-encoded to df-ordered ints (the standard first step of the
  * prefix-filter join literature), `array_intersect` on string arrays —
  * a hash set of UTF8Strings per row — becomes this merge over packed
  * ints, which benchmarked ~4× faster on the 10⁶-pair verify stage.
  *
  * Accepts array<long> or array<int> children (both sides the same
  * width): when the dictionary fits in an int — any local corpus, and
  * any real one until the bigram vocabulary passes 2³¹ — the narrow
  * arrays HALVE the verify join's shuffle payload, which is the
  * dominant cost of the exact join on near-duplicate-dense corpora. */
case class SortedIntersectExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  // Element width drives getInt-vs-getLong below; a mixed int/long pair
  // would silently read wrong bytes off the long ArrayData, so mismatch
  // must be an ANALYSIS error, not a wrong count.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) |
           (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (lt, rt) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect requires both children to be array<int> or both " +
            s"array<bigint>, got ${lt.catalogString} and ${rt.catalogString}")
    }

  private lazy val intElems: Boolean = left.dataType match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val nx = xs.numElements(); val ny = ys.numElements()
    var i = 0; var j = 0; var n = 0L
    if (intElems) {
      while (i < nx && j < ny) {
        val x = xs.getInt(i); val y = ys.getInt(j)
        if (x == y) { n += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    } else {
      while (i < nx && j < ny) {
        val x = xs.getLong(i); val y = ys.getLong(j)
        if (x == y) { n += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
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
