package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) over INT8-quantized embeddings
  * (the [[graft.llmops.Similarity.quantizeInt8]] output).
  *
  * Working on int8 codes instead of raw floats keeps every distance an
  * exact integer (sums of squared int differences), so PQ assignment,
  * LUT entries, and ADC scores are bit-identical across engines — the
  * DuckDB oracle replays them with BIGINT arithmetic and the gate can
  * never trip on float summation order. It also mirrors the production
  * layering: scalar-quantize first (4× cut), product-quantize the codes
  * (a further `dim/m ×` cut — 8 bytes/vector here vs 64 int8 codes).
  *
  * The codebook is tiny (m·ksub sub-vectors) and rides into the task as
  * a literal in the expression tree — broadcast-free, like the LSH
  * hyperplanes. Both expressions are one pass, zero allocation per row
  * beyond the output array.
  */
abstract class PqExprBase extends UnaryExpression with CodegenFallback {
  /** [subspace][centroid][component] int sub-vectors. */
  def codebook: Seq[Seq[Seq[Int]]]

  @transient protected lazy val m: Int = codebook.length
  @transient protected lazy val ksub: Int = codebook.head.length
  @transient protected lazy val dsub: Int = codebook.head.head.length
  /** Flattened codebook: cb(sub*ksub + j)(d). */
  @transient protected lazy val cb: Array[Array[Int]] =
    codebook.flatMap(_.map(_.toArray)).toArray

  override def nullable: Boolean = true

  /** Exact integer L2² between input sub-vector `sub` of `a` and codebook
    * entry (sub, j). */
  protected def l2sq(a: ArrayData, sub: Int, j: Int): Long = {
    val c = cb(sub * ksub + j)
    var acc = 0L
    var d = 0
    val off = sub * dsub
    while (d < dsub) {
      val diff = (a.getInt(off + d) - c(d)).toLong
      acc += diff * diff
      d += 1
    }
    acc
  }
}

/** PQ encode: int-code vector (length m·dsub) → array<int> of m centroid
  * ids, each the argmin-L2² codebook entry for its subspace (ties → the
  * lowest centroid id, matching the oracle's `ORDER BY dist, j`). */
case class PqEncodeExpr(child: Expression, codebook: Seq[Seq[Seq[Int]]])
    extends PqExprBase {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() < m * dsub) return null
    val out = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      var best = 0
      var bestD = l2sq(a, sub, 0)
      var j = 1
      while (j < ksub) {
        val d = l2sq(a, sub, j)
        if (d < bestD) { best = j; bestD = d }
        j += 1
      }
      out(sub) = best
      sub += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
    copy(child = c)
}

/** PQ ADC lookup table for one query: int-code vector → array<long> of
  * m·ksub entries, `lut(sub*ksub + j)` = exact integer L2² between the
  * query's sub-vector and codebook entry (sub, j). The asymmetric
  * distance to any corpus vector is then m array lookups over its PQ
  * codes — the scan never touches the original vectors. */
case class PqLutExpr(child: Expression, codebook: Seq[Seq[Seq[Int]]])
    extends PqExprBase {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() < m * dsub) return null
    val out = new Array[Long](m * ksub)
    var sub = 0
    while (sub < m) {
      var j = 0
      while (j < ksub) { out(sub * ksub + j) = l2sq(a, sub, j); j += 1 }
      sub += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): PqLutExpr =
    copy(child = c)
}

object PqExprs {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def encode(codes: Column, codebook: Seq[Seq[Seq[Int]]]): Column =
    column(PqEncodeExpr(expression(codes), codebook))

  def lut(codes: Column, codebook: Seq[Seq[Seq[Int]]]): Column =
    column(PqLutExpr(expression(codes), codebook))
}
