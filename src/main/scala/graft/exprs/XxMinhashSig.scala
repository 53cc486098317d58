package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** One-pass xxhash64 MinHash signature (the fast internal-LSH flavor):
  * distinct character k-grams → per-seed xx64 minima, one tight loop per
  * row. Replaces the explode + groupBy-min table build — the exploded
  * shingle relation (|text|·rows) never exists, so the signature stage
  * becomes a pure projection with no shuffle. Seeds are the xx64 seed
  * parameter (0..n-1): independent hash functions at any width. */
case class XxMinhashSigExpr(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    val mins = Array.fill[Long](numHashes)(Long.MaxValue)
    var any = false
    val last = math.max(n - k, 0)
    val seen = new java.util.HashSet[String](math.max(16, (last + 1) * 2))
    var i = 0
    while (i <= last) {
      val gram = if (n <= k) s else s.substring(i, i + k)
      if (seen.add(gram)) {
        any = true
        val bytes = gram.getBytes("UTF-8")
        var seed = 0
        while (seed < numHashes) {
          val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET,
            bytes.length, seed.toLong)
          if (h < mins(seed)) mins(seed) = h
          seed += 1
        }
      }
      if (n <= k) i = last + 1 else i += 1
    }
    if (!any) null
    else new GenericArrayData(mins.map(java.lang.Long.valueOf(_): AnyRef))
  }

  override protected def withNewChildInternal(newChild: Expression): XxMinhashSigExpr =
    copy(child = newChild)
}

object XxMinhashSigExpr {
  def column(c: Column, k: Int, numHashes: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      XxMinhashSigExpr(org.apache.spark.sql.GraftBridge.expression(c), k, numHashes))
}
