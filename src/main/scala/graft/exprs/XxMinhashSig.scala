package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** One-pass xxhash64 MinHash signature (the fast internal-LSH flavor):
  * distinct character k-grams → per-seed minima, one tight loop per row.
  * Replaces the explode + groupBy-min table build — the exploded shingle
  * relation (|text|·rows) never exists, so the signature stage becomes a
  * pure projection with no shuffle.
  *
  * Each gram is xxhash64'd ONCE; the per-seed hash is a splitmix64-style
  * finalizer over (h ⊕ seed·φ64) — the standard one-hash + universal-
  * rehash MinHash construction (the finalizer is a full-avalanche 64-bit
  * mixer, so the seeds behave as independent hash functions for minima
  * purposes). At the r8 default of 128 hashes this replaces 128 full
  * xxhash evaluations per gram with one hash plus 128 six-op mixes —
  * the signature kernel is the per-DOCUMENT cost every dedup query pays
  * before any join, so its constant matters at any corpus size. */
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
        val h0 = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET,
          bytes.length, 0L)
        var seed = 0
        while (seed < numHashes) {
          // splitmix64 finalizer over (h0 ⊕ seed·φ64)
          var x = h0 ^ (seed.toLong * 0x9E3779B97F4A7C15L)
          x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
          x ^= (x >>> 27); x *= 0x94D049BB133111EBL
          x ^= (x >>> 31)
          if (x < mins(seed)) mins(seed) = x
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
