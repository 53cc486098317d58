package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, "Winnowing:
  * Local Algorithms for Document Fingerprinting", SIGMOD 2003): hash every
  * k-gram, slide a window of `w` consecutive hashes, select the minimum of
  * each window (rightmost occurrence on ties), return the distinct
  * selected hashes sorted. Guarantees any shared substring of length
  * ≥ w+k-1 contributes a shared fingerprint — the standard local
  * plagiarism/near-dup sketch.
  *
  * Gram hash = first 16 hex chars of md5 (engine-portable: lexicographic
  * min over hex strings ≡ min over the 64-bit hash, so the DuckDB oracle
  * reproduces selections exactly). One pass, one reused digest. */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType)
  override def nullable: Boolean = true

  @transient private lazy val digest =
    java.security.MessageDigest.getInstance("MD5")
  private val hexChars = "0123456789abcdef".toCharArray

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val len = s.length
    val n = math.max(len - k + 1, 1)
    val hashes = new Array[String](n)
    val hex = new Array[Char](16)
    var i = 0
    while (i < n) {
      val gram = if (len <= k) s else s.substring(i, i + k)
      digest.reset()
      val d = digest.digest(gram.getBytes("UTF-8"))
      var b = 0
      while (b < 8) {
        hex(b * 2) = hexChars((d(b) >> 4) & 0xf)
        hex(b * 2 + 1) = hexChars(d(b) & 0xf)
        b += 1
      }
      hashes(i) = new String(hex)
      i += 1
    }
    // winnow: rightmost minimum of each length-w window of hashes
    val selected = new java.util.TreeSet[String]()
    val lastStart = math.max(n - w, 0)
    var ws = 0
    while (ws <= lastStart) {
      val end = math.min(ws + w, n)
      var minPos = ws
      var j = ws + 1
      while (j < end) {
        if (hashes(j) <= hashes(minPos)) minPos = j // rightmost tie
        j += 1
      }
      selected.add(hashes(minPos))
      ws += 1
    }
    val out = new Array[AnyRef](selected.size)
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

object WinnowExpr {
  def column(c: Column, k: Int, w: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      WinnowExpr(org.apache.spark.sql.GraftBridge.expression(c), k, w))
}

/** [[WinnowExpr]] variant that keeps the selected gram POSITIONS:
  * returns array<struct<p:int, h:string>> of distinct selected
  * (1-based gram start, hash) pairs sorted by position. The positional
  * form feeds span-level operations (duplicated-span excision) where
  * the hash-set form can only flag; same hashing and rightmost-min
  * selection, so a DuckDB oracle reproduces selections exactly. */
case class WinnowPosExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StructType(scala.Seq(
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("h", StringType))))
  override def nullable: Boolean = true

  @transient private lazy val digest =
    java.security.MessageDigest.getInstance("MD5")
  private val hexChars = "0123456789abcdef".toCharArray

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val len = s.length
    val n = math.max(len - k + 1, 1)
    val hashes = new Array[String](n)
    val hex = new Array[Char](16)
    var i = 0
    while (i < n) {
      val gram = if (len <= k) s else s.substring(i, i + k)
      digest.reset()
      val d = digest.digest(gram.getBytes("UTF-8"))
      var b = 0
      while (b < 8) {
        hex(b * 2) = hexChars((d(b) >> 4) & 0xf)
        hex(b * 2 + 1) = hexChars(d(b) & 0xf)
        b += 1
      }
      hashes(i) = new String(hex)
      i += 1
    }
    val selected = new java.util.TreeMap[Integer, String]()
    val lastStart = math.max(n - w, 0)
    var ws = 0
    while (ws <= lastStart) {
      val end = math.min(ws + w, n)
      var minPos = ws
      var j = ws + 1
      while (j < end) {
        if (hashes(j) <= hashes(minPos)) minPos = j // rightmost tie
        j += 1
      }
      selected.put(minPos + 1, hashes(minPos)) // 1-based like SQL substr
      ws += 1
    }
    val out = new Array[AnyRef](selected.size)
    val it = selected.entrySet().iterator()
    var o = 0
    while (it.hasNext) {
      val e = it.next()
      out(o) = org.apache.spark.sql.catalyst.InternalRow(
        e.getKey.intValue(), UTF8String.fromString(e.getValue))
      o += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowPosExpr =
    copy(child = newChild)
}

object WinnowPosExpr {
  def column(c: Column, k: Int, w: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      WinnowPosExpr(org.apache.spark.sql.GraftBridge.expression(c), k, w))
}
