package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character k-gram shingles as a native expression: ONE pass over the
  * string. The composable form (`transform(sequence(...), i ->
  * substr(text,i,k))`) re-walks the string from the start for every
  * position (UTF8 char offsets are byte-scans), i.e. O(len²) per document
  * — this is O(len·k) and was worth ~4× on the minhash signature stage.
  * One eval call per row (CodegenFallback costs one virtual call, not a
  * codegen break per element). */
case class CharShinglesExpr(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n <= k) return new GenericArrayData(Array[AnyRef](UTF8String.fromString(s)))
    val out = new Array[AnyRef](n - k + 1)
    var i = 0
    if (distinct) {
      val seen = new java.util.HashSet[String]((n - k + 1) * 2)
      var m = 0
      while (i <= n - k) {
        val sub = s.substring(i, i + k)
        if (seen.add(sub)) { out(m) = UTF8String.fromString(sub); m += 1 }
        i += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(out, m))
    } else {
      while (i <= n - k) {
        out(i) = UTF8String.fromString(s.substring(i, i + k))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CharShinglesExpr =
    copy(child = newChild)
}

object CharShinglesExpr {
  def column(c: Column, k: Int, distinct: Boolean): Column =
    org.apache.spark.sql.GraftBridge.column(
      CharShinglesExpr(org.apache.spark.sql.GraftBridge.expression(c), k, distinct))
}
