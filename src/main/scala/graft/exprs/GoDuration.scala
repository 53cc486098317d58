package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `parse_duration` as a native Catalyst expression with codegen
  * (reference `methods_strings.go:1094`, Go `time.ParseDuration`
  * semantics): compound strings like "1h2m3.5s" or "-300ms" → nanoseconds.
  * Null (permissive) on malformed input. doGenCode emits a static call so
  * the expression stays inside whole-stage codegen — no UDF boundary. */
case class GoDurationParse(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    GoDurationParse.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GoDurationParse.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |java.lang.Long ${ev.value}Tmp = $cls.parse($c);
         |if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}Tmp.longValue(); }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): GoDurationParse =
    copy(child = newChild)
}

object GoDurationParse {
  /** Column wrapper via the classic Expression↔Column bridge. */
  def column(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      GoDurationParse(org.apache.spark.sql.GraftBridge.expression(c)))

  /** Public entry used from both interpreted eval and generated code. */
  def parse(s: UTF8String): java.lang.Long = {
    if (s == null) return null
    var str = s.toString.trim
    if (str.isEmpty) return null
    var sign = 1L
    if (str.startsWith("-")) { sign = -1L; str = str.substring(1) }
    else if (str.startsWith("+")) str = str.substring(1)
    if (str == "0") return java.lang.Long.valueOf(0L)
    var total = 0.0
    var i = 0
    val n = str.length
    var any = false
    while (i < n) {
      val numStart = i
      while (i < n && (str.charAt(i).isDigit || str.charAt(i) == '.')) i += 1
      if (i == numStart) return null
      val num = try str.substring(numStart, i).toDouble catch { case _: Exception => return null }
      val unitStart = i
      while (i < n && !str.charAt(i).isDigit && str.charAt(i) != '.') i += 1
      val mult: Double = str.substring(unitStart, i) match {
        case "ns" => 1.0
        case "us" | "µs" | "μs" => 1e3
        case "ms" => 1e6
        case "s" => 1e9
        case "m" => 60e9
        case "h" => 3600e9
        case _ => return null
      }
      total += num * mult
      any = true
    }
    if (!any) null else java.lang.Long.valueOf(sign * total.toLong)
  }
}
