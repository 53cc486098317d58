package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Go's `strconv.Unquote` — the exact kernel behind the reference's
  * `unquote` method (`methods_strings.go:1492`) and the deprecated
  * `text` processor operator:
  *
  *  - double-quoted strings expand the full Go escape set: `\a \b \f
  *    \n \r \t \v \\ \"`, `\xHH`, `\NNN` (exactly three OCTAL digits,
  *    value < 256), `\uHHHH`, `\UHHHHHHHH` (must be a valid non-
  *    surrogate rune);
  *  - single-quoted form must decode to exactly one rune (`\'` legal
  *    only there);
  *  - backquoted raw strings take their contents verbatim minus
  *    carriage returns (the Go raw-literal value), no escapes;
  *  - a bare newline in the contents, a stray quote, or any malformed
  *    escape is `invalid syntax` (strconv.ErrSyntax) — surfaced here
  *    as null, which the compiler maps onto the expression error
  *    channel like the reference's method error.
  *
  * Documented divergence: Go's `\xHH`/octal escapes above 0x7F splice
  * raw non-UTF-8 BYTES into the string; JVM strings can't hold those,
  * so byte escapes land as the equal-valued code point (the Latin-1
  * reading). `\u`/`\U` are exact. */
object GoUnquote {

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  private def hexN(s: String, from: Int, n: Int): Int = {
    if (from + n > s.length) return -1
    var v = 0
    var i = 0
    while (i < n) {
      val h = hexVal(s.charAt(from + i))
      if (h < 0) return -1
      v = (v << 4) | h
      i += 1
    }
    v
  }

  /** strconv.Unquote; null = ErrSyntax. */
  def unquote(in: String): String = {
    if (in.length < 2) return null
    val quote = in.charAt(0)
    if (in.charAt(in.length - 1) != quote) return null
    val s = in.substring(1, in.length - 1)
    quote match {
      case '`' =>
        if (s.indexOf('`') >= 0) null
        else if (s.indexOf('\r') >= 0) s.replace("\r", "")
        else s
      case '"' | '\'' =>
        if (s.indexOf('\n') >= 0) return null
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i < s.length) {
          val c = s.charAt(i)
          if (c == quote) return null
          else if (c != '\\') { sb.append(c); i += 1 }
          else {
            i += 1
            if (i >= s.length) return null
            val e = s.charAt(i)
            i += 1
            e match {
              case 'a' => sb.append(7.toChar)
              case 'b' => sb.append('\b')
              case 'f' => sb.append('\f')
              case 'n' => sb.append('\n')
              case 'r' => sb.append('\r')
              case 't' => sb.append('\t')
              case 'v' => sb.append(11.toChar)
              case '\\' => sb.append('\\')
              case '\'' => if (quote != '\'') return null else sb.append('\'')
              case '"' => if (quote != '"') return null else sb.append('"')
              case 'x' =>
                val v = hexN(s, i, 2)
                if (v < 0) return null
                sb.append(v.toChar) // byte escape: Latin-1 code point
                i += 2
              case 'u' =>
                val v = hexN(s, i, 4)
                if (v < 0 || (v >= 0xD800 && v <= 0xDFFF)) return null
                sb.append(v.toChar)
                i += 4
              case 'U' =>
                val v = hexN(s, i, 8)
                if (v < 0 || v > 0x10FFFF || (v >= 0xD800 && v <= 0xDFFF))
                  return null
                sb.appendCodePoint(v)
                i += 8
              case d if d >= '0' && d <= '7' =>
                if (i + 2 > s.length) return null
                val o1 = s.charAt(i)
                val o2 = s.charAt(i + 1)
                if (o1 < '0' || o1 > '7' || o2 < '0' || o2 > '7') return null
                val v = (d - '0') * 64 + (o1 - '0') * 8 + (o2 - '0')
                if (v > 255) return null
                sb.append(v.toChar) // byte escape: Latin-1 code point
                i += 2
              case _ => return null
            }
          }
        }
        // char literal: exactly one rune
        if (quote == '\'' &&
            sb.codePointCount(0, sb.length) != 1) return null
        sb.toString
      case _ => null // not a quote character
    }
  }
}

case class GoUnquoteExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val r = GoUnquote.unquote(input.asInstanceOf[UTF8String].toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def withNewChildInternal(c: Expression): GoUnquoteExpr =
    copy(child = c)
}

object GoUnquoteExpr {
  def of(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      GoUnquoteExpr(org.apache.spark.sql.GraftBridge.expression(c)))
}
