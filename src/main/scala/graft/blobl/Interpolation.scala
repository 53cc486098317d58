package graft.blobl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Field interpolation `${! <query> }` (reference
  * `internal/bloblang/field/expression.go:50-121`): nearly every config
  * string field (keys, topics, paths) accepts embedded Bloblang queries.
  * Compiles a template to ONE concat Column; static templates collapse to
  * a literal at compile time (mirroring `expression.go:26`).
  */
object Interpolation {

  private val pattern = "\\$\\{!\\s*(.*?)\\s*\\}".r

  /** Compile against an envelope DataFrame. */
  def column(df: DataFrame, template: String): Column =
    build(template, expr => Mapping.envelopeExpr(df, expr))

  /** Compile against a plain DataFrame (this = row struct). */
  def columnPlain(df: DataFrame, template: String): Column =
    build(template, expr => Mapping.columnExpr(expr, df))

  private def build(template: String, compile: String => Column): Column = {
    val parts = scala.collection.mutable.ListBuffer[Column]()
    var last = 0
    for (m <- pattern.findAllMatchIn(template)) {
      if (m.start > last) parts += lit(template.substring(last, m.start))
      parts += compile(m.group(1)).cast("string")
      last = m.end
    }
    if (last < template.length) parts += lit(template.substring(last))
    if (parts.isEmpty) lit("")
    else if (parts.size == 1) parts.head
    else concat(parts.toSeq: _*)
  }

  /** True when the template contains no dynamic parts. */
  def isStatic(template: String): Boolean = pattern.findFirstIn(template).isEmpty
}
