package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Go `regexp.Expand` / `ReplaceAllString` template semantics as a
  * Catalyst expression (reference `lib/processor/text.go` operators
  * `regexp_expand` and `replace_regexp`, which call into Go's regexp
  * package):
  *
  *  - `$1` / `$name` / `${name}` substitute submatches; `$name` takes the
  *    LONGEST letter/digit/underscore run (`$1x` ≡ `${1x}`, `$10` ≡
  *    `${10}`).
  *  - An out-of-range index, unmatched group, or unknown name expands to
  *    the EMPTY string — Java's `Matcher.replaceAll` throws instead,
  *    which is why this can't compile onto `regexp_replace`.
  *  - `$$` emits a literal `$`; a malformed `${` or trailing/bare `$`
  *    stays literal.
  *  - `expand = true` (the `regexp_expand` operator): ONLY the expanded
  *    templates of each match are emitted, concatenated — non-matching
  *    text drops. `expand = false` (`replace_regexp`): every match is
  *    replaced in place, non-matching text kept.
  *
  * Go `(?P<name>...)` groups are rewritten through the shared
  * [[graft.blobl.Compiler.captureGroups]] translator, so patterns come
  * straight from reference configs. Per-row work is one matcher pass;
  * CodegenFallback is fine here — the operator is config-dialect surface,
  * not an analytic hot path. */
case class GoRegexpExpandExpr(child: Expression, pattern: String,
    template: String, expand: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val (javaPattern, groupNames) =
    graft.blobl.Compiler.captureGroups(pattern)
  @transient private lazy val compiled =
    java.util.regex.Pattern.compile(javaPattern)
  /** Go group name → 1-based index (first binding wins, like RE2). */
  @transient private lazy val nameIndex: Map[String, Int] =
    groupNames.zipWithIndex.collect {
      case (Some(n), i) => n -> (i + 1)
    }.reverse.toMap

  private def lookup(m: java.util.regex.Matcher, name: String): String = {
    val idx =
      if (name.nonEmpty && name.forall(_.isDigit))
        try name.toInt catch { case _: NumberFormatException => -1 }
      else nameIndex.getOrElse(name, -1)
    if (idx < 0 || idx > m.groupCount) ""
    else Option(m.group(idx)).getOrElse("")
  }

  /** Go regexp.expand of one match into `sb`. */
  private def expandMatch(sb: java.lang.StringBuilder,
      m: java.util.regex.Matcher): Unit = {
    var i = 0
    val t = template
    while (i < t.length) {
      val c = t.charAt(i)
      if (c == '$' && i + 1 < t.length) {
        val n = t.charAt(i + 1)
        if (n == '$') { sb.append('$'); i += 2 }
        else {
          val braced = n == '{'
          val start = if (braced) i + 2 else i + 1
          var k = start
          while (k < t.length && (t.charAt(k).isLetterOrDigit
            || t.charAt(k) == '_')) k += 1
          val name = t.substring(start, k)
          if (braced) {
            if (name.nonEmpty && k < t.length && t.charAt(k) == '}') {
              sb.append(lookup(m, name)); i = k + 1
            } else { sb.append('$'); i += 1 }
          } else if (name.isEmpty) { sb.append('$'); i += 1 }
          else { sb.append(lookup(m, name)); i = k }
        }
      } else { sb.append(c); i += 1 }
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val m = compiled.matcher(s)
    val sb = new java.lang.StringBuilder
    var last = 0
    // Matcher.find self-advances past zero-width matches, so this scan
    // always terminates
    while (m.find()) {
      if (!expand) sb.append(s, last, m.start())
      expandMatch(sb, m)
      last = m.end()
    }
    if (!expand) sb.append(s, last, s.length)
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : GoRegexpExpandExpr = copy(child = newChild)
}

object GoRegexpExpandExpr {
  def column(c: Column, pattern: String, template: String,
      expand: Boolean): Column =
    org.apache.spark.sql.GraftBridge.column(
      GoRegexpExpandExpr(
        org.apache.spark.sql.GraftBridge.expression(c), pattern, template,
        expand))
}
