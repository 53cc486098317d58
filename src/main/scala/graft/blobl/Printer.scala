package graft.blobl

import Ast._

/** AST → Bloblang source renderer. Used to re-express translated
  * dialects (jmespath conditions, structured YAML conditions) as
  * Bloblang strings so every condition path funnels through one
  * compiler. Round-trip property: `parse(print(e))` compiles to the
  * same Column as `e`.
  */
object Printer {

  def print(e: Expr): String = e match {
    case LitNull => "null"
    case LitBool(v) => v.toString
    case LitLong(v) => v.toString
    case LitDouble(v) => v.toString
    case LitString(v) => quote(v)
    case LitArray(items) => items.map(print).mkString("[", ", ", "]")
    case LitObject(fields) =>
      fields.map { case (k, v) => s"${print(k)}: ${print(v)}" }
        .mkString("{", ", ", "}")
    case This => "this"
    case VarRef(n) => "$" + n
    case Field(This, n) if plainIdent(n) => s"this.$n"
    case Field(b, n) if plainIdent(n) => s"${print(b)}.$n"
    case Field(b, n) => s"${print(b)}.get(${quote(n)})"
    case IndexOp(b, i) => s"${print(b)}.index(${print(i)})"
    case MethodCall(t, name, args) =>
      s"${print(t)}.$name(${args.map(print).mkString(", ")})"
    case FnCall(name, args) => s"$name(${args.map(print).mkString(", ")})"
    case BinOp(op, l, r) => s"(${print(l)} $op ${print(r)})"
    case Not(x) => s"!(${print(x)})"
    case Neg(x) => s"-(${print(x)})"
    case IfExpr(branches, orElse) =>
      val head = s"if ${print(branches.head._1)} { ${print(branches.head._2)} }"
      val elifs = branches.tail.map { case (c, v) =>
        s" else if ${print(c)} { ${print(v)} }" }.mkString
      val els = orElse.map(v => s" else { ${print(v)} }").getOrElse("")
      head + elifs + els
    case MatchExpr(t, cases) =>
      val cs = cases.map {
        case (None, v) => s"_ => ${print(v)}"
        case (Some(c), v) => s"${print(c)} => ${print(v)}"
      }.mkString(", ")
      s"match ${print(t)} { $cs }"
    case Lambda(p, b) => s"$p -> ${print(b)}"
    case o => throw new IllegalArgumentException(s"printer: cannot render $o")
  }

  private def plainIdent(n: String): Boolean =
    n.nonEmpty && (n.head.isLetter || n.head == '_') &&
      n.forall(c => c.isLetterOrDigit || c == '_')

  private def quote(v: String): String =
    "\"" + v.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case '\r' => "\\r"
      case c => c.toString
    } + "\""
}
