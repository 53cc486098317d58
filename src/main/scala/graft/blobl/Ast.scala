package graft.blobl

/** Typed AST for the Bloblang mapping language (reference grammar:
  * `internal/bloblang/parser/mapping_parser.go:51-101`,
  * `query_arithmetic_parser.go`, `query_expression_parser.go:68-233`).
  */
object Ast {
  sealed trait Expr

  case object LitNull extends Expr
  final case class LitBool(v: Boolean) extends Expr
  final case class LitLong(v: Long) extends Expr
  final case class LitDouble(v: Double) extends Expr
  final case class LitString(v: String) extends Expr
  final case class LitArray(items: List[Expr]) extends Expr
  final case class LitObject(fields: List[(Expr, Expr)]) extends Expr

  /** `this` — the input document (context value inside lambdas/match). */
  case object This extends Expr
  /** `$name` — a `let` variable reference. */
  final case class VarRef(name: String) extends Expr
  /** Field access `base.seg` (seg may be quoted). */
  final case class Field(base: Expr, name: String) extends Expr
  /** Bracket index `base[i]` (negative = from end, like Bloblang `index`). */
  final case class IndexOp(base: Expr, idx: Expr) extends Expr
  /** Function call `name(args...)`. */
  final case class FnCall(name: String, args: List[Expr]) extends Expr
  /** Method call `target.name(args...)`. */
  final case class MethodCall(target: Expr, name: String, args: List[Expr]) extends Expr
  /** Binary operator; op ∈ + - * / % == != > < >= <= && || | */
  final case class BinOp(op: String, l: Expr, r: Expr) extends Expr
  final case class Not(e: Expr) extends Expr
  final case class Neg(e: Expr) extends Expr
  /** if cond { a } else if c2 { b } else { c } — else optional (Nothing). */
  final case class IfExpr(branches: List[(Expr, Expr)], orElse: Option[Expr]) extends Expr
  /** match target { pattern => expr, ... }; pattern None = `_` default.
    * Inside cases, `this` rebinds to the match target. */
  final case class MatchExpr(target: Expr, cases: List[(Option[Expr], Expr)]) extends Expr
  /** Lambda `param -> body` (argument to map_each/filter/sort_by/...). */
  final case class Lambda(param: String, body: Expr) extends Expr
  /** One segment of an assignable path: a struct field or a literal
    * array index (0-based, negative = from the end, like jq). */
  sealed trait PathSeg
  final case class PField(name: String) extends PathSeg
  final case class PIndex(idx: Long) extends PathSeg

  /** `this` with a nested path set: `.a.b = v` / `.xs[0].a = v` as a
    * VALUE expression (the jq assignment stage — jq_test.go
    * TestJQMutation). The value compiles against the same `this`. */
  final case class SetPath(path: List[PathSeg], value: Expr) extends Expr

  sealed trait Target
  /** `root` / `root.a.b` */
  final case class RootPath(segs: List[String]) extends Target
  /** `meta key` (None = whole metadata object) */
  final case class MetaKey(key: Option[String]) extends Target
  /** `let name` */
  final case class LetVar(name: String) extends Target

  sealed trait Stmt
  final case class Assign(target: Target, value: Expr) extends Stmt
  final case class MapDef(name: String, stmts: List[Stmt]) extends Stmt
  /** `import "file"` — pull the file's map definitions in
    * (mapping_parser.go importParser); resolved by Mapping.compile. */
  final case class ImportFile(path: String) extends Stmt
  /** `from "file"` — execute the file as the whole mapping. */
  final case class FromFile(path: String) extends Stmt

  final case class Program(stmts: List[Stmt])
}
