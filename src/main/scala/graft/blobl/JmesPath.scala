package graft.blobl

import Ast._

/** JMESPath → Bloblang-AST translator (the `jmespath` processor,
  * `lib/processor/jmespath.go`). Covers the common subset — dotted paths,
  * `[n]` indexes, `[*]` / `[?expr]` projections, pipes, comparisons,
  * `&&`/`||`, and the frequent functions — by translating onto the same
  * AST the Bloblang compiler consumes, so everything stays a Catalyst
  * Column (no jmespath runtime).
  *
  * Mappings: `a.b[0]` → path+index; `xs[*].f` → map_each; `xs[?a>b]` →
  * filter; `xs[]` → flatten projection; `xs[a:b]` → slice; `m.*` →
  * object-values projection; `!expr` → not; `"quoted ident"` fields;
  * `l | r` → match-rebind (r evaluated with `this` = l);
  * `length(x)`/`keys`/`values`/`sort`/`join`/`max`/`min`/`sum`/
  * `to_string`/`contains`/`starts_with`/`ends_with`.
  */
object JmesPath {

  def translate(src: String): Expr = new P(src.trim).parsePipe()

  def column(df: org.apache.spark.sql.DataFrame, src: String): org.apache.spark.sql.Column =
    Compiler.compile(translate(src), Mapping.envelopeCtx(df)).col

  private final class P(s: String) {
    var i = 0
    def peek: Char = if (i < s.length) s.charAt(i) else '\u0000'
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def eat(c: Char): Unit = {
      ws(); require(peek == c, s"jmespath: expected '$c' at $i in '$s'"); i += 1
    }
    def tryEat(str: String): Boolean = {
      ws()
      if (s.startsWith(str, i)) { i += str.length; true } else false
    }

    def parsePipe(): Expr = {
      var l = parseOr()
      ws()
      while (peek == '|' && !s.startsWith("||", i)) {
        i += 1
        val r = parseOr()
        l = MatchExpr(l, List((None, r))) // rebind `this` to the LHS value
      }
      l
    }
    def parseOr(): Expr = {
      var l = parseAnd()
      while (tryEat("||")) l = BinOp("||", l, parseAnd())
      l
    }
    def parseAnd(): Expr = {
      var l = parseCmp()
      while (tryEat("&&")) l = BinOp("&&", l, parseCmp())
      l
    }
    def parseCmp(): Expr = {
      val l = parseNot()
      ws()
      val ops = List("==", "!=", ">=", "<=", ">", "<")
      ops.find(o => s.startsWith(o, i)) match {
        case Some(o) => i += o.length; BinOp(o, l, parseNot())
        case None => l
      }
    }

    def parseNot(): Expr = {
      ws()
      if (peek == '!' && !s.startsWith("!=", i)) { i += 1; Not(parseNot()) }
      else parseChain()
    }

    private def applySeg(base: Expr): Expr = {
      ws()
      if (peek == '*') {
        // object projection `m.*`: values, then per-element segments
        i += 1
        return MethodCall(MethodCall(base, "values", Nil),
          "map_each", List(Lambda("x", VarRef("x"))))
      }
      val name =
        if (peek == '"') { // quoted identifier
          i += 1
          val st = i
          while (i < s.length && s.charAt(i) != '"') i += 1
          val v = s.substring(st, i); i += 1
          v
        } else ident()
      base match {
        // projection context: apply the segment inside map_each
        case MethodCall(t, "map_each", List(Lambda(p, body))) =>
          MethodCall(t, "map_each", List(Lambda(p, Field(body, name))))
        case _ => Field(base, name)
      }
    }

    private def bracket(base: Expr): Expr = {
      eat('[')
      ws()
      if (peek == '*') {
        i += 1; eat(']')
        MethodCall(base, "map_each", List(Lambda("x", VarRef("x"))))
      } else if (peek == ']') {
        // flatten projection `xs[]`: one level flatten, then per-element
        i += 1
        MethodCall(MethodCall(base, "flatten", Nil),
          "map_each", List(Lambda("x", VarRef("x"))))
      } else if (peek == '?') {
        // filter: inside the lambda `this` is the element, so field refs
        // in the condition resolve against it directly. Filters CREATE a
        // projection (spec §filter-expressions): wrap in a map_each
        // identity so trailing segments apply per element
        i += 1
        val cond = parseCmp()
        eat(']')
        MethodCall(MethodCall(base, "filter", List(Lambda("it", cond))),
          "map_each", List(Lambda("x", VarRef("x"))))
      } else {
        def num(): Option[Long] = {
          ws()
          val neg = tryEat("-")
          val start = i
          while (i < s.length && s.charAt(i).isDigit) i += 1
          if (i == start) {
            require(!neg, s"jmespath: expected number at $i in '$s'"); None
          } else Some(s.substring(start, i).toLong * (if (neg) -1 else 1))
        }
        val lo = num()
        ws()
        if (peek == ':') {
          i += 1
          val hi = num()
          eat(']')
          // slices create projections too (spec §slices)
          MethodCall(
            MethodCall(base, "slice",
              LitLong(lo.getOrElse(0L)) :: hi.map(h => LitLong(h): Expr).toList),
            "map_each", List(Lambda("x", VarRef("x"))))
        } else {
          eat(']')
          IndexOp(base, LitLong(lo.getOrElse(throw new IllegalArgumentException(
            s"jmespath: expected index at $i in '$s'"))))
        }
      }
    }

    def parseChain(): Expr = {
      ws()
      var e: Expr = parsePrimary()
      var done = false
      while (!done) {
        ws()
        if (peek == '.') {
          i += 1
          ws()
          e = applySeg(e)
        } else if (peek == '[') e = bracket(e)
        else done = true
      }
      // the map_each-identity is only a parse-time projection marker; when
      // a SLICE's marker is never consumed by a trailing segment, drop it so
      // string slices keep compiling to substr (Bloblang slice semantics) —
      // an identity map_each is a no-op on arrays but an analysis error on
      // strings
      e match {
        case MethodCall(t @ MethodCall(_, "slice", _), "map_each",
            List(Lambda(p, VarRef(q)))) if p == q => t
        case other => other
      }
    }

    def parsePrimary(): Expr = {
      ws()
      peek match {
        case '`' => // JSON literal
          i += 1
          val start = i
          while (i < s.length && s.charAt(i) != '`') i += 1
          val raw = s.substring(start, i); i += 1
          jsonLiteral(raw)
        case '\'' =>
          i += 1
          val start = i
          while (i < s.length && s.charAt(i) != '\'') i += 1
          val v = s.substring(start, i); i += 1
          LitString(v)
        case '"' => // quoted identifier (field reference, not a literal)
          i += 1
          val start = i
          while (i < s.length && s.charAt(i) != '"') i += 1
          val v = s.substring(start, i); i += 1
          Field(This, v)
        case '@' => i += 1; This
        case '(' => i += 1; val e = parsePipe(); eat(')'); e
        case '{' => // multi-select hash: {Key: expr, ...}
          i += 1
          val fields = scala.collection.mutable.ListBuffer[(Expr, Expr)]()
          ws()
          if (peek != '}') {
            fields += hashField()
            while (tryEat(",")) fields += hashField()
          }
          eat('}')
          LitObject(fields.toList)
        case '[' => // multi-select list: [expr, expr]
          i += 1
          val items = scala.collection.mutable.ListBuffer[Expr]()
          ws()
          if (peek != ']') {
            items += parsePipe()
            while (tryEat(",")) items += parsePipe()
          }
          eat(']')
          LitArray(items.toList)
        case c if c.isLetter || c == '_' =>
          val name = ident()
          ws()
          if (peek == '(') fnCall(name) else Field(This, name)
        case c => throw new IllegalArgumentException(s"jmespath: unexpected '$c' at $i in '$s'")
      }
    }

    private def hashField(): (Expr, Expr) = {
      ws()
      val k =
        if (peek == '"') { // quoted key (spec §multiselect-hash)
          i += 1
          val st = i
          while (i < s.length && s.charAt(i) != '"') i += 1
          val v = s.substring(st, i); i += 1
          v
        } else ident()
      eat(':')
      (LitString(k), parsePipe())
    }

    def fnCall(name: String): Expr = {
      eat('(')
      val args = scala.collection.mutable.ListBuffer[Expr]()
      // `&expr` expression references (sort_by/min_by/max_by/map keys)
      // become lambdas over the element (jq map translation shape)
      def parseArg(): Expr = {
        ws()
        if (peek == '&') { i += 1; Lambda("x", parsePipe()) } else parsePipe()
      }
      ws()
      if (peek != ')') {
        args += parseArg()
        while (tryEat(",")) args += parseArg()
      }
      eat(')')
      name match {
        case "length" => MethodCall(args.head, "length", Nil)
        case "keys" => MethodCall(args.head, "keys", Nil)
        case "values" => MethodCall(args.head, "values", Nil)
        case "sort" => MethodCall(args.head, "sort", Nil)
        case "max" => MethodCall(args.head, "max", Nil)
        case "min" => MethodCall(args.head, "min", Nil)
        case "sum" => MethodCall(args.head, "sum", Nil)
        case "to_string" => MethodCall(args.head, "string", Nil)
        case "to_number" => MethodCall(args.head, "number", Nil)
        case "join" => MethodCall(args(1), "join", List(args.head))
        case "contains" => MethodCall(args.head, "contains", List(args(1)))
        case "starts_with" => MethodCall(args.head, "has_prefix", List(args(1)))
        case "ends_with" => MethodCall(args.head, "has_suffix", List(args(1)))
        case "abs" => MethodCall(args.head, "abs", Nil)
        case "floor" => MethodCall(args.head, "floor", Nil)
        case "ceil" => MethodCall(args.head, "ceil", Nil)
        case "reverse" => MethodCall(args.head, "reverse", Nil)
        case "type" => MethodCall(args.head, "type", Nil)
        case "not_null" =>
          // first non-null argument (JMESPath spec §not_null)
          args.reduceRight((a, b) => BinOp("|", a, b))
        case "avg" =>
          BinOp("/", MethodCall(args.head, "sum", Nil),
            MethodCall(args.head, "length", Nil))
        case "merge" =>
          args.reduceLeft((a, b) => MethodCall(a, "merge", List(b)))
        case "sort_by" => MethodCall(args.head, "sort_by", List(args(1)))
        case "min_by" =>
          IndexOp(MethodCall(args.head, "sort_by", List(args(1))), LitLong(0))
        case "max_by" =>
          IndexOp(MethodCall(args.head, "sort_by", List(args(1))), LitLong(-1))
        case "map" => MethodCall(args(1), "map_each", List(args.head))
        case "to_array" =>
          // array → unchanged; anything else wraps (spec §to_array) —
          // resolved on the static type by the compiler method
          MethodCall(args.head, "to_array", Nil)
        case o => throw new IllegalArgumentException(s"jmespath: unsupported function $o")
      }
    }

    def ident(): String = {
      ws()
      val start = i
      while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
      require(i > start, s"jmespath: expected identifier at $start in '$s'")
      s.substring(start, i)
    }

    def jsonLiteral(raw: String): Expr = {
      val t = raw.trim
      if (t.startsWith("\"")) LitString(t.substring(1, t.length - 1))
      else if (t == "true") LitBool(true)
      else if (t == "false") LitBool(false)
      else if (t == "null") LitNull
      else if (t.contains('.')) LitDouble(t.toDouble)
      else LitLong(t.toLong)
    }
  }
}

/** `jmespath` processor: doc := query(doc). */
final case class JmesPathProc(query: String) extends graft.ops.Processor {
  def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.model.Envelope._
    val result = Compiler.compile(JmesPath.translate(query), Mapping.envelopeCtx(df))
    df.select(col(Content), result.col.as(Doc), col(Meta), col(Error),
      col(BatchId), col(Seq))
  }
}
