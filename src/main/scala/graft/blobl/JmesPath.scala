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
      if (peek == '{' || peek == '[') {
        // multiselect as a dotted segment (spec: `foo.{a: a}` /
        // `foo.[a, b]`): parse the multiselect with its field refs
        // relative to `this`, then rebind `this` to the base (the same
        // match-rebind shape the pipe uses); in projection context the
        // rebind goes inside the per-element lambda
        val sel = parsePrimary()
        return base match {
          case MethodCall(t, "map_each", List(Lambda(p, body))) =>
            MethodCall(t, "map_each",
              List(Lambda(p, MatchExpr(body, List((None, sel))))))
          case _ => MatchExpr(base, List((None, sel)))
        }
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
        // identity so trailing segments apply per element. The condition
        // is a full boolean expression (spec: `[?a > `1` && b < `2`]`),
        // so parse at the or-level, not just one comparison
        i += 1
        val cond = parseOr()
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
          val idx = LitLong(lo.getOrElse(throw new IllegalArgumentException(
            s"jmespath: expected index at $i in '$s'")))
          base match {
            // projection context: `nest[0:2][0]` indexes each element
            // (spec: projections propagate through chained brackets)
            case MethodCall(t, "map_each", List(Lambda(p, body))) =>
              MethodCall(t, "map_each", List(Lambda(p, IndexOp(body, idx))))
            case _ => IndexOp(base, idx)
          }
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
        case '[' =>
          // disambiguate a bracket-specifier on `@` — `[0]`, `[1:3]`,
          // `[*]`, `[]` (legal as a standalone expression, e.g. after a
          // pipe: `xs[*].name | [0]`) — from a multi-select list
          // `[expr, expr]`. Raw numbers are not JMESPath expressions, so
          // a digit/'-'/':'/'*'/']' right after '[' can only be a
          // specifier.
          val save = i
          i += 1; ws()
          val spec = peek == ']' || peek == '*' || peek == ':' ||
            peek == '-' || peek.isDigit
          i = save
          if (spec) bracket(This)
          else {
            i += 1
            val items = scala.collection.mutable.ListBuffer[Expr]()
            ws()
            if (peek != ']') {
              items += parsePipe()
              while (tryEat(",")) items += parsePipe()
            }
            eat(']')
            LitArray(items.toList)
          }
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
      try new JsonP(t).parseDoc()
      catch {
        case _: IllegalArgumentException | _: NumberFormatException
            if !t.startsWith("{") && !t.startsWith("[") &&
              !t.startsWith("\"") =>
          // elided-quotes literal (spec appendix / go-jmespath): a
          // backtick literal that isn't valid JSON is a plain string —
          // `foo` == `"foo"`
          LitString(t)
      }
    }
  }

  /** Minimal JSON parser for backtick literals — full value grammar
    * (objects/arrays/strings with escapes/numbers/booleans/null), since
    * the spec allows any JSON inside backticks (`{"c": 3}` in merge()). */
  private final class JsonP(s: String) {
    var i = 0
    private def peek: Char = if (i < s.length) s.charAt(i) else ' '
    private def ws(): Unit =
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"jmespath literal: $msg at $i in '$s'")
    def parseDoc(): Expr = {
      val e = value(); ws()
      if (i < s.length) fail("trailing input")
      e
    }
    private def value(): Expr = { ws(); peek match {
      case '{' =>
        i += 1; ws()
        val fields = scala.collection.mutable.ListBuffer[(Expr, Expr)]()
        if (peek != '}') {
          def member(): Unit = {
            ws()
            if (peek != '"') fail("expected key")
            val k = str(); ws()
            if (peek != ':') fail("expected ':'")
            i += 1
            fields += ((LitString(k), value()))
          }
          member()
          while ({ ws(); peek == ',' }) { i += 1; member() }
        }
        ws(); if (peek != '}') fail("expected '}'"); i += 1
        LitObject(fields.toList)
      case '[' =>
        i += 1; ws()
        val items = scala.collection.mutable.ListBuffer[Expr]()
        if (peek != ']') {
          items += value()
          while ({ ws(); peek == ',' }) { i += 1; items += value() }
        }
        ws(); if (peek != ']') fail("expected ']'"); i += 1
        LitArray(items.toList)
      case '"' => LitString(str())
      case 't' if s.startsWith("true", i) => i += 4; LitBool(true)
      case 'f' if s.startsWith("false", i) => i += 5; LitBool(false)
      case 'n' if s.startsWith("null", i) => i += 4; LitNull
      case c if c == '-' || c.isDigit =>
        val st = i
        if (peek == '-') i += 1
        while (i < s.length && (s.charAt(i).isDigit || "+-.eE".contains(s.charAt(i)))) i += 1
        val t = s.substring(st, i)
        if (t.exists(c => c == '.' || c == 'e' || c == 'E')) LitDouble(t.toDouble)
        else LitLong(t.toLong)
      case _ => fail("unexpected character")
    }}
    private def str(): String = {
      if (peek != '"') fail("expected string")
      i += 1
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          i += 1
          s.charAt(i) match {
            case '"' => sb.append('"'); case '\\' => sb.append('\\')
            case '/' => sb.append('/'); case 'b' => sb.append('\b')
            case 'f' => sb.append('\f'); case 'n' => sb.append('\n')
            case 'r' => sb.append('\r'); case 't' => sb.append('\t')
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case o => fail(s"bad escape \\$o")
          }
          i += 1
        } else { sb.append(c); i += 1 }
      }
      if (peek != '"') fail("unterminated string")
      i += 1
      sb.toString
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
