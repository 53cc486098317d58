package graft.blobl

import Ast._

/** jq → Bloblang-AST translator (the `jq` processor,
  * `lib/processor/jq.go`, gojq in the reference). Covers the common
  * value-level subset — `.a.b` paths, `[n]` indexes, pipes, `//`
  * alternative, arithmetic/comparisons, object/array construction, and
  * the frequent builtins (`map`, `map(select(f))`, `length`, `keys`,
  * `add`, `min`/`max`, `sort`, `unique`, `join`, `tostring`, `tonumber`,
  * `ascii_downcase`/`ascii_upcase`, `split`, `ltrimstr`/`rtrimstr`,
  * `floor`, `fabs`) — by translating onto the Bloblang AST, so the query
  * compiles to Catalyst Columns with no jq runtime. Generators (`.[]`
  * fan-out) are out of scope (row-producing; use ops explode).
  */
object Jq {

  def translate(src: String): Expr = {
    val p = new P(src.trim)
    val e = p.parsePipe()
    p.ws()
    require(p.i >= p.s.length, s"jq: trailing input at ${p.i} in '$src'")
    e
  }

  private[blobl] final class P(val s: String) {
    var i = 0
    def peek: Char = if (i < s.length) s.charAt(i) else ' '
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def eat(c: Char): Unit = {
      ws(); require(peek == c, s"jq: expected '$c' at $i in '$s'"); i += 1
    }
    def tryEat(tok: String): Boolean = {
      ws()
      if (s.startsWith(tok, i)) { i += tok.length; true } else false
    }

    def parsePipe(): Expr = {
      var l = parseStage()
      ws()
      while (peek == '|' && !s.startsWith("||", i)) {
        i += 1
        l = MatchExpr(l, List((None, parseStage()))) // rebind `this`
      }
      l
    }

    /** One pipe stage: a jq path assignment `.a.b = expr`
      * (jq_test.go TestJQMutation) or a plain expression. */
    def parseStage(): Expr = {
      ws()
      val save = i
      if (peek == '.') {
        val segs = tryParsePurePath()
        if (segs.nonEmpty) {
          ws()
          if (peek == '=' && !s.startsWith("==", i)) {
            i += 1
            return SetPath(segs, parseAlt())
          }
        }
        i = save
      }
      parseAlt()
    }

    /** `.ident(.ident)*` with nothing else — the assignable-path form;
      * empty list (caller restores position) when it isn't one. */
    private def tryParsePurePath(): List[String] = {
      val segs = List.newBuilder[String]
      var n = 0
      while (peek == '.' && i + 1 < s.length &&
          (s.charAt(i + 1).isLetter || s.charAt(i + 1) == '_')) {
        i += 1
        val st = i
        while (i < s.length &&
          (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        segs += s.substring(st, i)
        n += 1
      }
      if (n == 0) Nil else segs.result()
    }
    def parseAlt(): Expr = { // `a // b`
      var l = parseOr()
      while (tryEat("//")) l = BinOp("|", l, parseOr())
      l
    }
    def parseOr(): Expr = {
      var l = parseAnd()
      while (tryEat("or")) l = BinOp("||", l, parseAnd())
      l
    }
    def parseAnd(): Expr = {
      var l = parseCmp()
      while (tryEat("and")) l = BinOp("&&", l, parseCmp())
      l
    }
    def parseCmp(): Expr = {
      val l = parseAdd()
      ws()
      List("==", "!=", ">=", "<=", ">", "<").find(o => s.startsWith(o, i)) match {
        case Some(o) => i += o.length; BinOp(o, l, parseAdd())
        case None => l
      }
    }
    def parseAdd(): Expr = {
      var l = parseMul()
      var go = true
      while (go) {
        ws()
        if (peek == '+' ) { i += 1; l = BinOp("+", l, parseMul()) }
        else if (peek == '-' && !s.startsWith("//", i)) { i += 1; l = BinOp("-", l, parseMul()) }
        else go = false
      }
      l
    }
    def parseMul(): Expr = {
      var l = parsePostfix()
      var go = true
      while (go) {
        ws()
        if (peek == '*') { i += 1; l = BinOp("*", l, parsePostfix()) }
        else if (peek == '/' && !s.startsWith("//", i)) { i += 1; l = BinOp("/", l, parsePostfix()) }
        else if (peek == '%') { i += 1; l = BinOp("%", l, parsePostfix()) }
        else go = false
      }
      l
    }

    def parsePostfix(): Expr = {
      var e = parsePrimary()
      var go = true
      while (go) {
        ws()
        if (peek == '.' && i + 1 < s.length && (s.charAt(i + 1).isLetter || s.charAt(i + 1) == '_')) {
          i += 1
          e = Field(e, ident())
        } else if (peek == '[') {
          i += 1; ws()
          require(peek != ']', "jq: generator .[] not supported (row-producing)")
          val neg = tryEat("-")
          val start = i
          while (i < s.length && s.charAt(i).isDigit) i += 1
          val n = s.substring(start, i).toLong * (if (neg) -1 else 1)
          eat(']')
          e = IndexOp(e, LitLong(n))
        } else go = false
      }
      e
    }

    def parsePrimary(): Expr = {
      ws()
      peek match {
        case '.' =>
          i += 1
          if (i < s.length && (s.charAt(i).isLetter || s.charAt(i) == '_'))
            Field(This, ident())
          else This
        case '"' =>
          i += 1
          val start = i
          while (i < s.length && s.charAt(i) != '"') i += 1
          val v = s.substring(start, i); i += 1
          LitString(v)
        case '(' => i += 1; val e = parsePipe(); eat(')'); e
        case '[' =>
          i += 1
          val items = scala.collection.mutable.ListBuffer[Expr]()
          ws()
          if (peek != ']') {
            items += parsePipe()
            while (tryEat(",")) items += parsePipe()
          }
          eat(']')
          LitArray(items.toList)
        case '{' =>
          i += 1
          val fields = scala.collection.mutable.ListBuffer[(Expr, Expr)]()
          ws()
          if (peek != '}') {
            fields += objField()
            while (tryEat(",")) fields += objField()
          }
          eat('}')
          LitObject(fields.toList)
        case c if c.isDigit =>
          val start = i
          while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
          val raw = s.substring(start, i)
          if (raw.contains('.')) LitDouble(raw.toDouble) else LitLong(raw.toLong)
        case c if c.isLetter || c == '_' =>
          val name = ident()
          name match {
            case "true" => LitBool(true)
            case "false" => LitBool(false)
            case "null" => LitNull
            case _ => builtin(name)
          }
        case c => throw new IllegalArgumentException(s"jq: unexpected '$c' at $i in '$s'")
      }
    }

    private def objField(): (Expr, Expr) = {
      ws()
      val k = ident()
      eat(':')
      (LitString(k), parsePipe())
    }

    /** Builtins apply to `this` (the piped value). */
    private def builtin(name: String): Expr = {
      def arg(): Expr = { eat('('); val e = parsePipe(); eat(')'); e }
      name match {
        case "length" => MethodCall(This, "length", Nil)
        case "keys" => MethodCall(MethodCall(This, "keys", Nil), "sort", Nil)
        case "add" => MethodCall(This, "sum", Nil)
        case "min" => MethodCall(This, "min", Nil)
        case "max" => MethodCall(This, "max", Nil)
        case "sort" => MethodCall(This, "sort", Nil)
        case "unique" => MethodCall(MethodCall(This, "unique", Nil), "sort", Nil)
        case "reverse" => MethodCall(This, "reverse", Nil)
        case "floor" => MethodCall(This, "floor", Nil)
        case "fabs" => MethodCall(This, "abs", Nil)
        case "tostring" => MethodCall(This, "string", Nil)
        case "tonumber" => MethodCall(This, "number", Nil)
        case "ascii_downcase" => MethodCall(This, "lowercase", Nil)
        case "ascii_upcase" => MethodCall(This, "uppercase", Nil)
        case "join" => MethodCall(This, "join", List(arg()))
        case "split" => MethodCall(This, "split", List(arg()))
        case "ltrimstr" => MethodCall(This, "trim_prefix", List(arg()))
        case "rtrimstr" => MethodCall(This, "trim_suffix", List(arg()))
        case "startswith" => MethodCall(This, "has_prefix", List(arg()))
        case "endswith" => MethodCall(This, "has_suffix", List(arg()))
        case "contains" => MethodCall(This, "contains", List(arg()))
        case "map" =>
          eat('(')
          ws()
          // map(select(f)) → filter; map(select(f).path) → filter+map;
          // map(f) → map_each
          if (tryEat("select")) {
            val cond = { eat('('); val c = parsePipe(); eat(')'); c }
            // optional postfix path applied to each selected element
            var proj: Expr = This
            var more = true
            while (more) {
              ws()
              if (peek == '.' && i + 1 < s.length &&
                  (s.charAt(i + 1).isLetter || s.charAt(i + 1) == '_')) {
                i += 1
                proj = Field(proj, ident())
              } else if (peek == '[') {
                i += 1; ws()
                val neg = tryEat("-")
                val st = i
                while (i < s.length && s.charAt(i).isDigit) i += 1
                val n = s.substring(st, i).toLong * (if (neg) -1 else 1)
                eat(']')
                proj = IndexOp(proj, LitLong(n))
              } else more = false
            }
            eat(')')
            val filtered = MethodCall(This, "filter", List(Lambda("x", cond)))
            if (proj == This) filtered
            else MethodCall(filtered, "map_each", List(Lambda("x", proj)))
          } else {
            val body = parsePipe()
            eat(')')
            MethodCall(This, "map_each", List(Lambda("x", body)))
          }
        case "select" =>
          val cond = arg()
          IfExpr(List((cond, This)), Some(LitNull))
        case "not" => Not(This)
        case "to_entries" => MethodCall(This, "key_values", Nil)
        case "from_entries" => MethodCall(This, "from_entries", Nil)
        case "empty" => LitNull
        case "type" => MethodCall(This, "type", Nil)
        case "has" => MethodCall(This, "exists", List(arg()))
        case "any" => MethodCall(This, "any", List(Lambda("x", VarRef("x"))))
        case "all" => MethodCall(This, "all", List(Lambda("x", VarRef("x"))))
        case "first" => IndexOp(This, LitLong(0))
        case "last" => IndexOp(This, LitLong(-1))
        case "flatten" => MethodCall(This, "flatten", Nil)
        case "abs" => MethodCall(This, "abs", Nil)
        case "test" => MethodCall(This, "re_match", List(arg()))
        case "gsub" =>
          // gsub(re; replacement)
          eat('(')
          val re = parsePipe()
          ws(); eat(';'); ws()
          val repl = parsePipe()
          eat(')')
          MethodCall(This, "re_replace", List(re, repl))
        case o => throw new IllegalArgumentException(s"jq: unsupported builtin $o")
      }
    }

    def ident(): String = {
      ws()
      val start = i
      while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
      require(i > start, s"jq: expected identifier at $start")
      s.substring(start, i)
    }
  }
}

/** `jq` processor: doc := query(doc). */
final case class JqProc(query: String) extends graft.ops.Processor {
  def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.model.Envelope._
    val result = Compiler.compile(Jq.translate(query), Mapping.envelopeCtx(df))
    df.select(col(Content), result.col.as(Doc), col(Meta), col(Error),
      col(BatchId), col(Seq))
  }
}
