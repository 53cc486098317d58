package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.blobl.{CompileError, Mapping, ParseError}

/** Compiler robustness: arbitrary input must produce a CONTROLLED outcome
  * — a compiled mapping or a typed compile/parse error — never a
  * StackOverflow, NPE, or match error. A config-driven engine's parser is
  * attacker-adjacent surface; "garbage in, diagnostic out" is the
  * contract `benthos lint` relies on. Deterministic seed so failures
  * reproduce. */
class FuzzSpec extends AnyFunSuite {

  private def compiles(src: String): Boolean =
    try { Mapping.compile(src); true }
    catch {
      case _: CompileError | _: ParseError => true
      case _: IllegalArgumentException => true
      case _: org.apache.spark.sql.AnalysisException => true
    }

  test("random printable garbage never crashes the Bloblang compiler") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val len = rnd.nextInt(120)
      val s = new String(Array.fill(len)((32 + rnd.nextInt(95)).toChar))
      assert(compiles(s), s"input: $s")
    }
  }

  test("random token soup (keywords/operators/idents) never crashes") {
    val toks = Array(
      "root", "this", "meta", "let", "map", "if", "else", "match",
      ".", "=", "==", "|", "->", "(", ")", "{", "}", "[", "]", ",",
      "\"x\"", "1", "1.5", "true", "null", "foo", "_bar", "+", "-",
      "*", "/", "!", "&&", "||", ">=", "$v", "#", "\n", " ")
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val s = Array.fill(1 + rnd.nextInt(30))(toks(rnd.nextInt(toks.length)))
        .mkString(" ")
      assert(compiles(s), s"input: $s")
    }
  }

  test("jq / jmespath / grok translators never crash on garbage") {
    def ok(f: => Any): Boolean =
      try { f; true }
      catch {
        case _: CompileError | _: ParseError => true
        case _: IllegalArgumentException => true
        case _: java.util.regex.PatternSyntaxException => true
      }
    val rnd = new scala.util.Random(99)
    val jqToks = Array(".", "|", "[", "]", "(", ")", "{", "}", ",", "?",
      "a", "b", "select", "map", "//", "==", "\"s\"", "1", " ")
    (1 to 300).foreach { _ =>
      val s = Array.fill(1 + rnd.nextInt(20))(jqToks(rnd.nextInt(jqToks.length))).mkString
      assert(ok(graft.blobl.Jq.translate(s)), s"jq: $s")
      assert(ok(graft.blobl.JmesPath.translate(s)), s"jmespath: $s")
    }
    val grokBits = Array("%{WORD:w}", "%{NUMBER", "%{", "}", "\\[", "(",
      "[a-", "%{IP:ip}", " ", "x")
    (1 to 200).foreach { _ =>
      val s = Array.fill(1 + rnd.nextInt(8))(grokBits(rnd.nextInt(grokBits.length))).mkString
      assert(ok(graft.ops.Grok.compile(s)), s"grok: $s")
    }
  }

  test("interpolation templates never crash on garbage") {
    val spark = Sessions.builder("2").getOrCreate()
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "v")
    def ok(t: String): Boolean =
      try { graft.blobl.Interpolation.column(df, t); true }
      catch {
        case _: CompileError | _: ParseError => true
        case _: IllegalArgumentException => true
        case _: org.apache.spark.sql.AnalysisException => true
      }
    val bits = Array("${!", "}", "this", ".", "id", "(", ")", "\"", "$",
      "{", "literal", " ", "${! this.v }", "%")
    val rnd = new scala.util.Random(3)
    (1 to 300).foreach { _ =>
      val s = Array.fill(1 + rnd.nextInt(10))(bits(rnd.nextInt(bits.length))).mkString
      assert(ok(s), s"template: $s")
    }
  }

  test("printer round-trip: print(translate(jmespath)) re-parses and compiles") {
    // every jmespath query the suite exercises must survive
    // AST → Bloblang-source → parse → compile (the condition path)
    val queries = scala.Seq(
      "a.b", "a.b[0].c", "people[*].name", "people[?age > `30`].name",
      "xs[].v", "xs[1:3]", "xs[-2:]", "!(a > `5`)", "m.*.v",
      "length(people)", "join(', ', tags)", "sort_by(xs, &v)",
      "min_by(xs, &v)", "max_by(xs, &v)", "map(&v, xs)",
      "merge(a, b)", "not_null(missing, a)", "avg(xs)",
      "a > `5` && b == 'x'", "sum([foo.bar, `6`])",
      "locations[?state == 'WA'].name | sort(@)")
    for (q <- queries) {
      val printed = graft.blobl.Printer.print(graft.blobl.JmesPath.translate(q))
      val reparsed = graft.blobl.Parser.parseQueryString(printed)
      assert(compiles(s"root = $printed"), s"$q → $printed")
      // printing the reparsed AST is a fixed point (stable rendering)
      assert(graft.blobl.Printer.print(reparsed).nonEmpty)
    }
  }

  test("container decoders never crash on random bytes (null, not exception)") {
    val spark = Sessions.builder("4").getOrCreate()
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(99)
    val blobs = (0 until 200).map { i =>
      val b = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(b)
      // seed some with real-looking magics so the walkers go deeper
      if (i % 5 == 0 && b.length >= 8) {
        val magic = scala.Seq("RIFF", "ID3", "ftyp").apply(i % 3)
          .getBytes("ISO-8859-1")
        System.arraycopy(magic, 0, b, 0, math.min(magic.length, b.length))
      }
      Tuple1(b)
    }
    val df = blobs.toDF("p")
    // each must evaluate without throwing; null results are fine
    val n = df.select(
      graft.llmops.Multimodal.decodeAvi(col("p")).as("a"),
      graft.llmops.Multimodal.aviFrames(col("p")).as("af"),
      graft.llmops.Multimodal.decodeMp4(col("p")).as("m4"),
      graft.llmops.Multimodal.decodeMp3(col("p")).as("m3"),
      graft.llmops.Multimodal.decodeFlac(col("p")).as("fl"),
      graft.llmops.Multimodal.decodeFlacSamples(col("p")).as("fs"),
      graft.llmops.Multimodal.mp4Samples(col("p")).as("ms"),
      graft.llmops.Multimodal.mp3Frames(col("p")).as("mf")).count()
    assert(n == 200L)
  }

  test("jq bounded iteration matches a reference interpreter on random affine walks") {
    // recurse(f; cond) / until / while over f(x) = a·x + b, cond x < L:
    // closed-form enough to interpret in-test, random enough to probe
    // the aggregate machinery's branch logic (emit-first semantics,
    // cond placement, cap handling)
    lazy val spark = Sessions.builder("4").getOrCreate()
    import org.apache.spark.sql.functions._
    import graft.model.Envelope
    import graft.blobl.JqProc
    val rnd = new scala.util.Random(271828)
    def runJq(q: String, v: Long): String = {
      import spark.implicits._
      val df = spark.read.json(spark.createDataset(scala.Seq(s"""{"v":$v}""")))
      val out = JqProc(q)(Envelope.wrapUnordered(df))
      val docCol = out.schema(Envelope.Doc).dataType match {
        case _: org.apache.spark.sql.types.ArrayType => to_json(col(Envelope.Doc))
        case _ => col(Envelope.Doc).cast("string")
      }
      val r = out.select(docCol, col(Envelope.Error)).head()
      if (!r.isNullAt(1)) "ERR" else r.getString(0)
    }
    (1 to 25).foreach { _ =>
      val a = 2 + rnd.nextInt(3) // 2..4
      val b = rnd.nextInt(5)
      val lim = 10 + rnd.nextInt(2000)
      val v0 = 1 + rnd.nextInt(20)
      def step(x: Long) = a * x + b
      // reference: recurse emits v0 then cond-filtered iterates
      val recRef = {
        val buf = scala.collection.mutable.ArrayBuffer[Long](v0)
        var x = step(v0)
        var depth = 0
        while (x < lim && depth < 16) { buf += x; x = step(x); depth += 1 }
        if (x < lim) "ERR" else buf.mkString("[", ",", "]")
      }
      assert(runJq(s"[.v | recurse(. * $a + $b; . < $lim)]", v0) == recRef,
        s"recurse a=$a b=$b lim=$lim v0=$v0")
      // until: first iterate ≥ lim (cap 64 is never the binder here)
      val untilRef = {
        var x = v0.toLong
        while (x < lim) x = step(x)
        x.toString
      }
      assert(runJq(s".v | until(. >= $lim; . * $a + $b)", v0) == untilRef,
        s"until a=$a b=$b lim=$lim v0=$v0")
      // while: iterates strictly below lim, possibly empty
      val whileRef = {
        val buf = scala.collection.mutable.ArrayBuffer[Long]()
        var x = v0.toLong
        while (x < lim && buf.length <= 64) { buf += x; x = step(x) }
        buf.mkString("[", ",", "]")
      }
      assert(runJq(s"[.v | while(. < $lim; . * $a + $b)]", v0) == whileRef,
        s"while a=$a b=$b lim=$lim v0=$v0")
    }
  }

  test("jq value-position generators match a reference on random arrays (r8)") {
    // [.xs[] | a·x + b], first/limit over mapped generators, and object
    // values collecting a generator — cross-checked against plain Scala
    // map/take on random int arrays
    lazy val spark = Sessions.builder("4").getOrCreate()
    import org.apache.spark.sql.functions._
    import graft.model.Envelope
    import graft.blobl.JqProc
    val rnd = new scala.util.Random(314159)
    def runJq(q: String, xs: scala.Seq[Int]): String = {
      import spark.implicits._
      val df = spark.read.json(
        spark.createDataset(scala.Seq(s"""{"xs":${xs.mkString("[", ",", "]")}}""")))
      val out = JqProc(q)(Envelope.wrapUnordered(df))
      val docCol = out.schema(Envelope.Doc).dataType match {
        case _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.StructType => to_json(col(Envelope.Doc))
        case _ => col(Envelope.Doc).cast("string")
      }
      out.select(docCol).head().getString(0)
    }
    (1 to 20).foreach { _ =>
      val n = 1 + rnd.nextInt(8)
      val xs = scala.Seq.fill(n)(rnd.nextInt(100))
      val a = 1 + rnd.nextInt(5)
      val b = rnd.nextInt(9)
      val k = 1 + rnd.nextInt(n + 2)
      val mapped = xs.map(x => a * x + b)
      assert(runJq(s"[.xs[] | . * $a + $b]", xs) ==
        mapped.mkString("[", ",", "]"), s"collect a=$a b=$b xs=$xs")
      assert(runJq(s"first(.xs[] | . * $a + $b)", xs) ==
        mapped.head.toString, s"first a=$a b=$b xs=$xs")
      assert(runJq(s"limit($k; .xs[] | . + $b)", xs) ==
        xs.map(_ + b).take(k).mkString("[", ",", "]"), s"limit k=$k xs=$xs")
      assert(runJq(s"{m: [.xs[] | . * $a], n: (.xs | length)}", xs) ==
        s"""{"m":${xs.map(_ * a).mkString("[", ",", "]")},"n":$n}""",
        s"object a=$a xs=$xs")
    }
  }

  test("jq explode forms match a reference on random nested docs (r9)") {
    // Root refs beside a bare generator, two-generator cartesians,
    // later-stage generators, and select under explode — cross-checked
    // against plain Scala for-comprehensions on random nested docs.
    lazy val spark = Sessions.builder("4").getOrCreate()
    import org.apache.spark.sql.functions._
    import graft.model.Envelope
    import graft.blobl.JqProc
    val rnd = new scala.util.Random(2718281)
    def runRows(q: String, doc: String): scala.Seq[String] = {
      import spark.implicits._
      val df = spark.read.json(spark.createDataset(scala.Seq(doc)))
      val out = JqProc(q)(Envelope.wrapUnordered(df))
      val docCol = out.schema(Envelope.Doc).dataType match {
        case _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.StructType |
             org.apache.spark.sql.types.VariantType =>
          to_json(col(Envelope.Doc))
        case _ => col(Envelope.Doc).cast("string")
      }
      out.orderBy(col(Envelope.Seq)).select(docCol)
        .collect().toIndexedSeq.map(_.getString(0))
    }
    (1 to 15).foreach { _ =>
      val nx = 1 + rnd.nextInt(5)
      val ny = 1 + rnd.nextInt(4)
      val xs = scala.Seq.fill(nx)(rnd.nextInt(50))
      val ys = scala.Seq.fill(ny)(rnd.nextInt(50))
      val nv = rnd.nextInt(100)
      val c = 1 + rnd.nextInt(40)
      val doc =
        s"""{"xs":${xs.mkString("[", ",", "]")},"ys":${ys
          .mkString("[", ",", "]")},"n":$nv}"""
      // root ref beside a generator
      assert(runRows("{a: .xs[], b: .n}", doc) ==
        xs.map(x => s"""{"a":$x,"b":$nv}"""), s"rootref $doc")
      // generator + root arithmetic
      assert(runRows(".xs[] + .n", doc) ==
        xs.map(x => (x + nv).toString), s"rootarith $doc")
      // cartesian: first generator varies slowest
      assert(runRows("{a: .xs[], b: .ys[]}", doc) ==
        (for (x <- xs; y <- ys) yield s"""{"a":$x,"b":$y}"""), s"cart $doc")
      // select drops, never nulls, under explode and collection
      assert(runRows(s"[.xs[] | select(. > $c)]", doc) ==
        scala.Seq(xs.filter(_ > c).mkString("[", ",", "]")), s"sel $doc")
      // later-stage generator over a nested doc
      val nested =
        s"""{"zs":[${xs.map(x => s"""{"ws":${ys.map(_ + x)
          .mkString("[", ",", "]")}}""").mkString(",")}]}"""
      assert(runRows(".zs[] | .ws[]", nested) ==
        (for (x <- xs; y <- ys) yield (y + x).toString), s"late $nested")
    }
  }

  test("jq walk and user defs match a reference on random nested docs (r9)") {
    // walk(f)'s static type-dispatch folding and def inlining,
    // cross-checked against a recursive Scala transform on random
    // {strings, numbers, nested object, number array} docs. JSON
    // inference sorts keys, so the reference renders sorted too.
    lazy val spark = Sessions.builder("4").getOrCreate()
    import org.apache.spark.sql.functions._
    import graft.model.Envelope
    import graft.blobl.JqProc
    val rnd = new scala.util.Random(1618033)
    def runOne(q: String, doc: String): String = {
      import spark.implicits._
      val df = spark.read.json(spark.createDataset(scala.Seq(doc)))
      val out = JqProc(q)(Envelope.wrapUnordered(df))
      val docCol = out.schema(Envelope.Doc).dataType match {
        case _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.StructType =>
          to_json(col(Envelope.Doc))
        case _ => col(Envelope.Doc).cast("string")
      }
      out.select(docCol).head().getString(0)
    }
    def word(): String = scala.Seq.fill(2 + rnd.nextInt(5))(
      ('a' + rnd.nextInt(26)).toChar).mkString
    (1 to 15).foreach { _ =>
      val s1 = word(); val s2 = word()
      val n1 = rnd.nextInt(90); val n2 = rnd.nextInt(90)
      val xs = scala.Seq.fill(1 + rnd.nextInt(4))(rnd.nextInt(50))
      val a = 1 + rnd.nextInt(5); val b = rnd.nextInt(9)
      val doc = s"""{"s":"$s1","n":$n1,"o":{"t":"$s2","m":$n2},""" +
        s""""xs":${xs.mkString("[", ",", "]")}}"""
      // walk uppercases every string at every depth
      assert(runOne(
        """walk(if type == "string" then ascii_upcase else . end)""",
        doc) ==
        s"""{"n":$n1,"o":{"m":$n2,"t":"${s2.toUpperCase}"},""" +
          s""""s":"${s1.toUpperCase}","xs":${xs.mkString("[", ",", "]")}}""",
        s"walk-str $doc")
      // walk maps every number, incl. array elements, at every depth
      assert(runOne(
        s"""walk(if type == "number" then . * $a + $b else . end)""",
        doc) ==
        s"""{"n":${n1 * a + b},"o":{"m":${n2 * a + b},"t":"$s2"},""" +
          s""""s":"$s1","xs":${xs.map(_ * a + b)
            .mkString("[", ",", "]")}}""",
        s"walk-num a=$a b=$b $doc")
      // def inlining: zero-arity, filter param over a generator, $ param
      assert(runOne(s"def f: . * $a + $b; .n | f", doc) ==
        (n1 * a + b).toString, s"def0 $doc")
      assert(runOne(s"def m(g): [.xs[] | g]; m(. + $b)", doc) ==
        xs.map(_ + b).mkString("[", ",", "]"), s"defg $doc")
      assert(runOne(s"def p($$v): $$v * $a; p(.o.m) + p(.n)", doc) ==
        (n2 * a + n1 * a).toString, s"defv $doc")
    }
  }

  test("deeply nested expressions fail gracefully, not with stack overflow") {
    // kilo-deep parens/paths — a recursive-descent parser either parses
    // them or reports a bounded error
    val deep = "root = " + ("(" * 2000) + "this.a" + (")" * 2000)
    assert(compiles(deep))
    val deepPath = "root = this" + (".a" * 3000)
    assert(compiles(deepPath))
  }

  test("jq self-recursive defs match a reference on random affine recursions (r9)") {
    // def f: if . >= L then . else . * a + b | f end — the bounded
    // BFS unfolding cross-checked against direct Scala iteration, with
    // random (a, b, L, v0); depths past the 16-level cap must land on
    // the error channel, never a wrong value. Also a randomized
    // two-param variant (value + filter params through recursion).
    lazy val spark = Sessions.builder("4").getOrCreate()
    import org.apache.spark.sql.functions._
    import graft.model.Envelope
    import graft.blobl.JqProc
    val rnd = new scala.util.Random(161803)
    def runJq(q: String, v: Long): String = {
      import spark.implicits._
      val df = spark.read.json(spark.createDataset(scala.Seq(s"""{"v":$v}""")))
      val out = JqProc(q)(Envelope.wrapUnordered(df))
      val r = out.select(col(Envelope.Doc).cast("string"),
        col(Envelope.Error)).head()
      if (!r.isNullAt(1)) "ERR" else r.getString(0)
    }
    (1 to 20).foreach { _ =>
      val a = 2 + rnd.nextInt(3) // 2..4
      val b = rnd.nextInt(5)
      val lim = 10 + rnd.nextInt(100000)
      val v0 = 1 + rnd.nextInt(20)
      val ref = {
        var x = v0.toLong
        var depth = 0
        while (x < lim && depth <= 16) { x = a * x + b; depth += 1 }
        if (depth > 16) "ERR" else x.toString
      }
      assert(runJq(
        s"def f: if . >= $lim then . else . * $a + $b | f end; .v | f",
        v0) == ref, s"selfrec a=$a b=$b lim=$lim v0=$v0")
      // countdown with a $-value param and a filter param: sum of
      // g(v0), g(v0-1), …, g(1) where g(x) = x * a
      val n0 = 1 + rnd.nextInt(14)
      val sumRef = (1 to n0).map(_.toLong * a).sum.toString
      assert(runJq(
        s"def s(g; $$n): if $$n <= 0 then 0 else ($$n | g) + s(g; $$n - 1) end; " +
          s"s(. * $a; $n0)", n0) == sumRef,
        s"paramrec a=$a n0=$n0")
    }
  }
}
