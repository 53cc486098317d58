package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Envelope
import graft.ops.FilterProc
import graft.runtime.Conditions

/** Structured v3 YAML condition tree → Bloblang checks
  * (`lib/condition/constructor.go`), evaluated end-to-end through
  * FilterProc over envelope rows. */
class ConditionsSpec extends AnyFunSuite {
  lazy val spark = Sessions.builder("4").getOrCreate()

  def jm(pairs: (String, Any)*): java.util.Map[String, Any] = {
    val m = new java.util.LinkedHashMap[String, Any]()
    pairs.foreach { case (k, v) => m.put(k, v) }
    m
  }
  def jl(items: Any*): java.util.List[Any] = {
    val l = new java.util.ArrayList[Any]()
    items.foreach(l.add)
    l
  }

  /** Rows kept by the compiled condition, by doc text. */
  def keep(cond: Any, rows: String*): scala.Seq[String] = {
    import spark.implicits._
    val env = Envelope.wrapUnordered(
      spark.read.json(spark.createDataset(rows)))
    FilterProc(Conditions.compile(cond))(env)
      .select(to_json(col(Envelope.Doc))).as[String].collect().sorted.toSeq
  }

  test("text operators") {
    val rows = scala.Seq("""{"s":"Hello World"}""", """{"s":"bye"}""")
    def textOn(op: String, arg: Any) =
      jm("check_field" -> jm("path" -> "s",
        "condition" -> jm("text" -> jm("operator" -> op, "arg" -> arg))))
    assert(keep(textOn("contains", "WORLD"), rows: _*).size == 1)
    assert(keep(textOn("contains_cs", "WORLD"), rows: _*).isEmpty)
    assert(keep(textOn("prefix", "hello"), rows: _*).size == 1)
    assert(keep(textOn("suffix_cs", "bye"), rows: _*).size == 1)
    assert(keep(textOn("equals", "BYE"), rows: _*).size == 1)
    assert(keep(textOn("regexp_partial", "W.rld"), rows: _*).size == 1)
    assert(keep(textOn("regexp_exact", "bye"), rows: _*).size == 1)
    assert(keep(textOn("enum", jl("bye", "other")), rows: _*).size == 1)
    assert(keep(textOn("contains_any", jl("world", "zzz")), rows: _*).size == 1)
  }

  test("number, json, boolean combinators") {
    val rows = scala.Seq("""{"n":5,"tags":["a","b"]}""", """{"n":50,"tags":[]}""")
    val gt = jm("check_field" -> jm("path" -> "n",
      "condition" -> jm("number" -> jm("operator" -> "greater_than", "arg" -> 10))))
    assert(keep(gt, rows: _*).size == 1)
    val json = jm("json" -> jm("operator" -> "contains", "path" -> "tags", "arg" -> "a"))
    assert(keep(json, rows: _*).size == 1)
    val both = jm("and" -> jl(
      jm("json" -> jm("operator" -> "contains", "path" -> "tags", "arg" -> "a")),
      jm("check_field" -> jm("path" -> "n",
        "condition" -> jm("number" -> jm("operator" -> "less_than", "arg" -> 10))))))
    assert(keep(both, rows: _*).size == 1)
    val either = jm("or" -> jl(
      jm("static" -> false),
      jm("json" -> jm("operator" -> "equals", "path" -> "n", "arg" -> 50))))
    assert(keep(either, rows: _*).size == 1)
    val neither = jm("not" -> jm("static" -> true))
    assert(keep(neither, rows: _*).isEmpty)
    // xor: exactly one true
    val x = jm("xor" -> jl(
      jm("json" -> jm("operator" -> "equals", "path" -> "n", "arg" -> 5)),
      jm("json" -> jm("operator" -> "contains", "path" -> "tags", "arg" -> "a"))))
    assert(keep(x, rows: _*).isEmpty) // both true on row1, both false on row2
  }

  test("jmespath condition via printer round-trip") {
    val rows = scala.Seq("""{"a":{"b":7}}""", """{"a":{"b":1}}""")
    assert(keep(jm("jmespath" -> jm("query" -> "a.b > `5`")), rows: _*).size == 1)
    assert(keep(jm("jmespath" -> "a.b == `1`"), rows: _*).size == 1)
  }

  test("check_interpolation and resource") {
    val rows = scala.Seq("""{"id":"x-1"}""", """{"id":"y-2"}""")
    val ci = jm("check_interpolation" -> jm(
      "value" -> "${!this.id}",
      "condition" -> jm("text" -> jm("operator" -> "prefix_cs", "arg" -> "x-"))))
    assert(keep(ci, rows: _*).size == 1)
    Conditions.resources.put("is_x",
      Conditions.compile(jm("text" -> jm("operator" -> "contains", "arg" -> "x"))))
    assert(Conditions.compile(jm("resource" -> "is_x")).nonEmpty)
  }

  /** Raw-content check (the reference vectors act on content bytes). */
  def checkRaw(cond: Any, content: String): Boolean = {
    import spark.implicits._
    val base = scala.Seq((0L, content)).toDF("id", "s")
    val env = Envelope.wrap(base, scala.Seq(col("id")))
      .withColumn(Envelope.Content, col("doc.s").cast("binary"))
    FilterProc(Conditions.compile(cond))(env).count() == 1L
  }

  test("reference text_test.go vectors") {
    def c(op: String, arg: Any) = jm("text" -> jm("operator" -> op, "arg" -> arg))
    // equals_cs pos/neg, equals case-insensitive 3 rows
    assert(checkRaw(c("equals_cs", "foo"), "foo"))
    assert(!checkRaw(c("equals_cs", "foo"), "not foo"))
    assert(checkRaw(c("equals", "fOo"), "foo"))
    assert(checkRaw(c("equals", "foo"), "fOo"))
    assert(!checkRaw(c("equals", "fOo"), "f0o"))
    // contains_cs / contains
    assert(checkRaw(c("contains_cs", "foo"), "hello foo world"))
    assert(!checkRaw(c("contains_cs", "foo"), "hello fOo world"))
    assert(checkRaw(c("contains", "fOo"), "hello foo world"))
    // prefix / suffix
    assert(checkRaw(c("prefix_cs", "foo"), "foo bar"))
    assert(!checkRaw(c("prefix_cs", "foo"), "Foo bar"))
    assert(checkRaw(c("prefix", "fOo"), "foo bar"))
    assert(checkRaw(c("suffix_cs", "bar"), "foo bar"))
    assert(checkRaw(c("suffix", "BAR"), "foo bar"))
    // regexp
    assert(checkRaw(c("regexp_partial", "1[a-z]2"), "hello 1a2 world"))
    assert(!checkRaw(c("regexp_partial", "1[a-z]2"), "hello 12 world"))
    assert(checkRaw(c("regexp_exact", "1[a-z]2"), "1a2"))
    assert(!checkRaw(c("regexp_exact", "1[a-z]2"), "hello 1a2 world"))
    // enum / contains_any
    assert(checkRaw(c("enum", jl("b", "c")), "b"))
    assert(!checkRaw(c("enum", jl("b", "c")), "a"))
    assert(checkRaw(c("contains_any_cs", jl("foo", "bar")), "zzz bar zzz"))
    assert(!checkRaw(c("contains_any_cs", jl("foo", "bar")), "zzz BAR zzz"))
    // is ip
    assert(checkRaw(c("is", "ip"), "10.1.2.3"))
    assert(!checkRaw(c("is", "ip"), "not-an-ip"))
    // number vectors (number_test.go): content parsed as number
    def n(op: String, arg: Any) = jm("number" -> jm("operator" -> op, "arg" -> arg))
    assert(checkRaw(n("equals", 7), "7"))
    assert(checkRaw(n("greater_than", 5), "7.5"))
    assert(!checkRaw(n("less_than", 5), "7"))
  }

  test("json_schema condition keeps only validating docs") {
    val schema =
      """{"type":"object","properties":{"n":{"type":"number"}},"required":["n"]}"""
    // n stays numeric under inference; {"x":2} fails `required: [n]`
    // (a wrong-TYPE n would be schema-merged to string for all rows —
    // the columnar-vs-per-row difference documented in SURVEY §1.3)
    val rows = scala.Seq("""{"n":1}""", """{"x":2}""")
    val kept = keep(jm("json_schema" -> jm("schema" -> schema)), rows: _*)
    assert(kept === scala.Seq("""{"n":1}"""))
  }

  test("config-level: structured condition in a filter processor") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cond").toString
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(dir, "in.jsonl"),
      """{"v":"keep me"}""" + "\n" + """{"v":"drop"}""" + "\n")
    val out = java.nio.file.Files.createTempDirectory("graft-condout").toString + "/res"
    val spec = graft.runtime.Config.load(
      s"""input:
         |  file:
         |    path: $dir/in.jsonl
         |    codec: lines
         |pipeline:
         |  processors:
         |    - filter:
         |        text:
         |          operator: contains
         |          arg: keep
         |output:
         |  file:
         |    path: $out
         |    codec: lines
         |""".stripMargin)
    spec.run(spark)
    val got = spark.read.textFile(out).collect().toSeq
    assert(got.size == 1 && got.head.contains("keep"), got)
  }
}
