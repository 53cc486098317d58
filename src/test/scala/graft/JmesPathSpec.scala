package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.blobl.JmesPathProc
import graft.model.Envelope

class JmesPathSpec extends AnyFunSuite {
  lazy val spark = Sessions.builder("4").getOrCreate()

  def jdf(rows: String*) = {
    import spark.implicits._
    spark.read.json(spark.createDataset(rows))
  }

  def run(query: String, row: String): String = {
    val env = Envelope.wrapUnordered(jdf(row))
    val out = JmesPathProc(query)(env)
    val doc = out.schema(Envelope.Doc).dataType
    out.select(doc match {
      case _: org.apache.spark.sql.types.StructType |
           _: org.apache.spark.sql.types.ArrayType => to_json(col(Envelope.Doc))
      case _ => col(Envelope.Doc).cast("string")
    }).head().getString(0)
  }

  test("reference TestJMESPath vectors: types preserved through extraction") {
    // lib/processor/jmespath_test.go:130-178
    assert(run("foo.bar", """{"foo":{"bar":{"baz":1}}}""") == """{"baz":1}""")
    assert(run("foo.bar", """{"foo":{"bar":["baz","qux"]}}""")
      == """["baz","qux"]""")
    assert(run("foo.bar", """{"foo":{"bar":"hello world"}}""") == "hello world")
    assert(run("foo.bar", """{"foo":{"bar":0.123}}""") == "0.123")
    assert(run("foo.bar", """{"foo":{"bar":123}}""") == "123")
    assert(run("foo.bar", """{"foo":{"bar":true}}""") == "true")
    // "addition int": sum([foo.bar, `6`])
    assert(run("sum([foo.bar, `6`])", """{"foo":{"bar":123}}""") == "129")
  }

  test("dotted path + index") {
    assert(run("a.b[0].c", """{"a":{"b":[{"c":42},{"c":7}]}}""") == "42")
  }

  test("wildcard projection") {
    assert(run("people[*].name",
      """{"people":[{"name":"ann"},{"name":"bo"}]}""") == """["ann","bo"]""")
  }

  test("filter projection") {
    assert(run("people[?age > `30`].name | sort(@)",
      """{"people":[{"name":"c","age":40},{"name":"a","age":20},{"name":"b","age":35}]}""")
      == """["b","c"]""")
  }

  test("pipe + functions") {
    assert(run("length(people)", """{"people":[{"n":1},{"n":2}]}""") == "2")
    assert(run("join(', ', tags)", """{"tags":["x","y"]}""") == "x, y")
    assert(run("max(nums)", """{"nums":[3,9,4]}""") == "9")
  }

  test("comparison and boolean logic") {
    assert(run("a > `5` && b == 'x'", """{"a":10,"b":"x"}""") == "true")
  }

  test("functions: type, not_null, avg, merge") {
    assert(run("type(a)", """{"a":[1,2]}""") == "array")
    assert(run("not_null(missing, a)", """{"a":"v"}""") == "v")
    assert(run("avg(xs)", """{"xs":[2,4,6]}""") == "4.0")
    assert(run("merge(a, b)", """{"a":{"x":1},"b":{"y":2}}""")
      == """{"x":1,"y":2}""")
    assert(run("to_array(a)", """{"a":[1,2]}""") == "[1,2]")
    assert(run("to_array(a)", """{"a":5}""") == "[5]")
  }

  test("expression references: sort_by, min_by, max_by, map") {
    assert(run("sort_by(xs, &v)", """{"xs":[{"v":3},{"v":1},{"v":2}]}""")
      == """[{"v":1},{"v":2},{"v":3}]""")
    assert(run("min_by(xs, &v)", """{"xs":[{"v":3},{"v":1},{"v":2}]}""")
      == """{"v":1}""")
    assert(run("max_by(xs, &v)", """{"xs":[{"v":3},{"v":1},{"v":2}]}""")
      == """{"v":3}""")
    assert(run("map(&v, xs)", """{"xs":[{"v":3},{"v":1}]}""") == "[3,1]")
  }

  test("flatten projection, slices, negation, quoted idents, object projection") {
    // `[]` flattens one level then projects
    assert(run("xs[].v", """{"xs":[[{"v":1},{"v":2}],[{"v":3}]]}""")
      == "[1,2,3]")
    // slices with negative and open bounds
    assert(run("xs[1:3]", """{"xs":[10,20,30,40]}""") == "[20,30]")
    assert(run("xs[:2]", """{"xs":[10,20,30]}""") == "[10,20]")
    assert(run("xs[-2:]", """{"xs":[10,20,30]}""") == "[20,30]")
    // `!` negation
    assert(run("!(a > `5`)", """{"a":10}""") == "false")
    assert(run("!b", """{"b":false}""") == "true")
    // quoted identifiers at root and as segments
    assert(run("\"odd name\"", """{"odd name":7}""") == "7")
    assert(run("a.\"b c\"", """{"a":{"b c":8}}""") == "8")
    // object projection `.*`
    assert(run("m.*.v | sort(@)", """{"m":{"a":{"v":2},"b":{"v":1}}}""")
      == "[1,2]")
  }

  test("filter and slice projections continue across segments (spec §projections)") {
    // filter creates a projection: trailing segments apply per element
    assert(run("xs[?v > `1`].name.first",
      """{"xs":[{"v":1,"name":{"first":"a"}},{"v":2,"name":{"first":"b"}},{"v":3,"name":{"first":"c"}}]}""")
      == """["b","c"]""")
    // slice creates a projection too
    assert(run("xs[1:3].v", """{"xs":[{"v":1},{"v":2},{"v":3},{"v":4}]}""")
      == "[2,3]")
    // quoted keys in multi-select hashes
    assert(run("""{"the key": a}""", """{"a":5}""") == """{"the key":5}""")
  }

  test("slices on STRING values keep Bloblang substr semantics") {
    // the projection marker is parse-time only: when no segment consumes
    // it, a slice must still compile for strings (substr), not force an
    // array transform
    assert(run("name[0:2]", """{"name":"abcdef"}""") == "ab")
    assert(run("name[2:]", """{"name":"abcdef"}""") == "cdef")
    assert(run("name[-2:]", """{"name":"abcdef"}""") == "ef")
  }

  test("reference doc example: cities query (lib/processor/jmespath.go)") {
    assert(run(
      """locations[?state == 'WA'].name | sort(@) | {Cities: join(', ', @)}""",
      """{"locations":[{"name":"Seattle","state":"WA"},{"name":"New York","state":"NY"},{"name":"Bellevue","state":"WA"},{"name":"Olympia","state":"WA"}]}""")
      == """{"Cities":"Bellevue, Olympia, Seattle"}""")
  }
}
