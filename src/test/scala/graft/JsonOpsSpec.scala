package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Envelope
import graft.ops.JsonProc

/** The deprecated v3 `json` operator processor (`lib/processor/json.go`)
  * — operator semantics pinned against the reference implementation,
  * plus the registry-parity batch: csv/subprocess/tcp inputs, the
  * `batch` re-batcher, the bounds_check condition, and the
  * sync_response / dynamic / http_server output sinks. */
class JsonOpsSpec extends AnyFunSuite {
  lazy val spark = Sessions.builder("4").getOrCreate()

  def env(rows: String*) = {
    import spark.implicits._
    Envelope.wrapUnordered(spark.read.json(spark.createDataset(rows)))
  }

  def run(p: JsonProc, row: String): String = {
    val out = p(env(row))
    out.schema(Envelope.Doc).dataType match {
      case _: org.apache.spark.sql.types.StructType |
          _: org.apache.spark.sql.types.ArrayType |
          _: org.apache.spark.sql.types.MapType |
          org.apache.spark.sql.types.VariantType =>
        out.select(to_json(col(Envelope.Doc))).head().getString(0)
      case org.apache.spark.sql.types.StringType =>
        "\"" + out.select(col(Envelope.Doc)).head().getString(0) + "\""
      case _ =>
        out.select(col(Envelope.Doc).cast("string")).head().getString(0)
    }
  }

  test("set / delete / select / copy / move") {
    assert(run(JsonProc("set", "a.b", Some(5)), """{"a":{"b":1},"c":2}""")
      == """{"a":{"b":5},"c":2}""")
    assert(run(JsonProc("set", "", Some("done")), """{"a":1}""") == "\"done\"")
    assert(run(JsonProc("delete", "a.b"), """{"a":{"b":1,"k":3},"c":2}""")
      == """{"a":{"k":3},"c":2}""")
    assert(run(JsonProc("select", "a"), """{"a":{"b":1},"c":2}""")
      == """{"b":1}""")
    assert(run(JsonProc("copy", "a", Some("d")), """{"a":7,"c":2}""")
      == """{"a":7,"c":2,"d":7}""")
    assert(run(JsonProc("move", "a", Some("d")), """{"a":7,"c":2}""")
      == """{"c":2,"d":7}""")
  }

  test("set: control characters in values and odd path segments survive") {
    // newline/tab/quote/raw-control value: litOf must emit a valid
    // mapping and the value must round-trip exactly
    assert(run(JsonProc("set", "a", Some("l1\nl2\t\"q\"\u0001")), """{"a":"x"}""")
      == "{\"a\":\"l1\\nl2\\t\\\"q\\\"\\u0001\"}")
    // a path segment that is not a plain identifier quotes, not breaks
    assert(run(JsonProc("set", "a b", Some(3)), """{"a b":1,"c":2}""")
      == """{"a b":3,"c":2}""")
    assert(run(JsonProc("select", "a b"), """{"a b":9}""") == "9")
  }

  test("split / fold_number_array / fold_string_array / flatten_array") {
    assert(run(JsonProc("split", "s", Some(",")), """{"s":"a,b,c"}""")
      == """{"s":["a","b","c"]}""")
    assert(run(JsonProc("fold_number_array", "xs"), """{"xs":[1,2,3]}""")
      == """{"xs":6}""")
    assert(run(JsonProc("fold_string_array", "ws", Some("-")),
      """{"ws":["a","b"]}""") == """{"ws":"a-b"}""")
    assert(run(JsonProc("flatten_array", "xs"), """{"xs":[[1,2],[3]]}""")
      == """{"xs":[1,2,3]}""")
  }

  test("append: array extends, scalar prepends, absent takes values") {
    assert(run(JsonProc("append", "xs", Some(java.util.List.of(4, 5))),
      """{"xs":[1,2]}""") == """{"xs":[1,2,4,5]}""")
    assert(run(JsonProc("append", "x", Some(9)), """{"x":1}""")
      == """{"x":[1,9]}""")
    assert(run(JsonProc("append", "nope", Some(9)), """{"x":1}""")
      == """{"x":1,"nope":[9]}""") // new fields append after existing
  }

  test("explode: one document copy per array element / object value") {
    assert(run(JsonProc("explode", "xs"), """{"k":"v","xs":[1,2]}""")
      == """[{"k":"v","xs":1},{"k":"v","xs":2}]""")
  }

  test("flatten: dot-joined leaf paths, scalar-array elements indexed") {
    assert(run(JsonProc("flatten", ""), """{"a":{"b":1,"c":"x"},"d":2}""")
      == """{"a.b":1,"a.c":"x","d":2}""")
    assert(run(JsonProc("flatten", ""), """{"a":{"ns":[7,8]},"d":2}""")
      == """{"a.ns.0":7,"a.ns.1":8,"d":2}""")
  }

  test("clean: empty strings/arrays/objects drop recursively") {
    // emptied values null out; the JSON renderer omits nulls
    assert(run(JsonProc("clean", ""),
      """{"a":"","b":[ "", "x" ],"c":{"d":""},"e":1}""")
      == """{"b":["x"],"e":1}""")
  }

  test("config wiring: json + batch processors, bounds_check condition") {
    import java.nio.file.Files
    val out = Files.createTempDirectory("graft-jsonop").toString + "/out"
    val spec = graft.runtime.Config.load(
      s"""input:
         |  generate:
         |    count: 6
         |    mapping: |
         |      root.i = this.i
         |      root.s = "v" + this.i.string()
         |pipeline:
         |  processors:
         |    - json:
         |        operator: set
         |        path: tag
         |        value: ok
         |    - batch:
         |        count: 3
         |    - filter:
         |        bounds_check:
         |          min_part_size: 1
         |          max_part_size: 10000
         |output:
         |  file:
         |    path: $out
         |    codec: lines
         |""".stripMargin)
    spec.run(spark)
    val lines = spark.read.text(out).collect().map(_.getString(0))
    assert(lines.length == 6)
    assert(lines.forall(_.contains("\"tag\":\"ok\"")))
  }

  test("csv + subprocess inputs (registry-parity batch)") {
    import java.nio.file.Files
    val csv = Files.createTempDirectory("graft-csvin").toString + "/d.csv"
    java.nio.file.Files.write(java.nio.file.Paths.get(csv),
      "a,b\n1,x\n2,y\n".getBytes("UTF-8"))
    val out = Files.createTempDirectory("graft-csvin").toString + "/out"
    graft.runtime.Config.load(
      s"""input:
         |  csv:
         |    paths: [ $csv ]
         |pipeline:
         |  processors:
         |    - bloblang: root.ab = this.a.string() + this.b
         |output:
         |  file:
         |    path: $out
         |    codec: lines
         |""".stripMargin).run(spark)
    val got = spark.read.text(out).collect().map(_.getString(0)).sorted
    assert(got.toList == List("""{"ab":"1x"}""", """{"ab":"2y"}"""))

    val src = graft.sources.Sources.subprocess(spark,
      scala.Seq("printf", "l1\\nl2\\n"))
    assert(src.count() == 2)
  }

  test("sync_response / dynamic / http_server output sinks") {
    val df = env("""{"m":"hello"}""")
    graft.sinks.Sinks.RoundtripStore.drain()
    graft.sinks.Sinks.SyncResponseSink().write(df)
    val got = graft.sinks.Sinks.RoundtripStore.drain()
    assert(got.exists(_.contains("hello")))

    val captured = scala.collection.mutable.ListBuffer[Long]()
    graft.sinks.Sinks.DynamicOutputs.set("t1", new graft.sinks.Sink {
      def write(d: org.apache.spark.sql.DataFrame): Unit =
        captured += d.count()
    })
    graft.sinks.Sinks.DynamicSink().write(df)
    graft.sinks.Sinks.DynamicOutputs.remove("t1")
    assert(captured.toList == List(1L))

    val hs = graft.sinks.Sinks.HttpServeSink("/jtest", "/jtest/stream")
    hs.write(df)
    assert(graft.sinks.Sinks.HttpServe.pop("/jtest").exists(_.contains("hello")))
    assert(graft.sinks.Sinks.HttpServe.pop("/jtest").isEmpty)
  }
}
