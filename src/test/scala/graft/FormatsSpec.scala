package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.blobl.Mapping
import graft.model.Envelope
import graft.ops._
import graft.ops.{BatchOps => B, ErrorOps => E}

class FormatsSpec extends AnyFunSuite {
  lazy val spark = Sessions.builder("4").getOrCreate()

  def jdf(rows: String*) = {
    import spark.implicits._
    spark.read.json(spark.createDataset(rows))
  }
  def run(mapping: String, rows: String*): List[String] = {
    val out = Mapping.compile(mapping).applyPlain(jdf(rows: _*))
    out.select(to_json(struct(out.columns.map(col).toIndexedSeq: _*))).collect()
      .map(_.getString(0)).toList
  }

  test("parse_yaml to variant") {
    assert(run(
      """root.name = this.y.parse_yaml().name.string()
        |root.n = this.y.parse_yaml().count.number()""".stripMargin,
      """{"y":"name: benthos\ncount: 3"}""")
      == List("""{"name":"benthos","n":3.0}"""))
  }

  test("format_yaml round trip") {
    val got = run("""root.back = this.j.parse_json().string().parse_yaml().k.number()""",
      """{"j":"{\"k\": 7}"}""")
    assert(got == List("""{"back":7.0}"""))
  }

  test("parse_xml: elements, attributes, repeats") {
    val got = run(
      """root.title = this.x.parse_xml().book.title.string()
        |root.id = this.x.parse_xml().book."-id".string()""".stripMargin,
      """{"x":"<book id=\"bk1\"><title>Dune</title></book>"}""")
    assert(got == List("""{"title":"Dune","id":"bk1"}"""))
  }

  test("json_schema flags invalid docs, valid pass") {
    val env = Envelope.wrap(
      jdf("""{"id":1,"name":"ok"}""", """{"id":2}"""), scala.Seq(col("id")))
    val out = E.JsonSchema("""{"required":["name"],"properties":{"id":{"type":"integer"}}}""")(env)
    val errs = out.orderBy("doc.id").select(Envelope.Error).collect().map(r =>
      Option(r.getString(0))).toList
    assert(errs.head.isEmpty && errs(1).exists(_.contains("name")))
  }

  test("json_schema recursive subset: nested props, items, enum, bounds") {
    val schema =
      """{
        |  "type": "object",
        |  "required": ["user"],
        |  "properties": {
        |    "user": {
        |      "type": "object",
        |      "required": ["name"],
        |      "properties": {
        |        "name": {"type": "string", "minLength": 2},
        |        "age": {"type": "integer", "minimum": 0, "maximum": 150},
        |        "role": {"enum": ["admin", "user"]}
        |      }
        |    },
        |    "tags": {"type": "array", "items": {"type": "string"}, "maxItems": 3}
        |  }
        |}""".stripMargin
    def errOf(doc: String): Option[String] = {
      val env = Envelope.wrap(jdf(doc), scala.Seq(col("user")))
      E.JsonSchema(schema)(env).select(Envelope.Error).collect()
        .headOption.flatMap(r => Option(r.getString(0)))
    }
    assert(errOf("""{"user":{"name":"ann","age":33,"role":"admin"},"tags":["a","b"]}""").isEmpty)
    assert(errOf("""{"user":{"name":"a"}}""").exists(_.contains("minLength")))
    assert(errOf("""{"user":{"name":"ann","age":200}}""").exists(_.contains("maximum")))
    assert(errOf("""{"user":{"name":"ann","role":"guest"}}""").exists(_.contains("enum")))
    // (schema-first note: mixed-type ARRAYS coerce at parse, so the type
    // violation is exercised through an object field instead)
    assert(errOf("""{"user":{"name":5}}""").exists(_.contains("expected string")))
    assert(errOf("""{"user":{"age":5,"name":"ok"},"tags":["a","b","c","d"]}""").exists(_.contains("maxItems")))
  }

  test("json_schema $ref, allOf, anyOf, oneOf, not") {
    val schema =
      """{
        |  "definitions": {
        |    "posInt": {"type": "integer", "minimum": 1},
        |    "person": {
        |      "type": "object", "required": ["name"],
        |      "properties": {
        |        "name": {"type": "string"},
        |        "boss": {"$ref": "#/definitions/person"}
        |      }
        |    }
        |  },
        |  "allOf": [
        |    {"required": ["who"]},
        |    {"properties": {"who": {"$ref": "#/definitions/person"}}}
        |  ],
        |  "properties": {
        |    "n": {"anyOf": [{"$ref": "#/definitions/posInt"}, {"type": "string"}]},
        |    "x": {"oneOf": [{"type": "integer"}, {"type": "string"}]},
        |    "tag": {"not": {"enum": ["forbidden"]}}
        |  }
        |}""".stripMargin
    def errOf(doc: String): Option[String] = {
      val df = jdf(doc)
      val env = Envelope.wrap(df, scala.Seq(col(df.columns.head)))
      E.JsonSchema(schema)(env).select(Envelope.Error).collect()
        .headOption.flatMap(r => Option(r.getString(0)))
    }
    assert(errOf("""{"who":{"name":"ann","boss":{"name":"zed"}},"n":3,"tag":"ok"}""").isEmpty)
    // recursive $ref applies at depth: boss is a person too
    assert(errOf("""{"who":{"name":"ann","boss":{"nick":"z"}}}""").exists(_.contains("required")))
    assert(errOf("""{"tag":"x"}""").exists(_.contains("required")))
    assert(errOf("""{"who":{"name":"a"},"n":0}""").exists(_.contains("anyOf")))
    assert(errOf("""{"who":{"name":"a"},"tag":"forbidden"}""").exists(_.contains("not")))
  }

  test("archive tar → unarchive tar round trip") {
    val env = Envelope.wrap(jdf(
      """{"id":1,"s":"alpha"}""", """{"id":2,"s":"beta"}"""), scala.Seq(col("id")))
    val pipeline = Pipeline(scala.Seq(
      BloblangProc("root = this.s"),
      B.Archive("tar"),
      B.UnarchiveArchive("tar")))
    val out = pipeline(env)
    val got = out.select(col(Envelope.Content).cast("string"))
      .collect().map(_.getString(0)).toSet
    assert(got == Set("alpha", "beta"))
    assert(out.select(element_at(col(Envelope.Meta), "archive_name")).count() == 2)
  }

  test("archive zip → unarchive zip round trip") {
    val env = Envelope.wrap(jdf(
      """{"id":1,"s":"one"}""", """{"id":2,"s":"two"}"""), scala.Seq(col("id")))
    val out = Pipeline(scala.Seq(
      BloblangProc("root = this.s"),
      B.Archive("zip"),
      B.UnarchiveArchive("zip")))(env)
    assert(out.select(col(Envelope.Content).cast("string"))
      .collect().map(_.getString(0)).toSet == Set("one", "two"))
  }

  test("unarchive json_array / json_map / csv") {
    import graft.ops.BatchOps
    def env(content: String) = Envelope.wrap(jdf("""{"id":1}"""), scala.Seq(col("id")))
      .withColumn(Envelope.Content, lit(content).cast("binary"))

    val arr = BatchOps.UnarchiveParts("json_array")(
      env("""[{"a":1},"two",3]"""))
    assert(arr.orderBy(Envelope.Seq).select(col(Envelope.Content).cast("string"))
      .collect().map(_.getString(0)).toList == List("""{"a":1}""", "\"two\"", "3"))

    val m = BatchOps.UnarchiveParts("json_map")(
      env("""{"b":{"x":1},"a":"one"}"""))
    val rows = m.orderBy(Envelope.Seq).select(
      col(Envelope.Content).cast("string"), col(Envelope.Meta)).collect()
    assert(rows.map(_.getString(0)).toList == List("\"one\"", """{"x":1}"""))
    assert(rows.map(_.getMap[String, String](1).get("archive_key").get).toList ==
      List("a", "b"))

    val csv = BatchOps.UnarchiveParts("csv")(
      env("name,color\nfoo,\"blue, dark\"\nbar,red"))
    assert(csv.orderBy(Envelope.Seq).select(col(Envelope.Content).cast("string"))
      .collect().map(_.getString(0)).toList ==
      List("""{"name":"foo","color":"blue, dark"}""", """{"name":"bar","color":"red"}"""))
  }

  test("archive binary → unarchive binary round trip (length-prefixed)") {
    val env = Envelope.wrap(jdf(
      """{"id":1,"s":"alpha"}""", """{"id":2,"s":""}""", """{"id":3,"s":"gamma"}"""),
      scala.Seq(col("id")))
    val out = Pipeline(scala.Seq(
      BloblangProc("root = this.s"),
      B.Archive("binary"),
      B.UnarchiveParts("binary")))(env)
    assert(out.orderBy(Envelope.Seq).select(col(Envelope.Content).cast("string"))
      .collect().map(_.getString(0)).toList == List("alpha", "", "gamma"))
  }
}
