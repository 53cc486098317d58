package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.exprs.Protobuf
import graft.model.Envelope
import graft.ops.CodecProcs

/** Protobuf codec: wire-format vectors (hand-computed per the public
  * encoding spec), .proto parsing, proto3 JSON mapping, and the processor
  * round trip — shaped after the reference's testing.Person example
  * (`lib/processor/protobuf.go:104-150`). */
class ProtobufSpec extends AnyFunSuite {
  lazy val spark = Sessions.builder("4").getOrCreate()
  import spark.implicits._

  val personProto = Map("person.proto" ->
    """syntax = "proto3";
      |package testing;
      |
      |message Person {
      |  string first_name = 1;
      |  string last_name = 2;
      |  string full_name = 3;
      |  int32 age = 4;
      |  int32 id = 5; // Unique ID number for this person.
      |  string email = 6;
      |}
      |""".stripMargin)

  test("wire vectors: varint + length-delimited (spec examples)") {
    val reg = Protobuf.parseSources(Map("t.proto" ->
      "syntax = \"proto3\"; message Test { string a = 1; int32 b = 2; }"))
    // "hi" in field 1: 0A 02 68 69 ; 150 in field 2: 10 96 01
    val bytes = Protobuf.fromJson("""{"a":"hi","b":150}""", "Test", reg)
    assert(bytes.map(b => f"$b%02x").mkString(" ") == "0a 02 68 69 10 96 01")
    assert(Protobuf.toJson(bytes, "Test", reg) == """{"a":"hi","b":150}""")
  }

  test("proto3 JSON: camelCase, defaults omitted, int64 as string") {
    val reg = Protobuf.parseSources(Map("t.proto" ->
      """syntax = "proto3";
        |message T {
        |  string first_name = 1;
        |  int64 big = 2;
        |  bool flag = 3;
        |  bytes blob = 4;
        |}""".stripMargin))
    val bytes = Protobuf.fromJson(
      """{"firstName":"ann","big":"9007199254740993","flag":false,"blob":"aGk="}""",
      "T", reg)
    val json = Protobuf.toJson(bytes, "T", reg)
    // flag=false is a proto3 default → omitted; int64 survives as string
    assert(json == """{"firstName":"ann","big":"9007199254740993","blob":"aGk="}""")
    // original (snake_case) field names accepted on input
    val bytes2 = Protobuf.fromJson("""{"first_name":"ann"}""", "T", reg)
    assert(Protobuf.toJson(bytes2, "T", reg) == """{"firstName":"ann"}""")
  }

  test("nested messages, repeated packed, enums, maps, zigzag") {
    val reg = Protobuf.parseSources(Map("t.proto" ->
      """syntax = "proto3";
        |package demo;
        |message Inner { sint32 delta = 1; }
        |enum Color { COLOR_UNSET = 0; RED = 1; BLUE = 2; }
        |message Outer {
        |  repeated int32 nums = 1;
        |  Inner inner = 2;
        |  Color color = 3;
        |  map<string, int32> counts = 4;
        |  repeated Inner inners = 5;
        |  oneof choice {
        |    string name = 6;
        |    int32 code = 7;
        |  }
        |}""".stripMargin))
    val json =
      """{"nums":[1,2,300],"inner":{"delta":-5},"color":"BLUE",""" +
        """"counts":{"a":1,"b":2},"inners":[{"delta":1},{"delta":-1}],"name":"x"}"""
    val bytes = Protobuf.fromJson(json, "demo.Outer", reg)
    assert(Protobuf.toJson(bytes, "demo.Outer", reg) == json)
    // zigzag: -5 encodes as varint 9 inside Inner (field 1 → 08 09)
    val inner = Protobuf.fromJson("""{"delta":-5}""", "demo.Inner", reg)
    assert(inner.map(b => f"$b%02x").mkString(" ") == "08 09")
  }

  test("reference Person example round-trips through the processor") {
    val reg = Protobuf.parseSources(personProto)
    val doc = """{"firstName":"caleb","lastName":"quaye","email":"caleb@myspace.com"}"""
    val wire = Protobuf.fromJson(doc, "testing.Person", reg)
    assert(Protobuf.toJson(wire, "testing.Person", reg) == doc)

    // processor pair: from_json → to_json over envelope content
    val env = Envelope.wrap(scala.Seq(1L).toDF("id"), scala.Seq(col("id")))
      .withColumn(Envelope.Content, lit(doc.getBytes("UTF-8")))
    val p1 = CodecProcs.ProtobufProc("from_json", "testing.Person",
      inlineSources = personProto)
    val p2 = CodecProcs.ProtobufProc("to_json", "testing.Person",
      inlineSources = personProto)
    val out = p2(p1(env))
    assert(new String(out.select(Envelope.Content).head()
      .getAs[Array[Byte]](0), "UTF-8") == doc)
  }

  test("unknown fields are skipped on decode") {
    val regFull = Protobuf.parseSources(Map("t.proto" ->
      "syntax = \"proto3\"; message T { string a = 1; int32 b = 2; }"))
    val regOld = Protobuf.parseSources(Map("t.proto" ->
      "syntax = \"proto3\"; message T { int32 b = 2; }"))
    val bytes = Protobuf.fromJson("""{"a":"hi","b":7}""", "T", regFull)
    assert(Protobuf.toJson(bytes, "T", regOld) == """{"b":7}""")
  }
}
