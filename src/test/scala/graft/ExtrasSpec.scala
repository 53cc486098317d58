package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.blobl.{Interpolation, Mapping}
import graft.model.Envelope
import graft.ops._
import graft.ops.{FlowOps => F}

/** Codecs, hmac/aes, parse_csv, interpolation, throw(), workflow auto-
  * ordering, metric observe. */
class ExtrasSpec extends AnyFunSuite {
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

  test("compress/decompress round-trips for all algorithms") {
    for (alg <- scala.Seq("gzip", "zlib", "flate", "snappy", "lz4")) {
      val got = run(
        s"""root.out = this.s.compress("$alg").decompress("$alg").string()""",
        """{"s":"hello compression world hello compression world"}""")
      assert(got == List("""{"out":"hello compression world hello compression world"}"""), alg)
    }
  }

  test("hmac_sha256 known vector") {
    // echo -n "message" | openssl dgst -sha256 -hmac "key"
    val got = run("""root.h = this.s.hash("hmac_sha256", "key")""",
      """{"s":"message"}""")
    assert(got == List(
      """{"h":"6e9ef29b75fffc5b7abae527d58fdadb2fe42e7219011976917343065f58ed4a"}"""))
  }

  test("aes cbc round trip") {
    val got = run(
      """root.out = this.s.encrypt_aes("0123456789abcdef", "cbc").decrypt_aes("0123456789abcdef", "cbc").string()""",
      """{"s":"secret payload"}""")
    assert(got == List("""{"out":"secret payload"}"""))
  }

  test("parse_csv to row objects") {
    val got = run(
      """root.rows = this.csv.parse_csv()
        |root.first_b = this.csv.parse_csv().index(0).b""".stripMargin,
      """{"csv":"a,b,c\n1,2,3\n4,5,6"}""")
    assert(got == List(
      """{"rows":[{"a":"1","b":"2","c":"3"},{"a":"4","b":"5","c":"6"}],"first_b":"2"}"""))
  }

  test("throw() flags _error and the row keeps flowing") {
    val env = Envelope.wrap(jdf("""{"id":1,"v":5}""", """{"id":2,"v":-1}"""), scala.Seq(col("id")))
    val out = BloblangProc(
      """root.id = this.id
        |root.v = if this.v < 0 { throw("negative value") } else { this.v }""".stripMargin)(env)
    val rows = out.select(col("doc.id"), col("doc.v"), col(Envelope.Error))
      .orderBy("doc.id").collect().toList
    assert(rows.map(_.getLong(0)) == List(1L, 2L))
    assert(rows(0).isNullAt(2) && rows(1).getString(2) == "negative value")
    assert(rows(1).isNullAt(1)) // throw branch yields null value
  }

  test("interpolation template compiles to one column") {
    val env = Envelope.wrap(jdf("""{"user":"ann","n":3}"""), scala.Seq(col("user")))
    val c = Interpolation.column(env, "out/${! this.user.uppercase() }/part-${! this.n + 1 }")
    assert(env.select(c).head().getString(0) == "out/ANN/part-4")
    assert(Interpolation.isStatic("plain/path") && !Interpolation.isStatic("${! this.x }"))
  }

  test("workflow auto-orders branches by read/write targets") {
    // b2 reads doc.x which b1 writes; b3 independent
    val b1 = F.Branch("root.a = this.a",
      scala.Seq(BloblangProc("root.r = this.a * 2")), scala.Seq("r" -> "x"))
    val b2 = F.Branch("root.x = this.x",
      scala.Seq(BloblangProc("root.r = this.x + 1")), scala.Seq("r" -> "y"))
    val b3 = F.Branch("root.a = this.a",
      scala.Seq(BloblangProc("root.r = this.a - 1")), scala.Seq("r" -> "z"))
    val wf = F.Workflow.auto(scala.Seq(b2, b1, b3)) // shuffled input order
    assert(wf.layers.head.toSet == Set(b1, b3) && wf.layers(1) == scala.Seq(b2))
    val env = Envelope.wrap(jdf("""{"a":10}"""), scala.Seq(col("a")))
    val out = Envelope.unwrap(wf(env)).select("x", "y", "z").head()
    assert((out.getLong(0), out.getLong(1), out.getLong(2)) == ((20L, 21L, 9L)))
  }

  test("metric observe accumulates during the action") {
    val obs = org.apache.spark.sql.Observation("m1")
    val env = Envelope.wrap(jdf("""{"v":1}""", """{"v":2}""", """{"v":3}"""), scala.Seq(col("v")))
    MetricProc(obs, scala.Seq(count(lit(1)).as("n"), sum(col("doc.v")).as("total")))(env)
      .write.format("noop").mode("overwrite").save()
    assert(obs.get("n") == 3L && obs.get("total") == 6L)
  }

  test("deep merge recurses into nested structs") {
    assert(run(
      """root.m = this.a.merge(this.b)""",
      """{"a":{"x":1,"nest":{"p":1,"q":2}},"b":{"y":9,"nest":{"q":3,"r":4}}}""")
      == List("""{"m":{"x":1,"nest":{"p":1,"q":[2,3],"r":4},"y":9}}"""))
  }

  test("collapse flattens to dot-path map") {
    assert(run("""root.flat = this.o.collapse()""",
      """{"o":{"a":{"b":1,"c":"z"},"d":true}}""")
      == List("""{"flat":{"a.b":"1","a.c":"z","d":"true"}}"""))
  }

  test("count() numbers rows in order") {
    val env = Envelope.wrap(jdf("""{"v":"a"}""","""{"v":"b"}""","""{"v":"c"}"""), scala.Seq(col("v")))
    val out = BloblangProc("root.v = this.v\nroot.n = count(\"c\")")(env)
    assert(Envelope.unwrap(out).orderBy("v").collect().map(_.getLong(1)).toList == List(1L, 2L, 3L))
  }

  test("branch inlines pure-mapping children: no join in plan") {
    val b = F.Branch("root.a = this.a",
      scala.Seq(BloblangProc("root.r = this.a * 3")), scala.Seq("r" -> "tripled"))
    val env = Envelope.wrap(jdf("""{"a":7}"""), scala.Seq(col("a")))
    val out = b(env)
    assert(Envelope.unwrap(out).select("tripled").head().getLong(0) == 21L)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"expected no join:\n$plan")
  }

  test("parse_duration: compound Go durations via native expression") {
    assert(run(
      """root.a = this.d1.parse_duration()
        |root.b = this.d2.parse_duration()
        |root.c = this.d3.parse_duration()
        |root.bad = this.d4.parse_duration()""".stripMargin,
      """{"d1":"1h2m3s","d2":"-300ms","d3":"1.5s","d4":"nope"}""")
      == List("""{"a":3723000000000,"b":-300000000,"c":1500000000}"""))
  }

  test("ascii85 and z85 round trips; z85 known vector") {
    assert(run(
      """root.a = this.s.encode("ascii85").decode("ascii85").string()""",
      """{"s":"some binary-ish payload"}""")
      == List("""{"a":"some binary-ish payload"}"""))
    // Z85 spec test vector: 0x86 0x4F 0xD2 0x6F 0xB5 0x59 0xF7 0x5B -> "HelloWorld"
    assert(run(
      """root.z = this.h.decode("hex").encode("z85")""",
      """{"h":"864fd26fb559f75b"}""")
      == List("""{"z":"HelloWorld"}"""))
  }
}
