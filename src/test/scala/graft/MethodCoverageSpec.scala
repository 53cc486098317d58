package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.blobl.Mapping
import graft.model.Envelope

/** Regression coverage for methods not exercised elsewhere. */
class MethodCoverageSpec extends AnyFunSuite {
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

  test("trim with cutset, trim_prefix, trim_suffix") {
    assert(run(
      """root.a = this.s.trim("!?")
        |root.b = this.s.trim_prefix("!!")
        |root.c = this.s.trim_suffix("??")""".stripMargin,
      """{"s":"!!hello??"}""")
      == List("""{"a":"hello","b":"hello??","c":"!!hello"}"""))
  }

  test("replace_many unrolls pairs") {
    assert(run("""root.out = this.s.replace_many(["<", "&lt;", ">", "&gt;"])""",
      """{"s":"<b>"}""") == List("""{"out":"&lt;b&gt;"}"""))
  }

  test("re_find_object with named groups") {
    // key "0" = the full match, like the reference's doc examples
    assert(run(
      """root.parts = this.s.re_find_object("(?<y>\\d{4})-(?<m>\\d{2})")""",
      """{"s":"on 2024-03 ok"}""")
      == List("""{"parts":{"0":"2024-03","y":"2024","m":"03"}}"""))
  }

  test("parse_timestamp_unix with layout") {
    assert(run(
      """root.u = this.d.parse_timestamp_unix("2006-01-02")""",
      """{"d":"1970-01-03"}""") == List("""{"u":172800}"""))
  }

  test("values key_values map_each_key on maps") {
    val env = Envelope.wrap(jdf("""{"id":1}"""), scala.Seq(col("id")))
    val out = graft.ops.BloblangProc(
      """meta a = "1"
        |meta b = "2"
        |root.vals = root_meta().values().sort()
        |root.keys_up = root_meta().map_each_key(k -> k.uppercase()).keys().sort()""".stripMargin)(env)
    val got = out.select(to_json(col("doc"))).head().getString(0)
    assert(got == """{"vals":["1","2"],"keys_up":["A","B"]}""")
  }

  test("unique and enumerated on strings arrays") {
    assert(run(
      """root.u = this.xs.unique().sort()""",
      """{"xs":["b","a","b","a"]}""") == List("""{"u":["a","b"]}"""))
  }

  test("number/int/bool casts are permissive (null on failure)") {
    assert(run(
      """root.n = this.s.number()
        |root.i = this.s.int()
        |root.bad = this.junk.number()""".stripMargin,
      """{"s":"42.5","junk":"xyz"}""")
      == List("""{"n":42.5,"i":42}""")) // bad → null → omitted from JSON
  }

  test("interpolated dynamic-path sink partitions by value") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dyn").toString
    val env = Envelope.wrap(jdf(
      """{"id":1,"lang":"en","s":"one"}""", """{"id":2,"lang":"de","s":"zwei"}""",
      """{"id":3,"lang":"en","s":"three"}"""), scala.Seq(col("id")))
      .withColumn(Envelope.Content, col("doc.s").cast("binary"))
    graft.sinks.Sinks.InterpolatedFileSink(dir, "lang=${! this.lang }").write(env)
    val en = spark.read.text(s"$dir/__path=lang%3Den").count()
    val de = spark.read.text(s"$dir/__path=lang%3Dde").count()
    assert(en == 2 && de == 1)
  }

  test("interpolated dynamic-path sink: structured (parquet) format") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dynp").toString
    val env = Envelope.wrap(jdf(
      """{"id":1,"lang":"en","s":"one"}""", """{"id":2,"lang":"de","s":"zwei"}"""),
      scala.Seq(col("id")))
    graft.sinks.Sinks.InterpolatedFileSink(dir, "lang=${! this.lang }",
      format = "parquet").write(env)
    val back = spark.read.parquet(dir)
    assert(back.count() == 2)
    assert(back.columns.contains("__path") && back.columns.contains("s"))
    assert(back.filter(col("__path") === "lang=en")
      .select("s").head().getString(0) == "one")
  }
}
