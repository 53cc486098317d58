package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Envelope
import graft.ops._
import graft.ops.{BatchOps => B}
import graft.ops.CodecProcs._

class CodecProcSpec extends AnyFunSuite {
  lazy val spark = Sessions.builder("4").getOrCreate()

  def jdf(rows: String*) = {
    import spark.implicits._
    spark.read.json(spark.createDataset(rows))
  }

  val avroSchema =
    """{"type":"record","name":"Ev","fields":[
      |{"name":"id","type":"long"},{"name":"tag","type":"string"}]}""".stripMargin

  test("avro from_json → to_json round trip") {
    val env = Envelope.wrap(jdf("""{"id":7,"tag":"x"}"""), scala.Seq(col("id")))
      .withColumn(Envelope.Content, to_json(col("doc")).cast("binary"))
    val out = Pipeline(scala.Seq(
      AvroProc("from_json", avroSchema),
      AvroProc("to_json", avroSchema)))(env)
    val got = out.select(col(Envelope.Content).cast("string")).head().getString(0)
    assert(got == """{"id":7,"tag":"x"}""")
  }

  test("compress/decompress processors on content") {
    val env = Envelope.wrap(jdf("""{"id":1}"""), scala.Seq(col("id")))
      .withColumn(Envelope.Content, lit("payload payload payload").cast("binary"))
    val out = Pipeline(scala.Seq(CompressProc("gzip"), DecompressProc("gzip")))(env)
    assert(out.select(col(Envelope.Content).cast("string")).head().getString(0)
      == "payload payload payload")
  }

  test("subprocess pipes content through a line filter") {
    val env = Envelope.wrap(jdf(
      """{"id":1,"s":"foo one"}""", """{"id":2,"s":"two foo"}"""), scala.Seq(col("id")))
      .withColumn(Envelope.Content, col("doc.s").cast("binary"))
    val out = SubprocessProc(scala.Seq("sed", "-u", "s/foo/BAR/g"))(env)
    val got = out.orderBy(Envelope.Seq)
      .select(col(Envelope.Content).cast("string")).collect().map(_.getString(0)).toList
    assert(got == List("BAR one", "two BAR"))
  }

  test("sort_parts reorders seq within batch") {
    val env = Envelope.wrap(jdf(
      """{"id":1,"r":30}""", """{"id":2,"r":10}""", """{"id":3,"r":20}"""), scala.Seq(col("id")))
    val out = B.SortParts("this.r")(env)
    val got = Envelope.unwrap(out.orderBy(Envelope.Seq)).select("id").collect()
      .map(_.getLong(0)).toList
    assert(got == List(2L, 3L, 1L))
  }
}
