package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Envelope
import graft.ops.SqlProc

/** Generic sql processor against embedded Derby (ships on the Spark
  * classpath): INSERT with args_mapping, parameterized SELECT with
  * result_codec json_array, error-flag on SQL failure. */
class SqlSpec extends AnyFunSuite {
  lazy val spark = Sessions.builder("4").getOrCreate()
  import spark.implicits._

  val dsn = "jdbc:derby:memory:graftdb;create=true"

  def exec(sql: String): Unit = {
    val c = java.sql.DriverManager.getConnection(dsn)
    try { val s = c.createStatement(); try s.execute(sql) finally s.close() }
    finally c.close()
  }

  def env = Envelope.wrap(
    scala.Seq((1L, "ann", 10L), (2L, "bob", 20L), (3L, "cay", 30L))
      .toDF("id", "name", "score"),
    scala.Seq(col("id")))

  test("insert with args_mapping, then query with result_codec json_array") {
    try exec("DROP TABLE footable") catch { case _: Exception => () }
    exec("CREATE TABLE footable (id BIGINT, name VARCHAR(64), score BIGINT)")

    val ins = SqlProc("derby", dsn,
      "INSERT INTO footable (id, name, score) VALUES (?, ?, ?)",
      argsMapping = "[ this.id, this.name, this.score ]")
    // single action: a write query is a side effect, so re-running the
    // plan re-executes it (standard Spark semantics — route writes
    // through a sink in real pipelines)
    val inserted = ins(env).collect()
    assert(inserted.length == 3)
    assert(inserted.forall(r => r.isNullAt(r.fieldIndex(Envelope.Error))))

    // postgres-style $1 placeholders are normalized to ?
    val sel = SqlProc("derby", dsn,
      "SELECT name, score FROM footable WHERE id <= $1 ORDER BY id",
      argsMapping = "[ this.id ]", resultCodec = "json_array")
    val out = sel(env).filter(col("doc.id") === 2L)
    val content = new String(
      out.select(Envelope.Content).head().getAs[Array[Byte]](0), "UTF-8")
    assert(content ==
      """[{"name":"ann","score":10},{"name":"bob","score":20}]""")
  }

  test("sql errors set the error flag, rows keep flowing") {
    val bad = SqlProc("derby", dsn, "SELECT * FROM no_such_table",
      resultCodec = "json_array")
    val out = bad(env)
    assert(out.count() == 3)
    assert(out.filter(col(Envelope.Error).startsWith("sql:")).count() == 3)
  }

  test("YAML sql config compiles") {
    val spec = graft.runtime.Config.load(
      s"""input:
         |  generate:
         |    count: 1
         |    mapping: "root.i = this.i"
         |output:
         |  drop: {}
         |pipeline:
         |  processors:
         |    - sql:
         |        driver: derby
         |        data_source_name: "$dsn"
         |        query: "SELECT 1 FROM SYSIBM.SYSDUMMY1"
         |        result_codec: json_array
         |""".stripMargin)
    assert(spec.pipeline.head.isInstanceOf[SqlProc])
  }
}
