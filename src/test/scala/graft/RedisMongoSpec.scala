package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Envelope
import graft.ops._

/** redis + mongodb processors and the external-KV cache backend —
  * the fake in-process transports behind the production client traits. */
class RedisMongoSpec extends AnyFunSuite {
  lazy val spark = Sessions.builder("4").getOrCreate()
  import spark.implicits._

  def env(rows: (Long, String)*) = Envelope.wrap(
    rows.toDF("id", "s"), scala.Seq(col("id")))

  test("redis incrby keeps a running total per key (reference example)") {
    FakeRedisServer.reset("redis://t1")
    val fac = FakeRedisFactory("redis://t1")
    // (name, friends_visited) — the docs example for incrby
    val visits = Envelope.wrap(
      scala.Seq(("ash", 10L), ("ash", -2L), ("bob", 3L), ("bob", 1L))
        .toDF("name", "n"), scala.Seq(col("name"), col("n")))
      .withColumn(Envelope.Content, col("doc.n").cast("string").cast("binary"))
    val out = RedisProc(fac, "incrby", "${! this.name }")(visits)
    // ONE action (increments replay per action — don't re-collect)
    val got = out.select(col(Envelope.Content).cast("string"),
      col(Envelope.Error)).collect()
    assert(got.forall(_.getString(1) == null))
    // intermediate totals depend on partition order; all must be numeric
    assert(got.length == 4 && got.forall(_.getString(0).matches("-?\\d+")))
    // totals per key: final value visible to a direct client read
    val client = fac.open()
    assert(client.get("ash").contains("8"))
    assert(client.get("bob").contains("4"))
  }

  test("redis sadd returns 1 for new members, 0 for repeats; scard counts") {
    FakeRedisServer.reset("redis://t2")
    val fac = FakeRedisFactory("redis://t2")
    val e = env(1L -> "m1", 2L -> "m2", 3L -> "m1")
      .withColumn(Envelope.Content, col("doc.s").cast("binary"))
      .coalesce(1) // deterministic first-wins for the repeated member
    val added = RedisProc(fac, "sadd", "theset")(e)
    assert(added.select(col(Envelope.Content).cast("string")).as[String]
      .collect().map(_.toLong).sum == 2L) // m1 added once, m2 once
    val card = RedisProc(fac, "scard", "theset")(env(1L -> "x"))
    assert(card.select(col(Envelope.Content).cast("string")).head().getString(0) == "2")
  }

  test("redis scard against a string key sets the error flag (WRONGTYPE)") {
    FakeRedisServer.reset("redis://t3")
    val fac = FakeRedisFactory("redis://t3")
    fac.open().set("plain", "v")
    val out = RedisProc(fac, "scard", "plain")(env(1L -> "x"))
    val e = out.select(col(Envelope.Error)).head().getString(0)
    assert(e != null && e.contains("WRONGTYPE"))
  }

  test("redis cache backend serves the cache processor verbs") {
    FakeRedisServer.reset("redis://t4")
    val store = new RedisCache(FakeRedisFactory("redis://t4"))
    CacheOps.CacheProc(store, "set", "k-${! this.id }", "${! this.s }")(
      env(1L -> "one", 2L -> "two"))
    val got = CacheOps.CacheProc(store, "get", "k-${! this.id }")(
      env(1L -> "x", 3L -> "y"))
    val byId = got.select(col("doc.id"), col(Envelope.Content).cast("string"),
      col(Envelope.Error)).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(byId(1L) == (("one", null)))
    assert(byId(3L)._2 == "cache get: key not found")
    CacheOps.CacheProc(store, "delete", "k-${! this.id }")(env(1L -> "d"))
    assert(store.snapshot(spark).collect().map(_.getString(0)).toSeq ==
      scala.Seq("k-2"))
  }

  test("mongodb insert-one then find-one round-trips a document") {
    FakeMongoServer.reset("mongodb://t5", "db", "users")
    val fac = FakeMongoFactory("mongodb://t5")
    val ins = MongoProc(fac, "db", "users", "insert-one",
      documentMap = "root.name = this.s\nroot.id = this.id")(
      env(1L -> "ada", 2L -> "bob"))
    ins.collect() // execute the side effect
    val found = MongoProc(fac, "db", "users", "find-one",
      filterMap = """root.name = "ada"""")(env(9L -> "q"))
    val content = found.select(col(Envelope.Content).cast("string")).head().getString(0)
    assert(content.contains("\"name\":\"ada\"") && content.contains("\"id\":1"))
  }

  test("mongodb update-one applies $set and $inc; zero-match flags error") {
    FakeMongoServer.reset("mongodb://t6", "db", "c")
    val fac = FakeMongoFactory("mongodb://t6")
    MongoProc(fac, "db", "c", "insert-one",
      documentMap = "root.k = this.s\nroot.n = this.id")(env(5L -> "x")).collect()
    val upd = MongoProc(fac, "db", "c", "update-one",
      documentMap = """root."$set".tag = "seen"""" + "\n" +
        """root."$inc".n = 10""",
      filterMap = """root.k = "x"""")(env(1L -> "x"))
    assert(upd.select(col(Envelope.Error)).head().isNullAt(0))
    val after = fac.open("db", "c").findOne("""{"k":"x"}""").get
    assert(after.contains("\"tag\":\"seen\"") && after.contains("\"n\":15"))

    val miss = MongoProc(fac, "db", "c", "update-one",
      documentMap = """root."$set".tag = "x"""",
      filterMap = """root.k = "nope"""")(env(1L -> "x"))
    assert(miss.select(col(Envelope.Error)).head().getString(0)
      .contains("no document matched"))
  }

  test("mongodb delete-many removes all matches; replace-one swaps the doc") {
    FakeMongoServer.reset("mongodb://t7", "db", "c")
    val fac = FakeMongoFactory("mongodb://t7")
    MongoProc(fac, "db", "c", "insert-one",
      documentMap = "root.g = this.s\nroot.id = this.id")(
      env(1L -> "a", 2L -> "a", 3L -> "b")).collect()
    MongoProc(fac, "db", "c", "replace-one",
      documentMap = """root.g = "b"""" + "\n" + """root.swapped = true""",
      filterMap = """root.g = "b"""")(env(1L -> "x")).collect()
    assert(fac.open("db", "c").findOne("""{"g":"b"}""").get.contains("swapped"))
    MongoProc(fac, "db", "c", "delete-many",
      filterMap = """root.g = "a"""")(env(1L -> "x")).collect()
    assert(fac.open("db", "c").findOne("""{"g":"a"}""").isEmpty)
    assert(fac.open("db", "c").findOne("""{"g":"b"}""").isDefined)
  }

  test("config surface: redis/mongodb processors + redis cache backend lint") {
    FakeRedisServer.reset("redis://cfg")
    val spec = graft.runtime.Config.load(
      """cache_resources:
        |  - label: kv
        |    redis:
        |      url: redis://cfg
        |input:
        |  generate:
        |    count: 3
        |    mapping: 'root.id = counter()'
        |pipeline:
        |  processors:
        |    - redis:
        |        url: redis://cfg
        |        operator: sadd
        |        key: ids
        |    - mongodb:
        |        url: mongodb://cfg
        |        database: db
        |        collection: c
        |        operation: insert-one
        |        document_map: 'root.v = this.id'
        |    - cache:
        |        resource: kv
        |        operator: set
        |        key: 'last-${! this.id }'
        |""".stripMargin)
    assert(spec.pipeline.size == 3)
    assert(spec.pipeline(0).isInstanceOf[RedisProc])
    assert(spec.pipeline(1).isInstanceOf[MongoProc])
  }
}
