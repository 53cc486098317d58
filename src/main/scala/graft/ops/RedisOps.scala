package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Envelope

/** `redis` processor + `redis` cache backend
  * (`lib/processor/redis.go:273-275` — scard/sadd/incrby;
  * `lib/cache/redis.go` — get/set/add/delete).
  *
  * The image has no egress, so the transport is abstracted behind
  * [[RedisClientFactory]]: a Serializable factory that opens ONE client
  * per partition (the connection-per-partition shape a 1000-executor
  * deployment needs — never a connection per row, never a driver-side
  * loop over data rows). [[FakeRedisFactory]] is the in-process
  * stand-in: a JVM-global keyspace per URL, concurrency-safe, shared by
  * all local-mode partitions; a production deployment implements the
  * same trait over a real client library.
  */
trait RedisClient extends AutoCloseable {
  def scard(key: String): Long
  def sadd(key: String, member: String): Long
  def incrby(key: String, amount: Long): Long
  def get(key: String): Option[String]
  /** Plain SET. */
  def set(key: String, value: String): Unit
  /** SET NX semantics: true iff the key was absent and is now set. */
  def add(key: String, value: String): Boolean
  def delete(key: String): Unit
  /** Full keyspace sweep of string keys (SCAN) — cache snapshot use. */
  def scan(): Iterator[(String, String)]
  /** List verbs (redis_list input/output, `lib/input/reader/redis_list.go`,
    * `lib/output/writer/redis_list.go`). */
  def lpush(key: String, value: String): Unit
  def rpop(key: String): Option[String]
  def llen(key: String): Long
  override def close(): Unit = ()
}

trait RedisClientFactory extends Serializable {
  def open(): RedisClient
}

/** JVM-global fake redis: one isolated keyspace per URL. Sets and
  * strings live in separate namespaces, like real redis type-checking
  * (scard on a string key raises; the processor maps that to the error
  * flag). */
object FakeRedisServer {
  final class State {
    val strings = scala.collection.concurrent.TrieMap[String, String]()
    val sets = scala.collection.concurrent.TrieMap[String,
      scala.collection.concurrent.TrieMap[String, Unit]]()
    val lists = scala.collection.concurrent.TrieMap[String,
      java.util.concurrent.ConcurrentLinkedDeque[String]]()
  }
  private val servers = scala.collection.concurrent.TrieMap[String, State]()
  def state(url: String): State = servers.getOrElseUpdate(url, new State)
  /** Test helper: drop a server's keyspace. */
  def reset(url: String): Unit = servers.remove(url)
}

final case class FakeRedisFactory(url: String) extends RedisClientFactory {
  def open(): RedisClient = new RedisClient {
    private val s = FakeRedisServer.state(url)
    private def requireNotString(key: String): Unit =
      if (s.strings.contains(key))
        throw new IllegalStateException(
          "WRONGTYPE Operation against a key holding the wrong kind of value")
    def scard(key: String): Long = {
      requireNotString(key)
      s.sets.get(key).map(_.size.toLong).getOrElse(0L)
    }
    def sadd(key: String, member: String): Long = {
      requireNotString(key)
      val set = s.sets.getOrElseUpdate(key,
        scala.collection.concurrent.TrieMap[String, Unit]())
      if (set.putIfAbsent(member, ()).isEmpty) 1L else 0L
    }
    def incrby(key: String, amount: Long): Long = s.strings.synchronized {
      val next = s.strings.get(key).map(_.toLong).getOrElse(0L) + amount
      s.strings.put(key, next.toString)
      next
    }
    def get(key: String): Option[String] = s.strings.get(key)
    def set(key: String, value: String): Unit = s.strings.put(key, value)
    def add(key: String, value: String): Boolean =
      s.strings.putIfAbsent(key, value).isEmpty
    def delete(key: String): Unit = {
      s.strings.remove(key); s.sets.remove(key); s.lists.remove(key)
      ()
    }
    def scan(): Iterator[(String, String)] = s.strings.iterator
    def lpush(key: String, value: String): Unit =
      s.lists.getOrElseUpdate(key,
        new java.util.concurrent.ConcurrentLinkedDeque[String]()).addFirst(value)
    def rpop(key: String): Option[String] =
      s.lists.get(key).flatMap(d => Option(d.pollLast()))
    def llen(key: String): Long =
      s.lists.get(key).map(_.size.toLong).getOrElse(0L)
  }
}

/** The `redis` processor: content is replaced with the operator result
  * (reference contract), per message. Runs as one client per partition;
  * a failed command sets the error flag and leaves content intact. */
final case class RedisProc(factory: RedisClientFactory, operator: String,
    key: String) extends Processor {
  require(scala.Seq("scard", "sadd", "incrby").contains(operator),
    s"redis: operator must be scard/sadd/incrby, got $operator")

  def apply(df: DataFrame): DataFrame = {
    val withKey = df.withColumn("_rk",
      graft.blobl.Interpolation.column(df, key).cast(StringType))
    val schema = withKey.schema
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val kIdx = schema.fieldIndex("_rk")
    val cIdx = schema.fieldIndex(Envelope.Content)
    val eIdx = schema.fieldIndex(Envelope.Error)
    val (fac, op) = (factory, operator)
    withKey.mapPartitions { rows =>
      val client = fac.open()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => client.close()))
      rows.map { r =>
        val vals = r.toSeq.toArray
        val k = r.getString(kIdx)
        val content =
          if (r.isNullAt(cIdx)) null
          else new String(r.getAs[Array[Byte]](cIdx), "UTF-8")
        try {
          val res = op match {
            case "scard" => client.scard(k)
            case "sadd" => client.sadd(k, if (content == null) "" else content)
            case "incrby" => client.incrby(k,
              java.lang.Long.parseLong(if (content == null) "0" else content.trim))
          }
          vals(cIdx) = res.toString.getBytes("UTF-8")
        } catch {
          case e: Exception => vals(eIdx) = s"redis $op: ${e.getMessage}"
        }
        org.apache.spark.sql.Row.fromSeq(vals.toIndexedSeq)
      }
    }(enc).drop("_rk")
  }
}

/** `redis` cache backend: the CacheStore contract over a client. The
  * snapshot/upsert paths collect through the driver — the cache contract
  * is control-sized KV state (dedupe keys, counters), same as the
  * memory/file backends; data-sized relations never route through it. */
final class RedisCache(factory: RedisClientFactory) extends CacheOps.CacheStore {
  private val kvSchema = StructType(scala.Seq(
    StructField("key", StringType), StructField("value", StringType)))
  def snapshot(spark: SparkSession): DataFrame = {
    val client = factory.open()
    try spark.createDataFrame(
      spark.sparkContext.parallelize(
        client.scan().map { case (k, v) =>
          org.apache.spark.sql.Row(k, v) }.toSeq, 1), kvSchema)
    finally client.close()
  }
  def upsert(pairs: DataFrame): Unit = {
    val client = factory.open()
    try pairs.collect().foreach(r => client.set(r.getString(0), r.getString(1)))
    finally client.close()
  }
  def remove(keys: DataFrame): Unit = {
    val client = factory.open()
    try keys.collect().foreach(r => client.delete(r.getString(0)))
    finally client.close()
  }
}

/** `redis_list` output: LPUSH each message, one client per partition. */
final case class RedisListSink(factory: RedisClientFactory, key: String)
    extends graft.sinks.Sink {
  def write(df: DataFrame): Unit = {
    val (fac, k) = (factory, key)
    df.select(graft.model.Envelope.contentOrDoc(df).cast(StringType).as("v"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val client = fac.open()
        try rows.foreach(r => client.lpush(k, r.getString(0)))
        finally client.close()
      }
  }
}
