package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Kafka
import graft.model.Envelope
import graft.runtime.Config

/** Kafka mapping tests: everything up to the connector boundary — option
  * mapping, wire-record → envelope, envelope → wire-record, YAML
  * round-trip. (The broker transport itself needs the spark-sql-kafka
  * jar + a broker, neither of which exists in this build image.) */
class KafkaSpec extends AnyFunSuite {
  lazy val spark = Sessions.builder("4").getOrCreate()
  import spark.implicits._

  test("input config maps to connector options (reference field parity)") {
    val opts = Kafka.sourceOptions(Kafka.InputConfig(
      addresses = scala.Seq("b1:9092", "b2:9092"),
      topics = scala.Seq("t1", "t2"),
      consumerGroup = "g1",
      startFromOldest = false,
      tlsEnabled = true,
      saslMechanism = "SCRAM-SHA-256", saslUser = "u", saslPassword = "p",
      minPartitions = Some(64)))
    assert(opts("kafka.bootstrap.servers") == "b1:9092,b2:9092")
    assert(opts("subscribe") == "t1,t2")
    assert(opts("startingOffsets") == "latest")
    assert(opts("kafka.group.id") == "g1")
    assert(opts("minPartitions") == "64")
    assert(opts("kafka.security.protocol") == "SASL_SSL")
    assert(opts("kafka.sasl.mechanism") == "SCRAM-SHA-256")
    assert(opts("kafka.sasl.jaas.config").contains("ScramLoginModule"))
  }

  test("wire record → envelope: reference metadata keys, offset as seq") {
    val records = scala.Seq(
      ("k1".getBytes, "hello".getBytes, "topicA", 0, 42L,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (null.asInstanceOf[Array[Byte]], "world".getBytes, "topicA", 1, 7L,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:01")))
      .toDF("key", "value", "topic", "partition", "offset", "timestamp")
    val env = Kafka.envelope(records).orderBy(col(Envelope.Seq))
    val rows = env.collect()
    assert(env.columns.toSeq == Envelope.envelopeCols)
    val first = rows.find(_.getLong(5) == 42L).get
    assert(new String(first.getAs[Array[Byte]](0)) == "hello")
    assert(first.getString(1) == "hello")
    val meta = first.getMap[String, String](2)
    assert(meta("kafka_key") == "k1")
    assert(meta("kafka_topic") == "topicA")
    assert(meta("kafka_partition") == "0")
    assert(meta("kafka_offset") == "42")
    assert(first.getLong(4) == 0L) // batch_id = kafka partition
    val second = rows.find(_.getLong(5) == 7L).get
    assert(second.getMap[String, String](2)("kafka_key") == "")
  }

  test("envelope → wire columns: interpolated key/topic, headers") {
    val env = Envelope.wrap(
      scala.Seq((1L, "alpha"), (2L, "beta")).toDF("id", "s"),
      scala.Seq(col("id")))
    val out = Kafka.sinkColumns(env, Kafka.OutputConfig(
      addresses = scala.Seq("b:9092"),
      topic = "events-${! this.id }",
      key = "${! this.s }",
      staticHeaders = Map("source" -> "graft"),
      metadataHeaders = true))
    assert(out.columns.toSeq == scala.Seq("key", "value", "topic", "headers"))
    val r = out.orderBy(col("topic")).head()
    assert(r.getString(2) == "events-1")
    assert(new String(r.getAs[Array[Byte]](0)) == "alpha")
    assert(new String(r.getAs[Array[Byte]](1)).contains("\"s\":\"alpha\""))
    val headers = r.getSeq[org.apache.spark.sql.Row](3)
    assert(headers.exists(h => h.getString(0) == "source" &&
      new String(h.getAs[Array[Byte]](1)) == "graft"))
  }

  test("YAML kafka config round-trips to a streaming spec + kafka sink") {
    val spec = Config.load(
      """input:
        |  kafka:
        |    addresses: [ "broker-0:9092" ]
        |    topics: [ "in-topic" ]
        |    consumer_group: workers
        |    start_from_oldest: true
        |pipeline:
        |  processors:
        |    - bloblang: "root = content().uppercase()"
        |output:
        |  kafka:
        |    addresses: [ "broker-0:9092" ]
        |    topic: out-topic
        |    key: "${! meta(\"kafka_key\") }"
        |""".stripMargin)
    assert(spec.streaming)
    assert(spec.pipeline.size == 1)
    val sink = spec.output.asInstanceOf[graft.sinks.Sinks.KafkaSink]
    assert(sink.conf.topic == "out-topic")
    assert(sink.conf.addresses == scala.Seq("broker-0:9092"))
    // batch replay flavor compiles to a non-streaming spec
    val batchSpec = Config.load(
      """input:
        |  kafka:
        |    addresses: [ "broker-0:9092" ]
        |    topics: [ "in-topic" ]
        |    batch: true
        |output:
        |  drop: {}
        |""".stripMargin)
    assert(!batchSpec.streaming)
  }
}
