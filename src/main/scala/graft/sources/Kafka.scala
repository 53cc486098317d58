package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Envelope

/** Kafka input/output (reference `lib/input/kafka.go:116`,
  * `lib/output/writer/kafka.go`) mapped onto Spark's kafka connector:
  * `readStream`/`read` with `format("kafka")` on the way in,
  * `writeStream`/`write` on the way out.
  *
  * Everything except the actual broker IO is pure and unit-tested here:
  * the config → connector-option mapping, the kafka wire record →
  * envelope projection (metadata keys exactly as the reference sets them,
  * `lib/input/reader/kafka.go:379-384`), and the envelope → wire-record
  * projection (key/topic interpolation, static + metadata headers). The
  * connector jar (`spark-sql-kafka-0-10`) supplies the transport; it is
  * not bundled in this build environment, so `read*`/`write*` resolve the
  * format at call time (standard Spark packaging), while the mapping
  * logic stays testable without a broker.
  *
  * Scale notes: one Spark task per topic-partition on the read side;
  * `seq` is the kafka offset (the true within-partition order) and
  * `batch_id` the kafka partition, so downstream batch semantics never
  * need a global shuffle. `minPartitions` can oversubscribe.
  */
object Kafka {

  /** `input.kafka` (reference fields `lib/input/reader/kafka.go:27-41`).
    * `extra` passes through any `kafka.*` client property (TLS keystores,
    * SASL jaas, etc.) verbatim. */
  final case class InputConfig(
      addresses: scala.Seq[String],
      topics: scala.Seq[String],
      consumerGroup: String = "",
      clientId: String = "graft",
      startFromOldest: Boolean = true,
      tlsEnabled: Boolean = false,
      saslMechanism: String = "",
      saslUser: String = "",
      saslPassword: String = "",
      minPartitions: Option[Int] = None,
      extra: Map[String, String] = Map.empty)

  /** `output.kafka` (reference fields `lib/output/writer/kafka.go:31-49`).
    * `topic` and `key` accept `${! ... }` Bloblang interpolation. */
  final case class OutputConfig(
      addresses: scala.Seq[String],
      topic: String,
      key: String = "",
      clientId: String = "graft",
      compression: String = "",
      staticHeaders: Map[String, String] = Map.empty,
      metadataHeaders: Boolean = false,
      tlsEnabled: Boolean = false,
      saslMechanism: String = "",
      saslUser: String = "",
      saslPassword: String = "",
      extra: Map[String, String] = Map.empty)

  private def securityOptions(tlsEnabled: Boolean, mech: String,
      user: String, password: String): Map[String, String] = {
    val sasl = mech.nonEmpty
    val protocol = (tlsEnabled, sasl) match {
      case (true, true) => Some("SASL_SSL")
      case (true, false) => Some("SSL")
      case (false, true) => Some("SASL_PLAINTEXT")
      case (false, false) => None
    }
    val saslOpts = if (sasl) {
      val module =
        if (mech.startsWith("SCRAM"))
          "org.apache.kafka.common.security.scram.ScramLoginModule"
        else "org.apache.kafka.common.security.plain.PlainLoginModule"
      Map(
        "kafka.sasl.mechanism" -> mech,
        "kafka.sasl.jaas.config" ->
          s"""$module required username="$user" password="$password";""")
    } else Map.empty[String, String]
    protocol.map("kafka.security.protocol" -> _).toMap ++ saslOpts
  }

  /** Connector options for the read side. */
  def sourceOptions(c: InputConfig): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> c.addresses.mkString(","),
      "subscribe" -> c.topics.mkString(","),
      "startingOffsets" -> (if (c.startFromOldest) "earliest" else "latest"),
      "kafka.client.id" -> c.clientId) ++
      (if (c.consumerGroup.nonEmpty) Map("kafka.group.id" -> c.consumerGroup)
       else Map.empty) ++
      c.minPartitions.map(n => "minPartitions" -> n.toString).toMap ++
      securityOptions(c.tlsEnabled, c.saslMechanism, c.saslUser, c.saslPassword) ++
      c.extra

  /** Connector options for the write side. */
  def sinkOptions(c: OutputConfig): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> c.addresses.mkString(","),
      "kafka.client.id" -> c.clientId) ++
      (if (c.compression.nonEmpty)
         Map("kafka.compression.type" -> c.compression)
       else Map.empty) ++
      (if (c.metadataHeaders || c.staticHeaders.nonEmpty)
         Map("includeHeaders" -> "true")
       else Map.empty) ++
      securityOptions(c.tlsEnabled, c.saslMechanism, c.saslUser, c.saslPassword) ++
      c.extra

  /** Kafka wire record → envelope. Metadata keys follow the reference
    * (`kafka_key`, `kafka_topic`, `kafka_partition`, `kafka_offset`,
    * `kafka_timestamp_unix`; `kafka_lag` has no Spark equivalent —
    * documented divergence). seq = offset, batch_id = kafka partition. */
  def envelope(records: DataFrame): DataFrame =
    records.select(
      col("value").as(Envelope.Content),
      col("value").cast(StringType).as(Envelope.Doc),
      map(
        lit("kafka_key"), coalesce(col("key").cast(StringType), lit("")),
        lit("kafka_topic"), col("topic"),
        lit("kafka_partition"), col("partition").cast(StringType),
        lit("kafka_offset"), col("offset").cast(StringType),
        lit("kafka_timestamp_unix"),
        unix_timestamp(col("timestamp")).cast(StringType)).as(Envelope.Meta),
      lit(null).cast(StringType).as(Envelope.Error),
      col("partition").cast(LongType).as(Envelope.BatchId),
      col("offset").as(Envelope.Seq))

  /** Streaming read (the normal path). */
  def readStream(spark: SparkSession, c: InputConfig): DataFrame =
    envelope(spark.readStream.format("kafka").options(sourceOptions(c)).load())

  /** Bounded replay read (`spark.read`): consumes the current topic
    * contents as a batch DataFrame — the debugging / reprocessing path. */
  def read(spark: SparkSession, c: InputConfig): DataFrame =
    envelope(spark.read.format("kafka")
      .options(sourceOptions(c) + ("endingOffsets" -> "latest")).load())

  /** Envelope → kafka wire columns: value from content-or-doc, key and
    * topic interpolated per row, headers from static config + (optionally)
    * message metadata. Pure projection — one pass, no shuffle. */
  def sinkColumns(df: DataFrame, c: OutputConfig): DataFrame = {
    val value = Envelope.contentOrDoc(df).as("value")
    val key =
      if (c.key.isEmpty) lit(null).cast(BinaryType).as("key")
      else graft.blobl.Interpolation.column(df, c.key).cast(BinaryType).as("key")
    val topic = graft.blobl.Interpolation.column(df, c.topic)
      .cast(StringType).as("topic")
    val static = c.staticHeaders.toSeq.sortBy(_._1).map { case (k, v) =>
      struct(lit(k).as("key"), lit(v).cast(BinaryType).as("value"))
    }
    val headerCols: Option[Column] =
      (static.nonEmpty, c.metadataHeaders) match {
        case (false, false) => None
        case (_, true) =>
          val metaHeaders = transform(map_entries(col(Envelope.Meta)),
            e => struct(e.getField("key").as("key"),
              e.getField("value").cast(BinaryType).as("value")))
          Some(concat(array(static: _*), metaHeaders))
        case (true, false) => Some(array(static: _*))
      }
    df.select(scala.Seq(key, value, topic) ++
      headerCols.map(_.as("headers")).toSeq: _*)
  }

  /** Batch write. */
  def write(df: DataFrame, c: OutputConfig): Unit =
    sinkColumns(df, c).write.format("kafka").options(sinkOptions(c)).save()

  /** Streaming write. */
  def writeStream(df: DataFrame, c: OutputConfig, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    sinkColumns(df, c).writeStream.format("kafka")
      .options(sinkOptions(c))
      .option("checkpointLocation", checkpoint)
      .start()
}
