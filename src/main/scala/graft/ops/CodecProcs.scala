package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Envelope

/** Content-codec processors (`avro`, `compress`, `decompress`,
  * `lib/processor/{avro,compress,decompress}.go`): transform the raw
  * content bytes, leaving doc/meta intact. */
object CodecProcs {

  /** `avro` processor. op = "to_json" (avro binary content → JSON text) or
    * "from_json" (JSON content → avro binary), with an inline schema. */
  final case class AvroProc(op: String, schemaJson: String) extends Processor {
    def apply(df: DataFrame): DataFrame = {
      val content = Envelope.contentOrDoc(df)
      val newContent = op match {
        case "to_json" =>
          graft.exprs.AvroCodec.avroToJson(content, schemaJson).cast(BinaryType)
        case "from_json" =>
          graft.exprs.AvroCodec.jsonToAvro(content.cast(StringType), schemaJson)
        case o => throw new IllegalArgumentException(s"avro: unknown operator $o")
      }
      df.withColumn(Envelope.Content, newContent)
    }
  }

  /** `protobuf` processor (`lib/processor/protobuf.go`): proto binary ↔
    * JSON under a message definition loaded from `import_paths` (.proto
    * sources) or supplied inline. The schema registry is parsed once at
    * construction and shipped in the closure. */
  final case class ProtobufProc(op: String, message: String,
      importPaths: scala.Seq[String] = Nil,
      inlineSources: Map[String, String] = Map.empty) extends Processor {
    private val registry =
      if (inlineSources.nonEmpty) graft.exprs.Protobuf.parseSources(inlineSources)
      else graft.exprs.Protobuf.parseImportPaths(importPaths)
    require(registry.messages.contains(message),
      s"protobuf: unknown message '$message' " +
        s"(have ${registry.messages.keys.mkString(", ")})")
    def apply(df: DataFrame): DataFrame = {
      val content = Envelope.contentOrDoc(df)
      val newContent = op match {
        case "to_json" =>
          graft.exprs.Protobuf.protoToJsonCol(content, message, registry)
            .cast(BinaryType)
        case "from_json" =>
          graft.exprs.Protobuf.jsonToProtoCol(content.cast(StringType),
            message, registry)
        case o => throw new IllegalArgumentException(s"protobuf: unknown operator $o")
      }
      df.withColumn(Envelope.Content, newContent)
    }
  }

  /** `compress` / `decompress` processors over content. */
  final case class CompressProc(alg: String) extends Processor {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(Envelope.Content,
        graft.exprs.Codecs.compress(Envelope.contentOrDoc(df), alg))
  }
  final case class DecompressProc(alg: String) extends Processor {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(Envelope.Content,
        graft.exprs.Codecs.decompress(Envelope.contentOrDoc(df), alg))
  }
}
