package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Avro ↔ JSON bridge over avro-core (the `avro` processor,
  * `lib/processor/avro.go`: operators to_json / from_json). The spark-avro
  * module isn't shipped in this image, so this uses the bundled
  * org.apache.avro directly; decode yields a JSON string (→ `parse_json`
  * for a queryable variant). */
object AvroCodec {

  /** Avro binary (schemaless single-record encoding) → JSON text. */
  def avroToJson(c: Column, schemaJson: String): Column = {
    val f = udf((b: Array[Byte]) => if (b == null) null else {
      try {
        val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
        val reader = new org.apache.avro.generic.GenericDatumReader[Any](schema)
        val decoder = org.apache.avro.io.DecoderFactory.get()
          .binaryDecoder(b, null)
        val record = reader.read(null, decoder)
        val out = new java.io.ByteArrayOutputStream()
        val jsonEnc = org.apache.avro.io.EncoderFactory.get()
          .jsonEncoder(schema, out)
        val writer = new org.apache.avro.generic.GenericDatumWriter[Any](schema)
        writer.write(record, jsonEnc)
        jsonEnc.flush()
        out.toString("UTF-8")
      } catch { case _: Exception => null }
    })
    f(c)
  }

  /** JSON text → Avro binary under the given schema. */
  def jsonToAvro(c: Column, schemaJson: String): Column = {
    val f = udf((s: String) => if (s == null) null else {
      try {
        val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
        val reader = new org.apache.avro.generic.GenericDatumReader[Any](schema)
        val jsonDec = org.apache.avro.io.DecoderFactory.get().jsonDecoder(schema, s)
        val record = reader.read(null, jsonDec)
        val out = new java.io.ByteArrayOutputStream()
        val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(out, null)
        val writer = new org.apache.avro.generic.GenericDatumWriter[Any](schema)
        writer.write(record, enc)
        enc.flush()
        out.toByteArray
      } catch { case _: Exception => null }
    })
    f(c)
  }
}
