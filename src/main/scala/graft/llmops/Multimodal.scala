package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns plus a typed metadata struct.
  *
  * The Spark-side plumbing (schema, partitioning by payload size, batch
  * shaping, slicing) is real; the actual media DECODE step is a clearly
  * marked STUB — this container has no image/audio libraries, so
  * [[fakeDecode]] derives deterministic pseudo-metadata from the bytes.
  * Swap `fakeDecode` for a real decoder (e.g. an Arrow-batched Python
  * worker via `mapInArrow`, or a JNI codec) without touching the pipeline
  * around it.
  */
object Multimodal {

  /** Typed metadata schema carried next to every media payload. */
  val metaSchema: StructType = StructType(scala.Seq(
    StructField("n_bytes", LongType),
    StructField("format", StringType),
    StructField("width", LongType),
    StructField("height", LongType)))

  /** STUB decode: deterministic fake metadata from the payload hash.
    * Real implementation would parse the container header. */
  def fakeDecode(payload: Column): Column = {
    val h = md5(payload)
    struct(
      octet_length(payload).cast(LongType).as("n_bytes"),
      when(ascii(substring(h, 1, 1)) % 3 === 0, "png")
        .when(ascii(substring(h, 1, 1)) % 3 === 1, "jpeg")
        .otherwise("webp").as("format"),
      (lit(320L) + (ascii(substring(h, 2, 1)) % 16).cast(LongType) * 64L).as("width"),
      (lit(240L) + (ascii(substring(h, 3, 1)) % 16).cast(LongType) * 48L).as("height"))
  }

  /** Frame sampling stub: n evenly spaced byte-slices of the payload
    * (stands in for video frame extraction; the slicing plumbing — offsets,
    * array-of-binary schema — is the real part). */
  def frameSample(payload: Column, n: Int): Column = {
    val len = octet_length(payload)
    array((0 until n).map { i =>
      substring(payload, lit(1) + (len * i / n).cast(IntegerType), lit(16))
    }: _*)
  }

  /** Partition a media DataFrame by payload size class so huge payloads
    * don't skew task times (the 100 TB concern: one 4 GB video per task vs
    * thousands of thumbnails). */
  def repartitionBySize(df: DataFrame, payloadCol: String, partitions: Int): DataFrame = {
    val sizeClass = when(octet_length(col(payloadCol)) < 1024, 0)
      .when(octet_length(col(payloadCol)) < 1024 * 1024, 1)
      .otherwise(2)
    df.repartition(partitions, sizeClass, pmod(hash(col(payloadCol)), lit(partitions)))
  }
}
