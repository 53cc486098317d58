package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns plus a typed metadata struct.
  *
  * IMAGE decode/resize is REAL for the formats the JDK decodes natively
  * (PNG, JPEG, GIF, BMP via `javax.imageio` — no external libraries):
  * [[decodeImage]] reads only the header for dimensions, [[resizeImage]]
  * re-renders through Graphics2D. Audio/video decode would need codec
  * libraries this container lacks, so [[fakeDecode]] remains as the
  * documented deterministic stand-in for those modalities (and for the
  * synthetic text-payload gate data); swap it for an Arrow-batched
  * worker or JNI codec without touching the pipeline around it.
  */
object Multimodal {

  private case class ImgMeta(n_bytes: Long, format: String,
      width: java.lang.Long, height: java.lang.Long)

  /** Real image metadata via javax.imageio: reads just the header (no
    * full pixel decode) — (n_bytes, format, width, height); unknown
    * formats yield null dims. Scalar-UDF shape: per-row byte work, no
    * data-dependent plan. */
  def decodeImage(payload: Column): Column = {
    val f = org.apache.spark.sql.functions.udf { (b: Array[Byte]) =>
      if (b == null) null
      else {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(b))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) ImgMeta(b.length.toLong, null, null, null)
          else {
            val r = readers.next()
            try {
              r.setInput(iis)
              ImgMeta(b.length.toLong, r.getFormatName.toLowerCase,
                r.getWidth(0).toLong, r.getHeight(0).toLong)
            } finally r.dispose()
          }
        } catch {
          case _: Exception => ImgMeta(b.length.toLong, null, null, null)
        } finally iis.close()
      }
    }
    f(payload)
  }

  /** Real image resize: decode → Graphics2D bilinear re-render → PNG
    * bytes. Null for undecodable payloads. */
  def resizeImage(payload: Column, width: Int, height: Int): Column = {
    val f = org.apache.spark.sql.functions.udf { (b: Array[Byte]) =>
      if (b == null) null
      else try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
        if (img == null) null
        else {
          val out = new java.awt.image.BufferedImage(width, height,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, width, height, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          bos.toByteArray
        }
      } catch { case _: Exception => null }
    }
    f(payload)
  }

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
