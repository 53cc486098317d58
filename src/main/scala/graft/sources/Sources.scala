package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Envelope

/** Input components (reference registry `lib/input/constructor.go:205-254`).
  * Every source yields the canonical envelope. File-family inputs map to
  * `spark.read`/`readStream` with the codec (§2.7) choosing the format;
  * gzip is transparent at the source. Object-store paths (s3a://, gs://,
  * abfss://) work through the same API — the path scheme IS the connector.
  */
object Sources {

  /** Codec-driven file read (`file`/`files`/`csv` inputs + §2.7 codecs).
    * codec ∈ lines | csv | csv:<delim> | json | json_documents | parquet |
    * all-bytes. */
  def file(spark: SparkSession, path: String, codec: String,
      schema: Option[StructType] = None, header: Boolean = true): DataFrame = {
    val meta = map(lit("path"), input_file_name())
    codec match {
      case "lines" =>
        val df = spark.read.text(path)
        df.select(
          col("value").cast(BinaryType).as(Envelope.Content),
          col("value").as(Envelope.Doc),
          meta.as(Envelope.Meta),
          lit(null).cast(StringType).as(Envelope.Error),
          spark_partition_id().cast(LongType).as(Envelope.BatchId),
          monotonically_increasing_id().as(Envelope.Seq))
      case c if c == "csv" || c.startsWith("csv:") =>
        val delim = if (c.startsWith("csv:")) c.substring(4) else ","
        var r = spark.read.option("header", header).option("sep", delim)
          .option("inferSchema", schema.isEmpty)
        schema.foreach(s => r = r.schema(s))
        wrap(r.csv(path))
      case "json" | "json_documents" =>
        var r = spark.read
        schema.foreach(s => r = r.schema(s))
        wrap(r.json(path))
      case "parquet" => wrap(spark.read.parquet(path))
      case "all-bytes" =>
        val df = spark.read.format("binaryFile").load(path)
        df.select(
          col("content").as(Envelope.Content),
          col("content").as(Envelope.Doc),
          map(lit("path"), col("path")).as(Envelope.Meta),
          lit(null).cast(StringType).as(Envelope.Error),
          spark_partition_id().cast(LongType).as(Envelope.BatchId),
          monotonically_increasing_id().as(Envelope.Seq))
      case o => throw new IllegalArgumentException(s"unknown codec $o")
    }
  }

  private def wrap(df: DataFrame): DataFrame = Envelope.wrapUnordered(df)

  /** `generate` input (`lib/input/generate.go:140-151`): Bloblang mapping
    * producing `count` rows (batch); streaming variant uses the rate
    * source (see graft.streaming). The mapping sees `this` = {i: Long}. */
  def generate(spark: SparkSession, mapping: String, count: Long): DataFrame = {
    val base = Envelope.wrapUnordered(spark.range(count).select(col("id").as("i")))
    graft.blobl.Mapping.compile(mapping).applyEnvelope(base)
  }

  /** `broker` fan-in (`lib/broker/fan_in.go`): union of N inputs. */
  def broker(inputs: scala.Seq[DataFrame]): DataFrame =
    inputs.reduce(_.unionByName(_, allowMissingColumns = false))

  /** `sequence` input: inputs consumed in order (batch concatenation with
    * a source index so downstream can preserve order). */
  def sequence(inputs: scala.Seq[DataFrame]): DataFrame =
    inputs.zipWithIndex.map { case (df, i) =>
      df.withColumn(Envelope.BatchId, lit(i.toLong))
    }.reduce(_.unionByName(_))

  /** `read_until` (`lib/input/read_until.go:31`): consume rows (ordered by
    * seq) up to AND INCLUDING the first one matching the predicate — the
    * reference explicitly delivers the triggering message before closing
    * the input. Plan: one parallel filtered aggregate finds the first
    * triggering seq (filter pushdown applies), then a plain filter keeps
    * everything at-or-before it — no global window, no single-partition
    * stage. */
  def readUntil(df: DataFrame, check: String): DataFrame = {
    val cond = graft.blobl.Mapping.envelopeExpr(df, check)
    val first = df.filter(coalesce(cond, lit(false)))
      .agg(min(col(Envelope.Seq))).head().get(0)
    first match {
      case null => df
      case v => df.filter(col(Envelope.Seq) <= lit(v))
    }
  }
}
