package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  val all: scala.Seq[String] = scala.Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // `events.ts` is parquet TIMESTAMP(NANOS); with
    // spark.sql.legacy.parquet.nanosAsLong=true it surfaces as nano epoch
    // longs — convert to a microsecond TimestampType column.
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        (org.apache.spark.sql.functions.col("ts") / 1000L).cast(org.apache.spark.sql.types.LongType)))
    else df
  }
}
