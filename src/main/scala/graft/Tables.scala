package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  val all: scala.Seq[String] = scala.Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // `events.ts` is parquet TIMESTAMP(NANOS); Spark 4.1 reads it as
    // TIMESTAMP_NTZ (micros, truncated). Convert to the session-zoned
    // TimestampType so downstream `unix_micros`/`window` work unchanged —
    // the session timezone is pinned to UTC (Sessions.scala), so the NTZ
    // wall-clock IS the instant and the cast is exact.
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.to_timestamp_ltz(
          org.apache.spark.sql.functions.col("ts")))
    else df
  }
}
