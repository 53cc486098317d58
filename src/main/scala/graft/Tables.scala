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
    // `ts div 1000` (IntegralDivide) — NOT `/` (Divide), which promotes to
    // double and loses ~256 ns at epoch-nanosecond magnitude, off-by-1µs
    // against an exact engine.
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }
}
