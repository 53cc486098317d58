package graft

import org.apache.spark.sql.SparkSession

/** Standard session config for the engine's entry points (Verify/Bench/tests).
  *
  * - shuffle.partitions sized to local cores (the 100 TB deployment overrides
  *   via spark-submit; AQE coalesces either way).
  * - UTC session timezone for oracle parity (and so the TIMESTAMP_NTZ that
  *   Spark 4.1 surfaces for the driver's TIMESTAMP(NANOS) `events.ts` casts
  *   exactly to an instant — see [[Tables]]).
  */
object Sessions {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // Benthos semantics are permissive: failed parses/casts yield null /
      // an _error flag, never a query-killing exception (reference
      // `lib/types/interface.go:89-104` error-flag contract).
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    // driver contract: local[32] with shuffle.partitions=32 (not 200)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
