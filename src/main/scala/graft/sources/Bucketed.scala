package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: the co-located-join path for datasets that are
  * joined or aggregated on the same key over and over (corpus fingerprint
  * indexes, signature tables, per-domain rollups).
  *
  * Writing both sides bucketed + sorted by the join key means every later
  * equi-join and groupBy on that key is EXCHANGE-FREE: at 100 TB the
  * shuffle is paid once at index-build time, not on every incremental
  * batch. This is the Spark-native equivalent of the reference's external
  * key-value cache backends for cross-job state (`lib/cache` — state
  * keyed once, reused cheaply), re-expressed as storage layout.
  *
  * Pair with [[graft.llmops.Dedup.minhashIndexWrite]]-style persisted
  * indexes: store the signature table bucketed by band-bucket key and the
  * daily near-dup scrub's bucket join never reshuffles the corpus.
  */
object Bucketed {

  /** Save `df` as a bucketed, sorted managed table. `buckets` should be
    * sized so one bucket of the LARGER table fits an executor's memory at
    * deploy scale (the same arithmetic as shuffle partition sizing). */
  def write(df: DataFrame, table: String, key: String, buckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .format("parquet")
      .mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Number of shuffle exchanges in the executed plan — 0 for a join or
    * aggregation that rides the bucketing. Audit helper for specs and
    * deploy-time plan review. */
  def shuffleExchanges(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size
}
