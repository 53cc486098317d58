package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from per-domain registries; every
  * query has deterministic row order and column names matching its oracle.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.BloblQueries.queries ++
      graft.queries.OpsQueries.queries ++
      graft.queries.LlmQueries.queries ++
      graft.queries.CurationQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++
      graft.queries.BloblQueries.oracleSql ++
      graft.queries.OpsQueries.oracleSql ++
      graft.queries.LlmQueries.oracleSql ++
      graft.queries.CurationQueries.oracleSql
}
