package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Mergeable aggregate state for incremental pipelines: compute compact
  * per-key partials over each arriving batch, persist them (parquet),
  * and fold new batches in WITHOUT rescanning history — the batch-side
  * analog of a streaming state store, and the shape that makes a 100 TB
  * corpus refresh an O(delta) job instead of an O(corpus) one.
  *
  * The invariant the gate query pins: merge(state(A), state(B)) ==
  * state(A ∪ B), bit-exactly. Sums ride DECIMAL(18,4) so merge order
  * can never flip a ulp (the driver tables carry ≤ 4 decimals).
  */
object Incremental {

  /** Per-key partial aggregate: (keys..., cnt, sum_dec, min_v, max_v).
    * One map-side-combined shuffle keyed by the group columns. */
  def aggState(df: DataFrame, keyCols: Seq[String], valCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valCol).cast(DecimalType(18, 4))).as("sum_dec"),
        min(col(valCol)).as("min_v"),
        max(col(valCol)).as("max_v"))

  /** Fold any number of states into one: counter/sum addition, min/max
    * union — associative and commutative, so states can merge in any
    * order and any grouping (tree-merge across days, shards, clusters). */
  def mergeStates(keyCols: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "mergeStates needs at least one state")
    states.reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("sum_dec")).as("sum_dec"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
  }

  /** Final read of a state: exact mean and double-cast sum derived from
    * the mergeable fields (never stored — derived columns don't merge). */
  def finishState(state: DataFrame, keyCols: Seq[String]): DataFrame =
    state.select(
      (keyCols.map(col) ++ Seq(col("cnt"),
        col("sum_dec").cast("double").as("sum_v"),
        (col("sum_dec").cast("double") / col("cnt").cast("double")).as("mean_v"),
        col("min_v"), col("max_v"))): _*)
}
