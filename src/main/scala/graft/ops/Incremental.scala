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

  /** Mergeable fixed-bin histogram state over a non-negative integer
    * measure: (keys..., bin, n) with bin = min(v div binWidth,
    * nBins−1) — the last bin absorbs the tail. States merge by
    * bin-count addition ([[mergeHists]]), which is what makes quantiles
    * maintainable incrementally: the per-batch pass is a word-count
    * shuffle on (keys, bin), never a sort. */
  def histState(df: DataFrame, keyCols: Seq[String], value: Column,
      binWidth: Long, nBins: Int): DataFrame = {
    require(binWidth >= 1 && nBins >= 2, "bad histogram geometry")
    df.select((keyCols.map(col) :+ value.cast("long").as("__v")): _*)
      .select((keyCols.map(col) :+
        expr(s"least(__v div ${binWidth}L, ${nBins - 1}L)").as("bin")): _*)
      .groupBy((keyCols.map(col) :+ col("bin")): _*)
      .agg(count(lit(1)).as("n"))
  }

  def mergeHists(keyCols: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "mergeHists needs at least one state")
    states.reduce(_ unionByName _)
      .groupBy((keyCols.map(col) :+ col("bin")): _*)
      .agg(sum(col("n")).as("n"))
  }

  /** Integer quantile estimates from a histogram state: for each
    * requested basis-point rank q, the LOWER BOUND (bin · binWidth) of
    * the first bin whose cumulative count reaches ceil(q·total/10000).
    * Deterministic integer arithmetic end to end; the cumulative window
    * partitions by the group key. Output: (keys..., q_bp, est). */
  def histQuantiles(state: DataFrame, keyCols: Seq[String], binWidth: Long,
      qsBp: Seq[Int]): DataFrame = {
    require(qsBp.nonEmpty && qsBp.forall(q => q >= 1 && q <= 10000),
      "quantile ranks are basis points in [1, 10000]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col("bin"))
    val cum = state
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("total", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(keyCols.map(col): _*)))
    cum.select((keyCols.map(col) ++ Seq(col("bin"), col("cum"), col("total"))): _*)
      .withColumn("q_bp", explode(lit(qsBp.toArray)))
      .filter(col("cum") * 10000 >= col("q_bp") * col("total"))
      .groupBy((keyCols.map(col) :+ col("q_bp").cast("long").as("q_bp")): _*)
      .agg((min(col("bin")) * binWidth).as("est"))
  }
}
