package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic distributed sketches. Spark's own approx aggregates
  * (HLL++, KLL) are neither seed-stable across engines nor replayable by
  * an external oracle; these sketches are built from md5 — identical
  * everywhere — so a correctness gate can replay them bit-exactly while
  * the shape stays the true streaming-sketch shape.
  */
object Sketches {

  /** KMV (k-minimum-values / bottom-k) distinct-count estimate per group
    * (Bar-Yossef et al. 2002): hash every value, keep the k smallest
    * DISTINCT hashes per group, estimate D ≈ (k−1)/h_(k) with the hash
    * normalized to [0,1). Here the estimate is computed on the top 24
    * bits of the k-th minimum md5 in pure BIGINT arithmetic:
    *
    *   est = (k−1) · 2²⁴ div toInt₂₄(h_(k))
    *
    * Mergeable by construction (bottom-k of a union = bottom-k of merged
    * bottom-ks), which is what makes it a sketch: partial aggregation
    * keeps ≤k values per group per partition, so the shuffle carries
    * O(groups · k), not the data. This implementation takes the
    * distinct-hash + per-group rank route (two key-local exchanges);
    * groups with fewer than k distinct values fall back to their exact
    * count (the standard KMV small-range rule).
    *
    * Output: (group, n_hashes, est_distinct) — n_hashes = min(D, k). */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    require(k >= 2, "kmv needs k >= 2")
    val hashed = df.select(col(groupCol).as("grp"),
        md5(col(valueCol).cast("string")).as("h"))
      .distinct()
    val ranked = hashed.withColumn("rnk",
      row_number().over(Window.partitionBy(col("grp")).orderBy(col("h"))))
    ranked.filter(col("rnk") <= k)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_hashes"), max(col("h")).as("h_k"))
      .select(col("grp"), col("n_hashes"),
        when(col("n_hashes") < k, col("n_hashes"))
          .otherwise(expr(s"(${k - 1}L * 16777216) div cast(conv(substr(h_k, 1, 6), 16, 10) as bigint)"))
          .as("est_distinct"))
  }
}
