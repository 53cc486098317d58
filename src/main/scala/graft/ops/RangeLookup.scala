package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval lookup join via binning — the scale-safe shape for
  * "classify each row by which [lo, hi) range it falls in" when the
  * range table is too large to broadcast (IP→geo tables run to
  * millions of rows): each range explodes to the fixed-width bins it
  * covers, facts join their bin as an EQUI key, and the exact bounds
  * check runs on the bin-local candidates. Shuffle volume is
  * O(facts + ranges · spans-per-range); no BroadcastNestedLoopJoin,
  * no cross product. With a broadcast-size range table Spark will
  * still pick a broadcast hash join on the bin key — same plan family,
  * zero shuffle.
  */
object RangeLookup {

  /** Join each fact row to the range rows whose [lo, hi) contains
    * `value`. `ranges` must carry long columns `lo` and `hi` (hi
    * exclusive) plus any payload columns; `value` must be non-negative
    * (shift both sides upstream — SQL `div` rounds toward zero, which
    * would misalign bins below zero). Non-matching facts are dropped
    * (inner); overlapping ranges yield one row per match. */
  def rangeLookup(fact: DataFrame, value: Column, ranges: DataFrame,
      binWidth: Long): DataFrame = {
    require(binWidth >= 1, "binWidth must be positive")
    val f = fact.withColumn("__v", value.cast("long"))
      .withColumn("__bin", expr(s"__v div ${binWidth}L"))
    val r = ranges
      .withColumn("__bin", explode(sequence(
        expr(s"lo div ${binWidth}L"), expr(s"(hi - 1) div ${binWidth}L"))))
    f.join(r, "__bin")
      .filter(col("__v") >= col("lo") && col("__v") < col("hi"))
      .drop("__bin", "__v")
  }
}
