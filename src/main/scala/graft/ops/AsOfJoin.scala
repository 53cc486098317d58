package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, the latest right row with the same key
  * and right.time <= left.time. The reference has no such operator (its
  * enrichment is point lookups); this is the standard time-series
  * extension, built from composition — union + per-key ordered window —
  * rather than a custom physical operator (SURVEY §4.3 preference (a)).
  *
  * Scale: one shuffle by key, one per-key ordered window; no range
  * explosion. Both sides can be arbitrarily large (no broadcast needed).
  */
object AsOfJoin {

  /** leftTime/rightTime must be mutually comparable (timestamps).
    * rightCols are carried to the output (nulls when nothing precedes).
    * Right columns travel as ONE struct so the filled values always come
    * from the same right row. */
  def join(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightCols: scala.Seq[String]): DataFrame = {
    val rStructType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))
    val lAligned = left.select(
      (col(leftKey).as("_k") +: col(leftTime).as("_t") +: lit(1).as("_side") +:
        lit(null).cast(rStructType).as("_r") +:
        left.columns.map(col)): _*)
    val rAligned = right.select(
      (col(rightKey).as("_k") +: col(rightTime).as("_t") +: lit(0).as("_side") +:
        struct(rightCols.map(col): _*).as("_r") +:
        left.columns.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    // right rows sort before left rows at equal timestamps, giving
    // right.time <= left.time semantics
    val w = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = lAligned.unionByName(rAligned)
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
    filled.filter(col("_side") === 1)
      .select((left.columns.map(col) ++
        rightCols.map(c => col("_r").getField(c).as(c))): _*)
  }
}
