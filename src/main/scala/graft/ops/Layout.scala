package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout keys for multi-dimensional locality: Morton (Z-order)
  * interleaving. Writing a table clustered by z-value makes range
  * predicates on EITHER dimension prune file-level min/max statistics —
  * the standard lakehouse trick for "filter by partkey OR by suppkey"
  * workloads where a single-column sort only serves one of the two.
  * Everything here is a pure projection (bit arithmetic, codegen'd); the
  * write path is `repartitionByRange(zCol)` + sortWithinPartitions.
  */
object Layout {

  /** 2-D Morton interleave of two non-negative ints, `bits` bits each:
    * bit i of x lands at position 2i, bit i of y at 2i+1. Monotone in
    * the locality sense: close (x, y) points share long z prefixes. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "zValue supports 1..31 bits per dim")
    (0 until bits).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Coarse z-bucket: the top `log2Buckets` bits of the z-value — the
    * file/partition assignment a z-clustered writer would use. */
  def zBucket(x: Column, y: Column, bits: Int, log2Buckets: Int): Column = {
    require(log2Buckets >= 1 && log2Buckets <= 2 * bits, "bad bucket width")
    shiftright(zValue(x, y, bits), 2 * bits - log2Buckets)
  }

  /** Per-z-bucket extent audit: row count and the min/max extent of both
    * dimensions inside each bucket. The point of the statistic: for a
    * z-clustered layout every bucket covers a BOUNDED rectangle of the
    * (x, y) plane, so min/max file statistics prune on either column.
    * One map-side-combined aggregation on ≤ 2^log2Buckets keys. */
  def zProfile(df: DataFrame, xCol: String, yCol: String, bits: Int,
      log2Buckets: Int): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    df.select(zBucket(x, y, bits, log2Buckets).as("z_bucket"), x.as("x"), y.as("y"))
      .groupBy(col("z_bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
      .orderBy(col("z_bucket"))
  }
}
