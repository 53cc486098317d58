package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.classic.ClassicConversions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Package-private Spark SQL surface the engine needs (lives under
  * `org.apache.spark.sql` for `private[sql]` access — public Spark API
  * knowledge only).
  *
  * [[zipWithIndexDF]] appends a global 0-based dense index column WITHOUT
  * leaving the internal row representation. The engine's previous global
  * sequence path went `DataFrame.rdd` → external `Row` (deserializing
  * every column per row) → `zipWithIndex` → `createDataFrame` (reflective
  * re-encode per row) — two full per-row conversion passes whose only
  * purpose was attaching one long. Here the index is appended to the
  * UnsafeRow stream directly and the result re-enters SQL via
  * `internalCreateDataFrame`.
  *
  * Correctness contract (same as the old path): the count job and the
  * final map run over the SAME materialized RDD instance, so the range
  * partitioner bounds backing a `repartitionByRange` input are sampled
  * once and every consumer sees one consistent row→index assignment.
  */
object GraftSqlShims {
  def zipWithIndexDF(df: DataFrame, out: String): DataFrame = {
    val spark: SparkSession = df.sparkSession
    val schema = StructType(df.schema.fields :+
      StructField(out, LongType, nullable = false))
    val indexed = df.queryExecution.toRdd.zipWithIndex().mapPartitions { it =>
      val joined = new JoinedRow
      val extra = new GenericInternalRow(1)
      val proj = UnsafeProjection.create(schema)
      it.map { case (row, idx) =>
        extra.update(0, idx)
        // copy: the projection reuses its output buffer; downstream
        // operators may hold references across iterator steps
        proj(joined(row, extra))
          .copy(): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    spark.internalCreateDataFrame(indexed, schema)
  }
}
