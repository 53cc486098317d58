package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Envelope._

/** Enrichment operators: the reference does per-message lookups
  * (`http`/`sql`/`cache` under `branch` — SURVEY §2.1 enrichment table);
  * the Spark-native form is a JOIN, broadcast when the dimension is small.
  */
object EnrichOps {

  /** `cache`/`sql` lookup as a broadcast join: enrich doc fields from a
    * dimension DataFrame. `keyExpr` is evaluated against the envelope doc;
    * `dimKey` is the dimension's join column; `fields` maps dimension
    * column → destination doc path. Missing keys leave nulls (left join),
    * matching cache-miss semantics. */
  final case class LookupJoin(
      dim: DataFrame, keyExpr: String, dimKey: String,
      fields: scala.Seq[(String, String)], broadcastDim: Boolean = true) extends Processor {
    def apply(df: DataFrame): DataFrame = {
      val key = graft.blobl.Mapping.envelopeExpr(df, keyExpr)
      val d0 = dim.select((dimKey +: fields.map(_._1)).distinct.map(col): _*)
      val d = if (broadcastDim) broadcast(d0) else d0
      val joined = df.withColumn("_lk", key)
        .join(d, col("_lk") === d(dimKey), "left")
      val newDoc = fields.foldLeft(col(Doc)) { case (acc, (dimCol, dest)) =>
        acc.withField(graft.model.Envelope.fieldPath(dest.split('.').toSeq), d(dimCol))
      }
      joined.select(col(Content), newDoc.as(Doc), col(Meta), col(Error), col(BatchId), col(Seq))
    }
  }

  /** `sequence` input with `sharded_join` (`lib/input/sequence.go:142-188`):
    * joins fragmented datasets on an id path, merging all fragments of an
    * id into one document. The reference shards manually over bounded
    * memory in `iterations` passes; Spark's shuffle IS the sharding —
    * one `groupBy(id)` replaces the whole mechanism.
    *
    * merge_strategy: "array" collects conflicting fragments into arrays
    * (here: one array column per source), "replace" keeps the last
    * fragment's fields. Inputs are (name, DataFrame, idCol).
    */
  def shardedJoin(
      inputs: scala.Seq[(String, DataFrame, String)],
      strategy: String = "array"): DataFrame = {
    require(inputs.nonEmpty)
    strategy match {
      case "array" =>
        inputs.map { case (name, df, idCol) =>
          df.groupBy(col(idCol).as("id"))
            .agg(collect_list(struct(df.columns.filter(_ != idCol).map(col).toIndexedSeq: _*)).as(name))
        }.reduce((a, b) => a.join(b, "id", "full_outer"))
      case "replace" =>
        inputs.map { case (name, df, idCol) =>
          val others = df.columns.filter(_ != idCol)
          val aggs = others.map(c => last(col(c)).as(c))
          df.groupBy(col(idCol).as("id"))
            .agg(aggs.head, aggs.tail.toIndexedSeq: _*)
        }.reduce((a, b) => a.join(b, "id", "full_outer"))
      case o => throw new IllegalArgumentException(s"sharded_join: unknown merge_strategy $o")
    }
  }
}
