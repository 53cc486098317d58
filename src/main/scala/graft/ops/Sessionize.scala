package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sessionization: merge a key's events into sessions when gaps are
  * < `gap` — Spark's native `session_window`, which the reference can only
  * approximate with stateful cache counters (benthos v3 has no event-time
  * sessions; SURVEY §2.6 documents windowing as a capability gap our
  * engine fills).
  *
  * Batch form here; the identical expression composes with
  * `withWatermark` in a `readStream` plan for the streaming form (state
  * store merges windows per key; see graft.streaming). Scale: one shuffle
  * keyed by the session key; window merging is within-group, no global
  * ordering anywhere.
  */
object Sessionize {

  /** One row per (key, session): observed start/end, event count, and any
    * extra aggregates. `gap` is a calendar interval string ("30 minutes"). */
  def sessions(df: DataFrame, keyCol: String, tsCol: String, gap: String,
      extraAggs: scala.Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    val aggs = scala.Seq(
      min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_end"),
      count(lit(1)).as("n_events")) ++ extraAggs
    df.groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(aggs.head, aggs.tail: _*)
      .drop("session_window")
  }
}
