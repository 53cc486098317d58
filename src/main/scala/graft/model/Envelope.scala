package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Canonical record envelope of the engine (SURVEY §1.3).
  *
  * The reference models data as batches ("messages") of parts, each part
  * carrying raw bytes + a lazily parsed JSON document + string metadata +
  * an error flag (`lib/message/part.go:26-30`, `lib/types/interface.go:89-104`
  * in the reference). The idiomatic Spark shape is one row per part:
  *
  * {{{
  *   content  BINARY                 -- raw bytes (nullable, lazily derived)
  *   doc      STRUCT<...>            -- parsed document (schema-first design)
  *   meta     MAP<STRING,STRING>     -- per-part metadata
  *   _error   STRING                 -- null = ok (error-flag semantics)
  *   batch_id LONG                   -- batch membership
  *   seq      LONG                   -- order within batch
  * }}}
  *
  * Operators are schema-preserving on the envelope and free-form on `doc`.
  * Keeping `doc` a typed struct (not a JSON string) is what lets Catalyst
  * prune/push down into sources — the central payoff vs. the reference's
  * row-at-a-time interpreter.
  */
object Envelope {
  val Content = "content"
  val Doc = "doc"
  val Meta = "meta"
  val Error = "_error"
  val BatchId = "batch_id"
  val Seq = "seq"

  val envelopeCols: scala.Seq[String] =
    scala.Seq(Content, Doc, Meta, Error, BatchId, Seq)

  /** Backtick-quote a struct field name for the Column APIs that PARSE
    * their name argument (`withField`/`dropFields`) — a name holding a
    * space/quote would be a parse error, and one holding a dot would
    * silently become a nesting step. */
  def fieldRef(name: String): String =
    if (name.nonEmpty && name.head.isUnicodeIdentifierStart &&
        name.forall(c => c.isUnicodeIdentifierPart || c == '_'))
      name
    else "`" + name.replace("`", "``") + "`"

  /** A dotted nested-field path with each segment quoted as needed. */
  def fieldPath(segs: scala.Seq[String]): String =
    segs.map(fieldRef).mkString(".")

  /** Wrap a plain DataFrame (one row per record) into the envelope.
    *
    * `orderBy` supplies a deterministic within-batch order (the reference's
    * parts are ordered); `batchSize` re-batches by count like the `split`
    * processor (`lib/processor/split.go:41-49`). At scale the sort is a
    * range-partitioned shuffle — only wrap when batch semantics are actually
    * needed; pure per-row pipelines should stay unwrapped.
    */
  def wrap(df: DataFrame, orderBy: scala.Seq[Column], batchSize: Long = Long.MaxValue): DataFrame = {
    val cols = df.columns
    val seqDf = withGlobalSeq(df, orderBy, "_graft_seq")
    val seqCol = col("_graft_seq")
    seqDf.select(
      lit(null).cast(BinaryType).as(Content),
      struct(cols.map(col).toIndexedSeq: _*).as(Doc),
      map().cast(MapType(StringType, StringType)).as(Meta),
      lit(null).cast(StringType).as(Error),
      (seqCol / lit(batchSize)).cast(LongType).as(BatchId),
      seqCol.as(Seq))
  }

  /** Global 0-based dense sequence following `orderBy` WITHOUT a
    * single-partition window (the round-1 scale-killer): range-shuffle by
    * the order key so partition id order == key order, sort within
    * partitions, then `RDD.zipWithIndex` — a tiny per-partition count job
    * (one long per partition to the driver) followed by an offset-adding
    * map, both fully parallel at any scale.
    *
    * zipWithIndex (not a hand-rolled DataFrame two-pass) because its count
    * job and the final map run over the SAME RDD instance: range-partition
    * bounds are sampled with an RDD-id-derived seed, so two separate
    * executions of a `repartitionByRange` plan can draw slightly different
    * bounds — per-partition counts from one execution would mis-offset
    * rows of the other. */
  private[graft] def withGlobalSeq(df: DataFrame, orderBy: scala.Seq[Column],
      out: String): DataFrame = {
    require(!df.isStreaming, "global sequence assignment requires a batch DataFrame")
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // r11: index appended on the INTERNAL (UnsafeRow) representation —
    // the old external-Row round trip (df.rdd → Row.fromSeq →
    // createDataFrame's reflective re-encode) deserialized and re-encoded
    // every column of every row just to attach one long.
    // r12: the shim takes the RAW range shuffle and applies the within-
    // partition sort itself, so the offset-count job no longer re-runs
    // the sort (counts are sort-invariant) — one sort pass instead of
    // two per wrapped-pipeline action, same one-RDD-instance guarantee.
    org.apache.spark.sql.graft.GraftSqlShims.zipWithIndexSortedDF(
      df.repartitionByRange(parts, orderBy: _*), orderBy, out)
  }

  /** Cheap wrap for pipelines that don't need batch semantics: no shuffle,
    * batch_id = spark partition id, seq = monotonic id. This is the 100 TB
    * path — batch identity maps to Spark's own partition/micro-batch.
    * Streaming plans forbid monotonically_increasing_id, so there seq is a
    * content hash (stable pseudo-id; true order arrives per micro-batch). */
  def wrapUnordered(df: DataFrame): DataFrame = {
    // backtick-quote source column names containing dots — col("a.b")
    // otherwise parses as a path and the wrap fails analysis on any
    // input whose flat column name contains a '.' (JMESPath compliance
    // corpus: {"with.dot": 2})
    val cols = df.columns.toIndexedSeq
      .map(n => if (n.contains(".")) col(s"`$n`") else col(n))
    val seqCol =
      if (df.isStreaming) xxhash64(cols: _*)
      else monotonically_increasing_id()
    df.select(
      lit(null).cast(BinaryType).as(Content),
      struct(cols: _*).as(Doc),
      map().cast(MapType(StringType, StringType)).as(Meta),
      lit(null).cast(StringType).as(Error),
      spark_partition_id().cast(LongType).as(BatchId),
      seqCol.as(Seq))
  }

  /** Unwrap: project the doc struct back to top-level columns. */
  def unwrap(df: DataFrame): DataFrame = df.select(col(Doc + ".*"))

  /** Raw content bytes: the explicit content if set, else the serialized
    * doc (the reference's dual representation, `lib/message/part.go:82-96`).
    * Struct/array/map docs serialize as JSON; scalar docs cast directly. */
  def contentOrDoc(df: DataFrame): Column = {
    val ser = df.schema(Doc).dataType match {
      case _: StructType | _: ArrayType | _: MapType => to_json(col(Doc)).cast(BinaryType)
      case BinaryType => col(Doc)
      case _ => col(Doc).cast(StringType).cast(BinaryType)
    }
    coalesce(col(Content), ser)
  }

  def failed: Column = col(Error).isNotNull
  def ok: Column = col(Error).isNull

  /** Mark rows matching `cond` as errored with message `msg` (does not drop
    * them — "failed messages keep flowing"). */
  def flagError(df: DataFrame, cond: Column, msg: Column): DataFrame =
    df.withColumn(Error, when(col(Error).isNotNull, col(Error)).otherwise(when(cond, msg)))
}
