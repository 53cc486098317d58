package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.blobl.{Mapping => Blobl}
import graft.model.Envelope

/** Cache resources + the `cache` processor verbs
  * (`lib/processor/cache.go:276-282`, backends
  * `lib/cache/constructor.go:82-92`).
  *
  * Batch rendering of the reference's row-interleaved semantics: a verb
  * executes as a BATCH operation when the processor is applied — `set`
  * upserts all keyed pairs of the flowing DataFrame, `add` inserts only
  * absent keys (rows whose key already existed get the error flag, like
  * the reference's per-message add failure), `get` is a lookup join that
  * replaces content (missing key → error flag), `delete` removes the
  * flowing keys. Cross-job state lives in the backend:
  *
  *  - [[FileCache]]: a parquet-backed KV dir — durable, any size,
  *    read as a broadcast-joinable DataFrame (the `file` backend).
  *  - [[MemoryCache]]: driver TrieMap for small control data and tests
  *    (the `memory` backend).
  *
  * Side-effect verbs write when applied (the pipeline composes eagerly),
  * so upstream lineage runs once for the write and again for downstream
  * consumers — persist upstream first if that matters. */
object CacheOps {

  trait CacheStore extends Serializable {
    /** Current contents as (key STRING, value STRING). */
    def snapshot(spark: SparkSession): DataFrame
    /** Insert-or-replace. */
    def upsert(pairs: DataFrame): Unit
    /** Remove the given keys (DataFrame with a `key` column). */
    def remove(keys: DataFrame): Unit
  }

  private val kvSchema = StructType(scala.Seq(
    StructField("key", StringType), StructField("value", StringType)))

  /** `memory` cache backend: driver-held map (small control data). */
  final class MemoryCache extends CacheStore {
    private val map = scala.collection.concurrent.TrieMap[String, String]()
    def snapshot(spark: SparkSession): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          map.toSeq.map { case (k, v) => org.apache.spark.sql.Row(k, v) }, 1),
        kvSchema)
    def upsert(pairs: DataFrame): Unit =
      pairs.collect().foreach(r => map.put(r.getString(0), r.getString(1)))
    def remove(keys: DataFrame): Unit =
      keys.collect().foreach(r => map.remove(r.getString(0)))
    def get(k: String): Option[String] = map.get(k)
  }

  /** `file` cache backend: parquet KV directory with copy-on-write
    * versions (a reader can never observe a half-written store; the
    * `current` pointer flips atomically). */
  final class FileCache(root: String) extends CacheStore {
    private def fs = java.nio.file.Paths.get(root)
    private def currentPtr = fs.resolve("current")
    private def currentDir: Option[String] = {
      if (java.nio.file.Files.exists(currentPtr))
        Some(new String(java.nio.file.Files.readAllBytes(currentPtr), "UTF-8").trim)
      else None
    }
    def snapshot(spark: SparkSession): DataFrame = currentDir match {
      case Some(d) => spark.read.parquet(fs.resolve(d).toString)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], kvSchema)
    }
    private def writeVersion(df: DataFrame): Unit = {
      java.nio.file.Files.createDirectories(fs)
      val v = s"v${System.nanoTime()}"
      df.write.mode("overwrite").parquet(fs.resolve(v).toString)
      java.nio.file.Files.write(currentPtr, v.getBytes("UTF-8"))
    }
    def upsert(pairs: DataFrame): Unit = {
      val p = pairs.dropDuplicates("key")
      val merged = snapshot(p.sparkSession)
        .join(p.select(col("key")), scala.Seq("key"), "left_anti")
        .unionByName(p)
      writeVersion(merged)
    }
    def remove(keys: DataFrame): Unit =
      writeVersion(snapshot(keys.sparkSession)
        .join(keys.select(col("key")), scala.Seq("key"), "left_anti"))
  }

  /** The `cache` processor. key/value are Bloblang interpolation strings
    * (value defaults to the content). */
  final case class CacheProc(store: CacheStore, operator: String,
      key: String, value: String = "") extends Processor {

    private def keyCol(df: DataFrame) =
      graft.blobl.Interpolation.column(df, key).cast(StringType)
    private def valueCol(df: DataFrame) =
      if (value.isEmpty) Envelope.contentOrDoc(df).cast(StringType)
      else graft.blobl.Interpolation.column(df, value).cast(StringType)

    def apply(df: DataFrame): DataFrame = operator match {
      case "set" =>
        store.upsert(df.select(keyCol(df).as("key"), valueCol(df).as("value")))
        df
      case "add" =>
        val keyed = df.withColumn("_ck", keyCol(df))
        val existing = broadcast(
          store.snapshot(df.sparkSession).select(col("key").as("_ck"),
            lit(true).as("_exists")))
        val flagged = keyed.join(existing, scala.Seq("_ck"), "left")
        store.upsert(flagged.filter(col("_exists").isNull)
          .select(col("_ck").as("key"), valueCol(df).as("value"))
          .dropDuplicates("key"))
        Envelope.flagError(flagged, col("_exists").isNotNull,
            lit("cache add: key already exists"))
          .drop("_ck", "_exists")
      case "get" =>
        val keyed = df.withColumn("_ck", keyCol(df))
        val kv = broadcast(store.snapshot(df.sparkSession)
          .select(col("key").as("_ck"), col("value").as("_cv")))
        val joined = keyed.join(kv, scala.Seq("_ck"), "left")
        Envelope.flagError(
            joined.withColumn(Envelope.Content, col("_cv").cast(BinaryType)),
            col("_cv").isNull, lit("cache get: key not found"))
          .drop("_ck", "_cv")
      case "delete" =>
        store.remove(df.select(keyCol(df).as("key")))
        df
      case o => throw new IllegalArgumentException(s"cache: unknown operator $o")
    }
  }

  /** Named cache-resource registry (the YAML `cache_resources` section). */
  object Caches {
    private val stores = scala.collection.concurrent.TrieMap[String, CacheStore]()
    def register(name: String, store: CacheStore): Unit = stores.put(name, store)
    def apply(name: String): CacheStore = stores.getOrElse(name,
      throw new IllegalArgumentException(s"unknown cache resource $name"))
    def clear(): Unit = stores.clear()
  }
}

/** `awk` processor (`lib/processor/awk.go`): run an awk program over the
  * content, output replaces content. Maps onto the subprocess pattern —
  * one awk process per partition, line-lockstep (the program must print
  * exactly one record per input line). Only the `text` codec (content as
  * `$0`) is supported: the reference's `json` codec injects per-row
  * variables, which a partition-long process cannot receive. */
final case class AwkProc(program: String, codec: String = "text") extends Processor {
  require(codec == "text",
    "awk: only codec 'text' is supported (json codec needs per-row vars)")
  // mawk buffers output with its own writer (stdbuf can't reach it) and
  // would deadlock the line-lockstep pipe; -W interactive makes it flush
  // per record. gawk/busybox awk flush before blocking on input.
  private def cmd: scala.Seq[String] =
    if (new java.io.File("/usr/bin/mawk").exists)
      scala.Seq("mawk", "-W", "interactive", program)
    else scala.Seq("awk", program)
  def apply(df: DataFrame): DataFrame = SubprocessProc(cmd)(df)
}

/** `log` processor (`lib/processor/log.go`): log an interpolated message
  * as rows flow. Sampled per partition (first `sampleN` rows) so the hot
  * path stays a passthrough; the interpolation is computed as a Catalyst
  * column. */
final case class LogProc(level: String, message: String, sampleN: Int = 1)
    extends Processor {
  def apply(df: DataFrame): DataFrame = {
    val withMsg = df.withColumn("_log_msg",
      graft.blobl.Interpolation.column(df, message).cast(StringType))
    val schema = withMsg.schema
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = schema.fieldIndex("_log_msg")
    val (lvl, n) = (level.toUpperCase, sampleN)
    withMsg.mapPartitions { rows =>
      val logger = org.slf4j.LoggerFactory.getLogger("graft.pipeline")
      var logged = 0
      rows.map { r =>
        if (logged < n) {
          logged += 1
          val msg = r.getString(idx)
          lvl match {
            case "ERROR" => logger.error(msg)
            case "WARN" => logger.warn(msg)
            case "DEBUG" => logger.debug(msg)
            case "TRACE" => logger.trace(msg)
            case _ => logger.info(msg)
          }
        }
        r
      }
    }(enc).drop("_log_msg")
  }
}
