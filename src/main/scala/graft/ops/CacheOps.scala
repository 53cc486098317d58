package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  /** In-heap KV store. `ttlSeconds > 0` gives the reference memory
    * cache's expiry semantics (`lib/cache/memory.go:92-110`: items older
    * than the TTL are dead on read and reaped lazily — no timer thread
    * needed). `clock` is injectable for deterministic specs. */
  final class MemoryCache(ttlSeconds: Long = 0L,
      clock: () => Long = () => System.currentTimeMillis()) extends CacheStore {
    private val map =
      scala.collection.concurrent.TrieMap[String, (String, Long)]()
    private def live(e: (String, Long)): Boolean =
      ttlSeconds <= 0 || clock() - e._2 < ttlSeconds * 1000L
    private def reap(): Unit =
      if (ttlSeconds > 0)
        map.filterNot { case (_, e) => live(e) }.keys.foreach(map.remove)
    def snapshot(spark: SparkSession): DataFrame = {
      reap()
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          map.toSeq.collect { case (k, e) if live(e) =>
            org.apache.spark.sql.Row(k, e._1) }, 1),
        kvSchema)
    }
    def upsert(pairs: DataFrame): Unit = {
      val now = clock()
      pairs.collect().foreach(r => map.put(r.getString(0), (r.getString(1), now)))
    }
    def remove(keys: DataFrame): Unit =
      keys.collect().foreach(r => map.remove(r.getString(0)))
    def get(k: String): Option[String] = {
      val e = map.get(k)
      if (e.exists(live)) e.map(_._1)
      else { e.foreach(_ => map.remove(k)); None }
    }
  }

  /** `file` cache backend: parquet KV store with APPEND-DELTA segments
    * and merge-on-read (the LSM shape). Each upsert/remove writes one
    * O(batch) segment and appends it to the `current` manifest — a
    * streaming dedupe's per-micro-batch write-back stays O(batch), not
    * O(store) (the old copy-on-write rewrite made a long-running stream
    * quadratic). Readers merge segments last-wins per key (tombstones
    * for deletes); past [[FileCache.MaxSegments]] the store compacts to
    * one segment. The manifest flips in a single atomic write, so a
    * reader can never observe a half-written store. */
  final class FileCache(root: String) extends CacheStore {
    private def fs = java.nio.file.Paths.get(root)
    private def currentPtr = fs.resolve("current")
    private def segments: List[String] =
      if (java.nio.file.Files.exists(currentPtr))
        new String(java.nio.file.Files.readAllBytes(currentPtr), "UTF-8")
          .split("\\s+").filter(_.nonEmpty).toList
      else Nil

    private def snapshotOf(spark: SparkSession, segs: List[String]): DataFrame =
      segs match {
        case Nil => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], kvSchema)
        case ss =>
          val parts = ss.zipWithIndex.map { case (s, i) =>
            val df = spark.read.parquet(fs.resolve(s).toString)
            val d = if (df.columns.contains("_del")) df
                    else df.withColumn("_del", lit(false)) // pre-delta segment
            d.withColumn("_seg", lit(i))
          }
          // last-wins per key, then drop tombstones: one partial-agg
          // shuffle on key — the same partitioned shape at any store size
          parts.reduce(_.unionByName(_))
            .groupBy(col("key"))
            .agg(max_by(struct(col("value"), col("_del")), col("_seg")).as("_w"))
            .filter(!col("_w._del"))
            .select(col("key"), col("_w.value").as("value"))
      }

    def snapshot(spark: SparkSession): DataFrame = snapshotOf(spark, segments)

    private def appendSegment(df: DataFrame, del: Boolean): Unit = {
      java.nio.file.Files.createDirectories(fs)
      // segment names must be unique ACROSS JVMs (the parquet write
      // happens before the lock): nanoTime alone can collide between
      // concurrent pipelines, so qualify with pid + a random component
      val v = FileCache.freshSegmentName()
      df.withColumn("_del", lit(del))
        .write.mode("overwrite").parquet(fs.resolve(v).toString)
      // the cache is a SHARED named resource (multiple pipelines may
      // write concurrently — the streaming dedupe contract): serialize
      // the read-manifest/append/flip section under an OS file lock so
      // a concurrent writer can't lose the other's segment
      val lockCh = java.nio.channels.FileChannel.open(fs.resolve(".lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      val lock = lockCh.lock()
      try appendLocked(df, v)
      finally { lock.release(); lockCh.close() }
    }

    private def appendLocked(df: DataFrame, v: String): Unit = {
      val segs = segments :+ v
      if (segs.length > FileCache.MaxSegments) {
        val merged = FileCache.freshSegmentName() + "m"
        snapshotOf(df.sparkSession, segs)
          .withColumn("_del", lit(false))
          .write.mode("overwrite").parquet(fs.resolve(merged).toString)
        java.nio.file.Files.write(currentPtr, merged.getBytes("UTF-8"))
        // Superseded segments are NOT deleted inline: a concurrent
        // pipeline (e.g. a streaming dedupe's stream-static anti-join,
        // which re-reads the snapshot's parquet paths every micro-batch)
        // may still hold a plan over them, and an immediate delete turns
        // that into FileNotFoundException rather than a clean retry.
        // Instead they go to a timestamped trash manifest; each later
        // compaction sweeps only entries older than the grace period,
        // by which point any manifest re-read has moved readers onto
        // newer segments. (Readers that cache a snapshot plan for LONGER
        // than the grace period should set
        // spark.sql.files.ignoreMissingFiles.)
        val now = System.currentTimeMillis()
        val oldTrash: List[(Long, String)] =
          if (java.nio.file.Files.exists(trashPtr))
            new String(java.nio.file.Files.readAllBytes(trashPtr), "UTF-8")
              .split("\n").filter(_.contains("\t")).toList
              .map { l => val t = l.split("\t"); (t(0).toLong, t(1)) }
          else Nil
        val (sweep, keep) = oldTrash.partition(_._1 < now - FileCache.TrashGraceMs)
        sweep.foreach { case (_, s) =>
          try {
            val dir = fs.resolve(s)
            java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
              .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
          } catch { case _: Exception => () }
        }
        val newTrash = keep ++ segs.map(s => (now, s))
        java.nio.file.Files.write(trashPtr,
          newTrash.map { case (t, s) => s"$t\t$s" }.mkString("\n").getBytes("UTF-8"))
      } else
        java.nio.file.Files.write(currentPtr, segs.mkString("\n").getBytes("UTF-8"))
    }

    private def trashPtr = fs.resolve("trash")

    def upsert(pairs: DataFrame): Unit =
      appendSegment(pairs.dropDuplicates("key")
        .select(col("key"), col("value")), del = false)
    def remove(keys: DataFrame): Unit =
      appendSegment(keys.select(col("key"),
        lit(null).cast(StringType).as("value")).dropDuplicates("key"), del = true)
  }

  object FileCache {
    /** Compaction threshold: manifests longer than this merge to one
      * segment (bounds read amplification at ~16 segment scans). */
    val MaxSegments = 16

    /** Deferred-deletion grace for superseded segments (ms): concurrent
      * readers re-resolve the manifest well within this window. */
    val TrashGraceMs: Long = 10 * 60 * 1000L

    private val rng = new java.security.SecureRandom()
    /** Unique across JVMs: time + pid + 32 random bits. */
    def freshSegmentName(): String =
      s"v${System.nanoTime()}_${ProcessHandle.current().pid()}_${Integer.toHexString(rng.nextInt())}"
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

  /** `multilevel` cache (`lib/cache/multilevel.go`): reads resolve
    * through the levels in order (earliest level wins per key); writes
    * and deletes fan out to every level. */
  final class MultilevelCache(levels: scala.Seq[CacheStore]) extends CacheStore {
    require(levels.nonEmpty, "multilevel cache: at least one level")
    def snapshot(spark: SparkSession): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val all = levels.zipWithIndex
        .map { case (c, i) => c.snapshot(spark).withColumn("_lvl", lit(i)) }
        .reduce(_.unionAll(_))
      val w = Window.partitionBy(col("key")).orderBy(col("_lvl"))
      all.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).select(col("key"), col("value"))
    }
    def upsert(pairs: DataFrame): Unit = levels.foreach(_.upsert(pairs))
    def remove(keys: DataFrame): Unit = levels.foreach(_.remove(keys))
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
  * content, printed output replaces content. Maps onto the subprocess
  * pattern — one awk process per partition, line-lockstep (the program
  * must print exactly one record per input line).
  *
  * Codecs (awk.go:440-443):
  *  - `text`: content is `$0`, the typical awk use.
  *  - `json`: the doc's flattened leaf fields become named awk variables
  *    (`flattenForAWK`, awk.go:825-827: dots → `_`, like `doc.val1` →
  *    `doc_val1`) and `$0` is a single space. The reference injects vars
  *    per message at interpreter startup; a partition-long process can't
  *    restart per row, but the envelope's doc SCHEMA is static, so the
  *    assignment prologue is generated at compile time and the values
  *    travel as an escaped unit-separator line per row. Divergences
  *    (documented in COVERAGE.md): metadata keys are dynamic and not
  *    injected; array fields bind their LAST element (the reference's
  *    map-iteration order is unspecified there); nulls read as "".
  */
final case class AwkProc(program: String, codec: String = "text") extends Processor {
  require(codec == "text" || codec == "json",
    s"awk: unrecognised codec: $codec")
  // mawk buffers output with its own writer (stdbuf can't reach it) and
  // would deadlock the line-lockstep pipe; -W interactive makes it flush
  // per record. gawk/busybox awk flush before blocking on input.
  private def cmd(prog: String): scala.Seq[String] =
    if (new java.io.File("/usr/bin/mawk").exists)
      scala.Seq("mawk", "-W", "interactive", prog)
    else scala.Seq("awk", prog)

  def apply(df: DataFrame): DataFrame = codec match {
    case "text" => SubprocessProc(cmd(program))(df)
    case "json" =>
      val fields = AwkProc.docLeaves(df)
      val line = concat_ws("\u001f", fields.map(f => AwkProc.escape(f._2)): _*)
      val staged = df.withColumn(Envelope.Content, line.cast(BinaryType))
      SubprocessProc(cmd(AwkProc.prologue(fields.map(_._1)) + "\n" + program))(staged)
  }
}

object AwkProc {
  /** Flattened (awkVarName, valueColumn) pairs for the doc struct, in
    * schema order — the static analog of the reference's `flattenForAWK`.
    * Maps are skipped (dynamic keys can't become compile-time names). */
  private[ops] def docLeaves(df: DataFrame): scala.Seq[(String, Column)] = {
    def walk(dt: DataType, path: String, c: Column): scala.Seq[(String, Column)] =
      dt match {
        case st: StructType => st.fields.toSeq.flatMap { f =>
          val p = if (path.isEmpty) f.name else path + "." + f.name
          walk(f.dataType, p, c.getField(f.name))
        }
        case ArrayType(et, _) => walk(et, path, element_at(c, -1))
        case _: MapType => scala.Seq.empty
        case _ => scala.Seq((path.replaceAll("[^a-zA-Z0-9_]", "_"), c.cast(StringType)))
      }
    walk(df.schema(Envelope.Doc).dataType, "", col(Envelope.Doc))
  }

  /** Escape % and the unit separator so any value survives the
    * one-line-per-row pipe; newlines become spaces (the same flattening
    * the text codec applies on write — a value that re-grew a newline
    * would make the program emit two lines and break lockstep). */
  private[ops] def escape(c: Column): Column = {
    val s = coalesce(c, lit(""))
    regexp_replace(regexp_replace(regexp_replace(
      s, "[\n\r]", " "), "%", "%P"), "\u001f", "%U")
  }

  /** Generated awk prologue: decode the var line, assign the flattened
    * doc variables, reset `$0` to the reference's single space. */
  private[ops] def prologue(names: scala.Seq[String]): String = {
    val assigns = names.zipWithIndex
      .map { case (n, i) => s"$n=__gdec(__GV[${i + 1}]);" }.mkString(" ")
    """function __gdec(s,  o,i,n,c) { o=""; n=length(s); i=1; while (i<=n) { c=substr(s,i,1); if (c=="%") { i+=1; c=substr(s,i,1); if (c=="U") { o=o __US } else if (c=="P") { o=o "%" } else { o=o "%" c } } else { o=o c } i+=1 } return o }
BEGIN { __US = sprintf("%c", 31) }
{ split($0, __GV, __US); """ + assigns + """ $0 = " " }"""
  }
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
