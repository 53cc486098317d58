package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Envelope
import graft.ops.CacheOps._
import graft.ops.{AwkProc, LogProc}

/** cache processor verbs over memory + file backends, awk, log. */
class CacheSpec extends AnyFunSuite {
  lazy val spark = Sessions.builder("4").getOrCreate()
  import spark.implicits._

  def env(rows: (Long, String)*) = Envelope.wrap(
    rows.toDF("id", "s"), scala.Seq(col("id")))

  test("cache set → get round trip (memory backend)") {
    val store = new MemoryCache
    CacheProc(store, "set", "k-${! this.id }", "${! this.s }")(
      env(1L -> "one", 2L -> "two"))
    assert(store.get("k-1").contains("one"))
    assert(store.get("k-2").contains("two"))

    val got = CacheProc(store, "get", "k-${! this.id }")(
      env(1L -> "x", 3L -> "y"))
    val rows = got.select(col("doc.id"),
      col(Envelope.Content).cast("string"), col(Envelope.Error)).collect()
    val byId = rows.map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(byId(1L) == (("one", null)))
    assert(byId(3L)._2 == "cache get: key not found")
  }

  test("memory cache TTL: items die after expiry, reads reap them") {
    var now = 1000L
    val store = new MemoryCache(ttlSeconds = 60, clock = () => now)
    CacheProc(store, "set", "k-${! this.id }", "${! this.s }")(env(1L -> "v"))
    assert(store.get("k-1").contains("v"))
    now += 59 * 1000L
    assert(store.get("k-1").contains("v")) // still inside the TTL
    now += 2 * 1000L
    assert(store.get("k-1").isEmpty) // expired
    assert(store.snapshot(spark).count() == 0) // snapshot reaps too
  }

  test("interpolated output path writes one file set per resolved path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dynpath").toString
    val spec = graft.runtime.Config.load(
      s"""input:
         |  generate:
         |    count: 4
         |    mapping: "root.id = this.i\\nroot.sev = if this.i % 2 == 0 { \\"info\\" } else { \\"warn\\" }"
         |output:
         |  file:
         |    path: $dir/$${! this.sev }.jsonl
         |    codec: json
         |""".stripMargin)
    spec.run(spark)
    val written = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(written.contains("info.jsonl") && written.contains("warn.jsonl"))
    assert(spark.read.json(s"$dir/info.jsonl").count() == 2)
  }

  test("cache-backed dedupe drops repeats ACROSS batches") {
    val store = new MemoryCache
    val proc = graft.ops.CachedDedupeProc(store, "this.s")
    val first = proc(env(1L -> "a", 2L -> "b", 3L -> "a")).count()
    assert(first == 2) // batch-local dup dropped too
    val second = proc(env(4L -> "b", 5L -> "c")).count()
    assert(second == 1) // "b" was seen in the first batch
    assert(store.get("c").contains("1"))
  }

  test("cache add flags existing keys; delete removes (file backend)") {
    val dir = Files.createTempDirectory("graft-cache").toString
    val store = new FileCache(dir)
    CacheProc(store, "set", "${! this.s }", "v1")(env(1L -> "a"))
    val added = CacheProc(store, "add", "${! this.s }", "v2")(
      env(1L -> "a", 2L -> "b"))
    val errs = added.select(col("doc.s"), col(Envelope.Error)).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(errs("a") == "cache add: key already exists")
    assert(errs("b") == null)
    // a kept v1, b got v2
    val snap = store.snapshot(spark).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(snap == Map("a" -> "v1", "b" -> "v2"))

    CacheProc(store, "delete", "${! this.s }")(env(1L -> "a"))
    assert(store.snapshot(spark).collect().map(_.getString(0)).toSeq == scala.Seq("b"))
  }

  test("dedupe key interpolation, default content key, and xxhash mode (dedupe.go fields)") {
    import graft.ops.DedupeProc
    val e = env(1L -> "a", 2L -> "b", 3L -> "a")
      .withColumn(Envelope.Content, col("doc.s").cast("binary"))
    // interpolated key (the reference's native form)
    assert(DedupeProc("${! this.s }")(e).count() == 2)
    // default key = message contents
    assert(DedupeProc("content().string()")(e).count() == 2)
    // hashed key mode keeps the same distinct set
    assert(DedupeProc("${! this.s }", hash = "xxhash")(e).count() == 2)
    // YAML form compiles with hash + interpolated key + default key
    val spec = graft.runtime.Config.load(
      """input:
        |  generate: { count: 4, mapping: "root.v = this.i % 2" }
        |pipeline:
        |  processors:
        |    - dedupe:
        |        key: ${! this.v }
        |        hash: xxhash
        |output: { drop: {} }
        |""".stripMargin)
    assert(spec.pipeline.nonEmpty)
  }

  test("file cache append-delta: last-wins overwrite, tombstoned delete, compaction") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-lsm").toString
    val store = new FileCache(dir)
    store.upsert(scala.Seq(("a", "1"), ("b", "1")).toDF("key", "value"))
    store.upsert(scala.Seq(("a", "2"), ("c", "1")).toDF("key", "value")) // overwrite a
    store.remove(scala.Seq(Tuple1("b")).toDF("key"))                    // tombstone b
    val snap = store.snapshot(spark).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(snap == Map("a" -> "2", "c" -> "1"))
    // a re-set after a delete resurrects the key (segment order wins)
    store.upsert(scala.Seq(("b", "9")).toDF("key", "value"))
    assert(store.snapshot(spark).filter(col("key") === "b").head().getString(1) == "9")
    // push past the compaction threshold; contents must be unchanged
    (0 until FileCache.MaxSegments + 2).foreach { i =>
      store.upsert(scala.Seq((s"k$i", i.toString)).toDF("key", "value"))
    }
    val after = store.snapshot(spark).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(after("a") == "2" && after("b") == "9" && after("k5") == "5")
    assert(after.size == 3 + FileCache.MaxSegments + 2)
    // compaction bounds the manifest: never more than MaxSegments + 1
    // live segments (the merged one plus post-compaction appends)
    val manifest = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "current")), "UTF-8").trim
    val nSegs = manifest.split("\\s+").count(_.nonEmpty)
    assert(nSegs <= FileCache.MaxSegments + 1,
      s"manifest not bounded by compaction: $nSegs segments")
    assert(manifest.contains("m"), "no compacted segment in the manifest")
  }

  test("file cache compaction defers segment deletion past a grace period") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-lsm-trash").toString
    val store = new FileCache(dir)
    (0 to FileCache.MaxSegments).foreach { i =>
      store.upsert(scala.Seq((s"k$i", i.toString)).toDF("key", "value"))
    }
    // compaction has happened; superseded segment dirs must STILL exist
    // (a concurrent reader may hold a plan over them) — they are only
    // recorded in the trash manifest
    val trashPath = java.nio.file.Paths.get(dir, "trash")
    assert(Files.exists(trashPath), "no trash manifest after compaction")
    val trashed = new String(Files.readAllBytes(trashPath), "UTF-8")
      .split("\n").filter(_.contains("\t")).map(_.split("\t")(1))
    assert(trashed.nonEmpty)
    trashed.foreach { s =>
      assert(Files.exists(java.nio.file.Paths.get(dir, s)),
        s"segment $s deleted inline — breaks concurrent readers")
    }
    // backdate the trash entries past the grace period, force another
    // compaction round: now (and only now) they get swept
    val backdated = new String(Files.readAllBytes(trashPath), "UTF-8")
      .split("\n").filter(_.contains("\t"))
      .map { l => val t = l.split("\t"); s"1\t${t(1)}" }.mkString("\n")
    Files.write(trashPath, backdated.getBytes("UTF-8"))
    (0 to FileCache.MaxSegments).foreach { i =>
      store.upsert(scala.Seq((s"x$i", i.toString)).toDF("key", "value"))
    }
    trashed.foreach { s =>
      assert(!Files.exists(java.nio.file.Paths.get(dir, s)),
        s"expired trash segment $s not swept")
    }
    // store contents unaffected throughout
    val snap = store.snapshot(spark).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(snap("k0") == "0" && snap(s"x${FileCache.MaxSegments}") ==
      FileCache.MaxSegments.toString)
  }

  test("awk processor (text codec) pipes content through mawk") {
    val e = env(1L -> "hello", 2L -> "world")
      .withColumn(Envelope.Content, col("doc.s").cast("binary"))
    val out = AwkProc("{ print toupper($0) }")(e)
    assert(out.select(col(Envelope.Content).cast("string")).as[String]
      .collect().sorted.toSeq == scala.Seq("HELLO", "WORLD"))
  }

  test("awk processor (json codec) binds flattened doc fields as variables") {
    // mirrors the reference's "Json Mapping and Arithmetic" example shape
    // (awk.go:326-345): fields accessed by flattened name, $0 is " ".
    val e = Envelope.wrap(
      scala.Seq((1L, 3L, 4L, "x%y\nz"), (2L, 10L, 5L, "plain"))
        .toDF("id", "val1", "val2", "s"),
      scala.Seq(col("id")))
    val out = AwkProc("{ print id \":\" (val1 + val2) \":\" s }", codec = "json")(e)
    assert(out.select(col(Envelope.Content).cast("string")).as[String]
      .collect().sorted.toSeq ==
      scala.Seq("1:7:x%y z", "2:15:plain"))
  }

  test("log processor passes rows through unchanged") {
    val e = env(1L -> "a", 2L -> "b")
    val out = LogProc("INFO", "saw ${! this.s }")(e)
    assert(out.columns.toSeq == e.columns.toSeq)
    assert(out.count() == 2)
  }

  test("multilevel cache: read-through order, fan-out writes") {
    import spark.implicits._
    import graft.ops.CacheOps._
    val l1 = new MemoryCache
    val l2 = new MemoryCache
    l2.upsert(scala.Seq(("k1", "from-l2"), ("k2", "only-l2")).toDF("key", "value"))
    l1.upsert(scala.Seq(("k1", "from-l1")).toDF("key", "value"))
    val ml = new MultilevelCache(scala.Seq(l1, l2))
    val snap = ml.snapshot(spark).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(snap == Map("k1" -> "from-l1", "k2" -> "only-l2"), snap)
    ml.upsert(scala.Seq(("k3", "v3")).toDF("key", "value"))
    assert(l1.get("k3").contains("v3") && l2.get("k3").contains("v3"))
    ml.remove(scala.Seq("k1").toDF("key"))
    assert(l1.get("k1").isEmpty && l2.get("k1").isEmpty)
    // config surface: multilevel over two registered labels
    Caches.register("lv1", new MemoryCache)
    Caches.register("lv2", new MemoryCache)
    graft.runtime.Config.load(
      """input:
        |  generate: {count: 1, mapping: 'root = {}'}
        |output:
        |  drop: {}
        |cache_resources:
        |  - label: tiered
        |    multilevel: [lv1, lv2]
        |""".stripMargin)
    assert(Caches("tiered").isInstanceOf[MultilevelCache])
  }

  test("aws_-prefixed cache kinds hit the external-KV backend, not the in-heap default") {
    // lib/cache/constructor.go registers BOTH aws_s3 and s3 (likewise
    // dynamodb) — the aws_ spellings used to fall through to the
    // in-heap memory map; the backend+target namespacing means two
    // resources on the same bucket must SHARE state
    graft.runtime.Config.load(
      """cache_resources:
        |  - label: c_aws
        |    aws_s3:
        |      bucket: parity-bkt
        |  - label: c_short
        |    s3:
        |      bucket: parity-bkt
        |input:
        |  generate: { count: 1, mapping: "root.i = this.i" }
        |output:
        |  drop: {}
        |""".stripMargin)
    import spark.implicits._
    Caches("c_aws").upsert(
      scala.Seq(("shared-key", "v1")).toDF("key", "value"))
    val got = Caches("c_short").snapshot(spark)
      .where(col("key") === "shared-key").collect()
    assert(got.length == 1 && got.head.getString(1) == "v1")
  }

  test("YAML cache_resources + cache/awk/log processors compile") {
    val spec = graft.runtime.Config.load(
      """cache_resources:
        |  - label: mycache
        |    memory: {}
        |input:
        |  generate:
        |    count: 2
        |    mapping: "root.i = this.i"
        |pipeline:
        |  processors:
        |    - cache:
        |        resource: mycache
        |        operator: set
        |        key: "k${! this.i }"
        |    - log:
        |        message: "row ${! this.i }"
        |    - awk:
        |        program: "{ print $0 }"
        |output:
        |  drop: {}
        |""".stripMargin)
    assert(spec.pipeline.size == 3)
    spec.run(spark) // executes: set + log + awk over 2 rows
  }
}
