package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llmops.Curation

class CurationSpec extends AnyFunSuite {
  lazy val spark = Sessions.builder("4").getOrCreate()
  import spark.implicits._

  test("c4LineFilter keeps long clean lines and gates docs on survivors") {
    val df = Seq(
      (1L, "one two three four five\nshort line\nbad javascript line here today ok\nsix seven eight nine ten"),
      (2L, "tiny\nalso tiny")).toDF("id", "text")
    val out = Curation.c4LineFilter(df, "id", "text", minWords = 5,
        badSubstrings = Seq("javascript"), minKeptLines = 2)
      .orderBy("id").collect()
    assert(out(0).getAs[Long]("n_lines") === 4)
    assert(out(0).getAs[Long]("n_kept") === 2)
    assert(out(0).getAs[String]("clean_text") ===
      "one two three four five\nsix seven eight nine ten")
    assert(out(0).getAs[Boolean]("keep_doc"))
    assert(out(1).getAs[Long]("n_kept") === 0)
    assert(out(1).getAs[String]("clean_text") === "")
    assert(!out(1).getAs[Boolean]("keep_doc"))
  }

  test("lineDedupGlobal removes repeat lines corpus-wide, first occurrence wins") {
    val df = Seq(
      (1L, "alpha\nshared line\nbeta"),
      (2L, "shared line\ngamma"),
      (3L, "gamma\ngamma")).toDF("id", "text")
    val out = Curation.lineDedupGlobal(df, "id", "text")
      .orderBy("id").collect()
    // doc 1 keeps everything (first to use "shared line")
    assert(out(0).getAs[Long]("n_removed") === 0)
    assert(out(0).getAs[String]("clean_text") === "alpha\nshared line\nbeta")
    // doc 2 loses "shared line", keeps gamma (first gamma overall)
    assert(out(1).getAs[Long]("n_removed") === 1)
    assert(out(1).getAs[String]("clean_text") === "gamma")
    // doc 3: both gammas are later occurrences
    assert(out(2).getAs[Long]("n_removed") === 2)
    assert(out(2).getAs[String]("clean_text") === "")
  }

  test("canonicalizeUrl normalizes scheme/host/path/query and drops tracking") {
    val cases = Seq(
      ("HTTPS://WWW.Example.COM:443//a/./b/?utm_source=x&b=2&a=1#frag",
        "https://example.com/a/b?a=1&b=2"),
      ("http://host.com:80/", "http://host.com/"),
      ("http://host.com", "http://host.com/"),
      ("http://host.com/path/", "http://host.com/path"),
      ("http://host.com/p?utm_medium=email", "http://host.com/p"),
      ("http://host.com/p?z=1&y=2&z=0", "http://host.com/p?y=2&z=0&z=1"),
      // non-default port survives; www stripped only as a prefix
      ("http://wwwhost.com:8080/x", "http://wwwhost.com:8080/x"))
    val df = cases.map(_._1).toDF("url")
      .withColumn("canon", Curation.canonicalizeUrl(col("url")))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      assert(got(in) === want, s"canonicalizeUrl($in)")
    }
  }

  test("hashSplit is deterministic, exhaustive, and near the target weights") {
    val df = spark.range(10000).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Curation.hashSplit(df, "id", splits)
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 10000L)
    assert(math.abs(counts("train") - 8000L) < 300, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 1000L) < 150, s"val=${counts("val")}")
    assert(math.abs(counts("test") - 1000L) < 150, s"test=${counts("test")}")
    // re-running yields the identical assignment (pure hash, no RNG)
    val again = Curation.hashSplit(df, "id", splits)
    assert(out.except(again).count() === 0 && again.except(out).count() === 0)
  }

  test("splitThresholds rejects weights that don't sum to 1") {
    intercept[IllegalArgumentException] {
      Curation.splitThresholds(Seq("a" -> 0.5, "b" -> 0.3))
    }
  }

  test("bpePairCounts counts within-word adjacent char pairs with multiplicity") {
    val df = Seq("aa ab aa", "x aab").toDF("text")
    // words: aa, ab, aa, x(skipped), aab -> pairs: aa, ab, aa, aa, ab
    val got = Curation.bpePairCounts(df, "text", k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("aa" -> 3L, "ab" -> 2L))
  }

  test("curation ops survive null/empty/single-token text") {
    val df = Seq[(java.lang.Long, String)](
      (1L, null), (2L, ""), (3L, "one"), (4L, "two tokens here"))
      .toDF("id", "text")
    val c4 = Curation.c4LineFilter(df, "id", "text", minWords = 2,
      badSubstrings = Seq("zz"), minKeptLines = 1).orderBy("id").collect()
    assert(c4.length === 4)
    // null text: no lines, not kept (never negative counts from size(null))
    assert(c4(0).getAs[Long]("n_lines") === 0L &&
      c4(0).getAs[Long]("n_kept") === 0L && !c4(0).getAs[Boolean]("keep_doc"))
    assert(c4(1).getAs[Long]("n_lines") === 1L && c4(1).getAs[Long]("n_kept") === 0L)
    val ld = Curation.lineDedupGlobal(df, "id", "text").orderBy("id").collect()
    assert(ld.length === 4 && ld.forall(_.getAs[Long]("n_removed") >= 0L))
    assert(Curation.bpePairCounts(df, "text", 10).collect()
      .forall(_.getLong(1) > 0))
    assert(Curation.hashSplit(df, "id",
      Seq("a" -> 0.5, "b" -> 0.5)).count() === 4)
    val canon = df.select(Curation.canonicalizeUrl(col("text")).as("c")).collect()
    assert(canon.length === 4) // no throw on null/garbage input
  }

  test("composition: chunkOverlap + minhashPairs finds a shared passage between docs") {
    import graft.llmops.{Dedup, TextStats}
    // two long docs sharing one verbatim passage, one unrelated doc
    val passage = (1 to 40).map(i => s"shared$i").mkString(" ")
    val df = Seq(
      (1L, (1 to 30).map(i => s"alpha$i").mkString(" ") + " " + passage),
      (2L, passage + " " + (1 to 30).map(i => s"beta$i").mkString(" ")),
      (3L, (1 to 70).map(i => s"lone$i").mkString(" "))).toDF("doc_id", "text")
    // sub-document near-dup: chunk into windows, then LSH near-dup over
    // chunk ids "doc:ix" — the chunk relation is what pairs at 100 TB
    val chunks = TextStats.chunkOverlap(df, "doc_id", "text",
        window = 32, stride = 16)
      .select(concat(col("id"), lit(":"), col("chunk_ix")).as("cid"),
        col("chunk_text"))
    val pairs = Dedup.minhashPairs(chunks, "cid", "chunk_text",
        threshold = 0.8)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getString(0).split(':')(0), r.getString(1).split(':')(0)))
    // at least one cross-document chunk pair between docs 1 and 2, none
    // touching the unrelated doc 3
    assert(pairs.exists(p => Set(p._1, p._2) == Set("1", "2")), pairs.mkString(", "))
    assert(!pairs.exists(p => p._1 == "3" || p._2 == "3"), pairs.mkString(", "))
  }

  test("deterministicShuffle is a stable permutation of 0..n-1") {
    val df = spark.range(500).toDF("id")
    val a = Curation.deterministicShuffle(df, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.values.toSeq.sorted === (0L until 500L))
    val b = Curation.deterministicShuffle(df, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    // it actually permutes (md5 order != id order)
    assert((0L until 500L).exists(i => a(i) != i))
  }

  test("truncateToBudget: sentence-aware cut, short docs untouched") {
    val df = Seq(
      (1L, "one two three. four five six seven"), // 7 tokens, budget 5
      (2L, "no sentence end here at all beyond budget"),
      (3L, "short doc")).toDF("id", "text")
    val out = Curation.truncateToBudget(df, "id", "text", maxTokens = 5)
      .orderBy("id").collect()
    // kept window = "one two three. four five" → back off to last '.'
    assert(out(0).getBoolean(2) && out(0).getString(3) == "one two three.")
    // no '.' in window → keep the full 5-token window
    assert(out(1).getBoolean(2)
      && out(1).getString(3) == "no sentence end here at")
    assert(!out(2).getBoolean(2) && out(2).getString(3) == "short doc")
  }

  test("sampleExactK: deterministic across input order, k caps the size") {
    val ids = (1L to 100L).toList
    val a = Curation.sampleExactK(ids.toDF("id"), "id", 10)
      .collect().map(_.getLong(0)).toSet
    val b = Curation.sampleExactK(
        scala.util.Random.shuffle(ids).toDF("id").repartition(7), "id", 10)
      .collect().map(_.getLong(0)).toSet
    assert(a === b && a.size === 10)
    // k beyond the corpus returns everything
    assert(Curation.sampleExactK(ids.toDF("id"), "id", 500).count() === 100)
  }

  test("dropTopGroups: largest k groups blocked, count ties break by name") {
    val df = scala.Seq(
      ("big", 1L), ("big", 2L), ("big", 3L),
      ("tie_a", 4L), ("tie_a", 5L),
      ("tie_b", 6L), ("tie_b", 7L),
      ("small", 8L)).toDF("g", "id")
    val out = Curation.dropTopGroups(df, "g", 2)
      .collect().map(r => r.getLong(1) -> r.getBoolean(2)).toMap
    // blocklist = big(3), then tie_a over tie_b lexicographically
    assert(out(1L) && out(4L) && !out(6L) && !out(8L))
  }

  test("interleaveGroups: training order cycles through groups round-robin") {
    val df = (1L to 30L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val out = Curation.interleaveGroups(df, "g", "id")
      .orderBy("train_rank").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    // groups are balanced (10 each), so consecutive train ranks never
    // repeat a group within a cycle of 3
    out.grouped(3).foreach { cycle =>
      assert(cycle.map(_._1).distinct.length === cycle.length)
    }
    // grp_rank is non-decreasing along the training order
    assert(out.map(_._2).sliding(2).forall(p => p(0) <= p(1)))
    // deterministic across input partitioning
    val base = Curation.interleaveGroups(df, "g", "id")
      .select("id", "train_rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val again = Curation.interleaveGroups(df.repartition(7), "g", "id")
      .select("id", "train_rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(base === again)
  }

  test("stratifiedExactSplit: exact per-group fraction, deterministic") {
    val df = ((1L to 100L).map(i => (i, "big")) ++
      (101L to 110L).map(i => (i, "small"))).toDF("id", "g")
    val out = Curation.stratifiedExactSplit(df, "id", "g", valFracBp = 1000)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(4)))
    // exactly floor(n * 0.10) per group: 10 of 100, 1 of 10
    assert(out.count(r => r._2 == "big" && r._3 == "val") === 10)
    assert(out.count(r => r._2 == "small" && r._3 == "val") === 1)
    // deterministic across partitioning
    val again = Curation.stratifiedExactSplit(df.repartition(7), "id", "g", 1000)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(out.map(r => r._1 -> r._3).toMap === again)
    // 0 bp → everything train; 10000 bp → everything val
    assert(Curation.stratifiedExactSplit(df, "id", "g", 0)
      .where(col("split") === "val").count() === 0)
    assert(Curation.stratifiedExactSplit(df, "id", "g", 10000)
      .where(col("split") === "train").count() === 0)
  }

  test("recencyWeights: halving per halflife, floored at 1 bp") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-03-10 23:59:00")), // newest: age 0
      (2L, ts("2024-03-08 00:01:00")), // age 2 days -> 0 halflives
      (3L, ts("2024-03-04 12:00:00")), // age 6 days -> 3 halflives @hl=2
      (4L, ts("2023-03-10 12:00:00"))  // age 366 -> capped, floor 1 bp
    ).toDF("id", "t")
    val out = Curation.recencyWeights(df, "id", col("t"), halflifeDays = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(out(1L) === (0L, 10000L))
    assert(out(2L) === (2L, 5000L))
    assert(out(3L) === (6L, 1250L))
    assert(out(4L)._2 === 1L) // shift capped at 13 → 10000 div 8192 = 1
  }

  test("scrubBoilerplateLines: df>=k lines drop everywhere, dups below keep") {
    val df = Seq(
      (1L, "banner\nunique one\nrepeat\nrepeat"), // banner df=3; repeat df=1 (dups kept)
      (2L, "banner\nunique two"),
      (3L, "banner\nunique three"),
      (4L, "pair\nonly here"),                    // pair df=2 < 3 -> kept
      (5L, "pair")
    ).toDF("id", "text")
    val out = Curation.scrubBoilerplateLines(df, "id", "text", minDf = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) === ((1L, 4L, 1L, "unique one\nrepeat\nrepeat")))
    assert(out(1) === ((2L, 2L, 1L, "unique two")))
    assert(out(3) === ((4L, 2L, 0L, "pair\nonly here")))
    assert(out(4) === ((5L, 1L, 0L, "pair")))
  }

  test("dedupLinesInDoc keeps first occurrence in order") {
    val df = Seq(
      (1L, "a\nb\na\nc\nb"),
      (2L, "x"),
      (3L, "dup\ndup\ndup")).toDF("id", "text")
    val out = Curation.dedupLinesInDoc(df, "id", "text")
      .orderBy("id").collect()
    assert(out(0).getLong(1) == 5L && out(0).getLong(2) == 3L
      && out(0).getString(3) == "a\nb\nc")
    assert(out(1).getString(3) == "x")
    assert(out(2).getLong(2) == 1L && out(2).getString(3) == "dup")
  }

  test("sourceSimilarity: exact Jaccard per source pair, zero-overlap pairs kept") {
    // A: {ab, cd}; B: {ab, ef}; C: {zz} — token-set fingerprints
    val df = Seq(
      ("A", "a b"), ("A", "c d"), ("B", "b a"), ("B", "e f"), ("C", "z z"))
      .toDF("source", "text")
    val out = graft.llmops.Dedup.sourceSimilarity(df, "source", "text")
      .orderBy("src_a", "src_b").collect()
    assert(out.length === 3)
    val ab = out(0) // A-B: inter 1 ("a b" ≡ "b a"), union 3 → 3333 bp
    assert(ab.getAs[Long]("n_inter") === 1L)
    assert(ab.getAs[Long]("jaccard_bp") === 3333L)
    val ac = out(1) // A-C: no overlap, pair still present
    assert(ac.getAs[Long]("n_inter") === 0L)
    assert(ac.getAs[Long]("jaccard_bp") === 0L)
  }

  test("clusterSafeSplit: byte-identical copies always share a split") {
    val df = (1L to 40L).map(i => (i, if (i % 4 == 0) "dup text" else s"doc $i"))
      .toDF("doc_id", "text")
    val out = Curation.clusterSafeSplit(df, "doc_id", "text",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).collect()
    val dupSplits = out.filter(_.getAs[String]("text") == "dup text")
      .map(_.getAs[String]("split")).distinct
    assert(dupSplits.length === 1) // all copies co-assigned
    val canon = out.filter(_.getAs[String]("text") == "dup text")
      .map(_.getAs[Long]("canon_id")).distinct
    assert(canon === Array(4L)) // min member id is the cluster key
  }

  test("new curation reports survive null/empty text") {
    val df = Seq(
      ("s1", "real text here"), ("s1", null), ("s1", ""), ("s2", null))
      .toDF("source", "text")
    // none of these may throw; groups with only null/empty text still row
    val sim = graft.llmops.Dedup.sourceSimilarity(df, "source", "text").collect()
    assert(sim.length === 1) // one pair s1-s2
    val imp = graft.llmops.Dedup.dedupImpact(df, "source", "text")
      .orderBy("source").collect()
    assert(imp.length === 2)
    val split = Curation.clusterSafeSplit(
      df.withColumn("id", monotonically_increasing_id()), "id", "text",
      Seq("train" -> 0.9, "test" -> 0.1)).collect()
    assert(split.length === 4)
    val prof = graft.llmops.TextStats.scriptProfile(df, "source", "text")
      .orderBy("group").collect()
    assert(prof.length === 2)
    assert(prof(0).getAs[Long]("n_docs") === 3L)
  }

  test("dedupImpact: dup copies and reclaimed bytes per source") {
    val df = Seq(
      ("s1", "same text"), ("s1", "same text"), ("s1", "uniq"),
      ("s2", "other")).toDF("source", "text")
    val out = graft.llmops.Dedup.dedupImpact(df, "source", "text")
      .orderBy("source").collect()
    val s1 = out(0)
    assert(s1.getAs[Long]("n_docs") === 3L)
    assert(s1.getAs[Long]("n_clusters") === 2L)
    assert(s1.getAs[Long]("dup_docs") === 1L)
    assert(s1.getAs[Long]("bytes_saved") === 9L) // one "same text" copy
    assert(out(1).getAs[Long]("dup_docs") === 0L)
  }
}
