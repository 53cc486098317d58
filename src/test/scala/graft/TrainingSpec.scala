package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llmops.Training

/** Training-data-assembly operators: k-means, sequence packing, mixing. */
class TrainingSpec extends AnyFunSuite {
  lazy val spark = Sessions.builder("4").getOrCreate()
  import spark.implicits._

  test("kmeans separates well-separated clusters; native agg = exact mean") {
    // two tight blobs on orthogonal axes + tiny jitter
    val pts = (0 until 20).map { i =>
      val base = if (i % 2 == 0) Array(1f, 0f, 0f, 0f) else Array(0f, 1f, 0f, 0f)
      val jit = base.zipWithIndex.map { case (v, d) => v + 0.01f * ((i + d) % 3) }
      (i.toLong, jit)
    }
    val df = pts.toDF("vec_id", "embedding")
    val (assigned, cents) = Training.KMeans.fit(df, "vec_id", "embedding", k = 2, iters = 3)
    val byCluster = assigned.select("vec_id", "cid").collect()
      .groupBy(_.getLong(1)).map { case (c, rs) => c -> rs.map(_.getLong(0)).toSet }
    assert(byCluster.size == 2)
    // each cluster is exactly one parity class
    assert(byCluster.values.toSet ==
      Set((0 until 20 by 2).map(_.toLong).toSet, (1 until 20 by 2).map(_.toLong).toSet))

    // native VectorSumAgg mean == driver-side exact mean of one cluster
    val evens = pts.filter(_._1 % 2 == 0).map(_._2)
    val exact = (0 until 4).map(d => evens.map(_(d).toDouble).sum / evens.size)
    val centRow = cents.orderBy("cid").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    val evenCid = byCluster.find(_._2.contains(0L)).get._1
    val got = centRow.find(_._1 == evenCid).get._2
    (exact, got).zipped.foreach((e, g) => assert(math.abs(e - g) < 1e-9))
  }

  test("packChunks: contiguous budget cuts, exact prefix arithmetic") {
    val docs = scala.Seq((1L, 100L), (2L, 50L), (3L, 200L), (4L, 30L), (5L, 500L))
      .toDF("doc_id", "toks")
    val out = Training.packChunks(docs, "doc_id", col("toks"), budget = 128L)
      .select("doc_id", "chunk_id", "chunk_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // prefix starts: 0, 100, 150, 350, 380
    assert(out.toSeq == scala.Seq(
      (1L, 0L, 0L), (2L, 0L, 100L), (3L, 1L, 22L), (4L, 2L, 94L), (5L, 2L, 124L)))
  }

  test("packChunks distributes: many partitions, same answer") {
    val docs = (1L to 1000L).map(i => (i, (i % 37) + 1)).toDF("doc_id", "toks")
      .repartition(16)
    val out = Training.packChunks(docs, "doc_id", col("toks"), budget = 97L)
    val rows = out.select("doc_id", "chunk_offset", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    var cum = 0L
    rows.foreach { case (_, off, n) =>
      assert(off == cum % 97L); cum += n
    }
  }

  test("mixStrata: deterministic, rates roughly honored, rate 1.0 keeps all") {
    val docs = (1L to 2000L).map(i =>
      (i, if (i % 4 == 0) "en" else if (i % 4 == 1) "de" else "zh"))
      .toDF("id", "lang")
    val out = Training.mixStrata(docs, col("lang"), col("id"),
      Map("en" -> 1.0, "de" -> 0.5), defaultRate = 0.25)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("en") == 500) // rate 1.0: everything kept
    assert(math.abs(counts("de") - 250.0) < 60)
    assert(math.abs(counts("zh") - 250.0) < 75)
    // determinism: second run identical
    val again = Training.mixStrata(docs, col("lang"), col("id"),
      Map("en" -> 1.0, "de" -> 0.5), defaultRate = 0.25)
    assert(out.select("id").collect().map(_.getLong(0)).toSet ==
      again.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("contaminationPairs flags the leaked eval doc") {
    import graft.llmops.Dedup
    val train = scala.Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine")).toDF("id", "text")
    val eval = scala.Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),   // contained in train 1
      (11L, "totally different words that never appear anywhere else here"))
      .toDF("id", "text")
    val out = Dedup.contaminationPairs(train, eval, "id", "text", n = 5,
      minContainment = 0.5).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 10L)
    assert(out.head.getDouble(3) == 1.0) // all eval 5-grams present
  }

  test("PII redaction replaces every class; counts match") {
    import graft.llmops.TextStats
    val df = scala.Seq((1L,
      "mail a.user+x@test.org or b@c.io, call +1 (555) 010-1234, " +
        "host 192.168.0.1, card 4111111111111111 end")).toDF("id", "text")
    val row = df.select(
      TextStats.piiCount(col("text"), TextStats.piiPatterns.toMap.apply("email")).as("e"),
      TextStats.piiCount(col("text"), TextStats.piiPatterns.toMap.apply("ipv4")).as("i"),
      TextStats.piiRedact(col("text")).as("r")).head()
    assert(row.getLong(0) == 2)
    assert(row.getLong(1) == 1)
    val r = row.getString(2)
    assert(r.contains("[EMAIL]") && r.contains("[PHONE]") &&
      r.contains("[IPV4]") && r.contains("[CARD]"))
    assert(!r.contains("@") && !r.contains("192.168"))
  }

  test("repetition stats: boilerplate scores high, prose low") {
    import graft.llmops.TextStats
    val df = scala.Seq(
      (1L, "buy now buy now buy now buy now"),
      (2L, "the quick brown fox jumps over a lazy dog")).toDF("id", "text")
    val rows = df.select(col("id"),
      TextStats.topBigramFrac(col("text")).as("tb"),
      TextStats.dupTokenFrac(col("text")).as("dt"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(rows(1L)._1 > 0.5 && rows(1L)._2 > 0.5)
    assert(rows(2L)._1 <= 0.2 && rows(2L)._2 == 0.0)
  }
}
