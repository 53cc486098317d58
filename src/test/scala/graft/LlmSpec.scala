package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llmops._

class LlmSpec extends AnyFunSuite {
  lazy val spark = Sessions.builder("4").getOrCreate()
  val dir = "/root/testdata/sf0.001"

  lazy val emb = Tables.t(spark, dir, "embeddings")
  lazy val docs = Tables.t(spark, dir, "documents")

  test("sign-LSH ANN recalls a reasonable fraction of brute-force neighbors") {
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.SignLsh(dim = 64, nPlanes = 4)
    val approx = lsh.topK(queries, emb, "vec_id", "embedding", 10, probes = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // 4 planes, multi-probe hamming<=1 → 5 of 16 buckets searched
    assert(recall > 0.4, s"recall=$recall")
    assert(approx.nonEmpty)
  }

  test("cosine of identical vectors is 1") {
    val one = emb.limit(1).select(
      Similarity.cosine(col("embedding"), col("embedding")).as("c"))
    assert(math.abs(one.head().getDouble(0) - 1.0) < 1e-12)
  }

  test("simhash: near-dup docs have close hashes, random docs differ") {
    // doc pair with jaccard ~0.99 exists in the corpus; verify hamming
    // distance of simhash for the most similar pair < for a random pair
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.9)
      .orderBy(col("jac").desc).limit(1).collect()
    if (pairs.nonEmpty) {
      val (a, b) = (pairs(0).getLong(0), pairs(0).getLong(1))
      val sh = docs.select(col("doc_id"), Dedup.simhash(col("text"), 16).as("h"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
      val near = ham(sh(a), sh(b))
      val far = ham(sh(a), sh((sh.keySet - a - b).head))
      assert(near <= far, s"near=$near far=$far")
    }
  }

  test("multimodal: frame sampling and size repartition plumbing") {
    val media = docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
    val frames = media.select(Multimodal.frameSample(col("payload"), 4).as("f"))
    val row = frames.head()
    assert(row.getSeq[Array[Byte]](0).size == 4)
    val parts = Multimodal.repartitionBySize(media, "payload", 8)
    assert(parts.rdd.getNumPartitions == 8)
    assert(parts.count() == media.count())
  }

  test("fakeDecode metadata is deterministic") {
    val m1 = docs.select(Multimodal.fakeDecode(col("text").cast("binary")).as("m"))
      .select("m.width", "m.height", "m.format").collect().toList
    val m2 = docs.select(Multimodal.fakeDecode(col("text").cast("binary")).as("m"))
      .select("m.width", "m.height", "m.format").collect().toList
    assert(m1 == m2)
    assert(m1.forall(r => r.getLong(0) >= 320 && r.getLong(1) >= 240))
  }
}
