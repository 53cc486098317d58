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
}
