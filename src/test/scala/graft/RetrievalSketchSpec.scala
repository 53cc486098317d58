package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llmops.{Index, Training}
import graft.ops.Sketches

/** Hand-computed cases for the retrieval index (postings / phrase /
  * BM25 / commonness), the KMV distinct sketch, and padding buckets.
  */
class RetrievalSketchSpec extends AnyFunSuite {
  lazy val spark = Sessions.builder("4").getOrCreate()
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "the quick quick fox"),
    (3L, "lazy dog sleeps"),
    (4L, "the lazy quick brown dog")
  ).toDF("doc_id", "text")

  test("postings: 0-based positions, one row per occurrence") {
    val out = Index.postings(Seq((1L, "a b a")).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(out === Set((1L, 0, "a"), (1L, 1, "b"), (1L, 2, "a")))
  }

  test("phraseHits: doc and occurrence counts; mixed phrase lengths; zero-hit absent") {
    val out = Index.phraseHits(docs, "doc_id", "text",
        Seq("quick brown", "the quick", "quick quick fox", "no such phrase"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map(
      "quick brown" -> (2L, 2L),      // docs 1, 4
      "the quick" -> (2L, 2L),        // docs 1, 2
      "quick quick fox" -> (1L, 1L))) // doc 2; zero-hit phrase not emitted
  }

  test("bm25TopK: rarer term outweighs common; tf saturates; ties by id") {
    // 'sleeps' appears only in doc 3 (df=1) vs 'the' in docs 1,2,4 (df=3):
    // doc 3 must outrank every 'the' doc for the query {the, sleeps}
    val out = Index.bm25TopK(docs, "doc_id", "text",
        Seq("the", "sleeps"), k = 4)
      .collect().map(_.getLong(0))
    assert(out.head === 3L)
    assert(out.length === 4)
  }

  test("bm25TopK: integer scores replicate the documented formula") {
    // one-term query over a two-doc corpus, hand-evaluated:
    // docs: d1 len 2 (hit tf=1), d2 len 2 (no hit). N=2, total=4.
    // idf_bp = 2*10000 div 1 = 20000
    // norm   = 100-75 + 75*2*2 div 4 = 25 + 75 = 100
    // s      = 20000*1*220 div (100 + 120*100) = 4400000 div 12100 = 363
    val two = Seq((1L, "x y"), (2L, "a b")).toDF("doc_id", "text")
    val out = Index.bm25TopK(two, "doc_id", "text", Seq("x"), k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 363L))
  }

  test("commonnessBp: mean df of occurrences in basis points") {
    // corpus: d1 "a b", d2 "a c". df(a)=2, df(b)=1, df(c)=1, N=2.
    // d1: (2+1)*10000 div (2*2) = 7500 ; d2 likewise 7500
    val two = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = Index.commonnessBp(two, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 7500L, 2L -> 7500L))
  }

  test("kmvDistinct: below-k groups fall back to exact count") {
    val df = (1 to 40).map(i => ("g", s"u${i % 7}")).toDF("grp", "v")
    val out = Sketches.kmvDistinct(df, "grp", "v", k = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("g", 7L, 7L)))
  }

  test("kmvDistinct: estimate within 30% at k=64 over 2000 distinct values") {
    val df = (1 to 6000).map(i => ("g", s"user-${i % 2000}")).toDF("grp", "v")
    val Array(row) = Sketches.kmvDistinct(df, "grp", "v", k = 64).collect()
    assert(row.getLong(1) === 64L)
    val est = row.getLong(2)
    assert(est > 1400 && est < 2600, s"estimate $est out of band")
  }

  test("kmvDistinct: sketch merges across partitions (repartition-invariant)") {
    val df = (1 to 3000).map(i => ("g", s"u$i")).toDF("grp", "v")
    val a = Sketches.kmvDistinct(df.repartition(1), "grp", "v", 32).collect()
    val b = Sketches.kmvDistinct(df.repartition(13), "grp", "v", 32).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("paddingBuckets: clamp to largest bucket; waste accounting") {
    // buckets 4/8, batch 2. docs: len 3, 4, 5, 9 (clamps to 8, kept 8)
    val df = Seq((1L, "a b c"), (2L, "a b c d"), (3L, "a b c d e"),
      (4L, "a b c d e f g h i")).toDF("doc_id", "text")
    val out = Training.paddingBuckets(df, "text", Seq(4, 8), batch = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // bucket 4: docs {1,2} kept 3+4=7, 1 batch, padded 2*4=8, waste 1250bp
    // bucket 8: docs {3,4} kept 5+8=13, 1 batch, padded 2*8=16, waste 1875bp
    assert(out === Map(
      4L -> (2L, 7L, 1L, 8L, 1250L),
      8L -> (2L, 13L, 1L, 16L, 1875L)))
  }
}
