package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llmops._

class GraphSpec extends AnyFunSuite {
  lazy val spark = Sessions.builder("4").getOrCreate()
  import spark.implicits._

  /** Reference union-find for cross-checking. */
  private def ufComponents(edges: scala.Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress everything, then relabel roots to component minima
    val nodes = edges.flatMap(e => scala.Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => ns.map(_ -> ns.min) }
  }

  private def ccMap(edges: scala.Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("connected components: two cliques + a bridge pair + isolated pair") {
    val clique1 = for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)
    val clique2 = for (a <- 20L to 24L; b <- (a + 1) to 24L) yield (a, b)
    val edges = clique1 ++ clique2 ++ scala.Seq((13L, 20L), (40L, 41L))
    assert(ccMap(edges) === ufComponents(edges))
  }

  test("connected components: long chain (worst-case diameter) converges") {
    val chain = (0L until 63L).map(i => (i + 1, i)) // 64-node path
    val got = ccMap(chain)
    assert(got === ufComponents(chain))
    assert(got.values.toSet === Set(0L))
  }

  test("connected components: distributed star-contraction path agrees " +
      "with the union-find finisher") {
    val clique = for (a <- 10L to 14L; b <- (a + 1) to 14L) yield (a, b)
    val edges = clique ++ (0L until 31L).map(i => (i + 100L, i + 101L)) ++
      scala.Seq((14L, 100L), (200L, 201L))
    // localThreshold = 0 forces the full distributed loop to convergence
    val distributed = Graph.connectedComponents(
        edges.toDF("a", "b"), "a", "b", localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distributed === ufComponents(edges))
    assert(distributed === ccMap(edges))
  }

  test("connected components: duplicate/reversed/self edges are harmless") {
    val edges = scala.Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (3L, 4L))
    val got = ccMap(edges)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("dedupClusters labels every doc; keep = cluster canonical") {
    val docs = scala.Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = scala.Seq((2L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val got = Graph.dedupClusters(docs, "doc_id", pairs, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got === Set(
      (1L, 1L, true), (2L, 2L, true), (3L, 3L, true),
      (4L, 2L, false), (5L, 2L, false)))
  }

  test("dedupClustersBy: keeper is highest score, ties break to lowest id") {
    val docs = scala.Seq((1L, 5L), (2L, 9L), (3L, 9L), (4L, 1L), (5L, 7L))
      .toDF("doc_id", "nt")
    val pairs = scala.Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Graph.dedupClustersBy(docs, "doc_id", col("nt"),
        pairs, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).toSet
    // cluster {1,2,3}: 2 and 3 tie at nt=9 → keeper 2; singletons keep
    assert(got == Set(
      (1L, 1L, false), (2L, 1L, true), (3L, 1L, false),
      (4L, 4L, true), (5L, 5L, true)))
  }

  test("softDedupWeights: inverse-cluster-size basis points, singletons full") {
    val docs = scala.Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val pairs = scala.Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val got = Graph.softDedupWeights(docs, "doc_id", pairs, "id_a", "id_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === Set(
      (1L, 1L, 3L, 3333L), (2L, 1L, 3L, 3333L), (3L, 1L, 3L, 3333L),
      (4L, 4L, 1L, 10000L),
      (5L, 5L, 2L, 5000L), (6L, 5L, 2L, 5000L)))
  }

  test("sessionize: gap boundary is inclusive (> gap starts a new session)") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(ms: Long) = new java.sql.Timestamp(base.getTime + ms)
    val m = 60000L
    val df = scala.Seq(
      (1L, ts(0)), (1L, ts(29 * m)),  // merge: gap 29 < 30
      (1L, ts(59 * m)),               // merge: gap exactly 30 (inclusive)
      (2L, ts(0)), (2L, ts(30 * m + 1)) // split: gap 30min + 1ms
    ).toDF("user_id", "ts")
    val got = graft.ops.Sessionize.sessions(df, "user_id", "ts", "30 minutes")
      .select(col("user_id"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(got(1L) === scala.Seq(3L))
    assert(got(2L) === scala.Seq(1L, 1L))
  }

  test("bigram novelty: hand-computed rare-mass") {
    // corpus: "a b a b" (bigrams: a b ×2, b a ×1), "x y" (x y ×1)
    val docs = scala.Seq((1L, "a b a b"), (2L, "x y"), (3L, "z")).toDF("id", "text")
    val model = llmops.TextStats.bigramModel(docs, "text")
    val got = llmops.TextStats.bigramNovelty(docs, "id", "text", model, rareMax = 1L)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(1L) === ((3L, 2L, 1L, 1.0 / 3.0))) // "b a" is the rare one
    assert(got(2L) === ((1L, 1L, 1L, 1.0)))
    assert(got(3L) === ((0L, 0L, 0L, 0.0))) // single token: no bigrams
  }

  test("tfidf top-k ranking: tf desc, doc-frequency asc, token asc") {
    val docs = scala.Seq(
      (1L, "apple apple banana common"),
      (2L, "banana common common"),
      (3L, "common")).toDF("id", "text")
    val got = llmops.TextStats.tfidfTopK(docs, "id", "text", 2)
      .filter(col("id") === 1L).orderBy(col("rnk"))
      .collect().map(r => (r.getString(0 max r.fieldIndex("token")), r.getLong(r.fieldIndex("tf"))))
    // doc 1: apple tf=2 first; banana (df=2) before common (df=3) at tf=1
    assert(got.toSeq === scala.Seq(("apple", 2L), ("banana", 1L)))
  }

  test("pagerankIter: hand-computed 3-sweep ranks on a 3-node star") {
    // 1↔2, 3↔2: hub 2 accumulates, leaves drain symmetrically
    val e = scala.Seq((1L, 2L), (2L, 1L), (3L, 2L), (2L, 3L)).toDF("s", "d")
    val out = Graph.pagerankIter(e, "s", "d", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 6291L, 2L -> 17415L, 3L -> 6291L))
  }

  test("pagerankIter: dangling-free symmetric pair is a fixed point") {
    val e = scala.Seq((1L, 2L), (2L, 1L)).toDF("s", "d")
    val out = Graph.pagerankIter(e, "s", "d", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 10000L, 2L -> 10000L))
  }

  test("containmentPairs: short doc quoted in long doc is caught one-way") {
    val docs = scala.Seq(
      (1L, "a b c d e f"),                 // 2 distinct 5-grams
      (2L, "x a b c d e f y"),             // contains both of doc 1's
      (3L, "p q r s t u v w")).toDF("doc_id", "text")
    val out = llmops.Dedup.containmentPairs(docs, "doc_id", "text",
        n = 5, minContainBp = 8000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    // A⊆B at 100%; B→A is 2/4 = 5000bp (below threshold); doc 3 shares nothing
    assert(out === Map((1L, 2L) -> 10000L))
  }

  test("gopher flags: keep verdict tracks the documented bounds") {
    val goodText = (scala.Seq.fill(30)("the data and that have with to of be") :+ "tail").mkString(" ")
    val docs = scala.Seq((1L, goodText), (2L, "short text")).toDF("id", "text")
    val got = docs.select(col("id") +: llmops.TextStats.gopherFlags(col("text")): _*)
      .collect().map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("keep"))).toMap
    assert(got(1L) === true)
    assert(got(2L) === false) // word count 2 < 50
  }
}
