package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed connected components over an edge/pair relation — the dedup
  * end-game. Near-dup PAIR detectors (MinHash/SimHash/embedding LSH in
  * [[Dedup]]) only say "a and b are copies"; deciding which documents to
  * KEEP needs the transitive closure: a~b, b~c ⇒ one cluster {a,b,c},
  * keep the canonical member (min id).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). Converges in
  * O(log² n) rounds worst-case — 1-2 rounds on the dense clique-ish
  * clusters LSH dedup emits. Each round is two shuffles (a groupBy-min and
  * an equi-join), both keyed by node id; nothing reaches the driver except
  * an O(1) convergence checksum, and `localCheckpoint` truncates the
  * iterative lineage each round (on a cluster, set a checkpoint dir and
  * swap in reliable checkpoints for fault tolerance across rounds).
  */
object Graph {

  /** Canonical symmetric edge set (both orientations, no self loops). */
  private def symmetrize(e: DataFrame): DataFrame =
    e.union(e.select(col("v").as("u"), col("u").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()

  /** Large-star: connect every neighbor larger than u to m(u). */
  private def largeStar(e: DataFrame): DataFrame = {
    val m = e.groupBy(col("u")).agg(min(col("v")).as("_mn"))
      .select(col("u"), least(col("u"), col("_mn")).as("m"))
    symmetrize(
      e.filter(col("v") > col("u")).join(m, "u")
        .select(col("v").as("u"), col("m").as("v")))
  }

  /** Small-star: orient each edge high→low, re-point every low neighbor
    * (and the high node itself) at the min of the low neighborhood. */
  private def smallStar(e: DataFrame): DataFrame = {
    val d = e.filter(col("v") < col("u")) // one orientation per undirected edge
    val m = d.groupBy(col("u")).agg(min(col("v")).as("m"))
    symmetrize(
      d.join(m, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(m.select(col("u"), col("m").as("v"))))
  }

  /** Order-insensitive fingerprint of the canonical edge set (count +
    * hash-sum) — the O(1) driver-side convergence check. */
  private def checksum(e: DataFrame): (Long, Long) = {
    val row = e.filter(col("u") < col("v"))
      .agg(count(lit(1)), coalesce(sum(xxhash64(col("u"), col("v"))), lit(0L)))
      .head()
    (row.getLong(0), row.getLong(1))
  }

  /** Edge sets at or below this (driver-memory-safe, ~32 MB of longs) are
    * finished with a driver union-find instead of more distributed rounds —
    * the iterative tail of a shrinking graph is pure scheduling overhead,
    * exactly the broadcast-join-threshold trade. Distributed rounds run
    * first whenever the graph is bigger, so a 100 TB pair set never
    * reaches the driver until star-contraction has collapsed it. */
  val localFinishThreshold: Long = 2000000L

  /** Component label per node: (id, component) where component = the
    * smallest node id reachable from `id`. Every id on a real (non-self)
    * edge gets a row; ids appearing only in self loops are singletons and
    * omitted (callers coalesce, see [[dedupClusters]]).
    *
    * The input edge relation is evaluated exactly ONCE (into the first
    * checkpoint) — callers can pass an expensive pair pipeline (LSH
    * self-join) directly. Superseded round checkpoints are unpersisted as
    * soon as the next round materializes, so iteration memory is bounded
    * by two copies of the (small) edge set; the returned label table is
    * itself checkpointed so no caller plan re-runs the loop's lineage.
    *
    * Hybrid finish: each round already pays one O(1) driver aggregate for
    * the convergence checksum; its count doubles as the size probe. The
    * moment the surviving edge set fits [[localFinishThreshold]], the
    * transitive closure completes with a driver union-find (milliseconds)
    * instead of O(log n) more two-shuffle rounds. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 30,
      localThreshold: Long = localFinishThreshold): DataFrame = {
    var e = symmetrize(edges.select(
        col(srcCol).cast(LongType).as("u"),
        col(dstCol).cast(LongType).as("v")))
      .localCheckpoint()
    var prev = checksum(e)
    var converged = false
    var it = 0
    while (!converged && prev._1 > localThreshold && it < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      val cur = checksum(next)
      e.unpersist()
      e = next
      converged = cur == prev
      prev = cur
      it += 1
    }
    val labels =
      if (!converged) { // small enough: finish on the driver
        require(prev._1 <= localThreshold,
          s"connectedComponents: not converged after $maxIter rounds")
        val lbl = localUnionFind(e)
        e.unpersist()
        lbl.localCheckpoint()
      } else {
        // Converged ⇒ every component is a star centered at its min id, so
        // comp(x) = min(x, min Γ(x)); e is symmetric, e.u covers every node.
        val out = e.groupBy(col("u")).agg(min(col("v")).as("_m"))
          .select(col("u").as("id"),
            least(col("u"), col("_m")).as("component"))
          .localCheckpoint()
        e.unpersist()
        out
      }
    labels
  }

  /** Driver union-find (path-halving + union-by-min-root) over a collected
    * symmetric edge set — the O(E α(E)) finisher for graphs under
    * [[localFinishThreshold]]. Labels every node with its component's min id. */
  private def localUnionFind(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val parent = new scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    // collect(), not toLocalIterator: the iterator fetches one partition
    // per Spark JOB, so the tail of every CC call paid O(partitions)
    // sequential job round-trips for a relation already bounded by
    // localFinishThreshold (≤2M (Long, Long) rows ≈ 32 MB serialized —
    // comfortably inside the driver and spark.driver.maxResultSize).
    val it = e.filter(col("u") < col("v")).as[(Long, Long)].collect().iterator
    while (it.hasNext) {
      val (u, v) = it.next()
      parent.getOrElseUpdate(u, u); parent.getOrElseUpdate(v, v)
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { // min id becomes the root ⇒ root IS the label
        if (ru < rv) parent(rv) = ru else parent(ru) = rv
      }
    }
    val rows = parent.keysIterator.map(id => (id, find(id))).toSeq
    spark.createDataset(rows).toDF("id", "component")
  }

  /** End-to-end dedup clustering: every document labeled with its near-dup
    * cluster (the min doc id of its connected component; singletons label
    * themselves) and the keep/drop verdict. `pairs` is any (idA, idB)
    * near-dup pair relation, e.g. [[Dedup.minhashPairs]] /
    * [[Dedup.simhashPairs]] / [[Dedup.embeddingNearDupPairs]] output. */
  def dedupClusters(docs: DataFrame, idCol: String,
      pairs: DataFrame, idACol: String, idBCol: String): DataFrame = {
    val cc = connectedComponents(pairs, idACol, idBCol)
    docs.select(col(idCol).cast(LongType).as("id"))
      .join(cc, scala.Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("component"), col("id")).as("cluster_id"))
      .withColumn("keep", col(idCol) === col("cluster_id"))
  }

  /** Dedup clustering with a QUALITY keeper policy: within each near-dup
    * cluster keep the row with the highest `score` (ties → lowest id) —
    * the keep-the-longest / keep-the-highest-quality rule production
    * pipelines use instead of keep-min-id. One extra aggregation keyed
    * by cluster id (clusters are tiny; the shuffle carries one row per
    * doc in a cluster, singletons skip it via the left join). */
  /** SOFT dedup: instead of dropping near-duplicates, weight every row
    * by the inverse of its cluster size (Muennighoff et al. 2023 —
    * repeated data is worth less, not nothing; the sampling weight for
    * cluster members is 1/|cluster|). Integer-exact basis points
    * (`10000 div size`) so an external oracle matches bit-for-bit.
    * Same plan as [[dedupClusters]] plus one cluster-keyed count.
    * Output: (id, cluster_id, cluster_size, weight_bp). */
  def softDedupWeights(docs: DataFrame, idCol: String,
      pairs: DataFrame, idACol: String, idBCol: String): DataFrame = {
    val labeled = dedupClusters(docs, idCol, pairs, idACol, idBCol)
      .select(col(idCol), col("cluster_id"))
    val sizes = labeled.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, "cluster_id")
      .select(col(idCol), col("cluster_id"), col("cluster_size"),
        expr("10000 div cluster_size").as("weight_bp"))
  }

  def dedupClustersBy(docs: DataFrame, idCol: String, score: Column,
      pairs: DataFrame, idACol: String, idBCol: String): DataFrame = {
    val cc = connectedComponents(pairs, idACol, idBCol)
    val labeled = docs
      .select(col(idCol).cast(LongType).as("id"), score.as("_score"))
      .join(cc, scala.Seq("id"), "left")
      .select(col("id"), col("_score"),
        coalesce(col("component"), col("id")).as("cluster_id"))
    val keeper = labeled.groupBy(col("cluster_id"))
      .agg(max_by(col("id"), struct(col("_score"), -col("id"))).as("keep_id"))
    labeled.join(keeper, "cluster_id")
      .select(col("id").as(idCol), col("cluster_id"), col("_score").as("score"),
        (col("id") === col("keep_id")).as("keep"))
  }

  /** Fixed-iteration integer PageRank (damping 0.85, ranks in basis
    * points of the uniform mass, base 10000):
    *
    *   r₀(v)    = 10000
    *   rₜ₊₁(v)  = 1500 + 85 · (Σ_{u→v} rₜ(u) div out(u)) div 100
    *
    * All-integer, so an external oracle replays every rank bit-exactly;
    * dangling-node mass is dropped (the standard simplified variant —
    * documented, deterministic). Each iteration is one equi-join of the
    * edge list with the rank relation on `src` plus one `dst`-keyed
    * aggregation — both map-side combined, both co-partitioned on the
    * same key across iterations, never any driver-side state. `iters`
    * is a fixed small constant (rank queries want 3–10 sweeps), so the
    * lineage stays bounded. */
  def pagerankIter(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 20, "pagerankIter wants 1..20 sweeps")
    // the edge relation feeds 2 joins per sweep — lazily checkpoint it
    // once so the upstream lineage (often a join+distinct) runs a
    // single time instead of O(iters) times. (An r9 experiment dropped
    // e's checkpoint and derived nodes from withDeg to halve block
    // storage; measured STRICTLY WORSE at the 256× probe point — 281 s
    // / 7.4 GB shuffled vs 43.6 s / 5.1 GB for this shape — the
    // re-scanned lineage and wider node derivation cost more than the
    // storage saved. The 300M-edge point needs a 48 GB heap on the
    // 32-thread single-JVM probe box either way: 32 concurrent
    // sort+agg tasks over 9.4M rows each sit right at the 32 GB
    // execution pool, a probe-configuration limit, not a plan one.)
    val e = edges.select(col(srcCol).cast(LongType).as("src"),
      col(dstCol).cast(LongType).as("dst")).localCheckpoint(false)
    // nodes feeds the rank seed AND every sweep's dangling-node left join,
    // so it appears iters+1 times in the final plan — lazily composed, the
    // union+distinct re-ran per reference (r12 QProf on q129: two ~3.5 s
    // task-time duplicate evaluations per action flagged by the dup-eval
    // detector). One checkpoint (8 B/node) ends that; same trade as `e`.
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(false)
    val withDeg = e.join(
      e.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
      .localCheckpoint(false)
    var rank = nodes.withColumn("rank", lit(10000L))
    for (_ <- 1 to iters) {
      val inflow = withDeg
        .join(rank.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("rank div deg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("inflow"))
      rank = nodes.join(inflow, scala.Seq("id"), "left")
        .select(col("id"),
          (lit(1500L) + expr("85 * coalesce(inflow, 0L) div 100")).as("rank"))
    }
    // NOT checkpointed per sweep: measured 25% slower here — the node
    // relation is small and bounded sweeps (≤20) keep the single deep
    // plan cheaper than per-sweep materialization overhead (contrast
    // connectedComponents, whose sweep count is data-dependent)
    rank
  }
}
