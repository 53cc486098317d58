package graft.llmops

import org.apache.spark.sql.DataFrame
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

  /** Component label per node: (id, component) where component = the
    * smallest node id reachable from `id`. Nodes only present as isolated
    * ids (no edges) are the caller's concern — every id appearing in
    * `edges` gets a row. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 30): DataFrame = {
    var e = symmetrize(edges.select(
        col(srcCol).cast(LongType).as("u"),
        col(dstCol).cast(LongType).as("v")))
      .localCheckpoint()
    var prev = checksum(e)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      e = smallStar(largeStar(e)).localCheckpoint()
      val cur = checksum(e)
      converged = cur == prev
      prev = cur
      it += 1
    }
    require(converged, s"connectedComponents: not converged after $maxIter rounds")
    // Converged ⇒ every component is a star centered at its min id, so
    // comp(x) = min(x, min Γ(x)).
    val nodes = edges.select(col(srcCol).cast(LongType).as("id"))
      .union(edges.select(col(dstCol).cast(LongType).as("id")))
      .distinct()
    val m = e.groupBy(col("u")).agg(min(col("v")).as("_m"))
      .select(col("u").as("id"), col("_m"))
    nodes.join(m, scala.Seq("id"), "left")
      .select(col("id"), least(col("id"), coalesce(col("_m"), col("id")))
        .as("component"))
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
}
