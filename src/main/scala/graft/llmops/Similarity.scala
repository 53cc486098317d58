package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * - [[cosine]] / [[bruteForceTopK]]: exact baseline. The query set is
  *   broadcast; the corpus streams through one pass — O(|corpus|·|queries|)
  *   work but no corpus shuffle, so it scales to a 100 TB corpus for
  *   moderate query batches.
  * - [[SignLsh]]: random-hyperplane LSH — corpus bucketed by sign-pattern
  *   key; queries probe only their bucket (plus optional multi-probe
  *   neighbors), turning search into a co-partitioned join. Hyperplanes are
  *   seeded deterministically.
  */
object Similarity {

  private def asDouble(v: Column): Column = transform(v, x => x.cast(DoubleType))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity between two float-array columns (double math). */
  def cosine(a: Column, b: Column): Column = {
    val ad = asDouble(a); val bd = asDouble(b)
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** Exact top-k neighbors for each query row.
    * queries/corpus: (idCol, vecCol). Output: qid, vid, rnk (1-based),
    * deterministic tie-break on vid. */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qvec")))
    val c = corpus.select(col(idCol).as("vid"), col(vecCol).as("cvec"))
    val sims = c.crossJoin(q).filter(col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"), cosine(col("qvec"), col("cvec")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vid"))
    sims.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("qid"), col("vid"), col("rnk"))
  }

  /** Label-noise detection (kNN consistency): for each vector, the
    * majority label among its k nearest neighbors vs its own label.
    * Disagreement flags candidate mislabeled examples — a standard
    * training-data curation signal. Deterministic: neighbor ties break on
    * vid, label-vote ties on the smaller label. */
  def labelConsistency(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    val neighbors = bruteForceTopK(queries, corpus, idCol, vecCol, k)
    val labels = corpus.select(col(idCol).as("vid"), col(labelCol).as("n_label"))
    val voted = neighbors.join(labels, "vid")
      .groupBy(col("qid"), col("n_label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("votes").desc, col("n_label"))
    val knn = voted.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("qid"), col("n_label").as("knn_label"))
    queries.select(col(idCol).as("qid"), col(labelCol).as("label"))
      .join(knn, "qid")
      .select(col("qid"), col("label"), col("knn_label"),
        (col("label") === col("knn_label")).as("agree"))
  }

  /** Random-hyperplane sign-LSH. `planes(dim, nPlanes, seed)` generates the
    * (deterministic) hyperplane matrix as a literal — broadcast free. */
  def planes(dim: Int, nPlanes: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  final case class SignLsh(dim: Int, nPlanes: Int, seed: Long = 42L) {
    private val hp: Array[Array[Double]] = planes(dim, nPlanes, seed)

    /** Bucket key: one bit per hyperplane (sign of the projection). */
    def bucket(vec: Column): Column = {
      val v = asDouble(vec)
      val bits = hp.zipWithIndex.map { case (plane, i) =>
        val planeCol = array(plane.map(lit(_)).toIndexedSeq: _*)
        when(dot(v, planeCol) >= 0, lit(1L << i)).otherwise(lit(0L))
      }
      bits.reduce(_ + _)
    }

    /** ANN top-k with multi-probe: queries probe their own bucket plus all
      * buckets within Hamming distance `probes` of it (standard multi-probe
      * LSH — big recall win for a small candidate-set increase). Candidates
      * come from a co-partitioned equi-join on the bucket key — the scale
      * path: the cross product never materializes. */
    def topK(queries: DataFrame, corpus: DataFrame,
        idCol: String, vecCol: String, k: Int, probes: Int = 1): DataFrame = {
      val base = bucket(col(vecCol))
      val probeBuckets: Column = {
        val flips: scala.Seq[Column] =
          if (probes <= 0) scala.Seq(base)
          else base +: (0 until nPlanes).map(i => base.bitwiseXOR(lit(1L << i)))
        array(flips: _*)
      }
      val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
          explode(probeBuckets).as("b"))
      val c = corpus.select(col(idCol).as("vid"), col(vecCol).as("cvec"),
        bucket(col(vecCol)).as("b"))
      val sims = q.join(c, "b").filter(col("vid") =!= col("qid"))
        .dropDuplicates("qid", "vid")
        .select(col("qid"), col("vid"), cosine(col("qvec"), col("cvec")).as("sim"))
      val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vid"))
      sims.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
        .select(col("qid"), col("vid"), col("rnk"))
    }
  }
}
