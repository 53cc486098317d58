package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for large-scale training-data pipelines:
  * exact (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket
  * join), SimHash, and n-gram Jaccard verification.
  *
  * Design for 100 TB: everything is shuffle-by-key — no pairwise O(n²)
  * stage ever materializes. LSH banding turns near-dup detection into
  * `explode(bands) → groupBy(band) → within-bucket self-join`, so cost is
  * driven by bucket sizes (tunable via bands×rows) rather than corpus
  * size². Hashes are md5-based so results are portable across engines
  * (and deterministic across runs/executors — no Random).
  */
object Dedup {

  /** Distinct character k-gram shingles of a text column. */
  def charShingles(text: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => text.substr(i, lit(k))))

  /** MinHash signature: for seeds 0..n-1, min over shingles of
    * md5(seed:shingle). Min of hex strings ≡ min of the 128-bit hash. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(shingles, s => md5(concat(lit(s"$seed:"), s))))
    }: _*)

  /** LSH band keys: signature split into `bands` groups of `rowsPerBand`;
    * each band hashes to one bucket key (band index prefixed so buckets
    * from different bands never collide). */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      md5(concat(lit(s"$b|"),
        concat_ws("|", slice(sig, b * rowsPerBand + 1, rowsPerBand))))
    }: _*)

  /** Exact dedup: keep the smallest id per key (hash-groupBy; map-side
    * combine makes this a single shuffle of (key → min id)).
    * Output: (dedupe_key, <idCol> = keeper, n_copies). */
  def exactDedupKeep(df: DataFrame, idCol: String, keyExpr: Column): DataFrame =
    df.withColumn("dedupe_key", keyExpr)
      .groupBy(col("dedupe_key"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Token-set fingerprint (order-insensitive content hash): md5 of the
    * sorted distinct whitespace tokens. Collapses word-reordered near-dups. */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(split(text, " "))), " "))

  /** SimHash (bitwise majority of token hashes). `bits` ≤ 32 hex nibbles
    * of md5 are used; bit b is set when the count of tokens whose b-th md5
    * nibble is odd exceeds half. Hamming-close simhashes ⇒ similar docs. */
  def simhash(text: Column, bits: Int = 16): Column = {
    val tokens = split(text, " ")
    val oddHex = scala.Seq("1", "3", "5", "7", "9", "b", "d", "f").map(lit(_))
    val bitCols = (0 until bits).map { b =>
      val balance = aggregate(tokens, lit(0L), (acc, tok) =>
        acc + when(substring(md5(tok), b + 1, 1).isin(oddHex: _*), 1L).otherwise(-1L))
      when(balance > 0, lit(1L) * (1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Exact Jaccard on two distinct-element arrays (verification stage). */
  def jaccard(a: Column, b: Column): Column = {
    val i = size(array_intersect(a, b)).cast(DoubleType)
    i / (size(a) + size(b) - i)
  }

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * Stages (each a narrow shuffle, no O(n²)):
    *   1. per-doc shingles + signature (projection)
    *   2. explode band keys → self-join per bucket → candidate pairs
    *   3. verify candidates with exact Jaccard ≥ threshold
    *
    * Returns (id_a, id_b, jac) with id_a < id_b, distinct.
    */
  def minhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, numHashes: Int = 12, bands: Int = 6,
      threshold: Double = 0.9): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sh = df.select(
      col(idCol).as("id"),
      charShingles(col(textCol), shingleK).as("shingles"))
    val sig = sh.select(col("id"), col("shingles"),
      lshBandKeys(minhashSignature(col("shingles"), numHashes), bands, rowsPerBand).as("bandkeys"))
    val buckets = sig.select(col("id"), col("shingles"), explode(col("bandkeys")).as("bucket"))
    val a = buckets.select(col("bucket"), col("id").as("id_a"), col("shingles").as("sh_a"))
    val b = buckets.select(col("bucket"), col("id").as("id_b"), col("shingles").as("sh_b"))
    val cand = a.join(b, scala.Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")
    cand.select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jac"))
      .filter(col("jac") >= threshold)
  }
}
