package graft

import org.apache.spark.sql.functions._

/** Scale-up probe: replicates the sf0.1 documents corpus at 1×/4×/16×
  * with per-copy word HASHING — every word of copy k becomes
  * hex(xxhash64(word, k)), so copies share neither tokens nor (beyond
  * chance) character shingles, while each copy's internal doc-vs-doc
  * similarity structure stays isomorphic to the base corpus's (same
  * word ⇒ same hash within a copy). Output pair counts and shuffle
  * volumes therefore scale ~linearly in the multiplier, and the probe
  * measures data-volume scaling, not synthetic self-similarity. (A
  * plain `_k` suffix salt is NOT enough: word-bigram operators
  * decorrelate but char-shingle MinHash still sees sibling copies as
  * near-dups through the shared word bodies — the first probe run
  * caught exactly that as a 1400× pair blowup.) Near-linear wall-clock
  * growth here is the local evidence behind the 100 TB claims — a
  * super-linear curve would mean a hidden quadratic (cross join,
  * unpartitioned window, driver collect) that small-SF gates can't see.
  *
  * Usage: sbt "runMain graft.ScaleProbe [mults...]"; prints one
  * SCALE line per (operator, multiplier).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.get()
    import spark.implicits._
    val mults = if (args.nonEmpty) args.toSeq.map(_.toInt) else scala.Seq(1, 4, 16)
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n0 = base.count()

    def corpus(mult: Int) = (0 until mult).map { k =>
      base.select((col("doc_id") + lit(k.toLong * 1000000L)).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          w => lower(hex(xxhash64(w, lit(k))))), " ").as("text"),
        col("source"))
    }.reduce(_.unionByName(_))

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
    }

    mults.foreach { mult =>
      val dir = s"/tmp/scale_docs_$mult"
      corpus(mult).repartition(32).write.mode("overwrite").parquet(dir)
      val docs = spark.read.parquet(dir)
      docs.count() // warm the page cache
      val (tJ, nJ) = time {
        graft.llmops.Dedup.jaccardJoinExact(docs, "doc_id", "text", 7000).count()
      }
      println(f"SCALE jaccard_join mult=$mult rows=${n0 * mult} t=$tJ%.2f s out=$nJ")
      val (tM, nM) = time {
        graft.llmops.Dedup.minhashPairs(docs, "doc_id", "text").count()
      }
      println(f"SCALE minhash_pairs mult=$mult rows=${n0 * mult} t=$tM%.2f s out=$nM")
      val (tB, nB) = time {
        val d2 = docs.select(col("source"), col("doc_id"),
          graft.llmops.Dedup.fingerprint(col("text")).as("fp"))
        val train = d2.filter(col("doc_id") % 50 =!= 0)
        val ev = d2.filter(col("doc_id") % 50 === 0).select(col("fp").as("efp"))
        graft.ops.Sketches.bloomAntiJoin(train, "fp", ev, "efp",
          4096L * mult, 65536L * mult).count()
      }
      println(f"SCALE bloom_anti mult=$mult rows=${n0 * mult} t=$tB%.2f s out=$nB")
      val (tT, nT) = time {
        graft.llmops.TextStats.tfidfTopK(docs, "doc_id", "text", 3).count()
      }
      println(f"SCALE tfidf_topk mult=$mult rows=${n0 * mult} t=$tT%.2f s out=$nT")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
