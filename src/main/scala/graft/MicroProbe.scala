package graft

import org.apache.spark.sql.functions._

/** One-off attribution experiments over an already-materialized ScaleProbe
  * corpus (r11, VERDICT r10 #1): isolates a single suspect stage of
  * minhash_pairs and re-times it under controlled variations — kernel
  * only, then the band-bucket exchange at several partition counts — so
  * the 256× wall residual can be pinned to either data volume (slower at
  * 256× regardless of partitioning) or the exchange configuration
  * (slower only at the 256×-sized partition count).
  *
  * Usage: sbt "runMain graft.MicroProbe /tmp/scale_docs_64 /tmp/scale_docs_256"
  */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.get()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"MICRO $tag t=${(System.nanoTime() - t0) / 1e9}%.2f s out=$n")
    }
    for (dir <- args) {
      val docs = spark.read.parquet(dir)
      val n = docs.count()
      println(s"MICRO corpus=$dir rows=$n")
      val sigArr = graft.exprs.XxMinhashSigExpr.column(col("text"), 5, 128)
      val sig = docs.select(col("doc_id").as("id"), sigArr.as("_sig"))
      val bandKey = (b: Int) => xxhash64(
        lit(b) +: (0 until 3).map(r => element_at(col("_sig"), b * 3 + r + 1)): _*)
      // 1. kernel only: signature compute, no explode, no shuffle (the
      // sum over all elements defeats column pruning — the first variant
      // counted rows and Catalyst deleted the kernel entirely)
      time(s"$dir kernel_only") {
        sig.select(aggregate(col("_sig"), lit(0L), (a, x) => a + x).as("h"))
          .agg(sum(col("h"))).head().getLong(0) & 1L
      }
      // 2. bucket rows + exchange at varying partition counts
      for (parts <- Seq(32, 44, 173, 512)) {
        val buckets = sig.select(col("id"), col("_sig").as("sig"),
          explode(array((0 until 8).map(bandKey): _*)).as("bucket"))
          .repartition(parts, col("bucket"))
        time(s"$dir exchange parts=$parts") {
          buckets.groupBy(spark_partition_id()).count()
            .agg(count(lit(1))).head().getLong(0)
        }
      }
      // 3. bucket-size distribution: Σs² is the within-bucket pair
      // enumeration the SMJ pays BEFORE the prefilter cuts anything —
      // candidates that never become records still burn CPU. Linear
      // growth in sum_s2 = healthy; super-linear = cross-copy bucket
      // collisions (degenerate signatures pooling across copies).
      locally {
        val row = sig.select(col("id"),
          explode(array((0 until 8).map(bandKey): _*)).as("bucket"))
          .groupBy(col("bucket")).count()
          .agg(sum(col("count") * col("count")).as("sum_s2"),
            max(col("count")).as("max_s"),
            sum(when(col("count") > 1024, col("count"))).as("capped_rows"),
            count(lit(1)).as("n_buckets")).head()
        println(s"MICRO $dir buckets sum_s2=${row.getLong(0)} " +
          s"max_s=${row.getLong(1)} capped=${if (row.isNullAt(2)) 0 else row.getLong(2)} " +
          s"n=${row.getLong(3)}")
      }
    }
    spark.stop()
  }
}
