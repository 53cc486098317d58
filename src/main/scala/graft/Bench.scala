package graft

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, 1 warmup + 3 timed runs each, reports per-query
  * median wall seconds as ONE JSON line (protocol per BASELINE.md).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.get()

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def median(xs: scala.Seq[Double]): Double = {
      val s = xs.sorted; s(s.length / 2)
    }

    // optional args = query-name filter (dev loop); driver passes none
    val names =
      if (args.nonEmpty) SparkEntry.queries.keys.toSeq.filter(args.contains).sorted
      else SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      try {
        time(fn(spark, sfDir).write.format("noop").mode("overwrite").save()) // warmup
        val runs = (1 to 3).map(_ =>
          time(fn(spark, sfDir).write.format("noop").mode("overwrite").save()))
        // free checkpointed/cached RDDs so block-manager pressure from one
        // query never skews the next (localCheckpoint has no auto-unpersist)
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        name -> median(runs)
      } catch { case _: Throwable => name -> -1.0 }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.4f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
