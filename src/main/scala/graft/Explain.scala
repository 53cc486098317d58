package graft

/** Plan-inspection main: prints `explain("formatted")` for selected queries
  * so pushdown / broadcast / whole-stage-codegen can be audited.
  * Usage: runMain graft.Explain [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        println(s"===== $name =====")
        fn(spark, dir).explain("formatted")
      }
    }
    spark.stop()
  }
}
