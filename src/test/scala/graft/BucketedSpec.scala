package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Bucketed

/** Bucketed-table co-location: the pay-the-shuffle-once layout for
  * repeatedly-joined corpus indexes. The assertions are on the PHYSICAL
  * plan — the join and aggregation must ride the bucketing with zero
  * shuffle exchanges, which is exactly the property that survives a
  * 100 TB scale-up. */
class BucketedSpec extends AnyFunSuite {
  lazy val spark = Sessions.builder("4").getOrCreate()

  test("join and groupBy on the bucket key are exchange-free") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val left = (0L until 1000L).map(i => (i % 97, i, s"l$i")).toDF("k", "id", "payload")
    val right = (0L until 500L).map(i => (i % 97, s"r$i")).toDF("k", "attr")
    Bucketed.write(left, "bk_left", "k", buckets = 8)
    Bucketed.write(right, "bk_right", "k", buckets = 8)

    val l = Bucketed.table(spark, "bk_left")
    val r = Bucketed.table(spark, "bk_right")
    val expected = left.join(right, "k").count()

    // force the sort-merge path (tiny test tables would broadcast, which
    // proves nothing about bucketing)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = l.join(r, "k")
      assert(joined.count() === expected)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), plan)
      assert(Bucketed.shuffleExchanges(joined) === 0, plan)

      // aggregation on the bucket key: no exchange either
      val agg = l.groupBy("k").agg(count(lit(1)).as("n"))
      assert(Bucketed.shuffleExchanges(agg) === 0,
        agg.queryExecution.executedPlan.toString)
      assert(agg.count() === 97)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bk_left")
      spark.sql("DROP TABLE IF EXISTS bk_right")
    }
  }
}
