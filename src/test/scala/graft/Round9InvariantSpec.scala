package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{EventAnalytics, Incremental, Sketches}
import graft.llmops.Graph

/** Randomized (fixed-seed) cross-checks of the round-9 operators
  * against brute-force driver-side references.
  */
class Round9InvariantSpec extends AnyFunSuite {
  lazy val spark = Sessions.builder("4").getOrCreate()
  import spark.implicits._

  private val rnd = new scala.util.Random(942L)

  test("rollingDistinct matches the brute-force trailing-window count") {
    val events = scala.Seq.fill(400) {
      (rnd.nextInt(25).toLong,
        java.sql.Timestamp.valueOf(f"2024-01-${1 + rnd.nextInt(28)}%02d 0${rnd.nextInt(10)}:00:00"))
    }
    val w = 5
    val got = EventAnalytics.rollingDistinct(events.toDF("uid", "ts"), "uid", "ts", w)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val byDay = events.map { case (u, t) => (t.toLocalDateTime.toLocalDate, u) }.distinct
    val days = byDay.map(_._1).distinct
    // distinct users active in the trailing w-day window of each observed day
    val expect2 = days.map { d =>
      d.toString -> byDay.filter { case (dd, _) =>
        !dd.isAfter(d) && dd.isAfter(d.minusDays(w))
      }.map(_._2).distinct.size.toLong
    }.toMap
    assert(got === expect2)
  }

  test("nearbyPairs matches the brute-force O(n^2) pair count") {
    val events = scala.Seq.tabulate(250) { i =>
      (i.toLong, scala.Seq("a", "b", "c")(rnd.nextInt(3)),
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(2000) * 100L))
    }
    val w = 30 // seconds
    val got = EventAnalytics.nearbyPairs(events.toDF("id", "et", "ts"),
        "id", "ts", "et", w)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val expect = (for {
      a <- events; b <- events
      da = a._3.getTime; db = b._3.getTime
      if db - da >= 0 && db - da <= w * 1000L &&
        (db > da || (db == da && b._1 > a._1))
    } yield (a._2, b._2)).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got === expect)
  }

  test("pagerankIter matches a driver-side reference on a random graph") {
    val edges = scala.Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).distinct
    val iters = 4
    val got = Graph.pagerankIter(edges.toDF("s", "d"), "s", "d", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: same integer recurrence
    val nodes = edges.flatMap(e => scala.Seq(e._1, e._2)).distinct
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var rank = nodes.map(_ -> 10000L).toMap
    for (_ <- 1 to iters) {
      val inflow = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (s, d) => inflow(d) += rank(s) / deg(s) }
      rank = nodes.map(n => n -> (1500L + 85L * inflow(n) / 100L)).toMap
    }
    assert(got === rank)
  }

  test("histQuantiles matches exact quantiles computed on the binned data") {
    val vals = scala.Seq.fill(500)(("k", rnd.nextInt(200).toLong))
    val (bw, nb) = (8L, 16)
    val st = Incremental.histState(vals.toDF("k", "v"), scala.Seq("k"), col("v"), bw, nb)
    val got = Incremental.histQuantiles(st, scala.Seq("k"), bw, scala.Seq(2500, 5000, 7500, 9900))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val bins = vals.map(v => math.min(v._2 / bw, nb - 1L)).sorted
    val expect = scala.Seq(2500, 5000, 7500, 9900).map { q =>
      val rank = (q.toLong * bins.size + 9999) / 10000 // ceil
      q.toLong -> bins(rank.toInt - 1) * bw
    }.toMap
    assert(got === expect)
  }

  test("kmvDistinct with k above the distinct count is exact for every group") {
    val df = scala.Seq.fill(600)((s"g${rnd.nextInt(6)}", s"u${rnd.nextInt(30)}"))
    val got = Sketches.kmvDistinct(df.toDF("g", "v"), "g", "v", 64)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val expect = df.groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).distinct.size.toLong }
    assert(got === expect)
  }
}
