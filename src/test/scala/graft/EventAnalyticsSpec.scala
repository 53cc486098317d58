package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.EventAnalytics

class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = Sessions.builder("4").getOrCreate()
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel: stages must be strictly ordered in the user's timeline") {
    val df = Seq(
      // u1 completes a->b->c in order
      (1L, "a", ts("2024-01-01 10:00:00"), 1L),
      (1L, "b", ts("2024-01-01 11:00:00"), 2L),
      (1L, "c", ts("2024-01-01 12:00:00"), 3L),
      // u2 has b BEFORE a -> only stage 1 counts
      (2L, "b", ts("2024-01-01 09:00:00"), 4L),
      (2L, "a", ts("2024-01-01 10:00:00"), 5L),
      // u3: a then b at the SAME instant -> strict 'after' fails stage 2
      (3L, "a", ts("2024-01-01 10:00:00"), 6L),
      (3L, "b", ts("2024-01-01 10:00:00"), 7L),
      // u4 never does 'a' but is still reported (reached 0)
      (4L, "x", ts("2024-01-01 10:00:00"), 8L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = EventAnalytics.funnel(df, "user_id", "ts", "event_type",
        Seq("a", "b", "c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("funnel: earliest qualifying time maximizes conversions") {
    // u1 does a twice; the EARLY a unlocks the b between them
    val df = Seq(
      (1L, "a", ts("2024-01-01 08:00:00"), 1L),
      (1L, "b", ts("2024-01-01 09:00:00"), 2L),
      (1L, "a", ts("2024-01-01 10:00:00"), 3L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = EventAnalytics.funnel(df, "user_id", "ts", "event_type",
      Seq("a", "b")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L))
  }

  test("funnel: randomized brute-force cross-check (single-scan window plan)") {
    // the chained strictly-after running-min plan must match the naive
    // greedy reference on arbitrary event soups, ties and gaps included
    val rnd = new scala.util.Random(42)
    val stages = Seq("s1", "s2", "s3", "s4")
    val types = stages ++ Seq("x", "y")
    val events = (1 to 2000).map { i =>
      val u = rnd.nextInt(60).toLong
      // coarse second grid so same-timestamp ties actually happen
      val at = ts("2024-01-01 00:00:00").getTime + rnd.nextInt(500) * 1000L
      (u, types(rnd.nextInt(types.length)), new java.sql.Timestamp(at), i.toLong)
    }
    // greedy reference: stage 1 unconstrained, stage j strictly after
    // the chained min time of stage j-1
    def brute(evs: Seq[(Long, String, java.sql.Timestamp, Long)]): Map[Long, Long] =
      evs.groupBy(_._1).map { case (u, es) =>
        var tPrev: Option[Long] = None
        var reached = 0L
        var continue = true
        stages.foreach { st =>
          if (continue) {
            val cand = es.filter(e => e._2 == st &&
              tPrev.forall(p => e._3.getTime > p))
            if (cand.nonEmpty) {
              tPrev = Some(cand.map(_._3.getTime).min); reached += 1
            } else continue = false
          }
        }
        u -> reached
      }
    val df = events.toDF("user_id", "event_type", "ts", "event_id")
    val got = EventAnalytics.funnel(df, "user_id", "ts", "event_type", stages)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === brute(events))
  }

  test("retentionCohorts: 7-day offsets from first active day") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")), // cohort 01-01, offset 0
      (1L, ts("2024-01-07 10:00:00")), // day 6  -> offset 0
      (1L, ts("2024-01-08 10:00:00")), // day 7  -> offset 1
      (2L, ts("2024-01-01 23:00:00")), // same cohort, offset 0 only
      (3L, ts("2024-01-05 01:00:00")), // cohort 01-05
      (3L, ts("2024-01-20 01:00:00"))  // day 15 -> offset 2
    ).toDF("user_id", "ts")
    val out = EventAnalytics.retentionCohorts(df, "user_id", "ts", 7)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("2024-01-01", 0L) -> 2L, ("2024-01-01", 1L) -> 1L,
      ("2024-01-05", 0L) -> 1L, ("2024-01-05", 2L) -> 1L))
  }

  test("lastTouchAttribution: latest touch at-or-before wins; no-touch is null") {
    val df = Seq(
      (1L, "touch", ts("2024-01-01 10:00:00"), 1L, "A", 0.0),
      (1L, "touch", ts("2024-01-01 11:00:00"), 2L, "B", 0.0),
      (1L, "buy",   ts("2024-01-01 12:00:00"), 3L, null.asInstanceOf[String], 10.0),
      // same-instant touch still gets credit (tag orders touch first)
      (2L, "touch", ts("2024-01-01 10:00:00"), 4L, "C", 0.0),
      (2L, "buy",   ts("2024-01-01 10:00:00"), 5L, null.asInstanceOf[String], 5.5),
      // purchase before any touch -> null channel
      (3L, "buy",   ts("2024-01-01 09:00:00"), 6L, null.asInstanceOf[String], 2.0),
      (3L, "touch", ts("2024-01-01 10:00:00"), 7L, "D", 0.0)
    ).toDF("user_id", "event_type", "ts", "event_id", "ch", "value")
    val out = EventAnalytics.lastTouchAttribution(df, "user_id", "ts",
        "event_id",
        convPred = col("event_type") === "buy",
        touchPred = col("event_type") === "touch",
        channel = col("ch"), revenue = col("value"))
      .collect()
      .map(r => Option(r.getString(0)).getOrElse("NULL") ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(out === Map(
      "B" -> (1L, 10.0), "C" -> (1L, 5.5), "NULL" -> (1L, 2.0)))
  }

  test("rollingDistinct: trailing window counts, only observed days emitted") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 12:00:00")), // same (user, day): counted once
      (2L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-05 10:00:00")),
      (3L, ts("2024-01-09 10:00:00"))
    ).toDF("user_id", "ts")
    val out = EventAnalytics.rollingDistinct(df, "user_id", "ts", 3)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // windows: 01-01 {u1}; 01-02 {u1,u2}; 01-05 {u1}; 01-09 {u3}.
    // 01-03/01-04 (u1,u2 still active) are NOT emitted: no events observed.
    assert(out === Map(
      "2024-01-01" -> 1L, "2024-01-02" -> 2L,
      "2024-01-05" -> 1L, "2024-01-09" -> 1L))
  }

  test("nearbyPairs: inclusive window bound, each pair counted once, ties by id") {
    val df = Seq(
      (1L, "a", ts("2024-01-01 10:00:00")),
      (2L, "b", ts("2024-01-01 10:00:05")),  // 5s after e1 (same bucket or next)
      (3L, "c", ts("2024-01-01 10:00:10")),  // exactly w=10s after e1: inclusive
      (4L, "a", ts("2024-01-01 10:00:30")),  // 20s after e3: outside
      (5L, "b", ts("2024-01-01 10:00:30"))   // tie with e4: only (4,5) ordered pair
    ).toDF("event_id", "event_type", "ts")
    val out = EventAnalytics.nearbyPairs(df, "event_id", "ts", "event_type", 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // pairs: (1,2) a-b, (1,3) a-c [exactly 10s], (2,3) b-c, (4,5) a-b tie
    assert(out === Map(
      ("a", "b") -> 2L, ("a", "c") -> 1L, ("b", "c") -> 1L))
  }

  test("nearbyPairs: bucket-boundary pairs meet exactly once") {
    // t=9.9s and t=10.1s straddle the w=10s bucket boundary; the probe
    // explode must find the pair in exactly one bucket (no double count)
    val df = Seq(
      (1L, "a", ts("2024-01-01 00:00:09")),
      (2L, "b", ts("2024-01-01 00:00:11"))
    ).toDF("event_id", "event_type", "ts")
    val out = EventAnalytics.nearbyPairs(df, "event_id", "ts", "event_type", 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(("a", "b") -> 1L))
  }
}
