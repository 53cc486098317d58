package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Event-stream analytics: ordered funnels, cohort retention, last-touch
  * attribution. The reference's event tooling stops at stateful counters
  * and batch grouping (`lib/processor/group_by.go`, cache counters —
  * SURVEY §2.10); these are the corresponding whole-corpus analyses an
  * analytics engine is actually asked for, expressed as Spark
  * aggregation plans.
  *
  * Scale notes (100 TB posture): every operator here shuffles ONLY on
  * the user/entity key (one exchange, reused by the chained aggregations
  * via co-partitioning) or on tiny (cohort, offset) pairs; per-user state
  * is a fixed-size tuple of stage timestamps — no per-user event arrays,
  * no global windows, no cross products.
  */
object EventAnalytics {

  /** Ordered funnel: stage i counts when an event of type `stages(i)`
    * happens STRICTLY AFTER the user's qualifying time for stage i-1
    * (classic "view → click → purchase within the user's own timeline").
    * For each stage the qualifying time is the MINIMUM event time after
    * the previous stage's qualifying time — the earliest completion, so
    * the funnel is maximal (a later stage-1 event can never unlock a
    * conversion the earliest one wouldn't).
    *
    * Plan: ONE scan, ONE shuffle, ONE sort. The event relation is
    * exchanged on the user key and sorted by time once; each stage j ≥ 2
    * is a running-min window column over the STRICTLY-PRECEDING range
    * frame (micros granularity) of the previous stage's qualifying
    * times — an s_j event at time ts qualifies iff some qualifying
    * s_{j-1} time lies strictly before ts, which (running mins being
    * monotone) is exactly `runmin_{j-1} < ts`. The per-user groupBy that
    * finishes each stage's min rides the same hash partitioning, so at
    * 100 TB the whole funnel is one I/O pass + one exchange no matter
    * the stage count (the previous shape re-scanned the source once per
    * stage). Window state is O(1) per row — no collected per-user event
    * arrays, unbounded-session-proof.
    * Output: (user, reached ∈ 0..k) for every user seen in the input. */
  def funnel(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: scala.Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val user = col(userCol)
    // materialize the micros key ONCE: every window then orders by the
    // same attribute, so the stacked Window nodes share a single sort
    // (fresh per-withColumn expression copies would each get their own
    // redundant Sort below them)
    val tsM = col("_ts")
    val before = Window.partitionBy(user).orderBy(tsM)
      .rangeBetween(Window.unboundedPreceding, -1)
    // qual(j) = this row's time iff it completes stages 1..j here
    var withQ = df
      .withColumn("_ts", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("_q1", when(col(typeCol) === stages.head, tsM))
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      withQ = withQ.withColumn(s"_q${i + 1}",
        when(col(typeCol) === st &&
          min(col(s"_q$i")).over(before) < tsM, tsM))
    }
    val reached = (stages.indices.map { i =>
      when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L)
    }).reduce(_ + _)
    withQ.groupBy(user.as("u"))
      .agg(min(col("_q1")).as("t1"),
        stages.indices.drop(1).map(i =>
          min(col(s"_q${i + 1}")).as(s"t${i + 1}")): _*)
      .select(col("u").as(userCol), reached.cast(LongType).as("reached"))
  }

  /** Cohort retention triangle: users are cohorted by their FIRST active
    * calendar day; every (user, active day) pair then lands in bucket
    * `floor(days_since_cohort / bucketDays)`. Output is the classic
    * retention matrix in long form.
    *
    * Plan: per-user min-day agg + distinct (user, day) activity —
    * both shuffle on the user key — then a count-distinct on the tiny
    * (cohort, offset) pairs. Days, not timestamps, cross the wire.
    * Output: (cohort_date, offset, n_users). */
  def retentionCohorts(df: DataFrame, userCol: String, tsCol: String,
      bucketDays: Int): DataFrame = {
    require(bucketDays > 0, s"bucketDays must be positive, got $bucketDays")
    val user = col(userCol)
    val day = to_date(col(tsCol))
    val cohort = df.groupBy(user.as("u")).agg(min(day).as("cohort_date"))
    val activity = df.select(user.as("u"), day.as("act_date")).distinct()
    activity.join(cohort, "u")
      .select(col("cohort_date"),
        expr(s"datediff(act_date, cohort_date) div $bucketDays")
          .cast(LongType).as("offset"),
        col("u"))
      .groupBy(col("cohort_date"), col("offset"))
      .agg(countDistinct(col("u")).as("n_users"))
  }

  /** Last-touch attribution: each conversion event is credited to the
    * channel of the latest touch event at-or-before it in the user's
    * timeline (touch-before-conversion on time ties — the industry
    * convention that a same-instant touch still gets credit). Revenue
    * and conversion counts roll up per channel.
    *
    * Plan: tag + union the two event slices, ONE window partitioned by
    * user ordered by (ts, tag, id) carrying the last non-null channel
    * forward, then a per-channel roll-up. One user-keyed shuffle; the
    * window state is a single value.
    * Output: (channel, n_conv, revenue) per channel, plus channel NULL
    * for conversions with no preceding touch. */
  def lastTouchAttribution(df: DataFrame, userCol: String, tsCol: String,
      idCol: String, convPred: Column, touchPred: Column,
      channel: Column, revenue: Column): DataFrame = {
    val user = col(userCol)
    val touches = df.filter(touchPred).select(user.as("u"),
      col(tsCol).as("ts"), lit(0).as("tag"), col(idCol).as("eid"),
      channel.as("ch"), lit(null).cast("double").as("rev"))
    val convs = df.filter(convPred).select(user.as("u"),
      col(tsCol).as("ts"), lit(1).as("tag"), col(idCol).as("eid"),
      lit(null).cast("string").as("ch"), revenue.cast("double").as("rev"))
    val w = Window.partitionBy(col("u"))
      .orderBy(col("ts"), col("tag"), col("eid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    touches.unionByName(convs)
      .withColumn("attr_ch", last(col("ch"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .groupBy(col("attr_ch").as("channel"))
      .agg(count(lit(1)).as("n_conv"),
        // exact-decimal sum (engine-order-independent), surfaced as double
        sum(col("rev").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast("double").as("revenue"))
  }

  /** Markov transition counts between event types along each user's
    * timeline — the path-analysis statistic behind "what happens next"
    * flows and session sankeys. Consecutive events (ordered by time,
    * ties by `tieCol`) contribute one (prev, next) pair; per-source
    * probabilities are integer basis points (`n · 10000 div` the source
    * state's outgoing total), replayable exactly by an oracle.
    *
    * Plan: one lag window over the user-keyed exchange (fixed per-row
    * state), then a groupBy on the tiny (prev, next) type matrix; the
    * probability window partitions the already-tiny relation by source
    * state. Output: (prev_type, next_type, n, p_bp). */
  /** Rolling exact distinct actives (the DAU/WAU/MAU family): for every
    * observed day, the count of distinct entities with at least one event
    * in the trailing `windowDays`-day window ending that day.
    *
    * Computed without any range join or per-day rescan: each distinct
    * (entity, day) pair is exploded to the `windowDays` window-end days
    * it contributes to (a bounded factor — 7 for WAU), then one distinct
    * aggregation per window-end day. Shuffles O(actives · window), keyed
    * by day — skew-free (day cardinality is the calendar), and the
    * explode factor is a constant, not the data. Window-end days outside
    * the observed range are dropped by an equi-join against the observed
    * day relation (calendar-sized, broadcast). */
  def rollingDistinct(df: DataFrame, userCol: String, tsCol: String,
      windowDays: Int): DataFrame = {
    val perDay = df.select(to_date(col(tsCol)).as("d"),
      col(userCol).as("uid")).distinct()
    val observed = broadcast(perDay.select(col("d").as("day")).distinct())
    perDay
      .select(col("uid"), explode(
        sequence(col("d"), date_add(col("d"), windowDays - 1))).as("day"))
      .join(observed, "day")
      .groupBy(col("day"))
      .agg(count_distinct(col("uid")).as("active_users"))
  }

  /** Temporal-proximity pairs via the binned interval self-join — the
    * scale-safe shape for "events within `windowSec` of each other"
    * when there is NO equi key to co-partition on. Each event lands in
    * bucket ⌊t/w⌋; the earlier side probes its own and the next bucket,
    * so every ordered pair with 0 ≤ t_later − t_earlier ≤ w meets in
    * EXACTLY one equi-join bucket (no dedupe pass needed). Candidate
    * volume is O(n · bucket density), never O(n²); ties on t order by id.
    * Output: (type_a, type_b, n_pairs) — earlier event's type first. */
  def nearbyPairs(df: DataFrame, idCol: String, tsCol: String,
      typeCol: String, windowSec: Int): DataFrame = {
    val w = windowSec * 1000000L
    val ev = df.select(col(idCol).as("id"), col(typeCol).as("et"),
      unix_micros(col(tsCol)).as("tus"))
    val probes = ev.select(col("id").as("id_a"), col("et").as("type_a"),
      col("tus").as("t_a"),
      explode(array(expr(s"tus div ${w}L"), expr(s"tus div ${w}L + 1"))).as("bkt"))
    val right = ev.select(col("id").as("id_b"), col("et").as("type_b"),
      col("tus").as("t_b"), expr(s"tus div ${w}L").as("bkt"))
    probes.join(right, "bkt")
      .filter(col("t_b") - col("t_a") <= w &&
        (col("t_b") > col("t_a") ||
          (col("t_b") === col("t_a") && col("id_b") > col("id_a"))))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Robust daily-volume spike detection per event type: a day is
    * anomalous when its count deviates from the type's median by more
    * than `k` × MAD (median absolute deviation) — the estimator that
    * doesn't let the outliers it hunts poison the baseline, computed
    * with the discrete median rule (value at rank ⌈n/2⌉, ties by day)
    * so every figure is an exact integer any engine reproduces.
    *
    * Two window passes partitioned by event type (day-count relation —
    * calendar × types sized, tiny relative to the event stream; the
    * only data-sized operation is the first day-count aggregation).
    * Output: flagged (event_type, day, n, med, mad), day ascending. */
  def spikeDays(df: DataFrame, typeCol: String, tsCol: String,
      k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("et"))
    def discreteMedian(value: Column, tie: Column): Column =
      // rank ⌈n/2⌉; the /2 stays exact in double (x.0/x.5) so the cast
      // truncation IS integer division here
      max(when(row_number().over(w.orderBy(value, tie)).cast("long") ===
        ((count(lit(1)).over(w) + 1) / 2).cast("long"), value)).over(w)
    val counts = df.select(col(typeCol).as("et"), to_date(col(tsCol)).as("day"))
      .groupBy(col("et"), col("day")).agg(count(lit(1)).as("n"))
    val withMed = counts.withColumn("med", discreteMedian(col("n"), col("day")))
      .withColumn("dev", abs(col("n") - col("med")))
    val withMad = withMed.withColumn("mad", discreteMedian(col("dev"), col("day")))
    withMad.filter(col("dev") > lit(k) * col("mad"))
      .select(col("et").as("event_type"), col("day"), col("n"),
        col("med"), col("mad"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Time-series similarity search over per-user daily value series —
    * histogram-intersection similarity (Σ_day min(a_d, b_d)) of a small
    * query set of users against the whole population, top-k matches per
    * query user. The "find accounts behaving like these" primitive
    * (alarm correlation / cohort expansion / fraud-ring seeds).
    *
    * Scale shape: the q29-kNN posture — the query side is tiny and
    * broadcasts, the population series makes ONE pass keyed by day
    * (candidate volume = |queries|·|users active that day|, never
    * users²); per-query top-k is a window over |queries| partitions.
    * Values aggregate as DECIMAL so every sum is exact and
    * order-independent (engine-portable — no float drift).
    *
    * Output: (query_user, rank, user_id, n_days, inter_s4) — inter
    * descending, ties by user id; inter_s4 is the DECIMAL(18,4)
    * intersection scaled ×10⁴ to BIGINT (bit-exact across engines,
    * where a decimal→double render can differ in the last ulp). */
  def seriesSimilarityTopK(df: DataFrame, userCol: String, tsCol: String,
      valueCol: String, queryPred: Column, k: Int): DataFrame = {
    // the daily series feeds BOTH join sides — materialize it once
    val daily = df.select(col(userCol).as("u"), to_date(col(tsCol)).as("day"),
        col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 4)).as("v"))
      .groupBy(col("u"), col("day")).agg(sum(col("v")).as("v"))
      .localCheckpoint(false)
    val q = daily.filter(queryPred)
      .select(col("u").as("qu"), col("day"), col("v").as("qv"))
    val scored = broadcast(q).join(daily, "day")
      .filter(col("u") =!= col("qu"))
      .groupBy(col("qu"), col("u"))
      .agg(count(lit(1)).as("n_days"),
        sum(least(col("qv"), col("v"))).as("inter"))
    val w = Window.partitionBy(col("qu"))
      .orderBy(col("inter").desc, col("u"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("qu").as("query_user"), col("rank"),
        col("u").as("user_id"), col("n_days"),
        (col("inter") * 10000).cast(LongType).as("inter_s4"))
  }

  def transitions(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .select(col(userCol), col(tsCol), col(tieCol),
        col(typeCol).as("next_type"))
      .withColumn("prev_type", lag(col("next_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("_tot",
        sum(col("n")).over(Window.partitionBy(col("prev_type"))))
      .select(col("prev_type"), col("next_type"), col("n"),
        expr("n * 10000 div _tot").as("p_bp"))
  }
}
