package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational capability queries (joins/aggregations/windows/set-ops).
  *
  * The reference reaches these semantics through batch + Bloblang
  * (`from_all().sum()`, `sequence.sharded_join`, enrichment lookups — see
  * SURVEY §2.12); here they are first-class Catalyst plans. Every query has a
  * DuckDB oracle twin in [[Relational.oracleSql]] with identical column names
  * and deterministic ORDER BY.
  *
  * Scale notes (100 TB): aggregations are partial (map-side combine) by
  * construction; small dimension tables (`part`, `nation`, `customer` at dim
  * scale) are broadcast explicitly so the big fact table never shuffles for
  * the join; window queries partition by a high-cardinality key.
  */
object Relational {
  import graft.Tables.t
  import org.apache.spark.sql.types.{DecimalType, DoubleType}

  type Q = (SparkSession, String) => DataFrame

  /** Exact aggregate for cross-engine bit-parity: doubles in the driver
    * tables carry <=4 decimals, so summing as DECIMAL(18,4) is exact; the
    * final cast to double is then identical in Spark and DuckDB. Plain
    * float sums differ in the last ulp (summation order) and round(x,2)
    * ties at .xx5 flip between engines. */
  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** TPC-H Q1 flavor: the canonical partial-agg scan. Filter is pushed to the
    * parquet scan; the groupBy key is tiny (6 groups) so AQE coalesces
    * post-shuffle partitions. */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Broadcast join: fact `lineitem` never shuffles; `part` is the broadcast
    * side (dim-scale even at 100 TB fact scale). */
  def q2JoinBrand(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val p = t(s, dir, "part")
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("p_brand"))
  }

  /** Two-hop enrichment join (orders → customer → nation), both dims
    * broadcast. Revenue per nation. */
  def q3JoinNation(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("n_name"))
  }

  /** Global top-k: Spark's `orderBy.limit` compiles to TakeOrderedAndProject
    * — per-partition heap + driver merge, no full sort shuffle. */
  def q4TopK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** Analytic window: top-3 orders per customer. Partitioned by a
    * high-cardinality key so the window shuffles evenly. */
  def q5WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Set ops (reference only has fan-in union — SURVEY §2.12): nations with
    * a very-high-balance customer but no very-high-balance supplier. */
  def q6SetOps(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_acctbal") > 9900)
      .select(col("c_nationkey").as("nationkey")).distinct()
    val su = t(s, dir, "supplier").filter(col("s_acctbal") > 9900)
      .select(col("s_nationkey").as("nationkey")).distinct()
    c.except(su).orderBy(col("nationkey"))
  }

  /** Semi-join (EXISTS): customers that placed orders, per market segment. */
  def q7SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** Anti-join (NOT EXISTS): customers who never placed an order above 300k,
    * per segment. */
  def q8AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_totalprice") > 300000).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** Event-stream aggregation by type (min/max are exact; sums via the
    * exact-decimal pattern for cross-engine bit parity). */
  def q9EventsAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("value")).as("sum_value"),
        (dsum(col("value")) / count(lit(1))).as("avg_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))

  /** Event-time tumbling window (the superset the reference lacks —
    * SURVEY §2.6); epoch-second buckets for cross-engine comparability. */
  def q33TimeWindow(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("bucket"),
        col("n"), col("sum_value"))
      .orderBy(col("bucket"))

  /** Session windows (native `session_window` — the event-time
    * sessionization the reference's batch policies can't express). 6-hour
    * gap; timestamps emitted as exact epoch micros for engine parity. */
  def q56Sessionize(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sessionize.sessions(t(s, dir, "events"), "user_id", "ts",
        "6 hours", scala.Seq(dsum(col("value")).as("sum_value")))
      .select(col("user_id"),
        unix_micros(col("session_start")).as("session_start"),
        unix_micros(col("session_end")).as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** ROLLUP grouping sets (absent from the reference; Spark builtin). */
  def q34Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** As-of join: latest order at-or-before each event (per user). Right
    * side pre-aggregated to unique (key, time) for determinism. */
  def q35AsOf(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts"))
    val ord = t(s, dir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("okey"))
    graft.ops.AsOfJoin.join(ev, ord,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        rightCols = scala.Seq("okey"))
      .select(col("event_id"), col("okey"))
      .orderBy(col("event_id"))
  }

  /** q106: ordered funnel signup → view → click → purchase per user —
    * stage i counts only strictly after the user's stage-(i-1) time. */
  def q106Funnel(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.funnel(t(s, dir, "events"), "user_id", "ts",
        "event_type", scala.Seq("signup", "view", "click", "purchase"))
      .orderBy(col("user_id"))

  /** q155: time-series similarity search — top-5 users whose daily
    * value series best matches each query user's (histogram
    * intersection, exact decimal sums; q29's broadcast-query kNN
    * posture over the event stream). */
  def q155SeriesSim(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.seriesSimilarityTopK(t(s, dir, "events"),
        "user_id", "ts", "value", col("u") % 30 === 0, k = 5)
      .orderBy(col("query_user"), col("rank"))

  /** q107: weekly cohort retention triangle — cohort by first active
    * day, activity bucketed in 7-day offsets from it. */
  def q107Retention(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.retentionCohorts(t(s, dir, "events"),
        "user_id", "ts", bucketDays = 7)
      .orderBy(col("cohort_date"), col("offset"))

  /** q117: event-type Markov transitions — per-user (prev → next)
    * counts with basis-point probabilities within each source state. */
  def q117Transitions(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.transitions(t(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type")
      .orderBy(col("prev_type"), col("next_type"))

  /** q121: rolling 7-day distinct active users per observed day (WAU
    * curve) — explode-to-window-end contribution, no range join. */
  def q121RollingActive(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.rollingDistinct(t(s, dir, "events"),
        "user_id", "ts", windowDays = 7)
      .orderBy(col("day"))

  /** q123: temporal-proximity pairs — ordered event pairs within 30 s of
    * each other via the binned interval self-join (no equi key, no cross
    * product), rolled up by (earlier, later) type. */
  def q123NearbyPairs(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.nearbyPairs(t(s, dir, "events"),
        "event_id", "ts", "event_type", windowSec = 30)
      .orderBy(col("type_a"), col("type_b"))

  /** q124: KMV bottom-64 sketch estimate of distinct users per event
    * type, with the exact-count fallback below k. */
  def q124KmvDistinct(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sketches.kmvDistinct(t(s, dir, "events"),
        "event_type", "user_id", k = 64)
      .select(col("grp").as("event_type"), col("n_hashes"),
        col("est_distinct"))
      .orderBy(col("event_type"))

  /** q125: bloom-prefiltered semi-join — lineitem rows kept only for
    * size-1 parts; the native bloom_filter_agg prefilter drops
    * non-matching rows before the exact semi-join's shuffle. Result is
    * bit-identical to the plain semi-join (false positives are removed
    * by the join); the oracle is that plain semi-join. */
  def q125BloomJoin(s: SparkSession, dir: String): DataFrame = {
    val dim = t(s, dir, "part").filter(col("p_size") === 1)
    graft.ops.Sketches.bloomSemiJoin(t(s, dir, "lineitem"), "l_partkey",
        dim, "p_partkey", expectedItems = 4096L, numBits = 65536L)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** q128: Z-order layout audit — Morton-interleave (l_partkey mod 1024,
    * l_suppkey mod 1024) at 10 bits/dim, bucket by the top 4 z bits, and
    * report each bucket's (x, y) extents: the bounded-rectangle property
    * that makes min/max file stats prune on either column. */
  def q128Zorder(s: SparkSession, dir: String): DataFrame =
    graft.ops.Layout.zProfile(
      t(s, dir, "lineitem").select(
        pmod(col("l_partkey"), lit(1024)).as("x"),
        pmod(col("l_suppkey"), lit(1024)).as("y")),
      "x", "y", bits = 10, log2Buckets = 4)

  /** q129: integer PageRank, 3 sweeps, over the symmetrized
    * customer–supplier trade graph (distinct (o_custkey, l_suppkey)
    * pairs via orders ⋈ lineitem; supplier ids offset by 1e6 into their
    * own id space). */
  def q129Pagerank(s: SparkSession, dir: String): DataFrame = {
    val e0 = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + lit(1000000L)).as("dst"))
      .distinct()
    val e = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
    graft.llmops.Graph.pagerankIter(e, "src", "dst", iters = 3)
      .orderBy(col("id"))
  }

  /** q130: incremental aggregate-state merge — orders split at
    * 1997-01-01 into a history batch and a delta batch, per-priority
    * partial states computed independently, merged, finished. The gate
    * pins merge(state(A), state(B)) == state(A ∪ B): the oracle is the
    * single-pass aggregate over everything. */
  def q130IncrementalState(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Incremental
    val o = t(s, dir, "orders")
    val hist = o.filter(col("o_orderdate") < lit("1997-01-01"))
    val delta = o.filter(col("o_orderdate") >= lit("1997-01-01"))
    Incremental.finishState(
      Incremental.mergeStates(Seq("o_orderpriority"),
        Incremental.aggState(hist, Seq("o_orderpriority"), "o_totalprice"),
        Incremental.aggState(delta, Seq("o_orderpriority"), "o_totalprice")),
      Seq("o_orderpriority"))
      .orderBy(col("o_orderpriority"))
  }

  /** q131: salted skew join — lineitem ⋈ supplier with the fact side
    * fanned over 8 deterministic salts and the dim side replicated 8×.
    * Row-identical to the plain join (the oracle); salting only spreads
    * hot keys across reducers. */
  def q131SaltedJoin(s: SparkSession, dir: String): DataFrame =
    graft.ops.SkewJoin.saltedJoin(
        t(s, dir, "lineitem"), "l_suppkey",
        t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
        "s_suppkey", salts = 8,
        saltBy = xxhash64(col("l_orderkey"), col("l_linenumber")))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("s_nationkey"))

  /** q134: binned range-lookup join — customers classified into balance
    * tiers by [lo, hi) interval membership through the bin-equi-join
    * shape (no BNLJ even when the range table can't broadcast). Dollar
    * values shift by +1000 so binning stays in non-negative `div`
    * territory. */
  def q134RangeLookup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tiers = scala.Seq(
      (0L, 1000L, "debt"), (1000L, 3000L, "low"),
      (3000L, 6000L, "mid"), (6000L, 9000L, "high"),
      (9000L, 11000L, "top")).toDF("lo", "hi", "tier")
    graft.ops.RangeLookup.rangeLookup(
        t(s, dir, "customer"),
        floor(col("c_acctbal")).cast("long") + lit(1000L),
        tiers, binWidth = 500L)
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("tier"))
  }

  /** q135: unpivot (melt) — the wide→long reshape inverse of q97's
    * pivot: per-returnflag quantity and price sums melted to
    * (l_returnflag, metric, value) rows. */
  def q135Unpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price")), "metric", "value")
      .orderBy(col("l_returnflag"), col("metric"))

  /** q137: KMV sketch set algebra — estimated distinct-user union and
    * intersection for event-type pairs, from bottom-64 sketches alone
    * (exact when the union sketch is unsaturated). */
  def q137KmvSetOps(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sketches.kmvSetOps(t(s, dir, "events"),
        "event_type", "user_id", k = 64,
        scala.Seq(("click", "view"), ("click", "purchase"),
          ("signup", "error")))
      .orderBy(col("grp_a"), col("grp_b"))

  /** q139: robust daily-volume spike days per event type — median/MAD
    * outlier rule (k=3) with the discrete-median convention, all
    * integer. */
  def q139SpikeDays(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.spikeDays(t(s, dir, "events"),
      "event_type", "ts", k = 3)

  /** q108: last-touch revenue attribution — each purchase credited to
    * the channel (props.k mod 10) of the latest view/click at-or-before
    * it in the user's timeline. */
  def q108Attribution(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.lastTouchAttribution(t(s, dir, "events"),
        "user_id", "ts", "event_id",
        convPred = col("event_type") === "purchase",
        touchPred = col("event_type").isin("view", "click"),
        channel = concat(lit("ch"),
          (get_json_object(col("props"), "$.k").cast("long") % 10)
            .cast("string")),
        revenue = col("value"))
      .orderBy(col("channel").asc_nulls_first)

  val queries: Map[String, Q] = Map(
    "q106_funnel" -> (q106Funnel _),
    "q107_retention" -> (q107Retention _),
    "q108_attribution" -> (q108Attribution _),
    "q117_transitions" -> (q117Transitions _),
    "q121_rolling_active" -> (q121RollingActive _),
    "q123_nearby_pairs" -> (q123NearbyPairs _),
    "q124_kmv_distinct" -> (q124KmvDistinct _),
    "q125_bloom_join" -> (q125BloomJoin _),
    "q128_zorder" -> (q128Zorder _),
    "q129_pagerank" -> (q129Pagerank _),
    "q130_incremental_state" -> (q130IncrementalState _),
    "q131_salted_join" -> (q131SaltedJoin _),
    "q134_range_lookup" -> (q134RangeLookup _),
    "q135_unpivot" -> (q135Unpivot _),
    "q137_kmv_setops" -> (q137KmvSetOps _),
    "q139_spike_days" -> (q139SpikeDays _),
    "q155_series_similarity" -> (q155SeriesSim _),
    "q56_sessionize" -> (q56Sessionize _),
    "q33_time_window" -> (q33TimeWindow _),
    "q34_rollup" -> (q34Rollup _),
    "q35_asof_join" -> (q35AsOf _),
    "q1_agg" -> (q1Agg _),
    "q2_join_brand" -> (q2JoinBrand _),
    "q3_join_nation" -> (q3JoinNation _),
    "q4_topk" -> (q4TopK _),
    "q5_window_rank" -> (q5WindowRank _),
    "q6_setops" -> (q6SetOps _),
    "q7_semi_join" -> (q7SemiJoin _),
    "q8_anti_join" -> (q8AntiJoin _),
    "q9_events_agg" -> (q9EventsAgg _))

  /** SQL for the Morton interleave of `bits`-bit x and y (bit i of x at
    * position 2i, of y at 2i+1) — mirrors [[graft.ops.Layout.zValue]]. */
  private def zvalSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Integer value of the first `n` hex chars of md5-string expr `e`. */
  private def hexValSql(e: String, n: Int): String =
    (1 to n).foldLeft("0") { (acc, i) =>
      s"($acc * 16 + (strpos('0123456789abcdef', substr($e, $i, 1)) - 1))"
    }

  val oracleSql: Map[String, String] = Map(
    "q155_series_similarity" ->
      """WITH daily AS (
        | SELECT user_id AS u, CAST(ts AS DATE) AS day,
        |  sum(CAST(value AS DECIMAL(18,4))) AS v
        | FROM events GROUP BY 1, 2),
        |q AS (SELECT u AS qu, day, v AS qv FROM daily WHERE u % 30 = 0),
        |scored AS (
        | SELECT qu, d.u, CAST(count(*) AS BIGINT) AS n_days,
        |  sum(least(qv, d.v)) AS inter
        | FROM q JOIN daily d USING (day) WHERE d.u <> qu
        | GROUP BY 1, 2),
        |rk AS (
        | SELECT qu, u, n_days, inter,
        |  row_number() OVER (PARTITION BY qu ORDER BY inter DESC, u) AS rank
        | FROM scored)
        |SELECT qu AS query_user, CAST(rank AS BIGINT) AS rank, u AS user_id,
        | n_days, CAST(inter * 10000 AS BIGINT) AS inter_s4
        |FROM rk WHERE rank <= 5 ORDER BY query_user, rank""".stripMargin,
    "q139_spike_days" ->
      """WITH c AS (
        | SELECT event_type AS et, CAST(ts AS DATE) AS day,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM events GROUP BY 1, 2),
        |r1 AS (
        | SELECT *, row_number() OVER (PARTITION BY et ORDER BY n, day) AS rn,
        |  count(*) OVER (PARTITION BY et) AS m FROM c),
        |m1 AS (
        | SELECT *, max(CASE WHEN rn = (m+1)//2 THEN n END)
        |  OVER (PARTITION BY et) AS med FROM r1),
        |d AS (SELECT *, abs(n - med) AS dev FROM m1),
        |r2 AS (
        | SELECT *, row_number() OVER (PARTITION BY et ORDER BY dev, day)
        |  AS rn2 FROM d),
        |m2 AS (
        | SELECT *, max(CASE WHEN rn2 = (m+1)//2 THEN dev END)
        |  OVER (PARTITION BY et) AS mad FROM r2)
        |SELECT et AS event_type, day, n, CAST(med AS BIGINT) AS med,
        | CAST(mad AS BIGINT) AS mad
        |FROM m2 WHERE dev > 3 * mad
        |ORDER BY event_type, day""".stripMargin,
    "q137_kmv_setops" -> {
      val est = s"(63 * 16777216 // ${hexValSql("h_k", 6)})"
      s"""WITH pairs(grp_a, grp_b) AS (VALUES
         |  ('click', 'view'), ('click', 'purchase'), ('signup', 'error')),
         |h AS (
         | SELECT DISTINCT event_type AS grp,
         |  md5(CAST(user_id AS VARCHAR)) AS h FROM events),
         |r AS (
         | SELECT grp, h,
         |  row_number() OVER (PARTITION BY grp ORDER BY h) AS rnk FROM h),
         |sk AS (SELECT grp, h FROM r WHERE rnk <= 64),
         |m0 AS (
         | SELECT p.grp_a, p.grp_b, s.h,
         |  max(CASE WHEN s.grp = p.grp_a THEN 1 ELSE 0 END) AS in_a,
         |  max(CASE WHEN s.grp = p.grp_b THEN 1 ELSE 0 END) AS in_b
         | FROM pairs p JOIN sk s ON s.grp = p.grp_a OR s.grp = p.grp_b
         | GROUP BY 1, 2, 3),
         |m AS (
         | SELECT *, row_number() OVER (
         |   PARTITION BY grp_a, grp_b ORDER BY h) AS rnk FROM m0),
         |a AS (
         | SELECT grp_a, grp_b, CAST(count(*) AS BIGINT) AS n_u,
         |  max(h) AS h_k, CAST(sum(in_a * in_b) AS BIGINT) AS rho
         | FROM m WHERE rnk <= 64 GROUP BY 1, 2)
         |SELECT grp_a, grp_b,
         | CAST(CASE WHEN n_u < 64 THEN n_u ELSE $est END AS BIGINT)
         |  AS est_union,
         | CAST(CASE WHEN n_u < 64 THEN rho ELSE rho * $est // 64 END
         |  AS BIGINT) AS est_intersect
         |FROM a ORDER BY grp_a, grp_b""".stripMargin
    },
    "q134_range_lookup" ->
      """WITH tiers(lo, hi, tier) AS (VALUES
        |  (0, 1000, 'debt'), (1000, 3000, 'low'), (3000, 6000, 'mid'),
        |  (6000, 9000, 'high'), (9000, 11000, 'top')),
        |v AS (
        | SELECT c_acctbal,
        |  CAST(floor(c_acctbal) AS BIGINT) + 1000 AS d FROM customer)
        |SELECT tier, CAST(count(*) AS BIGINT) AS n_cust,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM v JOIN tiers ON d >= lo AND d < hi
        |GROUP BY tier ORDER BY tier""".stripMargin,
    "q135_unpivot" ->
      """WITH agg AS (
        | SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |   AS sum_price
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, metric, value FROM (
        | SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM agg
        | UNION ALL
        | SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value
        | FROM agg)
        |ORDER BY l_returnflag, metric""".stripMargin,
    "q130_incremental_state" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_v,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |   / CAST(count(*) AS DOUBLE) AS mean_v,
        | min(o_totalprice) AS min_v, max(o_totalprice) AS max_v
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q131_salted_join" ->
      """SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |  AS sum_price
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q125_bloom_join" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 1)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q128_zorder" ->
      s"""WITH p AS (
        | SELECT l_partkey % 1024 AS x, l_suppkey % 1024 AS y
        | FROM lineitem),
        |z AS (
        | SELECT x, y, (${zvalSql("x", "y", 10)}) >> 16 AS z_bucket FROM p)
        |SELECT CAST(z_bucket AS BIGINT) AS z_bucket,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(min(x) AS BIGINT) AS x_min, CAST(max(x) AS BIGINT) AS x_max,
        | CAST(min(y) AS BIGINT) AS y_min, CAST(max(y) AS BIGINT) AS y_max
        |FROM z GROUP BY z_bucket ORDER BY z_bucket""".stripMargin,
    "q129_pagerank" ->
      """WITH e0 AS (
        | SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT src, dst FROM e0
        |      UNION ALL SELECT dst, src FROM e0),
        |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
        |        FROM e GROUP BY src),
        |r0 AS (SELECT id, CAST(10000 AS BIGINT) AS rank FROM nodes),
        |i1 AS (SELECT e.dst AS id, sum(r0.rank // deg.deg) AS inflow
        |       FROM e JOIN deg USING (src) JOIN r0 ON r0.id = e.src
        |       GROUP BY e.dst),
        |r1 AS (SELECT nodes.id, 1500 + 85 * COALESCE(inflow, 0) // 100 AS rank
        |       FROM nodes LEFT JOIN i1 USING (id)),
        |i2 AS (SELECT e.dst AS id, sum(r1.rank // deg.deg) AS inflow
        |       FROM e JOIN deg USING (src) JOIN r1 ON r1.id = e.src
        |       GROUP BY e.dst),
        |r2 AS (SELECT nodes.id, 1500 + 85 * COALESCE(inflow, 0) // 100 AS rank
        |       FROM nodes LEFT JOIN i2 USING (id)),
        |i3 AS (SELECT e.dst AS id, sum(r2.rank // deg.deg) AS inflow
        |       FROM e JOIN deg USING (src) JOIN r2 ON r2.id = e.src
        |       GROUP BY e.dst),
        |r3 AS (SELECT nodes.id, 1500 + 85 * COALESCE(inflow, 0) // 100 AS rank
        |       FROM nodes LEFT JOIN i3 USING (id))
        |SELECT id, CAST(rank AS BIGINT) AS rank FROM r3 ORDER BY id""".stripMargin,
    // Funnel stages replicated as chained filtered min-aggs; all time
    // comparisons on exact epoch micros (the engines' shared precision).
    "q106_funnel" ->
      """WITH ev AS (
        | SELECT user_id, event_type, epoch_ns(ts)//1000 AS tus FROM events),
        |s1 AS (SELECT user_id, min(tus) AS t1 FROM ev
        |       WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.tus) AS t2 FROM ev e
        |       JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'view' AND e.tus > s1.t1
        |       GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.tus) AS t3 FROM ev e
        |       JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.tus > s2.t2
        |       GROUP BY e.user_id),
        |s4 AS (SELECT e.user_id, min(e.tus) AS t4 FROM ev e
        |       JOIN s3 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.tus > s3.t3
        |       GROUP BY e.user_id)
        |SELECT u.user_id,
        | CAST((t1 IS NOT NULL)::INT + (t2 IS NOT NULL)::INT +
        |      (t3 IS NOT NULL)::INT + (t4 IS NOT NULL)::INT AS BIGINT)
        |  AS reached
        |FROM (SELECT DISTINCT user_id FROM events) u
        |LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |LEFT JOIN s3 USING (user_id) LEFT JOIN s4 USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "q107_retention" ->
      """WITH c AS (
        | SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
        | FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS act_date
        |      FROM events)
        |SELECT c.cohort_date,
        | CAST(date_diff('day', c.cohort_date, a.act_date) // 7 AS BIGINT)
        |  AS offset,
        | CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
        |FROM a JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q117_transitions" ->
      """WITH o AS (
        | SELECT user_id, epoch_ns(ts)//1000 AS tus, event_id, event_type
        | FROM events),
        |p AS (
        | SELECT event_type AS next_type,
        |  lag(event_type) OVER (
        |    PARTITION BY user_id ORDER BY tus, event_id) AS prev_type
        | FROM o),
        |tr AS (
        | SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
        | FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n,
        | CAST(n * 10000 // sum(n) OVER (PARTITION BY prev_type) AS BIGINT)
        |  AS p_bp
        |FROM tr ORDER BY prev_type, next_type""".stripMargin,
    "q121_rolling_active" ->
      """WITH pd AS (
        | SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
        |obs AS (SELECT DISTINCT d AS day FROM pd),
        |contrib AS (
        | SELECT user_id, CAST(unnest(generate_series(
        |   CAST(d AS TIMESTAMP),
        |   CAST(d AS TIMESTAMP) + INTERVAL 6 DAY,
        |   INTERVAL 1 DAY)) AS DATE) AS day
        | FROM pd)
        |SELECT day, CAST(count(DISTINCT user_id) AS BIGINT)
        |  AS active_users
        |FROM contrib JOIN obs USING (day)
        |GROUP BY day ORDER BY day""".stripMargin,
    "q123_nearby_pairs" ->
      """WITH e AS (
        | SELECT event_id, event_type, epoch_ns(ts)//1000 AS tus
        | FROM events)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        | CAST(count(*) AS BIGINT) AS n_pairs
        |FROM e a JOIN e b
        | ON b.tus - a.tus BETWEEN 0 AND 30000000
        | AND (b.tus > a.tus OR (b.tus = a.tus AND b.event_id > a.event_id))
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q124_kmv_distinct" ->
      """WITH h AS (
        | SELECT DISTINCT event_type,
        |  md5(CAST(user_id AS VARCHAR)) AS h FROM events),
        |r AS (
        | SELECT event_type, h,
        |  row_number() OVER (PARTITION BY event_type ORDER BY h) AS rnk
        | FROM h),
        |t AS (
        | SELECT event_type, CAST(count(*) AS BIGINT) AS n_hashes,
        |  max(h) AS h_k
        | FROM r WHERE rnk <= 64 GROUP BY event_type),
        |v AS (
        | SELECT event_type, n_hashes,
        |  (((((
        |    (strpos('0123456789abcdef', substr(h_k, 1, 1)) - 1) * 16 +
        |    (strpos('0123456789abcdef', substr(h_k, 2, 1)) - 1)) * 16 +
        |    (strpos('0123456789abcdef', substr(h_k, 3, 1)) - 1)) * 16 +
        |    (strpos('0123456789abcdef', substr(h_k, 4, 1)) - 1)) * 16 +
        |    (strpos('0123456789abcdef', substr(h_k, 5, 1)) - 1)) * 16 +
        |    (strpos('0123456789abcdef', substr(h_k, 6, 1)) - 1)) AS hv
        | FROM t)
        |SELECT event_type, n_hashes,
        | CAST(CASE WHEN n_hashes < 64 THEN n_hashes
        |  ELSE 63 * 16777216 // hv END AS BIGINT) AS est_distinct
        |FROM v ORDER BY event_type""".stripMargin,
    "q108_attribution" ->
      """WITH u AS (
        | SELECT user_id, epoch_ns(ts)//1000 AS tus, event_id,
        |  CASE WHEN event_type IN ('view','click') THEN 0 ELSE 1 END AS tag,
        |  CASE WHEN event_type IN ('view','click')
        |       THEN 'ch' || CAST(CAST(json_extract_string(props, '$.k')
        |            AS BIGINT) % 10 AS VARCHAR)
        |       ELSE NULL END AS ch,
        |  CASE WHEN event_type = 'purchase' THEN value ELSE NULL END AS rev
        | FROM events WHERE event_type IN ('view','click','purchase')),
        |l AS (
        | SELECT *, last_value(ch IGNORE NULLS) OVER (
        |   PARTITION BY user_id ORDER BY tus, tag, event_id
        |   ROWS UNBOUNDED PRECEDING) AS attr_ch
        | FROM u)
        |SELECT attr_ch AS channel, CAST(count(*) AS BIGINT) AS n_conv,
        | CAST(sum(CAST(rev AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM l WHERE tag = 1
        |GROUP BY attr_ch ORDER BY channel NULLS FIRST""".stripMargin,
    // Gaps-and-islands twin of session_window: a session breaks when the
    // gap STRICTLY exceeds 6h (Spark's merge boundary is inclusive — an
    // event exactly `gap` after its predecessor still merges; pinned by
    // GraphSpec). All arithmetic on exact epoch-microsecond integers.
    "q56_sessionize" ->
      """WITH o AS (
        | SELECT user_id, epoch_ns(ts)//1000 AS tus, value FROM events),
        |b AS (
        | SELECT user_id, tus, value,
        |  CASE WHEN lag(tus) OVER w IS NULL
        |        OR tus - lag(tus) OVER w > 21600000000 THEN 1 ELSE 0 END AS brk
        | FROM o WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
        |s AS (
        | SELECT user_id, tus, value,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY tus
        |   ROWS UNBOUNDED PRECEDING) AS sid
        | FROM b)
        |SELECT user_id, min(tus) AS session_start, max(tus) AS session_end,
        | count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q33_time_window" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT) AS bucket,
        | count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q34_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q35_asof_join" ->
      """SELECT e.event_id, r.okey
        |FROM events e ASOF LEFT JOIN (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS okey
        |  FROM orders GROUP BY 1, 2) r
        |ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
        |ORDER BY e.event_id""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_join_brand" ->
      """SELECT p_brand,
        | CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q3_join_nation" ->
      """SELECT n_name, CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q4_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q6_setops" ->
      """SELECT * FROM (
        | SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9900
        | EXCEPT
        | SELECT DISTINCT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9900)
        |ORDER BY nationkey""".stripMargin,
    "q7_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q8_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q9_events_agg" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        | CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_value,
        | min(value) AS min_value, max(value) AS max_value,
        | count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
}
