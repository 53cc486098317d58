package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audit over EVERY gate query: the 100 TB guardrail.
  *
  * - `CartesianProduct` (large × large) is never acceptable.
  * - `BroadcastNestedLoopJoin` is acceptable only where a deliberately
  *   tiny side broadcasts against one corpus pass: exact kNN (q29 — the
  *   query batch), and the k-centroid assignment crosses of IVF (q40)
  *   and k-means (q46). Everything else must be an equi-join / bucketed
  *   plan. A new query that accidentally introduces a cross product
  *   fails here before it ever reaches a cluster.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = Sessions.builder("4").getOrCreate()

  private val bnljAllowed = Set(
    "q29_cosine_topk", // exact kNN: broadcast query batch × corpus scan
    "q40_ann_ivf",     // 16 seed centroids broadcast for coarse assign
    "q46_kmeans",      // k=8 centroids broadcast per Lloyd assign
    "q75_embed_outliers",  // same Lloyd assign broadcast as q46
    "q102_recency_weight", // 1-row corpus-max-timestamp broadcast
    "q105_cluster_sample", // same Lloyd assign broadcast as q46
    "q113_pq_adc",         // broadcast query LUTs × PQ-code scan (ADC)
    "q114_binary_ann",     // broadcast query bit-words × packed-bit scan
    "q115_ivfpq",          // 16 seed centroids broadcast for coarse assign
    "q116_collocations",   // 1-row corpus-token-total broadcast
    "q119_bm25",           // 1-row corpus-stats (N, Σdl) broadcast
    "q120_commonness",     // 1-row corpus-doc-count broadcast
    "q142_ann_recall",     // exact side = q29's broadcast query batch
    "q148_rrf_fusion",     // dense side = q29's broadcast query batch
    "q151_source_similarity") // |sources|² cross of per-source counts (tiny)

  test("no CartesianProduct anywhere; BNLJ only documented tiny-side crosses") {
    val sf = "/root/testdata/sf0.001"
    val offenders = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct"))
        offenders += s"$name: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))
        offenders += s"$name: BroadcastNestedLoopJoin"
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("q77 classifier scores through a broadcast weight join") {
    // the weight table is ≤dim rows by construction — if this ever
    // degrades to a SortMergeJoin the tokenized corpus shuffles on the
    // feature key, which is the wrong plan at any scale
    val plan = graft.queries.LlmQueries
      .queries("q77_classifier")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("no unpartitioned Window in any gate query plan (scale-killer audit)") {
    // The round-1 verdict's top issue: Window.orderBy with no partition
    // serializes the whole dataset through one task at scale. Every such
    // site was replaced with partitioned two-pass assignment; this pins
    // the invariant for all current and future gate queries.
    import org.apache.spark.sql.execution.window.WindowExec
    val sf = "/root/testdata/sf0.001"
    val offenders = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val hits = fn(spark, sf).queryExecution.executedPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      if (hits.nonEmpty) offenders += s"$name: ${hits.size} global Window(s)"
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("plan-shape pins for the bench-drift trio (q57/q58/q96)") {
    // Round-4 bench flagged these three as 1.6-1.9x over committed
    // medians; an isolated re-measure at the medians' own commit showed
    // the SAME times — environment, not a plan regression. These pins
    // make any FUTURE plan-shape regression (extra exchange, extra scan)
    // fail structurally instead of surfacing as wall-clock noise.
    val sf = "/root/testdata/sf0.001"
    val pinned = Map( // name -> (max exchanges, max parquet scans)
      "q57_lm_novelty" -> (6, 3),
      "q58_tfidf" -> (4, 2),
      "q96_interleave" -> (1, 1),
      // single-scan funnel: 1 events scan; exchanges = Tables' spread
      // repartition + ONE hash(user) feeding windows+agg + final sort
      "q106_funnel" -> (3, 1))
    val offenders = scala.collection.mutable.ListBuffer[String]()
    pinned.foreach { case (name, (maxEx, maxScan)) =>
      val p = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      // string-level counts: AQE wraps the plan, hiding exchange nodes
      // from collect() until execution — the printed initial plan is the
      // stable pre-AQE shape
      val ex = p.linesIterator.count(_.contains("Exchange "))
      val scans = p.linesIterator.count(_.contains("Scan parquet"))
      if (ex > maxEx || scans > maxScan)
        offenders += s"$name: $ex exchanges (pin $maxEx), $scans scans (pin $maxScan)"
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("column pruning + filter pushdown reach the scan through Tables.parallelize") {
    // Tables.t inserts a repartitionByRange on small local inputs; this
    // pins that Catalyst still pushes projection and predicates THROUGH
    // that exchange to the parquet scan (a regression here would make
    // every query read every column at deploy scale).
    val plan = graft.queries.Relational.queries("q1_agg")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    val scan = plan.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(fail("no FileScan in q1 plan"))
    // 7 needed columns + the range key; never the full 16-column lineitem
    val readCols = "#\\d+".r.findAllIn(
      scan.substring(scan.indexOf("["), scan.indexOf("]") + 1)).size
    assert(readCols <= 8, s"scan reads $readCols columns: $scan")
    assert(scan.contains("l_shipdate") && plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"shipdate filter not pushed: $scan")
    // documents-based kernel: only (doc_id, text) may reach the scan
    val p50 = graft.queries.LlmQueries.queries("q30_text_quality")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    val docScan = p50.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(fail("no FileScan in q30 plan"))
    val cols50 = "#\\d+".r.findAllIn(
      docScan.substring(docScan.indexOf("["), docScan.indexOf("]") + 1)).size
    assert(cols50 <= 3, s"q30 documents scan reads $cols50 columns: $docScan")
  }
}
