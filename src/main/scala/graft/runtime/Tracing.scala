package graft.runtime

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Tracing (`lib/tracer/constructor.go`, `jaeger.go`): the reference opens
  * an opentracing span per processor per message part
  * (`IteratePartsWithSpan`, `lib/processor/util.go:184`). Per-ROW spans
  * make no sense in a vectorized engine — the Spark-native unit of work
  * is the plan/action/job, so the trace tree here is:
  *
  *   pipeline root span
  *     ├─ one child span per processor (plan-assembly — shows operator
  *     │  order and config cost)
  *     └─ one child span per Spark JOB launched while the trace is open
  *        (the actual data work, with real durations)
  *
  * No jaeger agent exists in this image (and no egress), so spans are
  * recorded in-process and served as jaeger-style JSON from the control
  * plane's `GET /traces` — the collection surface is swappable for a
  * UDP/HTTP reporter without touching instrumentation call sites. */
object Tracing {

  final case class Span(id: Long, parentId: Option[Long], traceId: Long,
      operation: String, startUs: Long, var endUs: Long,
      tags: Map[String, String]) {
    def durationUs: Long = math.max(0L, endUs - startUs)
  }

  private val idGen = new AtomicLong(1L)
  private val finished = new java.util.concurrent.ConcurrentLinkedQueue[Span]()
  private val active = new ThreadLocal[List[Span]] { override def initialValue = Nil }
  @volatile private var enabled = false
  @volatile private var listening: Option[(SparkSession, SparkListener)] = None

  def enable(): Unit = { enabled = true }
  def disable(): Unit = { enabled = false }
  def isEnabled: Boolean = enabled

  def clear(): Unit = finished.clear()

  // external reporters (e.g. the jaeger UDP agent wire): invoked with a
  // completed trace's spans whenever a ROOT span finishes
  private val flushHooks =
    new java.util.concurrent.CopyOnWriteArrayList[scala.Seq[Span] => Unit]()
  def onFlush(cb: scala.Seq[Span] => Unit): Unit = flushHooks.add(cb)
  def clearFlushHooks(): Unit = flushHooks.clear()
  private def fireFlush(traceId: Long): Unit =
    if (!flushHooks.isEmpty) {
      val trace = spans.filter(_.traceId == traceId)
      flushHooks.forEach(cb => cb(trace))
    }

  private def nowUs: Long = System.nanoTime() / 1000L

  /** Record `f` as a span (child of the enclosing span on this thread). */
  def span[T](operation: String, tags: Map[String, String] = Map.empty)(f: => T): T =
    if (!enabled) f
    else {
      val parent = active.get.headOption
      val s = Span(idGen.getAndIncrement(), parent.map(_.id),
        parent.map(_.traceId).getOrElse(idGen.getAndIncrement()),
        operation, nowUs, -1L, tags)
      active.set(s :: active.get)
      if (parent.isEmpty) noteOpened(s)
      try f
      finally {
        active.set(active.get.tail)
        s.endUs = nowUs
        finished.add(s)
        if (parent.isEmpty) { lastOpened = None; fireFlush(s.traceId) }
      }
    }

  /** While any trace span is open, record every Spark job as a child of
    * the trace root (jobs run on scheduler threads, so parentage comes
    * from the job-group property set by [[span]] callers' session). */
  def attachJobListener(spark: SparkSession): Unit = synchronized {
    if (listening.isEmpty) {
      val l = new SparkListener {
        private val open = scala.collection.concurrent.TrieMap[Int, (Long, String)]()
        override def onJobStart(js: SparkListenerJobStart): Unit =
          if (enabled) open.put(js.jobId, (nowUs,
            Option(js.properties.getProperty("spark.job.description"))
              .getOrElse(s"job ${js.jobId}")))
        override def onJobEnd(je: SparkListenerJobEnd): Unit =
          open.remove(je.jobId).foreach { case (t0, desc) =>
            val root = rootSpanHint
            finished.add(Span(idGen.getAndIncrement(), root.map(_.id),
              root.map(_.traceId).getOrElse(0L),
              s"spark job ${je.jobId}: $desc", t0, nowUs,
              Map("component" -> "spark")))
          }
      }
      spark.sparkContext.addSparkListener(l)
      listening = Some((spark, l))
    }
  }

  def detachJobListener(): Unit = synchronized {
    listening.foreach { case (spark, l) =>
      spark.sparkContext.removeSparkListener(l)
    }
    listening = None
  }

  // jobs finish on listener threads — parent them to the most recent
  // still-open span recorded by any thread (the pipeline root in the
  // single-pipeline case; a heuristic, clearly tagged, in concurrent ones)
  @volatile private var lastOpened: Option[Span] = None
  private def rootSpanHint: Option[Span] = lastOpened
  private[runtime] def noteOpened(s: Span): Unit = { lastOpened = Some(s) }

  /** Completed spans, oldest first. */
  def spans: scala.Seq[Span] = {
    val it = finished.iterator()
    val buf = scala.collection.mutable.ListBuffer[Span]()
    while (it.hasNext) buf += it.next()
    buf.sortBy(_.startUs).toSeq
  }

  /** Jaeger-style JSON (`{"data":[{"traceID","spans":[...]}]}`). */
  def tracesJson: String = {
    def esc(s: String) =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    val byTrace = spans.groupBy(_.traceId).toSeq.sortBy(_._1)
    val traces = byTrace.map { case (tid, ss) =>
      val spanJson = ss.map { s =>
        val refs = s.parentId
          .map(p => s"""[{"refType":"CHILD_OF","spanID":"$p"}]""")
          .getOrElse("[]")
        val tags = s.tags.toSeq.sortBy(_._1).map { case (k, v) =>
          s"""{"key":"${esc(k)}","type":"string","value":"${esc(v)}"}"""
        }.mkString("[", ",", "]")
        s"""{"spanID":"${s.id}","operationName":"${esc(s.operation)}",""" +
          s""""references":$refs,"startTime":${s.startUs},""" +
          s""""duration":${s.durationUs},"tags":$tags}"""
      }.mkString("[", ",", "]")
      s"""{"traceID":"$tid","spans":$spanJson}"""
    }.mkString("[", ",", "]")
    s"""{"data":$traces}"""
  }
}
