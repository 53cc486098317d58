package graft.runtime

import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import graft.streaming.StreamRegistry

/** Metric registry: named `df.observe` observations, rendered as
  * prometheus text (`lib/metrics/constructor.go:74-84` prometheus sink).
  * Batch observations publish after their action completes; streaming
  * metrics surface through query progress (`/streams/{id}/stats`). */
object Metrics {
  private[runtime] val observations =
    scala.collection.concurrent.TrieMap[String, org.apache.spark.sql.Observation]()

  def observation(name: String): org.apache.spark.sql.Observation =
    observations.getOrElseUpdate(name, org.apache.spark.sql.Observation(name))

  /** A NEW Observation registered under `name` (replacing any prior) —
    * an Observation instance can only attach to one DataFrame, so every
    * pipeline compile needs a fresh one; /metrics always renders the
    * latest. */
  def freshObservation(name: String): org.apache.spark.sql.Observation = {
    val o = org.apache.spark.sql.Observation(
      s"$name#${System.nanoTime()}")
    observations.put(name, o)
    o
  }

  def clear(): Unit = { observations.clear(); pathMap = defaultPathMap }

  private def sanitize(s: String): String =
    s.replaceAll("[^A-Za-z0-9_]", "_")

  /** Metric-path mapper (`lib/metrics` whitelist / blacklist / rename /
    * path_mapping wrappers): applied to the dotted `obs.metric` path
    * before rendering; None drops the metric. Composed by Config when a
    * metrics wrapper section is present. */
  private val defaultPathMap: String => Option[String] = s => Some(s)
  @volatile var pathMap: String => Option[String] = defaultPathMap

  /** Prometheus exposition text of all completed observations. */
  def prometheus: String = {
    val lines = observations.toSeq.sortBy(_._1).flatMap { case (n, o) =>
      org.apache.spark.sql.GraftBridge.observationValues(o)
        .toSeq.sortBy(_._1).flatMap { case (k, v) =>
        val num = v match {
          case x: java.lang.Number => Some(x.doubleValue)
          case _ => None
        }
        for {
          d <- num
          path <- pathMap(s"$n.$k")
        } yield {
          val metric = s"graft_${sanitize(path)}"
          s"# TYPE $metric gauge\n$metric $d"
        }
      }
    }
    lines.mkString("", "\n", "\n")
  }

  /** statsd line protocol rendering of the same registry
    * (`lib/metrics/statsd.go`): one `<prefix>.<obs>.<metric>:<v>|g`
    * gauge line per value. */
  def statsdLines(prefix: String = "graft"): scala.Seq[String] =
    observations.toSeq.sortBy(_._1).flatMap { case (n, o) =>
      org.apache.spark.sql.GraftBridge.observationValues(o)
        .toSeq.sortBy(_._1).flatMap { case (k, v) =>
        v match {
          case x: java.lang.Number =>
            pathMap(s"$n.$k").map(p =>
              s"$prefix.${p.split('.').map(sanitize).mkString(".")}:${x.doubleValue}|g")
          case _ => None
        }
      }
    }
}

/** `path_mapping` metric-name Bloblang mapper (`lib/metrics/
  * path_mapping.go`): the mapping runs with `this` = the dotted metric
  * path; `deleted()` drops the metric. Names are memoized — the
  * registry is tiny and names are stable, so each distinct path
  * evaluates its (one-row, local) plan exactly once. */
final class BloblPathMapper(mapping: String) extends (String => Option[String]) {
  private val stmts = graft.blobl.Parser.parseMapping(mapping).stmts
  private val cache =
    scala.collection.concurrent.TrieMap[String, Option[String]]()
  def apply(n: String): Option[String] = cache.getOrElseUpdate(n, {
    val spark = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession).orNull
    if (spark == null) Some(n)
    else {
      import org.apache.spark.sql.functions.col
      import org.apache.spark.sql.types.StringType
      val df = spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(n)),
        org.apache.spark.sql.types.StructType(scala.Seq(
          org.apache.spark.sql.types.StructField("p", StringType))))
      val ctx = graft.blobl.Ctx(
        thisTC = graft.blobl.TC(col("p"), Some(StringType)),
        meta = None, err = None, content = None,
        vars = Map.empty, maps = Map.empty, batch = None)
      val tc = graft.blobl.Mapping.compileMapValue(stmts, ctx)
      val r = df.select(tc.col.cast("string")).head()
      if (r.isNullAt(0)) None else Some(r.getString(0))
    }
  })
}

/** `metrics: statsd` export (`lib/metrics/statsd.go`): flush the
  * registry as statsd gauge datagrams on a period. UDP to the
  * configured address — the standard statsd transport; cloudwatch and
  * friends deploy by pointing an agent at this (the reference's own
  * recommended relay shape for sinks without a direct client). */
final class StatsdExporter(host: String, port: Int,
    periodMs: Long = 1000, prefix: String = "graft") {
  @volatile private var running = true
  private val sock = new java.net.DatagramSocket()
  private val addr = java.net.InetAddress.getByName(host)
  private val thread = new Thread(() => {
    while (running) {
      flush()
      try Thread.sleep(periodMs) catch { case _: InterruptedException => }
    }
  }, "graft-statsd")
  thread.setDaemon(true)

  def flush(): Unit =
    Metrics.statsdLines(prefix).foreach { line =>
      val b = line.getBytes("UTF-8")
      sock.send(new java.net.DatagramPacket(b, b.length, addr, port))
    }

  def start(): StatsdExporter = { thread.start(); this }
  def stop(): Unit = { running = false; thread.interrupt(); sock.close() }
}

/** REST control plane over the stream registry — the reference's streams
  * mode API (`lib/stream/manager/api.go:34-58`):
  *
  *   GET    /ping, /ready          liveness / readiness
  *   GET    /streams               ids → {active, uptime_s}
  *   POST   /streams/{id}          body = YAML config → start
  *   GET    /streams/{id}          status JSON
  *   DELETE /streams/{id}          stop
  *   GET    /streams/{id}/stats    last progress JSON (streaming)
  *   GET    /metrics, /stats       prometheus text of observations
  *
  * Runs on the driver (the natural control-plane host in Spark's
  * architecture); data never flows through it. */
final class ControlPlane(spark: SparkSession,
    registry: StreamRegistry = new StreamRegistry, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  private val started =
    scala.collection.concurrent.TrieMap[String, (Long, Boolean)]() // id → (t0, streaming)
  // http_server-input specs: registered at POST /streams/{id}, fed by
  // POST /streams/{id}{pushPath} (lib/input/http_server.go)
  private val pushSpecs =
    scala.collection.concurrent.TrieMap[String, Config.StreamSpec]()
  private val checkpointRoot =
    java.nio.file.Files.createTempDirectory("graft-api-ckpt").toString

  def boundPort: Int = server.getAddress.getPort

  private def respond(ex: HttpExchange, code: Int, body: String,
      contentType: String = "application/json"): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def streamStatus(id: String): Option[String] =
    started.get(id).map { case (t0, streaming) =>
      val active = streaming && registry.list.contains(id)
      val uptime = (System.currentTimeMillis() - t0) / 1000.0
      s"""{"active":$active,"uptime_s":$uptime,"streaming":$streaming}"""
    }

  private def handle(ex: HttpExchange): Unit = try {
    val path = ex.getRequestURI.getPath.stripSuffix("/")
    val method = ex.getRequestMethod
    (method, path.split("/").filter(_.nonEmpty).toList) match {
      case ("GET", List("ping")) => respond(ex, 200, "pong", "text/plain")
      case ("GET", List("ready")) => respond(ex, 200, """{"ready":true}""")
      case ("GET", List("metrics")) | ("GET", List("stats")) =>
        respond(ex, 200, Metrics.prometheus,
          "text/plain; version=0.0.4; charset=utf-8")
      case ("GET", List("traces")) =>
        respond(ex, 200, Tracing.tracesJson)
      case ("GET", List("streams")) =>
        val items = started.keys.toSeq.sorted.map(id =>
          s"${jsonStr(id)}:${streamStatus(id).get}")
        respond(ex, 200, items.mkString("{", ",", "}"))
      case ("POST", List("streams", id)) =>
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        val spec = Config.load(body)
        if (spec.pushPath.isDefined) {
          // push input: no data yet — runs per POST to the push path
          pushSpecs.put(id, spec)
          started.put(id, (System.currentTimeMillis(), false))
          respond(ex, 200,
            s"""{"status":"created","post_path":"/streams/$id${spec.pushPath.get}"}""")
        } else if (spec.streaming) {
          val q = spec.runStream(spark, s"$checkpointRoot/$id")
          registry.start(id, q)
          started.put(id, (System.currentTimeMillis(), true))
        } else {
          spec.run(spark)
          started.put(id, (System.currentTimeMillis(), false))
        }
        respond(ex, 200, """{"status":"created"}""")
      case ("GET", List("streams", id)) =>
        streamStatus(id) match {
          case Some(s) => respond(ex, 200, s)
          case None => respond(ex, 404, """{"error":"stream not found"}""")
        }
      case ("POST", "streams" :: id :: rest)
          if pushSpecs.get(id).exists(_.pushPath.contains("/" + rest.mkString("/"))) =>
        // the push endpoint: body → one staged message → synchronous
        // pipeline run; a sync_response capture answers the request,
        // the (possibly further-transformed) message goes to the output
        val spec = pushSpecs(id)
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        graft.sources.Sources.HttpServerStage.stage(scala.Seq(body))
        try {
          val staged = spec.pipeline.foldLeft(spec.input(spark))((d, p) => p(d))
          import org.apache.spark.sql.functions.{col, element_at, lit}
          val syncParts = staged.select(element_at(
              col(graft.model.Envelope.Meta),
              lit(graft.ops.SyncResponseProc.MetaKey)).as("_s"))
            .collect().flatMap(r => Option(r.getString(0)))
          spec.output.write(staged)
          if (syncParts.nonEmpty)
            respond(ex, 200, syncParts.mkString("\n"), "application/octet-stream")
          else respond(ex, 200, """{"received":1}""")
        } finally graft.sources.Sources.HttpServerStage.clear()
      // dynamic-input CRUD (lib/input/dynamic.go REST surface): the
      // registered YAML fragment becomes a member of the `dynamic` input
      case ("POST", List("inputs", id)) =>
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        Config.DynamicInputs.set(id, Config.load(
          if (body.trim.startsWith("input:")) body else s"input:\n" +
            body.linesIterator.map("  " + _).mkString("\n") +
            "\noutput:\n  drop: {}\n").input)
        respond(ex, 200, """{"status":"registered"}""")
      case ("GET", List("inputs")) =>
        respond(ex, 200, Config.DynamicInputs.list
          .map(jsonStr).mkString("[", ",", "]"))
      case ("DELETE", List("inputs", id)) =>
        if (Config.DynamicInputs.remove(id))
          respond(ex, 200, """{"status":"removed"}""")
        else respond(ex, 404, """{"error":"input not found"}""")
      case ("DELETE", List("streams", id)) =>
        val wasStreaming = registry.stop(id)
        pushSpecs.remove(id)
        if (started.remove(id).isDefined)
          respond(ex, 200, s"""{"status":"stopped","was_active":$wasStreaming}""")
        else respond(ex, 404, """{"error":"stream not found"}""")
      case ("GET", List("streams", id, "stats")) =>
        if (!started.contains(id))
          respond(ex, 404, """{"error":"stream not found"}""")
        else respond(ex, 200, registry.stats(id).getOrElse("{}"))
      case _ => respond(ex, 404, """{"error":"not found"}""")
    }
  } catch {
    case e: Exception =>
      respond(ex, 400, s"""{"error":${jsonStr(String.valueOf(e.getMessage))}}""")
  }

  server.createContext("/", handle(_))
  server.setExecutor(null) // single-threaded: a control plane, not a data path

  def start(): ControlPlane = { server.start(); this }
  def stop(): Unit = { registry.stopAll(); server.stop(0) }
}
