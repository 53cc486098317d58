package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Envelope
import graft.ops._

/** HttpProc against an in-process HTTP server (no egress needed). */
class HttpSpec extends AnyFunSuite {
  lazy val spark = Sessions.builder("2").getOrCreate()

  def jdf(rows: String*) = {
    import spark.implicits._
    spark.read.json(spark.createDataset(rows))
  }

  def withServer(handler: String => (Int, String))(f: String => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val (code, resp) = handler(body)
      val bytes = resp.getBytes("UTF-8")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/")
    finally server.stop(0)
  }

  test("http enrichment: response replaces content") {
    withServer(body => (200, body.toUpperCase + "!")) { url =>
      val env = Envelope.wrap(jdf("""{"id":1,"s":"hello"}""", """{"id":2,"s":"bye"}"""),
        scala.Seq(col("id"))).withColumn(Envelope.Content, col("doc.s").cast("binary"))
      val out = HttpProc(url)(env)
      val got = out.orderBy(Envelope.Seq)
        .select(col(Envelope.Content).cast("string")).collect().map(_.getString(0)).toList
      assert(got == List("HELLO!", "BYE!"))
      assert(out.filter(col(Envelope.Error).isNotNull).count() == 0)
    }
  }

  test("http failure flags _error, content preserved, row keeps flowing") {
    withServer(_ => (500, "boom")) { url =>
      val env = Envelope.wrap(jdf("""{"id":1,"s":"hello"}"""), scala.Seq(col("id")))
        .withColumn(Envelope.Content, col("doc.s").cast("binary"))
      val out = HttpProc(url, retries = 1)(env)
      val row = out.select(col(Envelope.Content).cast("string"), col(Envelope.Error)).head()
      assert(row.getString(0) == "hello")
      assert(row.getString(1).contains("500"))
    }
  }

  test("rate_limit resource throttles http requests") {
    RateLimits.register("slow", 10.0) // 10 req/s → 8 requests ≥ ~700ms
    withServer(body => (200, body)) { url =>
      val rows = (1 to 8).map(i => s"""{"id":$i,"s":"x"}""")
      val env = Envelope.wrap(jdf(rows: _*), scala.Seq(col("id")))
        .withColumn(Envelope.Content, col("doc.s").cast("binary"))
        .coalesce(1) // one bucket, one partition → measurable pacing
      val t0 = System.nanoTime()
      val n = HttpProc(url, rateLimit = "slow")(env).count()
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      assert(n == 8)
      assert(elapsedMs >= 500, s"elapsed $elapsedMs ms — limiter not applied")
    }
  }

  test("http_client input fetches and envelopes lines; YAML wired") {
    withServer(_ => (200, "alpha\nbeta\ngamma\n")) { url =>
      val df = graft.sources.Sources.httpClient(spark, url)
      val lines = df.select(col(Envelope.Content).cast("string"))
        .collect().map(_.getString(0)).sorted.toList
      assert(lines == List("alpha", "beta", "gamma"))
      assert(df.select(Envelope.Meta).head().getMap[String, String](0)
        .get("http_status").contains("200"))

      val spec = graft.runtime.Config.load(
        s"""input:
           |  http_client:
           |    url: $url
           |    codec: lines
           |output:
           |  drop: {}
           |""".stripMargin)
      assert(!spec.streaming)
    }
  }

  test("http_client output posts each row's content") {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    withServer(body => { seen.add(body); (200, "ok") }) { url =>
      val env = Envelope.wrap(jdf("""{"id":1,"s":"one"}""", """{"id":2,"s":"two"}"""),
        scala.Seq(col("id"))).withColumn(Envelope.Content, col("doc.s").cast("binary"))
      graft.sinks.Sinks.HttpClientSink(url).write(env)
      val got = scala.jdk.CollectionConverters.CollectionHasAsScala(seen)
        .asScala.toList.sorted
      assert(got == List("one", "two"))
    }
  }

  test("socket input reads lines until EOF (batch form)") {
    val server = new java.net.ServerSocket(0)
    val t = new Thread(() => {
      val c = server.accept()
      val w = new java.io.PrintWriter(c.getOutputStream, true)
      w.println("one"); w.println("two"); w.close(); c.close()
    })
    t.start()
    try {
      val df = graft.sources.Sources.socket(spark, "127.0.0.1", server.getLocalPort)
      assert(df.select(col(Envelope.Content).cast("string"))
        .collect().map(_.getString(0)).sorted.toList == List("one", "two"))
    } finally { t.join(); server.close() }
  }

  test("socket streaming form compiles to Spark's socket source") {
    val spec = graft.runtime.Config.load(
      """input:
        |  socket:
        |    address: 127.0.0.1:9999
        |    stream: true
        |output:
        |  drop: {}
        |""".stripMargin)
    assert(spec.streaming)
  }
}
