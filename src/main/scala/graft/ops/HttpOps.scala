package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Envelope

/** `rate_limit` resources (`lib/ratelimit/constructor.go:71` local token
  * bucket): a named per-JVM bucket external-IO processors acquire from.
  * In a cluster each executor holds its own bucket, so the effective
  * ceiling is `perSecond × executors` — size accordingly (the reference
  * has the same caveat per benthos instance). */
object RateLimits {
  final class Bucket(perSecond: Double) extends Serializable {
    // capacity-1 bucket = strict pacing at the configured rate (the
    // reference's local limiter blocks once `count` per `interval` is
    // spent; steady-state throughput is identical)
    private var allowance = 1.0
    private var last = System.nanoTime()
    def acquire(): Unit = synchronized {
      var acquired = false
      while (!acquired) {
        val now = System.nanoTime()
        allowance = math.min(1.0,
          allowance + (now - last) / 1e9 * perSecond)
        last = now
        if (allowance >= 1.0) { allowance -= 1.0; acquired = true }
        else Thread.sleep(math.max(1L, ((1.0 - allowance) / perSecond * 1000).toLong))
      }
    }
  }
  private val buckets = scala.collection.concurrent.TrieMap[String, Bucket]()
  private val configs = scala.collection.concurrent.TrieMap[String, Double]()
  def register(name: String, perSecond: Double): Unit = {
    configs.put(name, perSecond)
    buckets.remove(name)
    ()
  }
  /** Executor-side lookup: lazily builds the bucket from the registered
    * config (configs serialize with the closure via [[configFor]]). */
  def acquire(name: String, perSecond: Double): Unit =
    buckets.getOrElseUpdate(name, new Bucket(perSecond)).acquire()
  def configFor(name: String): Double = configs.getOrElse(name,
    throw new IllegalArgumentException(s"unknown rate_limit resource $name"))
}

/** `http` processor (`lib/processor/http.go`): per-part HTTP request whose
  * response body replaces the content. One pooled client per PARTITION
  * (mapPartitions — the pattern for all external-I/O enrichment at scale:
  * connection reuse, bounded concurrency = partition count). Failures flag
  * `_error` and the row keeps flowing (retry via `retries`). Optional
  * `rateLimit` names a registered token bucket acquired per request. */
final case class HttpProc(
    url: String, method: String = "POST",
    headers: Map[String, String] = Map.empty,
    timeoutMs: Int = 5000, retries: Int = 2,
    rateLimit: String = "") extends Processor {

  def apply(df: DataFrame): DataFrame = {
    val docType = df.schema(Envelope.Doc).dataType
    val enc = Encoders.row(StructType(scala.Seq(
      StructField("content", StringType),
      StructField("meta", MapType(StringType, StringType)),
      StructField("err", StringType),
      StructField("batch_id", LongType),
      StructField("seq", LongType))))
    val prepared = df.select(
      Envelope.contentOrDoc(df).cast(StringType).as("content"),
      col(Envelope.Meta), col(Envelope.Error), col(Envelope.BatchId), col(Envelope.Seq))
    val (u, m, hs, tmo, rtr) = (url, method, headers, timeoutMs, retries)
    val rl = rateLimit
    val rlPerSec = if (rateLimit.isEmpty) 0.0 else RateLimits.configFor(rateLimit)
    val piped = prepared.mapPartitions { rows =>
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(tmo)).build()
      rows.map { r =>
        if (rl.nonEmpty) RateLimits.acquire(rl, rlPerSec)
        val body = r.getString(0)
        var attempt = 0
        var result: Either[String, String] = Left("not attempted")
        while (attempt <= rtr && result.isLeft) {
          attempt += 1
          result = try {
            val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(u))
              .timeout(java.time.Duration.ofMillis(tmo))
              .method(m, java.net.http.HttpRequest.BodyPublishers.ofString(body))
            hs.foreach { case (k, v) => b.header(k, v) }
            val resp = client.send(b.build(),
              java.net.http.HttpResponse.BodyHandlers.ofString())
            if (resp.statusCode() >= 200 && resp.statusCode() < 300) Right(resp.body())
            else Left(s"http status ${resp.statusCode()}")
          } catch { case e: Exception => Left(s"http: ${e.getMessage}") }
        }
        result match {
          case Right(respBody) =>
            Row(respBody, r.getMap[String, String](1), r.getString(2), r.getLong(3), r.getLong(4))
          case Left(err) =>
            Row(body, r.getMap[String, String](1),
              Option(r.getString(2)).getOrElse(err), r.getLong(3), r.getLong(4))
        }
      }
    }(enc)
    piped.select(
      col("content").cast(BinaryType).as(Envelope.Content),
      lit(null).cast(docType).as(Envelope.Doc),
      col("meta").as(Envelope.Meta),
      col("err").as(Envelope.Error),
      col("batch_id").as(Envelope.BatchId),
      col("seq").as(Envelope.Seq))
  }
}

/** `sync_response` processor (`lib/processor/sync_response.go:82` +
  * `lib/message/roundtrip/result_store.go`): capture the message state
  * at this pipeline point as the HTTP response for the originating
  * `http_server` request. The capture rides in the meta map (the
  * envelope channel that survives every downstream processor's
  * projection); the control plane's push endpoint reads it after the
  * pipeline runs and answers the POST with it, while the message itself
  * continues (possibly further transformed) to the configured output —
  * exactly the reference's response/output split. */
final case class SyncResponseProc() extends Processor {
  def apply(df: DataFrame): DataFrame =
    df.withColumn(Envelope.Meta, map_concat(
      map_filter(col(Envelope.Meta),
        (k, _) => k =!= SyncResponseProc.MetaKey),
      map(lit(SyncResponseProc.MetaKey),
        Envelope.contentOrDoc(df).cast(StringType))))
}

object SyncResponseProc {
  val MetaKey = "_sync_response"
}
