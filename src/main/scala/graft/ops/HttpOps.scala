package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Envelope

/** `http` processor (`lib/processor/http.go`): per-part HTTP request whose
  * response body replaces the content. One pooled client per PARTITION
  * (mapPartitions — the pattern for all external-I/O enrichment at scale:
  * connection reuse, bounded concurrency = partition count). Failures flag
  * `_error` and the row keeps flowing (retry via `retries`). Typically run
  * under `branch` to map request/response onto the doc. */
final case class HttpProc(
    url: String, method: String = "POST",
    headers: Map[String, String] = Map.empty,
    timeoutMs: Int = 5000, retries: Int = 2) extends Processor {

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
    val piped = prepared.mapPartitions { rows =>
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(tmo)).build()
      rows.map { r =>
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
