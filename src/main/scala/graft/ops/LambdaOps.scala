package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Envelope

/** AWS Signature Version 4 (public spec) — the HMAC-SHA256 signing chain
  * for REST calls to AWS services. Self-contained: no SDK in the image. */
object AwsSigV4 {
  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes("UTF-8"))
  }
  private def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString
  private def sha256Hex(data: Array[Byte]): String =
    hex(java.security.MessageDigest.getInstance("SHA-256").digest(data))

  /** Returns the signing headers (host, x-amz-date, authorization, and
    * x-amz-security-token when a session token is present) for a request. */
  def signedHeaders(
      method: String, host: String, path: String, payload: Array[Byte],
      service: String, region: String,
      accessKey: String, secretKey: String, sessionToken: String = "",
      now: java.time.Instant = java.time.Instant.now()): Map[String, String] = {
    val utc = java.time.ZonedDateTime.ofInstant(now, java.time.ZoneOffset.UTC)
    val amzDate = utc.format(
      java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'"))
    val dateStamp = utc.format(
      java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd"))
    val payloadHash = sha256Hex(payload)
    val baseHeaders = scala.collection.immutable.TreeMap(
      "host" -> host, "x-amz-date" -> amzDate) ++
      (if (sessionToken.nonEmpty) Map("x-amz-security-token" -> sessionToken)
       else Map.empty)
    val canonicalHeaders = baseHeaders.map { case (k, v) => s"$k:$v\n" }.mkString
    val signedHeaderNames = baseHeaders.keys.mkString(";")
    val canonicalRequest =
      s"$method\n$path\n\n$canonicalHeaders\n$signedHeaderNames\n$payloadHash"
    val scope = s"$dateStamp/$region/$service/aws4_request"
    val stringToSign = s"AWS4-HMAC-SHA256\n$amzDate\n$scope\n" +
      sha256Hex(canonicalRequest.getBytes("UTF-8"))
    val kDate = hmac(s"AWS4$secretKey".getBytes("UTF-8"), dateStamp)
    val kRegion = hmac(kDate, region)
    val kService = hmac(kRegion, service)
    val kSigning = hmac(kService, "aws4_request")
    val signature = hex(hmac(kSigning, stringToSign))
    val auth = s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
      s"SignedHeaders=$signedHeaderNames, Signature=$signature"
    (baseHeaders - "host") + ("authorization" -> auth)
  }
}

/** `aws_lambda` processor (`lib/processor/aws_lambda.go`): invoke a Lambda
  * function per message, response body replaces content. The HTTP sibling
  * of HttpProc — one pooled client per partition, SigV4-signed POSTs to
  * the public Lambda Invoke REST API. `endpoint` overrides the URL for
  * localstack-style testing; credentials come from config or the standard
  * AWS_* environment variables. Failures flag `_error` and flow on
  * (matching the reference's error-handling docs). */
final case class LambdaProc(
    function: String,
    region: String = "us-east-1",
    endpoint: String = "",
    accessKey: String = "",
    secretKey: String = "",
    sessionToken: String = "",
    timeoutMs: Int = 10000,
    retries: Int = 2) extends Processor {

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
    val base =
      if (endpoint.nonEmpty) endpoint.stripSuffix("/")
      else s"https://lambda.$region.amazonaws.com"
    val path = s"/2015-03-31/functions/$function/invocations"
    val ak = if (accessKey.nonEmpty) accessKey
      else sys.env.getOrElse("AWS_ACCESS_KEY_ID", "")
    val sk = if (secretKey.nonEmpty) secretKey
      else sys.env.getOrElse("AWS_SECRET_ACCESS_KEY", "")
    val st = if (sessionToken.nonEmpty) sessionToken
      else sys.env.getOrElse("AWS_SESSION_TOKEN", "")
    val (rgn, tmo, rtr) = (region, timeoutMs, retries)

    val piped = prepared.mapPartitions { rows =>
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(tmo)).build()
      val uri = java.net.URI.create(base + path)
      val host = uri.getHost + (if (uri.getPort > 0) s":${uri.getPort}" else "")
      rows.map { r =>
        val body = r.getString(0)
        var attempt = 0
        var result: Either[String, String] = Left("not attempted")
        while (attempt <= rtr && result.isLeft) {
          attempt += 1
          result = try {
            val payload = body.getBytes("UTF-8")
            val headers = AwsSigV4.signedHeaders(
              "POST", host, path, payload, "lambda", rgn, ak, sk, st)
            val b = java.net.http.HttpRequest.newBuilder(uri)
              .timeout(java.time.Duration.ofMillis(tmo))
              .POST(java.net.http.HttpRequest.BodyPublishers.ofByteArray(payload))
              .header("content-type", "application/json")
              .header("x-amz-invocation-type", "RequestResponse")
            headers.foreach { case (k, v) => b.header(k, v) }
            val resp = client.send(b.build(),
              java.net.http.HttpResponse.BodyHandlers.ofString())
            val fnErr = resp.headers().firstValue("x-amz-function-error")
            if (fnErr.isPresent) Left(s"lambda function error: ${fnErr.get}")
            else if (resp.statusCode() >= 200 && resp.statusCode() < 300)
              Right(resp.body())
            else Left(s"lambda status ${resp.statusCode()}")
          } catch { case e: Exception => Left(s"lambda: ${e.getMessage}") }
        }
        result match {
          case Right(respBody) =>
            Row(respBody, r.getMap[String, String](1), r.getString(2),
              r.getLong(3), r.getLong(4))
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
