package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Envelope
import graft.ops.{AwsSigV4, LambdaProc}
import graft.sources.Sources

/** aws_lambda processor (SigV4-signed invoke against an in-proc endpoint)
  * and the §2.7 codec gaps: delim:x, chunker:n, tar, gzip chains, auto. */
class LambdaCodecSpec extends AnyFunSuite {
  lazy val spark = Sessions.builder("4").getOrCreate()
  import spark.implicits._

  test("sigv4 signing is deterministic with the documented shape") {
    val t = java.time.Instant.parse("2015-08-30T12:36:00Z")
    val h = AwsSigV4.signedHeaders("POST", "lambda.us-east-1.amazonaws.com",
      "/2015-03-31/functions/fn/invocations", "{}".getBytes("UTF-8"),
      "lambda", "us-east-1", "AKIDEXAMPLE",
      "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY", now = t)
    assert(h("x-amz-date") == "20150830T123600Z")
    assert(h("authorization").startsWith(
      "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/lambda/aws4_request"))
    assert(h("authorization").contains("SignedHeaders=host;x-amz-date"))
    val h2 = AwsSigV4.signedHeaders("POST", "lambda.us-east-1.amazonaws.com",
      "/2015-03-31/functions/fn/invocations", "{}".getBytes("UTF-8"),
      "lambda", "us-east-1", "AKIDEXAMPLE",
      "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY", now = t)
    assert(h == h2)
  }

  test("lambda invoke: signed request, response replaces content") {
    val seen = new java.util.concurrent.atomic.AtomicReference[Map[String, String]]
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      seen.set(Map(
        "path" -> ex.getRequestURI.getPath,
        "auth" -> ex.getRequestHeaders.getFirst("Authorization"),
        "date" -> ex.getRequestHeaders.getFirst("X-Amz-Date")))
      val resp = body.toUpperCase.getBytes("UTF-8")
      ex.sendResponseHeaders(200, resp.length.toLong)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.start()
    try {
      val env = Envelope.wrap(scala.Seq((1L, "hello")).toDF("id", "s"),
        scala.Seq(col("id")))
        .withColumn(Envelope.Content, lit("hello".getBytes("UTF-8")))
      val proc = LambdaProc("myfn",
        endpoint = s"http://localhost:${server.getAddress.getPort}",
        accessKey = "AKID", secretKey = "SECRET", retries = 0)
      val out = proc(env).select(Envelope.Content).head().getAs[Array[Byte]](0)
      assert(new String(out, "UTF-8") == "HELLO")
      assert(seen.get()("path") == "/2015-03-31/functions/myfn/invocations")
      assert(seen.get()("auth").startsWith("AWS4-HMAC-SHA256 Credential=AKID/"))
      assert(seen.get()("date").endsWith("Z"))
    } finally server.stop(0)
  }

  test("codec delim:x splits on custom delimiters") {
    val dir = Files.createTempDirectory("graft-codec").toString
    Files.write(java.nio.file.Paths.get(s"$dir/f.txt"),
      "alpha|beta|gamma".getBytes("UTF-8"))
    val df = Sources.file(spark, s"$dir/f.txt", "delim:|")
    assert(df.select(col(Envelope.Doc).cast("string")).as[String]
      .collect().sorted.toSeq == scala.Seq("alpha", "beta", "gamma"))
  }

  test("codec lines/multipart batches on empty lines, delimiters dropped") {
    val dir = Files.createTempDirectory("graft-codec").toString
    Files.write(java.nio.file.Paths.get(s"$dir/m.txt"),
      "a1\na2\n\nb1\n\nc1\nc2\nc3".getBytes("UTF-8"))
    val df = Sources.file(spark, s"$dir/m.txt", "lines/multipart")
    val rows = df.select(col(Envelope.BatchId),
        col(Envelope.Content).cast("string"))
      .as[(Long, String)].collect().sortBy(r => (r._1, r._2))
    // 3 batches; empty delimiter lines are not messages
    assert(rows.map(_._2).toSeq == scala.Seq("a1", "a2", "b1", "c1", "c2", "c3"))
    val byBatch = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(byBatch.size == 3)
    assert(byBatch.values.toSet == Set(
      scala.Seq("a1", "a2"), scala.Seq("b1"), scala.Seq("c1", "c2", "c3")))
  }

  test("codec chunker:n yields fixed-size chunks") {
    val dir = Files.createTempDirectory("graft-codec").toString
    Files.write(java.nio.file.Paths.get(s"$dir/f.bin"),
      "0123456789".getBytes("UTF-8"))
    val df = Sources.file(spark, s"$dir/f.bin", "chunker:4")
    val chunks = df.orderBy(col(Envelope.Seq))
      .select(col(Envelope.Content).cast("string")).as[String].collect().toSeq
    assert(chunks == scala.Seq("0123", "4567", "89"))
  }

  test("codec gzip/lines decompresses then splits; auto maps extensions") {
    val dir = Files.createTempDirectory("graft-codec").toString
    val gz = new java.io.ByteArrayOutputStream()
    val zo = new java.util.zip.GZIPOutputStream(gz)
    zo.write("one\ntwo\nthree\n".getBytes("UTF-8")); zo.close()
    Files.write(java.nio.file.Paths.get(s"$dir/f.dat"), gz.toByteArray)
    val df = Sources.file(spark, s"$dir/f.dat", "gzip/lines")
    assert(df.count() == 3)
    assert(df.select(col(Envelope.Doc).cast("string")).as[String]
      .collect().sorted.toSeq == scala.Seq("one", "three", "two"))
    assert(Sources.file(spark, s"$dir/f.dat", "auto") != null) // .dat → lines
  }

  test("codec tar reads entries with names in meta") {
    val dir = Files.createTempDirectory("graft-codec").toString
    val bos = new java.io.ByteArrayOutputStream()
    val tar = new org.apache.commons.compress.archivers.tar.TarArchiveOutputStream(bos)
    scala.Seq("a.txt" -> "AAA", "b.txt" -> "BB").foreach { case (n, c) =>
      val e = new org.apache.commons.compress.archivers.tar.TarArchiveEntry(n)
      e.setSize(c.length.toLong)
      tar.putArchiveEntry(e)
      tar.write(c.getBytes("UTF-8"))
      tar.closeArchiveEntry()
    }
    tar.close()
    Files.write(java.nio.file.Paths.get(s"$dir/f.tar"), bos.toByteArray)
    val df = Sources.file(spark, s"$dir/f.tar", "auto") // auto → tar
    val rows = df.select(col(Envelope.Content).cast("string"),
      element_at(col(Envelope.Meta), "archive_name")).collect()
    assert(rows.map(r => (r.getString(1), r.getString(0))).sorted.toSeq ==
      scala.Seq(("a.txt", "AAA"), ("b.txt", "BB")))
  }
}
