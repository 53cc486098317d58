package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.exprs.CodecExpr

/** Pins the pooled-codec Expression (exprs/CodecExpr.scala) against
  * java.util.zip: roundtrips for every algorithm, gzip frame interop in
  * BOTH directions (our fixed frame ↔ GZIPOutputStream's), the
  * buffer-growth path, and the permissive bad-stream → null contract. */
class CodecExprSpec extends AnyFunSuite {
  lazy val spark = Sessions.builder("4").getOrCreate()
  import spark.implicits._

  private def roundtrip(alg: String, payload: Array[Byte]): Array[Byte] = {
    val df = scala.Seq(payload).toDF("b")
    df.select(CodecExpr.decompress(CodecExpr.compress(col("b"), alg), alg).as("r"))
      .head().getAs[Array[Byte]]("r")
  }

  val sample: Array[Byte] =
    ("the quick brown fox jumps over the lazy dog " * 40).getBytes("UTF-8")

  for (alg <- scala.Seq("gzip", "zlib", "flate", "snappy", "lz4"))
    test(s"$alg roundtrip preserves bytes") {
      assert(java.util.Arrays.equals(roundtrip(alg, sample), sample))
      assert(roundtrip(alg, Array.emptyByteArray).isEmpty)
    }

  test("buffer growth: payload larger than the initial scratch buffer") {
    val rnd = new scala.util.Random(7)
    val big = new Array[Byte](1 << 20) // 1 MiB of noise — incompressible
    rnd.nextBytes(big)
    assert(java.util.Arrays.equals(roundtrip("gzip", big), big))
    assert(java.util.Arrays.equals(roundtrip("zlib", big), big))
  }

  test("our gzip frame is readable by java.util.zip.GZIPInputStream") {
    val df = scala.Seq(sample).toDF("b")
    val framed = df.select(CodecExpr.compress(col("b"), "gzip").as("c"))
      .head().getAs[Array[Byte]]("c")
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(framed))
    assert(java.util.Arrays.equals(in.readAllBytes(), sample))
  }

  test("GZIPOutputStream frames (incl. optional header fields) decode") {
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(sample); gz.close()
    val df = scala.Seq(out.toByteArray).toDF("c")
    val back = df.select(CodecExpr.decompress(col("c"), "gzip").as("r"))
      .head().getAs[Array[Byte]]("r")
    assert(java.util.Arrays.equals(back, sample))
  }

  test("decompress of a corrupt stream yields null, not an exception") {
    val junk = "definitely not compressed".getBytes("UTF-8")
    val df = scala.Seq(junk).toDF("c")
    for (alg <- scala.Seq("gzip", "zlib", "flate", "lz4"))
      assert(df.select(CodecExpr.decompress(col("c"), alg).as("r"))
        .head().isNullAt(0), s"alg=$alg")
  }

  test("unknown algorithm fails at construction, not per-row") {
    intercept[IllegalArgumentException] {
      CodecExpr.compress(col("b"), "zstd-nope")
    }
  }

  test("many-row stability: pooled state resets correctly across rows") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text").cast("binary").as("b"))
    val n = docs.select(col("doc_id"),
        CodecExpr.decompress(CodecExpr.compress(col("b"), "gzip"), "gzip")
          .cast("string").as("t2"), col("b").cast("string").as("t1"))
      .filter(col("t1") === col("t2")).count()
    assert(n == docs.count())
  }

  test("randomized roundtrip: 200 random payloads, every deflate algorithm") {
    val rnd = new scala.util.Random(42)
    val payloads = (0 until 200).map { i =>
      val n = rnd.nextInt(5000)
      val b = new Array[Byte](n)
      // mix of compressible (zero runs) and incompressible payloads
      if (i % 3 == 0) rnd.nextBytes(b)
      else java.util.Arrays.fill(b, (i % 7).toByte)
      b
    }
    val df = payloads.toDF("b")
    for (alg <- scala.Seq("gzip", "zlib", "flate")) {
      val bad = df.select(col("b"),
          CodecExpr.decompress(CodecExpr.compress(col("b"), alg), alg).as("r"))
        .filter(not(col("b") <=> col("r"))).count()
      assert(bad == 0L, s"alg=$alg")
    }
  }
}
