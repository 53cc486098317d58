package graft

import org.scalatest.funsuite.AnyFunSuite

/** SparkSessionExtensions function registration: the native kernels reach
  * SQL users through spark.sql.extensions=graft.plans.GraftExtensions. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = {
    // conf-based injection (spark.sql.extensions=graft.plans.GraftExtensions)
    // only applies to sessions constructed after the conf is set; the test
    // JVM shares one session across suites, so use the install() path
    val s = Sessions.builder("2").getOrCreate()
    graft.plans.GraftExtensions.install(s)
    s
  }

  test("registered SQL functions evaluate") {
    val r = spark.sql(
      """SELECT
        |  graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |  graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |  graft_parse_duration('1h30m') AS nanos,
        |  size(graft_char_shingles('abcdef', 3)) AS n_shingles,
        |  size(graft_minhash_sig('hello world hello', 5, 4)) AS n_sig,
        |  size(graft_winnow('the quick brown fox jumps', 5, 4)) AS n_fp
        |""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 11.0)
    assert(r.getLong(2) == 5400L * 1000000000L)
    assert(r.getInt(3) == 4) // abc bcd cde def
    assert(r.getInt(4) == 4)
    assert(r.getInt(5) >= 1)
  }

  test("round-6 kernels: xxminhash signature + sorted-long merge intersect") {
    val r = spark.sql(
      """SELECT
        |  size(graft_xxminhash_sig('hello world hello', 5, 24)) AS n_sig,
        |  graft_sorted_intersect(array(1L, 3L, 5L, 9L),
        |                         array(2L, 3L, 5L, 8L, 9L)) AS inter
        |""".stripMargin).head()
    assert(r.getInt(0) == 24)
    assert(r.getLong(1) == 3L) // {3,5,9}
  }

  test("round-3 kernels: simhash, top-bigram-frac, vector-sum aggregate") {
    val r = spark.sql(
      """SELECT
        |  graft_simhash('hello world hello', 16) AS sh,
        |  graft_top_bigram_frac('buy now buy now buy now') AS tb
        |""".stripMargin).head()
    assert(r.getLong(0) >= 0L && r.getLong(0) < (1L << 16))
    assert(r.getDouble(1) > 0.5)

    val agg = spark.sql(
      """SELECT k, graft_vector_sum(v) AS vs FROM VALUES
        |  (1, array(1.0D, 2.0D)), (1, array(10.0D, 20.0D)),
        |  (2, array(5.0D, 5.0D)) AS t(k, v)
        |GROUP BY k ORDER BY k""".stripMargin).collect()
    assert(agg(0).getSeq[Double](1) == scala.Seq(11.0, 22.0))
    assert(agg(1).getSeq[Double](1) == scala.Seq(5.0, 5.0))
  }

  test("graft_normalize: unicode forms incl. NFKC fold and accent strip") {
    val decomposed = "café"     // e + combining acute
    val composed = "café"
    val r = spark.sql(
      s"""SELECT graft_normalize('$decomposed', 'NFC') AS nfc,
         |  graft_normalize('$composed', 'NFD') AS nfd,
         |  graft_normalize('ｆｕｌｌ 2µ', 'NFKC') AS nfkc,
         |  graft_normalize('$decomposed nöel', 'STRIP_ACCENTS') AS plain
         |""".stripMargin).head()
    assert(r.getString(0) == composed)
    assert(r.getString(1) == decomposed)
    assert(r.getString(2) == "full 2μ") // fullwidth + micro sign folded
    assert(r.getString(3) == "cafe noel")
  }
}
