package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native [[graft.exprs.WordNgramsExpr]] kernel to the composable
  * form it replaced (split + transform/slice/array_join + array_distinct):
  * identical output — values, first-occurrence order, the empty-below-n
  * contract — on every byte-level edge the split/join round trip has. */
class TextNgramSpec extends AnyFunSuite {
  lazy val spark = Sessions.builder("4").getOrCreate()
  import spark.implicits._

  /** The pre-r12 composable form, verbatim (the oracle-proven semantics). */
  private def composable(text: Column, n: Int): Column = {
    def bindArray(arr: Column, f: Column => Column): Column =
      element_at(transform(array(arr), f), 1)
    bindArray(split(text, " "), toks =>
      when(size(toks) < n, array().cast(ArrayType(StringType)))
        .otherwise(array_distinct(transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => array_join(slice(toks, i, lit(n)), " ")))))
  }

  private val cases = scala.Seq(
    "a b c d e f g",
    "a b c d e",            // exactly n tokens (n=5)
    "a b c d",              // below n
    "",                     // empty string = one empty token
    "    ",                 // only spaces: empty tokens
    "a  b   c d e f",       // consecutive spaces → empty tokens
    " a b c d e ",          // leading/trailing space
    "the the the the the the", // duplicates collapse
    "héllo wörld çafé naïve über straße", // multi-byte UTF-8
    "a b a b a b a b",      // periodic → few distinct
    "x", "x y",
    "tab\tis not a space b c d e f" // only 0x20 splits
  )

  test("native wordNgrams ≡ composable split/slice/join/distinct form") {
    for (n <- scala.Seq(1, 2, 3, 5, 8)) {
      val df = cases.toDF("t")
      val rows = df.select(
        graft.exprs.WordNgramsExpr.column(col("t"), n).as("native"),
        composable(col("t"), n).as("ref")).collect()
      rows.zip(cases).foreach { case (r, c) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n text='$c': native=${r.getSeq[String](0)} ref=${r.getSeq[String](1)}")
      }
    }
  }

  test("raw (distinct=false) n-grams ≡ zip_with/slice/concat_ws form") {
    // the bigram/trigram-with-multiplicity reference forms replaced in r12
    def bigramsRef(text: Column): Column = {
      val toks = split(text, " ")
      when(size(toks) < 2, array().cast(ArrayType(StringType)))
        .otherwise(zip_with(
          slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1),
          (a, b) => concat_ws(" ", a, b)))
    }
    def trigramsRef(text: Column): Column = {
      val toks = split(text, " ")
      when(size(toks) < 3, array().cast(ArrayType(StringType)))
        .otherwise(zip_with(
          zip_with(
            slice(toks, lit(1), size(toks) - 2),
            slice(toks, lit(2), size(toks) - 2),
            (a, b) => concat_ws(" ", a, b)),
          slice(toks, lit(3), size(toks) - 2),
          (ab, c) => concat_ws(" ", ab, c)))
    }
    val df = cases.toDF("t")
    val rows = df.select(col("t"),
      graft.exprs.WordNgramsExpr.column(col("t"), 2, distinct = false).as("n2"),
      bigramsRef(col("t")).as("r2"),
      graft.exprs.WordNgramsExpr.column(col("t"), 3, distinct = false).as("n3"),
      trigramsRef(col("t")).as("r3")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"bigram '${r.getString(0)}'")
      assert(r.getSeq[String](3) == r.getSeq[String](4), s"trigram '${r.getString(0)}'")
    }
  }

  test("null text yields the empty array (composable-form parity)") {
    // the composable form never returns null: size(null) = -1 (legacy
    // sizeOfNull, non-ANSI session) takes the `size < n` empty branch
    val df = scala.Seq[Option[String]](None, Some("a b c")).toDF("t")
    val rows = df.select(
      graft.exprs.WordNgramsExpr.column(col("t"), 2).as("native"),
      composable(col("t"), 2).as("ref")).collect()
    assert(!rows(0).isNullAt(0) && !rows(0).isNullAt(1))
    assert(rows(0).getSeq[String](0) == rows(0).getSeq[String](1))
    assert(rows(0).getSeq[String](0).isEmpty)
    assert(rows(1).getSeq[String](0) == rows(1).getSeq[String](1))
  }

  test("kernel does not alias the input buffer across rows (distinct arrays)") {
    // many rows through whole-stage codegen; values must survive collection
    val df = spark.range(0, 1000).select(
      concat_ws(" ", lit("w"), col("id").cast(StringType), lit("t"),
        (col("id") % 7).cast(StringType), lit("z"), col("id").cast(StringType)).as("t"))
    val got = df.select(col("t"),
        graft.exprs.WordNgramsExpr.column(col("t"), 3).as("g"))
      .collect()
    got.foreach { r =>
      val toks = r.getString(0).split(" ", -1)
      val expect = toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
      assert(r.getSeq[String](1) == expect, s"row '${r.getString(0)}'")
    }
  }
}
