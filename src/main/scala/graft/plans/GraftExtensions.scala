package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql` users (and external SQL
  * tools attached to the session) can reach them without the Scala API:
  *
  * {{{
  *   spark.conf: spark.sql.extensions=graft.plans.GraftExtensions
  *   SELECT graft_cosine(a.embedding, b.embedding)        -- fused kernel
  *   SELECT graft_minhash_sig(text, 5, 4)                 -- one-pass sigs
  *   SELECT graft_winnow(text, 5, 4)                      -- fingerprints
  *   SELECT graft_char_shingles(text, 5)                  -- k-gram set
  *   SELECT graft_parse_duration('1h30m')                 -- Go durations
  * }}}
  *
  * This is the standard extension-library shape (injectFunction on the
  * session's FunctionRegistry); the expressions themselves live in
  * `graft.exprs` and are the same ones the DataFrame API uses. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case o => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $o")
  }

  private def fn(name: String, usage: String,
      builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, FunctionBuilder) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft.exprs", name, usage),
      (args: Seq[Expression]) => builder(args))

  /** All registrations as (id, info, builder) triples. */
  def functions: scala.Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] =
    scala.Seq(
      fn("graft_cosine",
        "graft_cosine(a, b) - fused cosine similarity of two numeric arrays",
        args => graft.exprs.CosineSimExpr(args(0), args(1))),
      fn("graft_dot",
        "graft_dot(a, b) - dot product of two numeric arrays",
        args => graft.exprs.DotExpr(args(0), args(1))),
      fn("graft_minhash_sig",
        "graft_minhash_sig(text, k, n) - one-pass MinHash signature",
        args => graft.exprs.MinhashSigExpr(args(0),
          intLit(args(1), "k"), intLit(args(2), "numHashes"))),
      fn("graft_winnow",
        "graft_winnow(text, k, w) - winnowing document fingerprints",
        args => graft.exprs.WinnowExpr(args(0),
          intLit(args(1), "k"), intLit(args(2), "w"))),
      fn("graft_char_shingles",
        "graft_char_shingles(text, k) - distinct character k-grams",
        args => graft.exprs.CharShinglesExpr(args(0),
          intLit(args(1), "k"), distinct = true)),
      fn("graft_parse_duration",
        "graft_parse_duration(s) - Go duration string to nanoseconds",
        args => graft.exprs.GoDurationParse(args(0))),
      fn("graft_simhash",
        "graft_simhash(text, bits) - one-pass SimHash of whitespace tokens",
        args => graft.exprs.SimhashExpr(args(0), intLit(args(1), "bits"))),
      fn("graft_top_bigram_frac",
        "graft_top_bigram_frac(text) - share of the most frequent word bigram",
        args => graft.exprs.TopBigramFracExpr(args(0))),
      fn("graft_vector_sum",
        "graft_vector_sum(vec) - element-wise sum aggregate over arrays",
        args => graft.exprs.VectorSumAgg(args(0)).toAggregateExpression()),
      fn("graft_normalize",
        "graft_normalize(text, form) - Unicode normalization " +
          "(NFC/NFD/NFKC/NFKD/STRIP_ACCENTS)",
        args => graft.exprs.UnicodeNormExpr(args(0), strLit(args(1), "form"))),
      fn("graft_xxminhash_sig",
        "graft_xxminhash_sig(text, k, n) - one-pass xxhash64 MinHash " +
          "signature (the LSH dedup kernel)",
        args => graft.exprs.XxMinhashSigExpr(args(0),
          intLit(args(1), "k"), intLit(args(2), "numHashes"))),
      fn("graft_sorted_intersect",
        "graft_sorted_intersect(a, b) - intersection size of two " +
          "sorted long arrays (merge, no hashing)",
        args => graft.exprs.SortedIntersectExpr(args(0), args(1))))

  private def strLit(e: Expression, what: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
      v.toString
    case o => throw new IllegalArgumentException(
      s"$what must be a string literal, got $o")
  }

  override def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  /** Register on an already-running session (the conf-based path only
    * affects sessions constructed after it is set). */
  def install(session: org.apache.spark.sql.SparkSession): Unit =
    new GraftExtensions().functions.foreach { case (id, info, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(session, id, info, builder)
    }
}
