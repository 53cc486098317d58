package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Character-coverage fraction of repeated word n-grams — the remaining
  * Gopher repetition filters (Rae et al. 2021 §A1.1): "fraction of
  * characters contained within the most frequently-occurring n-gram"
  * (n = 2..4) and "fraction of characters contained within all
  * duplicate n-grams" (n = 5..10).
  *
  * Both are defined by POSITION MARKING so overlapping occurrences never
  * double-count and the result is bounded by 1: mark every token
  * position covered by an occurrence of a selected n-gram, then divide
  * the code-point length of marked tokens by the code-point length of
  * all tokens (separators excluded on both sides).
  *
  * - `dup = false` (top mode): the selected n-gram is the most frequent
  *   one; count ties break to the EARLIEST first occurrence — a
  *   position-based rule an external SQL oracle can replicate exactly
  *   (`min_by(key, first_pos)`), unlike string collation.
  * - `dup = true`: every n-gram occurring at least twice is selected.
  *
  * One pass, one hash map per row — a pure projection inside the scan,
  * like [[TopBigramFracExpr]]; the Column formulation of the same thing
  * needs an explode + two shuffles per n. Documents shorter than n
  * tokens (or with zero token characters) score 0.0. */
case class NgramCoverExpr(child: Expression, n: Int, dup: Boolean)
    extends UnaryExpression with CodegenFallback {
  require(n >= 2, s"n-gram size must be >= 2, got $n")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val m = toks.length - n + 1 // number of n-gram occurrences
    var totalChars = 0L
    var t = 0
    while (t < toks.length) {
      totalChars += toks(t).codePointCount(0, toks(t).length); t += 1
    }
    if (m <= 0 || totalChars == 0L) return 0.0
    // pass 1: count occurrences, remember each position's key and every
    // key's first position (the top-mode tiebreak)
    val counts = new java.util.HashMap[String, Int](math.min(m * 2, 1 << 16))
    val keys = new Array[String](m)
    var max = 0
    var i = 0
    val sb = new java.lang.StringBuilder
    while (i < m) {
      sb.setLength(0)
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(toks(j)); j += 1
      }
      val key = sb.toString
      keys(i) = key
      val c = counts.merge(key, 1, (a, b) => a + b)
      if (c > max) max = c
      i += 1
    }
    // top mode: single winner = max count, earliest first occurrence.
    // keys(i) scan order IS first-occurrence order, so the first key
    // reaching `max` wins.
    var topKey: String = null
    if (!dup) {
      i = 0
      while (topKey == null && i < m) {
        if (counts.get(keys(i)) == max) topKey = keys(i)
        i += 1
      }
    }
    // pass 2: mark covered token positions
    val covered = new Array[Boolean](toks.length)
    i = 0
    while (i < m) {
      val sel = if (dup) counts.get(keys(i)) >= 2 else keys(i) == topKey
      if (sel) {
        var j = i
        while (j < i + n) { covered(j) = true; j += 1 }
      }
      i += 1
    }
    var coveredChars = 0L
    t = 0
    while (t < toks.length) {
      if (covered(t))
        coveredChars += toks(t).codePointCount(0, toks(t).length)
      t += 1
    }
    coveredChars.toDouble / totalChars.toDouble
  }

  override protected def withNewChildInternal(c: Expression): NgramCoverExpr =
    copy(child = c)
}

object NgramCoverExpr {
  def column(text: Column, n: Int, dup: Boolean): Column =
    GraftBridge.column(NgramCoverExpr(GraftBridge.expression(text), n, dup))
}
