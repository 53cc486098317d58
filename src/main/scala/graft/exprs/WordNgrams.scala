package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-grams ("a b c …" strings) as ONE native pass over the
  * text (r12, the q127/q49/q90 hot path).
  *
  * The composable form — `split` + `transform(sequence(...), i ->
  * array_join(slice(toks, i, n), " "))` + `array_distinct` — allocates a
  * sliced array AND a joined string per position, then rehashes the whole
  * n-gram array once more for distinctness; every step is an interpreted
  * HigherOrderFunction (Spark's HOFs are CodegenFallback), so each of the
  * W positions pays lambda-dispatch + copy overhead (measured 3-5× the
  * kernel below at sf0.1).
  *
  * One byte-scan property makes the single pass exact: `split(text, " ")`
  * partitions the string at every single space (limit -1, trailing empties
  * kept), so joining any run of n consecutive tokens with " " reproduces
  * the ORIGINAL byte span from the start of token i to the end of token
  * i+n-1 — consecutive spaces yield empty tokens whose re-join re-inserts
  * exactly the bytes that were there. Each n-gram is therefore a zero-copy
  * slice of one byte array (0x20 never occurs inside a UTF-8 multi-byte
  * sequence, so byte scanning is charset-safe). First-occurrence order and
  * the empty-array-below-n-tokens contract match the composable form
  * bit-for-bit (pinned in TextNgramSpec).
  *
  * Codegen: a real `doGenCode` (kernel call on the codegen'd child value,
  * via a reference object) — no CodegenFallback, so no interpreted eval
  * and no INPUT_ROW dependency inside whole-stage codegen. */
case class WordNgramsExpr(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {
  require(n >= 1, s"WordNgramsExpr: n must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType)

  /** NULL text yields the EMPTY array, exactly like the composable form it
    * replaced: there `size(null) = -1` (legacy sizeOfNull under the
    * engine's non-ANSI session) satisfied `size < n`, selecting the
    * empty-array branch — so the column was never null. Pinned in
    * TextNgramSpec. */
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) WordNgramsExpr.empty
    else WordNgramsExpr.eval(v.asInstanceOf[UTF8String], n, distinct)
  }

  /** Instance entry points for generated code (reference-object calls —
    * instance dispatch avoids Janino's patchy support for Scala objects'
    * `$.MODULE$` static fields). */
  def ngrams(s: UTF8String): ArrayData = WordNgramsExpr.eval(s, n, distinct)
  def emptyArray(): ArrayData = WordNgramsExpr.empty

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordNgrams", this, classOf[WordNgramsExpr].getName)
    val childGen = child.genCode(ctx)
    val arrCls = classOf[ArrayData].getName
    ev.copy(
      code = childGen.code +
        code"""
          final $arrCls ${ev.value} = ${childGen.isNull} ?
            $ref.emptyArray() : $ref.ngrams(${childGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgramsExpr =
    copy(child = newChild)
}

object WordNgramsExpr {
  def column(text: Column, n: Int, distinct: Boolean = true): Column =
    org.apache.spark.sql.GraftBridge.column(
      WordNgramsExpr(org.apache.spark.sql.GraftBridge.expression(text), n,
        distinct))

  private val empty = new GenericArrayData(new Array[AnyRef](0))

  /** One pass: locate token starts (bytes after each 0x20), emit each
    * n-gram as a zero-copy view into ONE private byte array; when
    * `distinct`, dedup with a hash set in first-occurrence order
    * (`distinct = false` is the raw with-multiplicity form — the
    * `bigramsOfTokens`/`trigramsOfTokens` zip_with-slice-concat_ws chains
    * it replaced produce the identical byte spans). */
  def eval(s: UTF8String, n: Int, distinct: Boolean = true): ArrayData = {
    // getBytes copies unless the string exactly spans its own array; the
    // views below alias `b`, so the (at most one) copy per row is what
    // makes them safe against UnsafeRow/ColumnVector buffer reuse
    val b = s.getBytes
    val len = b.length
    var nTok = 1
    var i = 0
    while (i < len) { if (b(i) == ' ') nTok += 1; i += 1 }
    if (nTok < n) return empty
    val starts = new Array[Int](nTok + 1)
    var k = 1
    i = 0
    while (i < len) { if (b(i) == ' ') { starts(k) = i + 1; k += 1 }; i += 1 }
    starts(nTok) = len + 1 // sentinel: "start of one-past-last token"
    val m = nTok - n + 1
    val out = new Array[AnyRef](m)
    if (distinct) {
      val seen = new java.util.HashSet[UTF8String](Math.max(4, m * 2))
      var cnt = 0
      var t = 0
      while (t < m) {
        val st = starts(t)
        val en = starts(t + n) - 1 // end of token t+n-1 (strip the space/sentinel)
        val g = UTF8String.fromBytes(b, st, en - st)
        if (seen.add(g)) { out(cnt) = g; cnt += 1 }
        t += 1
      }
      new GenericArrayData(
        if (cnt == m) out else java.util.Arrays.copyOf(out, cnt))
    } else {
      var t = 0
      while (t < m) {
        out(t) = UTF8String.fromBytes(b, starts(t), starts(t + n) - 1 - starts(t))
        t += 1
      }
      new GenericArrayData(out)
    }
  }
}
