package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Top word-bigram fraction (the Gopher repetition filter): the share of
  * all adjacent-token pairs taken by the single most frequent pair.
  * One pass, one hash map per row — a pure projection; the naive
  * Column formulation (distinct × filter) is O(n²) per document. */
case class TopBigramFracExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val n = toks.length - 1
    if (n <= 0) 0.0
    else {
      val counts = new java.util.HashMap[String, Int](math.min(n * 2, 1 << 16))
      var max = 0
      var i = 0
      while (i < n) {
        val bg = toks(i) + " " + toks(i + 1)
        val c = counts.merge(bg, 1, (a, b) => a + b)
        if (c > max) max = c
        i += 1
      }
      max.toDouble / n.toDouble
    }
  }

  override protected def withNewChildInternal(c: Expression): TopBigramFracExpr =
    copy(child = c)
}

object TopBigramFracExpr {
  def column(text: Column): Column =
    GraftBridge.column(TopBigramFracExpr(GraftBridge.expression(text)))
}
