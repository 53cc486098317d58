package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native element-wise SUM aggregate over `array<float|double>` columns —
  * the centroid-update kernel for distributed k-means (and any vector
  * mean). The alternative (posexplode → groupBy(key, pos) → collect_list)
  * shuffles n·dim rows; this partial-aggregates per partition and
  * shuffles k·dim doubles — the difference between "recluster 100 TB of
  * embeddings" and "wait a day".
  *
  * Accumulation order is partition-dependent (like every distributive
  * Spark SUM over doubles); pair integer-keyed outputs with it when an
  * external oracle must hash-match (see LlmQueries q46 notes).
  */
case class VectorSumAgg(child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  @transient private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case o => throw new IllegalArgumentException(
      s"vector_sum needs array<float|double>, got $o")
  }

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      val b = if (buf.isEmpty) new Array[Double](n) else buf
      val m = math.min(n, b.length)
      var i = 0
      while (i < m) {
        b(i) += (if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i))
        i += 1
      }
      b
    }
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] =
    if (b1.isEmpty) b2
    else if (b2.isEmpty) b1
    else {
      val m = math.min(b1.length, b2.length)
      var i = 0
      while (i < m) { b1(i) += b2(i); i += 1 }
      b1
    }

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asDoubleBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(o: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): VectorSumAgg =
    copy(child = c)
}

object VectorSumAgg {
  def column(c: Column): Column =
    GraftBridge.column(
      VectorSumAgg(GraftBridge.expression(c)).toAggregateExpression())
}
