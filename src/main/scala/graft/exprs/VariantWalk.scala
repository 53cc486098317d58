package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, VariantType}
import org.apache.spark.types.variant.{Variant, VariantBuilder, VariantUtil}
import org.apache.spark.unsafe.types.VariantVal

/** jq `..` / `recurse` / `paths` over a VARIANT document: a true
  * recursive pre-order walk of the binary variant encoding — the dynamic
  * counterpart of the compiler's static schema walk, which cannot see
  * inside a variant (on raw-content pipelines `fromjson | ..` previously
  * surfaced only the root). Variants are acyclic and finite by
  * construction, so the walk needs no depth cap.
  *
  * `mode` = "values" (self + every descendant, array<variant>) or
  * "paths" (every path as array<variant> of string keys / long indices,
  * root's empty path excluded, array<array<variant>>). `filter` applies
  * the jq type-filter family at RUNTIME on each node's variant type —
  * on a dynamic document the static type filter has nothing to inspect.
  * Object fields walk in the variant's stored order (sorted by key —
  * the same order Spark's parse_json and the JSON schema reader use). */
case class VariantWalkExpr(child: Expression, mode: String, filter: String)
    extends UnaryExpression with CodegenFallback {
  require(mode == "values" || mode == "paths",
    s"VariantWalkExpr: unknown mode $mode")

  override def dataType: DataType = mode match {
    case "values" => ArrayType(VariantType)
    case _ => ArrayType(ArrayType(VariantType))
  }
  override def nullable: Boolean = true

  private def keep(v: Variant): Boolean = {
    import VariantUtil.Type._
    val t = v.getType
    filter match {
      case "values" => true
      case "numbers" => t == LONG || t == DOUBLE || t == DECIMAL || t == FLOAT
      case "strings" => t == STRING
      case "booleans" => t == BOOLEAN
      case "nulls" => t == NULL
      case "arrays" => t == ARRAY
      case "objects" => t == OBJECT
      case "iterables" => t == ARRAY || t == OBJECT
      case "scalars" => t != ARRAY && t != OBJECT
      case o => throw new IllegalArgumentException(
        s"variant walk: unsupported filter '$o'")
    }
  }

  private def strElem(s: String): VariantVal = {
    val b = new VariantBuilder(false)
    b.appendString(s)
    val r = b.result()
    new VariantVal(r.getValue, r.getMetadata)
  }
  private def longElem(i: Long): VariantVal = {
    val b = new VariantBuilder(false)
    b.appendLong(i)
    val r = b.result()
    new VariantVal(r.getValue, r.getMetadata)
  }

  override def nullSafeEval(input: Any): Any = {
    import VariantUtil.Type._
    val vv = input.asInstanceOf[VariantVal]
    val root = new Variant(vv.getValue, vv.getMetadata)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val path = scala.collection.mutable.ArrayBuffer.empty[Any]
    def walk(v: Variant): Unit = {
      if (mode == "values") {
        if (keep(v)) out += new VariantVal(v.getValue, v.getMetadata)
      } else if (path.nonEmpty && keep(v)) {
        out += new GenericArrayData(path.toArray)
      }
      v.getType match {
        case OBJECT =>
          val n = v.objectSize()
          var i = 0
          while (i < n) {
            val f = v.getFieldAtIndex(i)
            path += strElem(f.key)
            walk(f.value)
            path.remove(path.length - 1)
            i += 1
          }
        case ARRAY =>
          val n = v.arraySize()
          var i = 0
          while (i < n) {
            path += longElem(i.toLong)
            walk(v.getElementAtIndex(i))
            path.remove(path.length - 1)
            i += 1
          }
        case _ => ()
      }
    }
    walk(root)
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): VariantWalkExpr = copy(child = newChild)
}

object VariantWalkExpr {
  def values(c: Column, filter: String = "values"): Column =
    org.apache.spark.sql.GraftBridge.column(VariantWalkExpr(
      org.apache.spark.sql.GraftBridge.expression(c), "values", filter))
  def paths(c: Column, filter: String = "values"): Column =
    org.apache.spark.sql.GraftBridge.column(VariantWalkExpr(
      org.apache.spark.sql.GraftBridge.expression(c), "paths", filter))
}

/** jq `walk(f)` over a VARIANT document: a true bottom-up runtime walk —
  * the dynamic counterpart of the compiler's static-schema walk_apply.
  * `f` arrives as a pair of ANALYZED Catalyst expressions (value + error
  * channel) over one BoundReference(0, VariantType): the node flows in as
  * a one-column row, f evaluates interpreted per node (the CodegenFallback
  * posture — the same per-node cost class as the other variant walks),
  * and containers rebuild from their walked children through compact JSON
  * (the engine's standard container↔variant hop).
  *
  * Output: struct<v: variant, e: string> — an f error at ANY node nulls
  * the value and surfaces the first error on `e` (the expression error
  * channel contract). */
case class VariantWalkApplyExpr(child: Expression, f: Expression,
    fErr: Option[Expression])
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.types.{StringType, StructField, StructType}
  import org.apache.spark.sql.catalyst.InternalRow

  override def dataType: DataType = StructType(Seq(
    StructField("v", VariantType), StructField("e", StringType)))
  override def nullable: Boolean = true

  private final class WalkFError(val msg: String) extends RuntimeException(msg)

  private def applyF(nodeJson: String): String = {
    val v = org.apache.spark.types.variant.VariantBuilder.parseJson(nodeJson, false)
    val row = InternalRow(new VariantVal(v.getValue, v.getMetadata))
    fErr.foreach { ee =>
      val e = ee.eval(row)
      if (e != null) throw new WalkFError(e.toString)
    }
    f.eval(row) match {
      case null => "null"
      case vv: VariantVal =>
        new Variant(vv.getValue, vv.getMetadata)
          .toJson(java.time.ZoneOffset.UTC)
      case other => throw new WalkFError(
        s"walk: f returned a non-variant value $other")
    }
  }

  private def walk(v: Variant): String = {
    import VariantUtil.Type._
    val rebuilt: String = v.getType match {
      case OBJECT =>
        val sb = new java.lang.StringBuilder("{")
        val n = v.objectSize()
        var i = 0
        while (i < n) {
          val fld = v.getFieldAtIndex(i)
          if (i > 0) sb.append(',')
          graft.exprs.JqStream.jsonEscape(fld.key, sb)
          sb.append(':').append(walk(fld.value))
          i += 1
        }
        sb.append('}').toString
      case ARRAY =>
        val sb = new java.lang.StringBuilder("[")
        val n = v.arraySize()
        var i = 0
        while (i < n) {
          if (i > 0) sb.append(',')
          sb.append(walk(v.getElementAtIndex(i)))
          i += 1
        }
        sb.append(']').toString
      case _ => v.toJson(java.time.ZoneOffset.UTC)
    }
    applyF(rebuilt)
  }

  override def nullSafeEval(input: Any): Any = {
    val vv = input.asInstanceOf[VariantVal]
    try {
      val outJson = walk(new Variant(vv.getValue, vv.getMetadata))
      val out = org.apache.spark.types.variant.VariantBuilder.parseJson(outJson, false)
      InternalRow(new VariantVal(out.getValue, out.getMetadata), null)
    } catch {
      case e: WalkFError =>
        InternalRow(null, org.apache.spark.unsafe.types.UTF8String.fromString(e.msg))
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): VariantWalkApplyExpr = copy(child = newChild)
}
