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
