package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, VariantType}
import org.apache.spark.types.variant.{Variant, VariantUtil}
import org.apache.spark.unsafe.types.{UTF8String, VariantVal}

/** jq's streaming trio (`tostream` / `fromstream` / `truncate_stream`,
  * reachable from `lib/processor/jq.go` via gojq v0.11.2's builtins) as
  * runtime variant walks — the closing-marker events need the RUNTIME
  * length of every container (the last child's key/index), which is what
  * kept a static-schema expansion from expressing them.
  *
  * Event protocol (jq manual "Streaming"): each leaf at path p emits
  * `[p, leaf]`; each non-empty container emits, after its children, the
  * closing event `[p + [lastChildKey]]`; empty containers are leaves.
  * Objects stream in sorted-key order — both gojq (normalized Go maps)
  * and Spark's variant encoding (sorted field ids) agree on that order.
  *
  * Events cross the expression boundary as compact JSON strings (one
  * per event) and are `parse_json`ed back to variants at the Column
  * layer — the variant builder API has no cheap nested-array append,
  * and the JSON hop keeps every number/string rendering consistent
  * with the engine's other variant paths. */
object JqStream {
  private val zone = java.time.ZoneOffset.UTC

  private[exprs] def jsonEscape(s: String, sb: java.lang.StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => sb.append("\\\\")
        case '"' => sb.append("\\\"")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case ch if ch < ' ' => sb.append(f"\\u${ch.toInt}%04x")
        case ch => sb.append(ch)
      }
      i += 1
    }
    sb.append('"')
  }

  /** Render a path (Seq of String keys / Long indices) as a JSON array. */
  private[exprs] def pathJson(path: scala.collection.Seq[Any]): String = {
    val sb = new java.lang.StringBuilder("[")
    var first = true
    path.foreach { p =>
      if (!first) sb.append(',')
      first = false
      p match {
        case s: String => jsonEscape(s, sb)
        case l: Long => sb.append(l)
        case o => sb.append(o.toString)
      }
    }
    sb.append(']').toString
  }

  private[exprs] def variantJson(v: Variant): String = v.toJson(zone)

  /** tostream over one variant document → event JSON strings. */
  def tostreamEvents(vv: VariantVal): Array[UTF8String] = {
    import VariantUtil.Type._
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val path = scala.collection.mutable.ArrayBuffer.empty[Any]
    def leaf(v: Variant): Unit =
      out += UTF8String.fromString(
        s"[${pathJson(path)},${variantJson(v)}]")
    def closing(last: Any): Unit =
      out += UTF8String.fromString(s"[${pathJson(path :+ last)}]")
    def walk(v: Variant): Unit = v.getType match {
      case OBJECT if v.objectSize() > 0 =>
        val n = v.objectSize()
        var i = 0
        var lastKey: String = null
        while (i < n) {
          val f = v.getFieldAtIndex(i)
          lastKey = f.key
          path += f.key
          walk(f.value)
          path.remove(path.length - 1)
          i += 1
        }
        closing(lastKey)
      case ARRAY if v.arraySize() > 0 =>
        val n = v.arraySize()
        var i = 0
        while (i < n) {
          path += i.toLong
          walk(v.getElementAtIndex(i))
          path.remove(path.length - 1)
          i += 1
        }
        closing((n - 1).toLong)
      case _ => leaf(v) // scalars, null, EMPTY containers
    }
    walk(new Variant(vv.getValue, vv.getMetadata))
    out.toArray
  }
}

/** `tostream`: variant document → array of event JSONs. */
case class JqToStreamExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      JqStream.tostreamEvents(input.asInstanceOf[VariantVal]).toArray[Any])
  override protected def withNewChildInternal(c: Expression): JqToStreamExpr =
    copy(child = c)
}

/** `fromstream(f)`: array<variant> of events → array of emitted value
  * JSONs (gojq's foreach fold: a 2-event sets `x` at its path — emitting
  * immediately when the path is empty — and a 1-event with a length-1
  * path emits the accumulated value and resets). Reconstruction runs on
  * jackson's mutable tree: int path steps extend arrays with nulls,
  * string steps create objects, exactly jq `setpath`. */
case class JqFromStreamExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType)
  override def nullable: Boolean = true

  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  private def setpath(cur: com.fasterxml.jackson.databind.JsonNode,
      path: Variant, from: Int,
      v: com.fasterxml.jackson.databind.JsonNode): com.fasterxml.jackson.databind.JsonNode = {
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
    import VariantUtil.Type._
    if (from >= path.arraySize()) return v
    val step = path.getElementAtIndex(from)
    step.getType match {
      case STRING =>
        val key = step.getString
        val obj = cur match {
          case o: ObjectNode => o
          case _ => mapper.createObjectNode()
        }
        val prev = Option(obj.get(key))
          .getOrElse(com.fasterxml.jackson.databind.node.NullNode.getInstance())
        obj.set[ObjectNode](key, setpath(prev, path, from + 1, v))
        obj
      case LONG =>
        val ix = step.getLong.toInt
        require(ix >= 0, "fromstream: negative array index in path")
        val arr = cur match {
          case a: ArrayNode => a
          case _ => mapper.createArrayNode()
        }
        while (arr.size() <= ix) arr.addNull()
        arr.set(ix, setpath(arr.get(ix), path, from + 1, v))
        arr
      case o => throw new IllegalArgumentException(
        s"fromstream: path step must be a string or an integer, got $o")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    import VariantUtil.Type._
    val events = input.asInstanceOf[ArrayData]
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var x: com.fasterxml.jackson.databind.JsonNode = null
    def emit(n: com.fasterxml.jackson.databind.JsonNode): Unit = {
      out += UTF8String.fromString(
        if (n == null) "null" else mapper.writeValueAsString(n))
      x = null
    }
    var i = 0
    val n = events.numElements()
    while (i < n) {
      if (!events.isNullAt(i)) {
        val vv = events.getVariant(i)
        val ev = new Variant(vv.getValue, vv.getMetadata)
        require(ev.getType == ARRAY && ev.arraySize() >= 1 && ev.arraySize() <= 2,
          "fromstream: events must be [path, value] or [path] arrays")
        val p = ev.getElementAtIndex(0)
        require(p.getType == ARRAY, "fromstream: event path must be an array")
        if (ev.arraySize() == 2) {
          val v = mapper.readTree(JqStream.variantJson(ev.getElementAtIndex(1)))
          if (p.arraySize() == 0) emit(v)
          else x = setpath(
            if (x == null) com.fasterxml.jackson.databind.node.NullNode.getInstance() else x,
            p, 0, v)
        } else if (p.arraySize() == 1) emit(x)
        // deeper closing events are no-ops (the value is already set)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): JqFromStreamExpr =
    copy(child = c)
}

/** `truncate_stream`: drop the first `depth` path segments of every
  * event, dropping events whose path is not longer than `depth`. */
case class JqTruncateStreamExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  // left = depth (long), right = array<variant> of events
  override def dataType: DataType = ArrayType(StringType)
  override def nullable: Boolean = true

  override def nullSafeEval(depth: Any, input: Any): Any = {
    import VariantUtil.Type._
    val nDrop = depth.asInstanceOf[Long].toInt
    require(nDrop >= 0, "truncate_stream: depth must be non-negative")
    val events = input.asInstanceOf[ArrayData]
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    val n = events.numElements()
    while (i < n) {
      if (!events.isNullAt(i)) {
        val vv = events.getVariant(i)
        val ev = new Variant(vv.getValue, vv.getMetadata)
        require(ev.getType == ARRAY && ev.arraySize() >= 1,
          "truncate_stream: events must be [path, value?] arrays")
        val p = ev.getElementAtIndex(0)
        require(p.getType == ARRAY, "truncate_stream: event path must be an array")
        val plen = p.arraySize()
        if (plen > nDrop) {
          val segs = (nDrop until plen).map { j =>
            val s = p.getElementAtIndex(j)
            if (s.getType == STRING) (s.getString: Any) else (s.getLong: Any)
          }
          val sb = new java.lang.StringBuilder("[")
          sb.append(JqStream.pathJson(segs))
          if (ev.arraySize() == 2)
            sb.append(',').append(JqStream.variantJson(ev.getElementAtIndex(1)))
          sb.append(']')
          out += UTF8String.fromString(sb.toString)
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JqTruncateStreamExpr = copy(left = l, right = r)
}

object JqStreamExprs {
  import org.apache.spark.sql.GraftBridge.{column, expression}
  def tostream(c: Column): Column = column(JqToStreamExpr(expression(c)))
  def fromstream(events: Column): Column =
    column(JqFromStreamExpr(expression(events)))
  def truncate(depth: Column, events: Column): Column =
    column(JqTruncateStreamExpr(expression(depth), expression(events)))
}
