package graft.exprs

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's `merge_json` fold with EXACT dynamic semantics
  * (`lib/processor/merge_json.go`: each part's parsed JSON is merged
  * into one accumulating document via gabs/v2 `Merge` — go.mod:13 pins
  * gabs v2.6.1):
  *
  *  - merge starts from an empty object (`gabs.New()`); a part whose
  *    root is NOT a JSON object is a no-op (gabs `MergeFn` only walks
  *    map roots), and an unparseable part is skipped (logged in the
  *    reference);
  *  - same-keyed OBJECTS recurse field-by-field;
  *  - any other key collision gathers into an array in part order,
  *    expanding sides that are already arrays
  *    (`{"foo":[1,2]}` + `{"foo":3}` → `{"foo":[1,2,3]}`) — the
  *    reference's own vectors in `lib/processor/merge_json_test.go`;
  *  - a LONE value stays unwrapped (`{"foo":1}` alone → `{"foo":1}`) —
  *    the one shape the engine's static-schema rendering
  *    (`ops/BatchOps.MergeJson`) cannot express, which is exactly why
  *    this runtime-tree kernel exists;
  *  - a JSON-null side of a collision yields to the other side (gabs'
  *    nil-destination/nil-source collision rule).
  *
  * Output renders like the reference's `json.Marshal`: object keys
  * sorted, HTML-unsafe characters (`<` `>` `&`) and U+2028/U+2029
  * escaped, float64 in Go's shortest form (`1.0` → `1`, exponent
  * notation only below 1e-6 / at and above 1e21). Two documented
  * improvements over the reference: integers beyond 2^53 keep exact
  * precision (Go parses every JSON number as float64), and key sorting
  * is UTF-16 code-unit order (Go sorts UTF-8 bytes — they differ only
  * beyond the BMP).
  *
  * Scale note: this kernel is per-BATCH (one message's parts, bounded
  * in-memory in the reference too); the static-schema aggregate path
  * stays the default for typed high-volume pipelines.
  */
object GabsMerge {
  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  /** Fold part JSONs (seq order) into one merged JSON string. */
  def mergeDocs(parts: Iterator[String]): String = {
    val root = mapper.createObjectNode()
    parts.foreach { s =>
      val node =
        try mapper.readTree(s)
        catch { case _: Exception => null } // unparseable part: skipped
      node match {
        case o: ObjectNode => mergeObj(root, o)
        case _ => () // non-object root: gabs MergeFn no-op
      }
    }
    val sb = new java.lang.StringBuilder
    render(root, sb)
    sb.toString
  }

  private def mergeObj(dest: ObjectNode, src: ObjectNode): Unit = {
    val it = src.fields()
    while (it.hasNext) {
      val e = it.next()
      val k = e.getKey
      val v = e.getValue
      if (dest.has(k)) {
        (dest.get(k), v) match {
          case (d: ObjectNode, s: ObjectNode) => mergeObj(d, s)
          case (d, s) => dest.set[ObjectNode](k, collide(d, s))
        }
      } else dest.set[ObjectNode](k, v)
    }
  }

  /** gabs v2 collision: nulls yield, arrays expand, scalars gather. */
  private def collide(d: JsonNode, s: JsonNode): JsonNode = {
    if (d.isNull) return s
    if (s.isNull) return d
    val arr = d match {
      case a: ArrayNode => a
      case _ =>
        val a = mapper.createArrayNode()
        a.add(d)
        a
    }
    s match {
      case sa: ArrayNode =>
        val it = sa.elements()
        while (it.hasNext) arr.add(it.next())
      case _ => arr.add(s)
    }
    arr
  }

  // ---- Go json.Marshal-compatible rendering ----

  private def render(n: JsonNode, sb: java.lang.StringBuilder): Unit = n match {
    case o: ObjectNode =>
      val names = new java.util.ArrayList[String]()
      val it = o.fieldNames()
      while (it.hasNext) names.add(it.next())
      java.util.Collections.sort(names)
      sb.append('{')
      var i = 0
      while (i < names.size()) {
        if (i > 0) sb.append(',')
        escape(names.get(i), sb)
        sb.append(':')
        render(o.get(names.get(i)), sb)
        i += 1
      }
      sb.append('}')
    case a: ArrayNode =>
      sb.append('[')
      var i = 0
      while (i < a.size()) {
        if (i > 0) sb.append(',')
        render(a.get(i), sb)
        i += 1
      }
      sb.append(']')
    case t if t.isTextual => escape(t.textValue(), sb)
    case b if b.isBoolean => sb.append(if (b.booleanValue()) "true" else "false")
    case x if x.isNull => sb.append("null")
    case f if f.isDouble || f.isFloat => sb.append(goDouble(f.doubleValue()))
    case num => sb.append(num.asText()) // int/long/BigInteger/decimal
  }

  /** Go's encoding/json string escaping (EscapeHTML on, the Marshal
    * default the reference uses). */
  private[graft] def escape(s: String, sb: java.lang.StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '<' => sb.append("\\u003c")
        case '>' => sb.append("\\u003e")
        case '&' => sb.append("\\u0026")
        case c if c == 0x2028.toChar => sb.append("\\u2028")
        case c if c == 0x2029.toChar => sb.append("\\u2029")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  /** Go's encoding/json float64 rendering: shortest round-trip digits,
    * plain decimal for 1e-6 <= |v| < 1e21, else e-notation with the
    * single leading zero of a short negative exponent trimmed. */
  private[graft] def goDouble(d: Double): String = {
    if (d == 0.0) return if (1.0 / d < 0) "-0" else "0"
    val abs = math.abs(d)
    // Double.toString is the JDK's shortest-unique-decimal rendering —
    // the same digits Go's strconv shortest mode produces
    val s = java.lang.Double.toString(d)
    if (abs >= 1e-6 && abs < 1e21) {
      new java.math.BigDecimal(s).stripTrailingZeros.toPlainString
    } else {
      val ei = s.indexOf('E')
      val mant0 = if (ei >= 0) s.substring(0, ei) else s
      val exp = if (ei >= 0) s.substring(ei + 1).toInt else 0
      val mant =
        if (mant0.endsWith(".0")) mant0.substring(0, mant0.length - 2)
        else mant0
      val sign = if (exp < 0) "-" else "+"
      mant + "e" + sign + math.abs(exp).toString
    }
  }
}

/** array<string> of part JSONs (seq order, nulls pre-filtered) →
  * merged JSON string. Per-batch runtime kernel — CodegenFallback is
  * the right posture for a tree fold. */
case class GabsMergeExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val parts = (0 until arr.numElements()).iterator
      .filterNot(arr.isNullAt)
      .map(i => arr.getUTF8String(i).toString)
    UTF8String.fromString(GabsMerge.mergeDocs(parts))
  }

  override protected def withNewChildInternal(c: Expression): GabsMergeExpr =
    copy(child = c)
}

object GabsMergeExpr {
  def merged(parts: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      GabsMergeExpr(org.apache.spark.sql.GraftBridge.expression(parts)))
}
