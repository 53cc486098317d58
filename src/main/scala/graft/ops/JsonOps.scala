package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Envelope

/** The deprecated v3 `json` processor (`lib/processor/json.go`):
  * operator + dot path + value. The reference itself marks it
  * superseded by bloblang, and that is exactly how most operators
  * compile here — each translates to a Bloblang mapping (which already
  * handles variant/string documents, nested path creation, and
  * field-level `deleted()`), so the whole processor stays one Catalyst
  * projection. `explode`, `flatten` and `clean` need typed schema
  * surgery no mapping text expresses and compile natively over a
  * struct-typed document.
  *
  * Semantics per json.go: `set` (whole doc when path is empty),
  * `delete`, `select`, `copy`/`move` (dest/src in `value`), `append`
  * (array extends, scalar/null prepends as element), `split` (string →
  * array on the `value` delimiter), `fold_number_array` (sum),
  * `fold_string_array` (join on optional delimiter),
  * `flatten_array` (one-level concat), `flatten` (gabs Flatten: leaf
  * values keyed by dot-joined paths; array elements key as `p.<i>`
  * like gabs — arrays of containers stay leaves, the documented
  * static-schema boundary), `explode` (array/object at path → one
  * document copy per element, collected as array/object), `clean`
  * (recursively drop empty strings/arrays/objects — emptied values
  * null out and the JSON renderer omits nulls,
  * spark.sql.jsonGenerator.ignoreNullFields). `parts` is a batch-shape
  * knob with no meaning in the per-row model (all rows process, like
  * the other per-row processors). */
final case class JsonProc(operator: String, path: String = "",
    value: Option[Any] = None) extends Processor {

  private def segs = path.split('.').toList.filter(_.nonEmpty)
  // the path re-rendered with non-identifier segments quoted, so a
  // segment holding spaces/quotes can't break the generated mapping
  private def sPath = JsonProc.safePath(segs)

  private def litOf(v: Any): String = v match {
    case null => "null"
    case s: String => JsonProc.quote(s)
    case m: java.util.Map[_, _] =>
      import scala.jdk.CollectionConverters._
      m.asScala.map { case (k, x) => litOf(k.toString) + ":" + litOf(x) }
        .mkString("{", ",", "}")
    case l: java.util.List[_] =>
      import scala.jdk.CollectionConverters._
      l.asScala.map(litOf).mkString("[", ",", "]")
    case m: Map[_, _] =>
      m.map { case (k, x) => litOf(k.toString) + ":" + litOf(x) }
        .mkString("{", ",", "}")
    case l: scala.Seq[_] => l.map(litOf).mkString("[", ",", "]")
    case other => other.toString
  }

  private def strValue(what: String): String = value match {
    case Some(s: String) => s
    case o => throw new IllegalArgumentException(
      s"json processor: $operator needs a string value ($what), got $o")
  }

  private def mapping(text: String): Processor = BloblangProc(text)

  def apply(df: DataFrame): DataFrame = operator match {
    case "set" =>
      if (segs.isEmpty) mapping(s"root = ${litOf(value.orNull)}")(df)
      else mapping(s"root = this\nroot.$sPath = ${litOf(value.orNull)}")(df)
    case "delete" =>
      if (segs.isEmpty) mapping("root = null")(df)
      else mapping(s"root = this\nroot.$sPath = deleted()")(df)
    case "select" =>
      mapping(if (segs.isEmpty) "root = this" else s"root = this.$sPath")(df)
    case "copy" =>
      val dest = JsonProc.safePath(strValue("destination path")
        .split('.').toList.filter(_.nonEmpty))
      mapping(s"root = this\nroot.$dest = this.$sPath")(df)
    case "move" =>
      val dest = JsonProc.safePath(strValue("destination path")
        .split('.').toList.filter(_.nonEmpty))
      mapping(s"root = this\nroot.$dest = this.$sPath\n" +
        s"root.$sPath = deleted()")(df)
    case "split" =>
      val delim = strValue("delimiter")
      mapping(s"root = this\nroot.$sPath = this.$sPath.split(${litOf(delim)})")(df)
    case "fold_number_array" =>
      mapping(s"root = this\nroot.$sPath = this.$sPath.sum()")(df)
    case "fold_string_array" =>
      val delim = value match { case Some(s: String) => s; case _ => "" }
      mapping(s"root = this\nroot.$sPath = this.$sPath.join(${litOf(delim)})")(df)
    case "flatten_array" =>
      mapping(s"root = this\nroot.$sPath = this.$sPath.flatten()")(df)
    case "append" =>
      // json.go newAppendOperator: value-as-array extends an array
      // target, a present scalar/null target prepends as the first
      // element, an absent target takes just the value elements. The
      // branch resolves from the STATIC schema (a typed plan can't
      // unify the array-vs-scalar arms anyway); variant documents keep
      // the dynamic type() dispatch.
      require(segs.nonEmpty, "json append: operator requires a target path")
      val elems = (value match {
        case Some(l: java.util.List[_]) =>
          import scala.jdk.CollectionConverters._
          l.asScala.toSeq.map(litOf)
        case Some(l: scala.Seq[_]) => l.map(litOf)
        case v => scala.Seq(litOf(v.orNull))
      }).mkString(", ")
      val rhs = docType(df) match {
        case s: StructType => fieldTypeOpt(s, segs) match {
          case Some(_: ArrayType) => s"this.$sPath.append($elems)"
          case Some(_) => s"[this.$sPath].append($elems)"
          case None => s"[$elems]"
        }
        case _ => s"if this.$sPath.type() == \"array\" " +
          s"{ this.$sPath.append($elems) } else if this.$sPath.type() == " +
          s"\"null\" { [$elems] } else { [this.$sPath].append($elems) }"
      }
      mapping(s"root = this\nroot.$sPath = $rhs")(df)
    case "explode" => explodeOp(df)
    case "flatten" => flattenOp(df)
    case "clean" => cleanOp(df)
    case o => throw new IllegalArgumentException(
      s"json processor: operator not recognised: $o")
  }

  // ---------- native (typed schema surgery) operators ----------

  private def docType(df: DataFrame): DataType = df.schema(Envelope.Doc).dataType

  private def fieldTypeOpt(dt: DataType, p: List[String]): Option[DataType] =
    p match {
      case Nil => Some(dt)
      case h :: rest => dt match {
        case s: StructType =>
          s.fields.find(_.name == h).flatMap(f => fieldTypeOpt(f.dataType, rest))
        case _ => None
      }
    }

  private def fieldType(dt: DataType, p: List[String]): DataType = p match {
    case Nil => dt
    case h :: rest => dt match {
      case s: StructType => fieldType(
        s.fields.find(_.name == h).getOrElse(throw new IllegalArgumentException(
          s"json processor: no field '$h' in document schema")).dataType, rest)
      case o => throw new IllegalArgumentException(
        s"json processor: path segment '$h' into non-object type $o")
    }
  }

  private def getPath(c: Column): Column = segs.foldLeft(c)(_.getItem(_))

  private def explodeOp(df: DataFrame): DataFrame = {
    require(segs.nonEmpty, "json explode: operator requires a target path")
    val doc = col(Envelope.Doc)
    val nested = Envelope.fieldPath(segs)
    val out = fieldType(docType(df), segs) match {
      case _: ArrayType =>
        transform(getPath(doc), x => doc.withField(nested, x))
      case _: MapType =>
        val m = getPath(doc)
        map_from_arrays(map_keys(m),
          transform(map_values(m), x => doc.withField(nested, x)))
      case o => throw new IllegalArgumentException(
        s"json explode: target value was not an array or a map, found: $o")
    }
    df.withColumn(Envelope.Doc, out)
  }

  /** gabs Flatten: map of dot-joined leaf path → value. Leaves cast to
    * variant so heterogenous values share the map's value type. */
  private def flattenOp(df: DataFrame): DataFrame = {
    val doc = col(Envelope.Doc)
    val target = getPath(doc)
    def entries(c: Column, dt: DataType, prefix: String): scala.Seq[Column] =
      dt match {
        case s: StructType => s.fields.toSeq.flatMap { f =>
          val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
          entries(c.getField(f.name), f.dataType, p)
        }
        case ArrayType(et, _) if !et.isInstanceOf[StructType] &&
            !et.isInstanceOf[ArrayType] && !et.isInstanceOf[MapType] =>
          // scalar array: gabs keys elements as `<p>.<i>`
          scala.Seq(transform(c, (x, i) => struct(
            concat_ws(".", lit(prefix), i.cast(StringType)).as("key"),
            x.cast(VariantType).as("value"))))
        case _ =>
          // container arrays/maps stay leaves — the static-schema
          // boundary (gabs recurses through runtime values)
          scala.Seq(array(struct(lit(prefix).as("key"),
            c.cast(VariantType).as("value"))))
      }
    val dt = fieldType(docType(df), segs)
    require(dt.isInstanceOf[StructType],
      s"json flatten: target must be an object, found $dt")
    val flat = map_from_entries(flatten(array(
      entries(target, dt, "").map(e => e.cast(ArrayType(StructType(scala.Seq(
        StructField("key", StringType),
        StructField("value", VariantType)))))): _*)))
    df.withColumn(Envelope.Doc,
      if (segs.isEmpty) flat else doc.withField(Envelope.fieldPath(segs), flat))
  }

  /** Empty strings/arrays/objects null out recursively (bottom-up), and
    * the JSON renderer drops nulls — json.go's cleanValueFn. */
  private def cleanOp(df: DataFrame): DataFrame = {
    def clean(c: Column, dt: DataType): Column = dt match {
      case s: StructType =>
        val cleaned = s.fields.foldLeft(c) { (acc, f) =>
          acc.withField(Envelope.fieldRef(f.name), clean(acc.getField(f.name), f.dataType))
        }
        // an object whose every field is null is itself empty
        when(s.fields.map(f => cleaned.getField(f.name).isNull)
          .reduce(_ && _), lit(null)).otherwise(cleaned)
      case ArrayType(et, _) =>
        val kept = filter(transform(c, x => clean(x, et)), _.isNotNull)
        when(c.isNull || size(kept) === 0, lit(null)).otherwise(kept)
      case StringType =>
        when(length(c) === 0, lit(null)).otherwise(c)
      case m: MapType =>
        val kept = map_filter(c, (_, v) => clean(v, m.valueType).isNotNull)
        when(c.isNull || size(kept) === 0, lit(null)).otherwise(
          transform_values(kept, (_, v) => clean(v, m.valueType)))
      case _ => c
    }
    val doc = col(Envelope.Doc)
    val dt = fieldType(docType(df), segs)
    val cleaned = clean(getPath(doc), dt)
    df.withColumn(Envelope.Doc,
      if (segs.isEmpty) cleaned
      else doc.withField(Envelope.fieldPath(segs), cleaned))
  }
}

object JsonProc {
  /** Bloblang/JSON string-literal quoting: escapes backslash, quote and
    * every control character (newlines, tabs, \u00XX) so an interpolated
    * value can never break — or change the meaning of — the generated
    * mapping text. */
  def quote(s: String): String = {
    val sb = new StringBuilder(s.length + 2).append('"')
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '"' => sb.append("\\\"")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  // plain identifiers stay raw; all-digit segments stay raw too (they
  // parse as array-index steps, which quoting would turn into field gets)
  private val PlainSeg =
    java.util.regex.Pattern.compile("[A-Za-z_][A-Za-z0-9_]*|[0-9]+")
  /** A dotted path re-rendered for mapping text with non-identifier
    * segments quoted (`a."weird key".b`) — the parser accepts string
    * tokens as path segments. */
  def safePath(segs: List[String]): String =
    segs.map(s => if (PlainSeg.matcher(s).matches()) s else quote(s)).mkString(".")
}
