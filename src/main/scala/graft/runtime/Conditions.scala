package graft.runtime

/** Structured YAML condition → Bloblang check-string compiler
  * (`lib/condition/constructor.go` registry). The reference's v3
  * condition tree (text / number / json / metadata / jmespath /
  * and / or / not / xor / static / count / check_field /
  * check_interpolation / processor_failed / resource) is re-expressed
  * as a single Bloblang boolean expression, so every condition path in
  * the config dialect funnels through the one Bloblang→Catalyst
  * compiler (conditions stay codegen'd Columns — no interpreter).
  *
  * Batch-scoped `any`/`all` collapse to the row-level child under the
  * engine's row-per-part model; `count` maps the reference's global
  * counter onto the deterministic per-batch index.
  */
object Conditions {

  /** Named `resources: conditions:` entries (registered at config load). */
  val resources = new scala.collection.concurrent.TrieMap[String, String]()

  def compile(c: Any): String = c match {
    case s: String => s // already a bloblang check string
    case m => compileMap(toMap(m), None)
  }

  private def compileMap(m: Map[String, Any], target: Option[String]): String = {
    val entries = m.filterNot { case (k, _) => k == "label" || k == "type" }
    val kind = m.get("type").map(_.toString).getOrElse {
      require(entries.size == 1,
        s"condition must have exactly one kind, got ${entries.keys.mkString(",")}")
      entries.keys.head
    }
    val conf: Any = entries.getOrElse(kind, Map.empty[String, Any])
    kind match {
      case "bloblang" =>
        wrap(conf.toString, target)
      case "jmespath" =>
        val q = conf match {
          case s: String => s
          case o => toMap(o).get("query").map(_.toString).getOrElse(o.toString)
        }
        wrap(graft.blobl.Printer.print(graft.blobl.JmesPath.translate(q)), target)
      case "text" => textCond(toMap(conf), target.getOrElse("content()"))
      case "number" => numberCond(toMap(conf), target.getOrElse("content().string()"))
      case "metadata" => metaCond(toMap(conf))
      case "json" => jsonCond(toMap(conf), target.getOrElse("this"))
      case "and" =>
        asSeq(conf).map(x => compileMap(toMap(x), target)).mkString("(", " && ", ")")
      case "or" =>
        asSeq(conf).map(x => compileMap(toMap(x), target)).mkString("(", " || ", ")")
      case "xor" =>
        // exactly one of the children true
        asSeq(conf).map(x => s"(if ${compileMap(toMap(x), target)} { 1 } else { 0 })")
          .mkString("((", " + ", ") == 1)")
      case "any" | "all" =>
        // batch-scoped in the reference; row-per-part ⇒ the child itself
        compileMap(toMap(conf), target)
      case "not" =>
        s"!(${compileMap(toMap(conf), target)})"
      case "static" => conf.toString.toBoolean.toString
      case "count" =>
        // lib/condition/count.go: true until the rolling counter hits
        // `arg`, then resets — deterministic per-batch analog
        val n = toMap(conf).get("arg").map(_.toString.toLong).getOrElse(100L)
        s"(((batch_index() + 1) % ${n}L) != 0)"
      case "processor_failed" => wrap("errored()", target)
      case "bounds_check" =>
        // lib/condition/bounds_check.go: part byte-size within bounds.
        // min_parts/max_parts are batch-count bounds — in the per-row
        // model batch sizing belongs to the batch policy, and the
        // reference defaults (1..100) are the no-op; the part-size
        // bounds compile exactly.
        val cm = toMap(conf)
        val maxSz = cm.get("max_part_size").map(_.toString.toLong)
          .getOrElse(1073741824L)
        val minSz = cm.get("min_part_size").map(_.toString.toLong)
          .getOrElse(1L)
        // raw content when present, else the re-serialized doc — BYTES
        // (length() on binary is octet_length), matching the
        // reference's len(part bytes); string().length() would count
        // characters and under-measure multi-byte UTF-8
        val sz = "content().or(this.string().bytes()).length()"
        s"($sz >= $minSz && $sz <= $maxSz)"
      case "json_schema" =>
        // lib/condition/jsonschema.go: boolean = does the doc validate
        // against the schema (inline `schema` or `schema_path` file)
        val cm = toMap(conf)
        val schema = cm.get("schema").map(_.toString).orElse(
          cm.get("schema_path").map(p => new String(
            java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
              p.toString.stripPrefix("file://"))), "UTF-8")))
          .getOrElse(throw new IllegalArgumentException(
            "json_schema condition: missing schema/schema_path"))
        // SQL null semantics make `x != null` never-true — test via type()
        wrap(s"this.json_schema(${quote(schema)}).catch(null).type() != \"null\"",
          target)
      case "check_field" =>
        val cm = toMap(conf)
        val path = cm.getOrElse("path",
          throw new IllegalArgumentException("check_field: missing path")).toString
        compileMap(toMap(cm("condition")), Some(s"this.$path"))
      case "check_interpolation" =>
        val cm = toMap(conf)
        val value = cm.getOrElse("value",
          throw new IllegalArgumentException("check_interpolation: missing value")).toString
        compileMap(toMap(cm("condition")), Some(interpToExpr(value)))
      case "resource" =>
        resources.getOrElse(conf.toString, throw new IllegalArgumentException(
          s"unknown condition resource '$conf'"))
      case o => throw new IllegalArgumentException(s"unknown condition kind $o")
    }
  }

  /** Rebind `this` to the check_field target around an opaque check. */
  private def wrap(src: String, target: Option[String]): String = target match {
    case None => s"($src)"
    case Some(t) => s"match ($t) { _ => ($src) }"
  }

  // `${!expr}` interpolation template → string-concat Bloblang expression
  private val interp = java.util.regex.Pattern.compile("\\$\\{!([^}]*)\\}")
  private[runtime] def interpToExpr(template: String): String = {
    val m = interp.matcher(template)
    val parts = scala.collection.mutable.ListBuffer[String]()
    var last = 0
    while (m.find()) {
      if (m.start() > last) parts += quote(template.substring(last, m.start()))
      parts += s"(${m.group(1)}).string()"
      last = m.end()
    }
    if (last < template.length) parts += quote(template.substring(last))
    if (parts.isEmpty) quote("") else parts.mkString("(", " + ", ")")
  }

  private def textCond(conf: Map[String, Any], targetRaw: String): String = {
    val t = s"($targetRaw).string()"
    val arg = conf.get("arg")
    def a: String = lit(arg.getOrElse(
      throw new IllegalArgumentException("text condition: missing arg")))
    def lcPair(method: String): String =
      s"$t.lowercase().$method(${a}.lowercase())"
    conf.get("operator").map(_.toString).getOrElse("equals") match {
      case "equals_cs" => s"($t == $a)"
      case "equals" => s"($t.lowercase() == ${a}.lowercase())"
      case "contains_cs" => s"$t.contains($a)"
      case "contains" => lcPair("contains")
      case "prefix_cs" => s"$t.has_prefix($a)"
      case "prefix" => lcPair("has_prefix")
      case "suffix_cs" => s"$t.has_suffix($a)"
      case "suffix" => lcPair("has_suffix")
      case "regexp_partial" => s"$t.re_match($a)"
      case "regexp_exact" =>
        s"$t.re_match(${quote("^" + arg.map(_.toString).getOrElse("") + "$")})"
      case "enum" => s"${lit(arg.get)}.contains($t)"
      case "contains_any_cs" =>
        asSeq(arg.get).map(x => s"$t.contains(${lit(x)})").mkString("(", " || ", ")")
      case "contains_any" =>
        asSeq(arg.get).map(x => s"$t.lowercase().contains(${lit(x)}.lowercase())")
          .mkString("(", " || ", ")")
      case "is" => arg.map(_.toString).getOrElse("") match {
        // lib/condition/text.go ip checks (public dotted-quad / hex forms)
        case "ip" | "ipv4" | "ipv6" =>
          val v4 = "^(\\\\d{1,3}\\\\.){3}\\\\d{1,3}$"
          val v6 = "^[0-9a-fA-F:]+:[0-9a-fA-F:]*$"
          arg.get.toString match {
            case "ipv4" => s"""$t.re_match("$v4")"""
            case "ipv6" => s"""$t.re_match("$v6")"""
            case _ => s"""($t.re_match("$v4") || $t.re_match("$v6"))"""
          }
        case o => throw new IllegalArgumentException(s"text is: unsupported $o")
      }
      case o => throw new IllegalArgumentException(s"text operator: unsupported $o")
    }
  }

  private def numberCond(conf: Map[String, Any], targetRaw: String): String = {
    val t = s"($targetRaw).number()"
    val a = lit(conf.getOrElse("arg",
      throw new IllegalArgumentException("number condition: missing arg")))
    conf.get("operator").map(_.toString).getOrElse("equals") match {
      case "equals" => s"($t == $a)"
      case "greater_than" => s"($t > $a)"
      case "less_than" => s"($t < $a)"
      case o => throw new IllegalArgumentException(s"number operator: unsupported $o")
    }
  }

  private def metaCond(conf: Map[String, Any]): String = {
    val key = conf.getOrElse("key",
      throw new IllegalArgumentException("metadata condition: missing key")).toString
    val t = s"meta(${quote(key)})"
    val arg = conf.get("arg")
    def a: String = lit(arg.getOrElse(
      throw new IllegalArgumentException("metadata condition: missing arg")))
    conf.get("operator").map(_.toString).getOrElse("equals") match {
      case "exists" => s"$t.type() != \"null\""
      case "equals" => s"($t.lowercase() == ${a}.lowercase())"
      case "equals_cs" => s"($t == $a)"
      case "has_prefix" => s"$t.has_prefix($a)"
      case "greater_than" => s"($t.number() > $a)"
      case "less_than" => s"($t.number() < $a)"
      case "regexp_partial" => s"$t.re_match($a)"
      case "regexp_exact" =>
        s"$t.re_match(${quote("^" + arg.map(_.toString).getOrElse("") + "$")})"
      case "enum" => s"${lit(arg.get)}.contains($t)"
      case o => throw new IllegalArgumentException(s"metadata operator: unsupported $o")
    }
  }

  private def jsonCond(conf: Map[String, Any], targetRaw: String): String = {
    val path = conf.get("path").map(_.toString).getOrElse("")
    val t = if (path.isEmpty) s"($targetRaw)" else s"($targetRaw).$path"
    conf.get("operator").map(_.toString).getOrElse("exists") match {
      case "exists" =>
        if (path.isEmpty) s"$t.type() != \"null\""
        else s"($targetRaw).exists(${quote(path)})"
      case "equals" => s"($t == ${lit(conf("arg"))})"
      case "contains" => s"$t.contains(${lit(conf("arg"))})"
      case o => throw new IllegalArgumentException(s"json operator: unsupported $o")
    }
  }

  // ---------- value rendering ----------

  private def lit(a: Any): String = a match {
    case s: String => quote(s)
    case b: java.lang.Boolean => b.toString
    case n: java.lang.Number =>
      val d = n.doubleValue()
      if (d == Math.floor(d) && !n.toString.contains(".")) n.toString
      else d.toString
    case l: java.util.List[_] =>
      l.toArray.map(lit).mkString("[", ", ", "]")
    case l: scala.Seq[_] => l.map(lit).mkString("[", ", ", "]")
    case o => quote(o.toString)
  }

  private def quote(v: String): String =
    "\"" + v.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case '\r' => "\\r"
      case c => c.toString
    } + "\""

  private def toMap(a: Any): Map[String, Any] = a match {
    case m: Map[_, _] => m.map { case (k, v) => k.toString -> (v: Any) }
    case m: java.util.Map[_, _] =>
      import scala.jdk.CollectionConverters._
      m.asScala.map { case (k, v) => k.toString -> (v: Any) }.toMap
    case o => throw new IllegalArgumentException(s"condition: expected a map, got $o")
  }

  private def asSeq(a: Any): scala.Seq[Any] = a match {
    case l: java.util.List[_] => l.toArray.toIndexedSeq
    case l: scala.Seq[_] => l
    case o => scala.Seq(o)
  }
}
