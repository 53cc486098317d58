package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Envelope._

/** Grok + structured-log parsing (`lib/processor/grok.go`,
  * `lib/processor/parse_log.go`). Grok patterns are sugar over regex: the
  * translator expands %{NAME:field} against a base pattern library into one
  * regex whose capture groups map to fields — each field then extracts with
  * a codegen'd `regexp_extract`, no UDF.
  */
object Grok {

  /** Base patterns (subset of the standard grok library, all with
    * non-capturing inner groups so user captures keep stable indices). */
  val base: Map[String, String] = Map(
    "WORD" -> "\\b\\w+\\b",
    "NOTSPACE" -> "\\S+",
    "SPACE" -> "\\s*",
    "DATA" -> ".*?",
    "GREEDYDATA" -> ".*",
    "INT" -> "[+-]?\\d+",
    "POSINT" -> "\\d+",
    "NUMBER" -> "[+-]?\\d+(?:\\.\\d+)?",
    "BASE16NUM" -> "(?:0[xX])?[0-9a-fA-F]+",
    "USERNAME" -> "[a-zA-Z0-9._-]+",
    "UUID" -> "[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "IPV4" -> "(?:\\d{1,3}\\.){3}\\d{1,3}",
    "IP" -> "(?:\\d{1,3}\\.){3}\\d{1,3}",
    "HOSTNAME" -> "\\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\\.?\\b",
    "LOGLEVEL" -> "(?:[Tt]race|TRACE|[Dd]ebug|DEBUG|[Ii]nfo|INFO|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Ff]atal|FATAL)",
    "TIMESTAMP_ISO8601" -> "\\d{4}-\\d{2}-\\d{2}[T ]\\d{2}:\\d{2}:\\d{2}(?:\\.\\d+)?(?:Z|[+-]\\d{2}:?\\d{2})?",
    "SYSLOGTIMESTAMP" -> "[A-Z][a-z]{2} +\\d{1,2} \\d{2}:\\d{2}:\\d{2}")

  /** Expand a grok pattern → (regex, captured field names in group order). */
  def compile(pattern: String): (String, List[String]) = {
    val rx = "%\\{(\\w+)(?::(\\w+))?\\}".r
    val fields = scala.collection.mutable.ListBuffer[String]()
    val out = new StringBuilder
    var last = 0
    for (m <- rx.findAllMatchIn(pattern)) {
      out.append(java.util.regex.Pattern.quote(pattern.substring(last, m.start)))
      val pat = base.getOrElse(m.group(1),
        throw new IllegalArgumentException(s"grok: unknown pattern %{${m.group(1)}}"))
      Option(m.group(2)) match {
        case Some(f) => fields += f; out.append("(").append(pat).append(")")
        case None => out.append("(?:").append(pat).append(")")
      }
      last = m.end
    }
    out.append(java.util.regex.Pattern.quote(pattern.substring(last)))
    (out.toString, fields.toList)
  }

  /** Column-level: parse `src` with a grok pattern into a struct. */
  def extract(src: Column, pattern: String): Column = {
    val (regex, fields) = compile(pattern)
    struct(fields.zipWithIndex.map { case (f, i) =>
      regexp_extract(src, regex, i + 1).as(f)
    }: _*)
  }

  /** `grok` processor: doc := grok-extract(content). */
  final case class GrokProc(pattern: String) extends Processor {
    def apply(df: DataFrame): DataFrame = {
      val parsed = extract(contentOrDoc(df).cast(StringType), pattern)
      df.select(col(Content), parsed.as(Doc), col(Meta), col(Error), col(BatchId), col(Seq))
    }
  }

  /** `parse_log` syslog_rfc3164 flavor (`lib/processor/parse_log.go`):
    * fixed grok bundle. */
  val Rfc3164 = "<%{INT:priority}>%{SYSLOGTIMESTAMP:timestamp} %{HOSTNAME:hostname} %{DATA:appname}: %{GREEDYDATA:message}"
  /** syslog_rfc5424 header (no structured-data parsing). */
  val Rfc5424 = "<%{INT:priority}>%{INT:version} %{TIMESTAMP_ISO8601:timestamp} %{NOTSPACE:hostname} %{NOTSPACE:appname} %{NOTSPACE:procid} %{NOTSPACE:msgid} %{GREEDYDATA:message}"
}

/** v3 `text` processor (`lib/processor/text.go:198-233`): content-level
  * string operations. `value` is a Bloblang-interpolated string (the
  * reference's `${! }` message interpolation), `arg` a static argument.
  * Every operator compiles to a Catalyst column over the content — no
  * UDF. `regexp_expand` (Go template expansion) is unsupported. */
final case class TextProc(operator: String, arg: String = "", value: String = "")
    extends Processor {
  def apply(df: DataFrame): DataFrame = {
    val content = contentOrDoc(df).cast(StringType)
    def interp: Column =
      graft.blobl.Interpolation.column(df, value).cast(StringType)
    val out: Column = operator match {
      case "set" => interp
      case "append" => concat(content, interp)
      case "prepend" => concat(interp, content)
      case "to_upper" => upper(content)
      case "to_lower" => lower(content)
      case "trim_space" =>
        // Go strings.TrimSpace strips the Unicode White_Space set (tabs,
        // newlines, NBSP…); Spark's trim only strips ' ' — use the exact
        // property class (ported text_test.go "trim space 3" pins this)
        regexp_replace(content,
          "^\\p{IsWhite_Space}+|\\p{IsWhite_Space}+$", "")
      case "trim" => if (arg.isEmpty) trim(content) else trim(content, arg)
      case "replace" =>
        regexp_replace(content,
          lit(java.util.regex.Pattern.quote(arg)),
          regexp_replace(interp, "([\\\\$])", "\\\\$1"))
      case "replace_regexp" =>
        // Go Expand semantics ($name / out-of-range → empty) need the
        // native expression; a dynamic ${! } replacement value falls back
        // to regexp_replace (Java $-rules), which dynamic configs accept
        if (value.contains("${!")) regexp_replace(content, lit(arg), interp)
        else graft.exprs.GoRegexpExpandExpr.column(content, arg, value,
          expand = false)
      case "regexp_expand" =>
        graft.exprs.GoRegexpExpandExpr.column(content, arg, value,
          expand = true)
      case "find_regexp" => regexp_extract(content, arg, 0)
      case "strip_html" => regexp_replace(content, "<[^>]*>", "")
      case "quote" =>
        graft.blobl.Mapping.envelopeExpr(df, "content().string().quote()")
      case "unquote" =>
        graft.blobl.Mapping.envelopeExpr(df, "content().string().unquote()")
      case "escape_url_query" => url_encode(content)
      case "unescape_url_query" => url_decode(content)
      case o => throw new IllegalArgumentException(s"text: unsupported operator $o")
    }
    df.withColumn(Content, out.cast(BinaryType))
  }
}
