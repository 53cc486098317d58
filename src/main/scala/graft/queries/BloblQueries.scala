package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.blobl.Mapping

/** Oracle-checked queries exercising the Bloblang mapping compiler end to
  * end on the driver tables (the `bloblang` processor,
  * reference `lib/processor/bloblang.go`). Each mapping compiles to a single
  * Catalyst projection — verify with `.explain`: one Project node, filter
  * pushed to the scan.
  */
object BloblQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Projection + derived fields + deleted()-filter over lineitem. */
  def q10(s: SparkSession, dir: String): DataFrame = {
    val m = Mapping.compile(
      """root.orderkey = this.l_orderkey
        |root.linenumber = this.l_linenumber
        |root.revenue = this.l_extendedprice * (1 - this.l_discount)
        |root.flag = this.l_returnflag.lowercase()
        |root.ship_month = this.l_shipdate.format_timestamp("2006-01")
        |root = if this.l_quantity < 10 { deleted() }""".stripMargin)
    m.applyPlain(t(s, dir, "lineitem"))
      .orderBy(col("orderkey"), col("linenumber"))
  }

  /** Dynamic JSON (events.props) via parse_json → variant + match buckets. */
  def q11(s: SparkSession, dir: String): DataFrame = {
    val m = Mapping.compile(
      """root.event_id = this.event_id
        |root.etype = this.event_type.uppercase()
        |root.k = this.props.parse_json().k.number()
        |root.bucket = match this.value {
        |  this < 5 => "low"
        |  this < 15 => "mid"
        |  _ => "high"
        |}""".stripMargin)
    m.applyPlain(t(s, dir, "events")).orderBy(col("event_id"))
  }

  /** Text-shaping methods over documents. */
  def q12(s: SparkSession, dir: String): DataFrame = {
    val m = Mapping.compile(
      """root.doc_id = this.doc_id
        |root.lang_uc = this.lang.uppercase()
        |root.n_words = this.text.split(" ").length()
        |root.head = this.text.slice(0, 30)
        |root.tagged = this.source + ":" + this.lang""".stripMargin)
    m.applyPlain(t(s, dir, "documents")).orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "q10_blobl_lineitem" -> (q10 _),
    "q11_blobl_events" -> (q11 _),
    "q12_blobl_text" -> (q12 _))

  val oracleSql: Map[String, String] = Map(
    "q10_blobl_lineitem" ->
      """SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
        | l_extendedprice*(1-l_discount) AS revenue,
        | lower(l_returnflag) AS flag,
        | strftime(l_shipdate, '%Y-%m') AS ship_month
        |FROM lineitem WHERE NOT (l_quantity < 10)
        |ORDER BY orderkey, linenumber""".stripMargin,
    "q11_blobl_events" ->
      """SELECT event_id, upper(event_type) AS etype,
        | CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k,
        | CASE WHEN value < 5 THEN 'low' WHEN value < 15 THEN 'mid' ELSE 'high' END AS bucket
        |FROM events ORDER BY event_id""".stripMargin,
    "q12_blobl_text" ->
      """SELECT doc_id, upper(lang) AS lang_uc,
        | len(string_split(text, ' ')) AS n_words,
        | substr(text, 1, 30) AS head,
        | source || ':' || lang AS tagged
        |FROM documents ORDER BY doc_id""".stripMargin)
}
