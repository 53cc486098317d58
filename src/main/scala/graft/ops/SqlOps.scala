package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import com.fasterxml.jackson.databind.ObjectMapper
import graft.blobl.{Mapping => Blobl}
import graft.model.Envelope

/** Generic `sql` processor (`lib/processor/sql.go:35-113`): a prepared
  * query per message against a JDBC database, with `args_mapping` (a
  * Bloblang expression producing the argument array) and `result_codec`
  * (`none` for writes, `json_array` to replace content with the result
  * rows).
  *
  * Execution shape: one connection + prepared statement per PARTITION
  * (mapPartitions), rows streamed through it — the JDBC sibling of the
  * subprocess processor. Args are computed as a Catalyst projection
  * (to_json of the Bloblang array) before the partition map, so the
  * Bloblang stays codegen'd; only the actual statement execution is
  * per-row JVM work.
  *
  * Scale note: per-row round trips are inherently the slow path — for
  * equi-key enrichment use the lookup-join form (EnrichOps.cacheJoin /
  * sqlLookup), which becomes a broadcast join. This processor exists for
  * the reference's general form: INSERTs into OLTP stores and non-equi
  * parameterized queries. Postgres-style `$1` placeholders are rewritten
  * to JDBC `?`. */
final case class SqlProc(
    driver: String,
    dsn: String,
    query: String,
    argsMapping: String = "",
    resultCodec: String = "none") extends Processor {

  private def normalized: String = query.replaceAll("\\$\\d+", "?")

  def apply(df: DataFrame): DataFrame = {
    val argsCol =
      if (argsMapping.isEmpty) lit("[]")
      else coalesce(to_json(Blobl.envelopeExpr(df, argsMapping)), lit("[]"))
    val withArgs = df.withColumn("_sql_args", argsCol)
    val schema = withArgs.schema
    val enc = Encoders.row(schema)
    val argsIdx = schema.fieldIndex("_sql_args")
    val contentIdx = schema.fieldIndex(Envelope.Content)
    val errIdx = schema.fieldIndex(Envelope.Error)
    val (q, url, codec) = (normalized, dsn, resultCodec)

    val mapped = withArgs.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        val conn = java.sql.DriverManager.getConnection(url)
        val psOrErr: Either[String, java.sql.PreparedStatement] =
          try Right(conn.prepareStatement(q))
          catch { case e: java.sql.SQLException => Left(e.getMessage) }
        val mapper = new ObjectMapper()
        var closed = false
        def closeAll(): Unit = if (!closed) {
          closed = true
          try psOrErr.foreach(_.close()) finally conn.close()
        }
        val inner = rows.map { r =>
          psOrErr match {
            case Left(msg) =>
              Row.fromSeq(r.toSeq.updated(errIdx, s"sql: $msg"))
            case Right(ps) => try {
            ps.clearParameters()
            val args = mapper.readTree(r.getString(argsIdx))
            var i = 0
            args.elements().forEachRemaining { n =>
              i += 1
              if (n.isNull) ps.setObject(i, null)
              else if (n.isIntegralNumber) ps.setLong(i, n.asLong())
              else if (n.isNumber) ps.setDouble(i, n.asDouble())
              else if (n.isBoolean) ps.setBoolean(i, n.asBoolean())
              else ps.setString(i, n.asText())
            }
            if (codec == "json_array") {
              val rs = ps.executeQuery()
              val md = rs.getMetaData
              val arr = mapper.createArrayNode()
              while (rs.next()) {
                val o = arr.addObject()
                var c = 1
                while (c <= md.getColumnCount) {
                  val label = md.getColumnLabel(c).toLowerCase
                  rs.getObject(c) match {
                    case null => o.putNull(label)
                    case b: java.lang.Boolean => o.put(label, b.booleanValue)
                    case n: java.lang.Integer => o.put(label, n.longValue)
                    case n: java.lang.Long => o.put(label, n.longValue)
                    case n: java.lang.Short => o.put(label, n.longValue)
                    case n: java.lang.Double => o.put(label, n.doubleValue)
                    case n: java.lang.Float => o.put(label, n.doubleValue)
                    case n: java.math.BigDecimal => o.put(label, n)
                    case other => o.put(label, other.toString)
                  }
                  c += 1
                }
              }
              rs.close()
              Row.fromSeq(r.toSeq.updated(contentIdx,
                mapper.writeValueAsBytes(arr)))
            } else {
              ps.executeUpdate()
              r
            }
          } catch {
            case e: java.sql.SQLException =>
              // error-flag discipline: failed messages keep flowing
              Row.fromSeq(r.toSeq.updated(errIdx, s"sql: ${e.getMessage}"))
          }
          }
        }
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = inner.hasNext
            if (!h) closeAll()
            h
          }
          def next(): Row = inner.next()
        }
      }
    }(enc)
    mapped.drop("_sql_args")
  }
}
