package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Envelope

/** `subprocess` processor (`lib/processor/subprocess.go`): pipe each part's
  * content through a child process with a line codec (one line in → one
  * line out). One process per PARTITION (not per row) — the `ds.pipe`
  * pattern; process isolation for untrusted transforms (SURVEY §4.2). */
final case class SubprocessProc(cmd: scala.Seq[String]) extends Processor {
  def apply(df: DataFrame): DataFrame = {
    val docType = df.schema(Envelope.Doc).dataType
    val spark = df.sparkSession
    val enc = Encoders.row(StructType(scala.Seq(
      StructField("content", StringType),
      StructField("meta", MapType(StringType, StringType)),
      StructField("err", StringType),
      StructField("batch_id", LongType),
      StructField("seq", LongType))))
    val prepared = df.select(
      Envelope.contentOrDoc(df).cast(StringType).as("content"),
      col(Envelope.Meta).as("meta"), col(Envelope.Error).as("err"),
      col(Envelope.BatchId).as("batch_id"), col(Envelope.Seq).as("seq"))
    val cmdSeq = cmd
    val piped = prepared.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        val proc = new ProcessBuilder(cmdSeq: _*).redirectErrorStream(false).start()
        val writer = new java.io.PrintWriter(new java.io.OutputStreamWriter(
          proc.getOutputStream, "UTF-8"))
        val reader = new java.io.BufferedReader(new java.io.InputStreamReader(
          proc.getInputStream, "UTF-8"))
        // line-lockstep codec: write one line, read one line — bounded
        // buffering, no deadlock for line-oriented filters. The iterator
        // stays LAZY (no per-partition materialization — a 100 TB
        // partition's output never sits in memory at once); the process
        // closes when the iterator exhausts.
        val inner = rows.map { r =>
          writer.println(r.getString(0).replace("\n", " "))
          writer.flush()
          val line = reader.readLine()
          Row(line, r.getMap[String, String](1), r.getString(2), r.getLong(3), r.getLong(4))
        }
        new Iterator[Row] {
          private var closed = false
          def hasNext: Boolean = {
            val h = inner.hasNext
            if (!h && !closed) {
              closed = true
              writer.close()
              proc.waitFor()
              ()
            }
            h
          }
          def next(): Row = inner.next()
        }
      }
    }(enc)
    piped.select(
      col("content").cast(BinaryType).as(Envelope.Content),
      lit(null).cast(docType).as(Envelope.Doc),
      col("meta").as(Envelope.Meta),
      col("err").as(Envelope.Error),
      col("batch_id").as(Envelope.BatchId),
      col("seq").as(Envelope.Seq))
  }
}
