package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType}

import graft.model.Envelope
import graft.llmops.{Curation, TextStats}

/** The LLM-curation operators as envelope processors, so YAML pipelines
  * (and streams mode) can run the same corpus-curation stages the gate
  * queries exercise. All pure projections / filters on `content` — every
  * one is stream-safe and shuffle-free.
  *
  * These have no reference equivalent (the reference stops at generic
  * text/mapping processors); they are the extension surface the engine
  * adds for training-data pipelines, exposed in the same config dialect.
  */
object CurationProcs {

  private def contentStr(df: DataFrame) =
    Envelope.contentOrDoc(df).cast(StringType)

  /** `c4_line_filter`: drop low-quality lines from content, then drop
    * messages with fewer than `minKeptLines` surviving lines. */
  final case class C4LineFilterProc(sep: String = "\n", minWords: Int = 5,
      badSubstrings: scala.Seq[String] = scala.Seq("lorem ipsum", "javascript"),
      minKeptLines: Int = 1) extends Processor {
    def apply(df: DataFrame): DataFrame = {
      val lines = when(contentStr(df).isNull,
          array().cast(org.apache.spark.sql.types.ArrayType(StringType)))
        .otherwise(split(contentStr(df), java.util.regex.Pattern.quote(sep)))
      val kept = filter(lines, l =>
        badSubstrings.foldLeft(size(split(l, " ")) >= minWords) {
          (acc, b) => acc && !l.contains(b)
        })
      df.withColumn("_kept", kept)
        .filter(size(col("_kept")) >= minKeptLines)
        .withColumn(Envelope.Content,
          array_join(col("_kept"), sep).cast(BinaryType))
        .drop("_kept")
    }
  }

  /** `pii_redact`: scrub emails/cards/phones/IPs from content. */
  final case class PiiRedactProc() extends Processor {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(Envelope.Content,
        TextStats.piiRedact(contentStr(df)).cast(BinaryType))
  }

  /** `gopher_filter`: drop messages failing the Gopher quality gates. */
  final case class GopherFilterProc() extends Processor {
    def apply(df: DataFrame): DataFrame =
      df.filter(struct(TextStats.gopherFlags(contentStr(df)): _*)
        .getField("keep"))
  }

  /** `unicode_normalize`: canonical-bytes pass (NFC/NFKC/STRIP_ACCENTS). */
  final case class UnicodeNormalizeProc(form: String = "NFC") extends Processor {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(Envelope.Content,
        TextStats.normalizeUnicode(contentStr(df), form).cast(BinaryType))
  }

  /** `hash_split`: deterministic split assignment written to a meta key
    * (default `split`), bucketed by md5 of a Bloblang key expression. */
  final case class HashSplitProc(weights: scala.Seq[(String, Double)],
      metaKey: String = "split", key: String = "content().string()")
      extends Processor {
    def apply(df: DataFrame): DataFrame = {
      val h = substring(
        md5(graft.blobl.Mapping.envelopeExpr(df, key).cast(StringType)), 1, 4)
      val cuts = Curation.splitThresholds(weights)
      val assigned = weights.init.zip(cuts).reverse
        .foldLeft(lit(weights.last._1)) { case (acc, ((name, _), cut)) =>
          when(h < lit(cut), name).otherwise(acc)
        }
      val M = Envelope.Meta
      df.withColumn(M, map_concat(
        map_filter(col(M), (k, _) => k =!= metaKey),
        map(lit(metaKey), assigned)))
    }
  }
}
