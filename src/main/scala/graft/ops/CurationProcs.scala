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

  /** `dedup_lines`: within-message duplicate-line removal (keep first
    * occurrence, order preserved) — the processor form of
    * [[Curation.dedupLinesInDoc]]. Pure per-row kernel, stream-safe. */
  final case class DedupLinesProc(sep: String = "\n") extends Processor {
    def apply(df: DataFrame): DataFrame =
      df
        .withColumn("_ls", split(contentStr(df), java.util.regex.Pattern.quote(sep)))
        .withColumn(Envelope.Content,
          array_join(filter(col("_ls"), (x, i) =>
            array_position(col("_ls"), x) ===
              (i + 1).cast(org.apache.spark.sql.types.LongType)), sep)
            .cast(BinaryType))
        .drop("_ls")
  }

  /** `quality_score`: score each message with a trained
    * [[graft.llmops.Training.nbClassifierWeights]] table (loaded from
    * `weightsPath`) and write the fixed-point mean posterior to a meta
    * key. The ≤dim-entry weight table becomes a LITERAL map, so scoring
    * is a pure per-row fold over the token array — no join, no shuffle,
    * stream-safe; identical arithmetic to the batch scorer (tokens whose
    * hash bucket is absent from the table are skipped, like its inner
    * join). */
  final case class QualityScoreProc(weightsPath: String, dim: Int = 4096,
      scale: Long = 1000000L, metaKey: String = "quality_score_fp")
      extends Processor {
    def apply(df: DataFrame): DataFrame = {
      val rows = graft.llmops.Training
        .loadClassifier(df.sparkSession, weightsPath).collect()
      val wmap = map_from_arrays(
        lit(rows.map(_.getLong(0))), lit(rows.map(_.getLong(1))))
      val LT = org.apache.spark.sql.types.LongType
      def bucket(t: org.apache.spark.sql.Column) =
        conv(substring(md5(t), 1, 4), 16, 10).cast(LT) % dim
      val M = Envelope.Meta
      df
        .withColumn("_ws8",
          filter(transform(split(contentStr(df), " "),
            t => element_at(wmap, bucket(t))), w => w.isNotNull))
        .withColumn(M, map_concat(
          map_filter(col(M), (k, _) => k =!= metaKey),
          map(lit(metaKey),
            when(size(col("_ws8")) > 0,
              floor(aggregate(col("_ws8"), lit(0L), (a, x) => a + x) /
                size(col("_ws8"))).cast(LT))
              .otherwise(lit(scale / 2)).cast(StringType))))
        .drop("_ws8")
    }
  }

  /** `truncate_budget`: sentence-aware token-budget truncation — the
    * processor form of [[Curation.truncateToBudget]] (same kernel, so
    * stream output matches the batch gate bit-for-bit). Pure per-row
    * projection, stream-safe. */
  final case class TruncateBudgetProc(maxTokens: Int) extends Processor {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    def apply(df: DataFrame): DataFrame =
      df.withColumn(Envelope.Content,
        graft.llmops.Curation.truncatedTextCol(contentStr(df), maxTokens)
          .cast(BinaryType))
  }
}
