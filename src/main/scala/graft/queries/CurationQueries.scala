package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llmops.Curation

/** Oracle-gated web-curation queries (q69-q74): C4 line filtering, BPE
  * merge-pair counts, URL canonicalization + dedup, deterministic hash
  * splits, corpus-wide exact line dedup, deterministic global shuffle.
  *
  * The documents table is single-line synthetic text, so the line-based
  * gates derive lines deterministically by replacing the token ` the `
  * with a newline — `replace` and Java/RE2 `regexp_replace` share the
  * same left-to-right non-overlapping scan, so both engines see the
  * exact same line structure.
  */
object CurationQueries {
  import graft.Tables.t

  type Q = (SparkSession, String) => DataFrame

  /** Newline-ified text: ' the ' → '\n' (deterministic line derivation). */
  private def linesText = regexp_replace(col("text"), " the ", "\n")

  private val linesSqlExpr = "replace(text, ' the ', chr(10))"

  /** q81: within-doc duplicate-line removal — the repetition scrub
    * complementing q76's flags (keep first occurrence, order kept). */
  def q81(s: SparkSession, dir: String): DataFrame =
    graft.llmops.Curation.dedupLinesInDoc(
        t(s, dir, "documents").select(col("doc_id"), linesText.as("t2")),
        "doc_id", "t2", sep = "\n")
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** q84: sentence-aware token-budget truncation at 24 tokens — the
    * context-length trim before packing. */
  def q84(s: SparkSession, dir: String): DataFrame =
    graft.llmops.Curation.truncateToBudget(
        t(s, dir, "documents"), "doc_id", "text", maxTokens = 24)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** q69: C4-style line filter — lines need ≥10 words and no 'slow';
    * docs need ≥2 surviving lines. */
  def q69(s: SparkSession, dir: String): DataFrame =
    Curation.c4LineFilter(
        t(s, dir, "documents").select(col("doc_id"), linesText.as("t2")),
        "doc_id", "t2", sep = "\n", minWords = 10,
        badSubstrings = scala.Seq("slow"), minKeptLines = 2)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** q70: one BPE merge-step statistic — corpus-wide adjacent character
    * pair counts inside words, top 20 (ties → pair ascending). */
  def q70(s: SparkSession, dir: String): DataFrame =
    Curation.bpePairCounts(t(s, dir, "documents"), "text", k = 20)

  /** Synthetic absolute URL per document (deterministic from columns;
    * doc_id % 250 induces canonical collisions so the dedup fires). */
  private def rawUrl = concat(
    lit("HTTPS://WWW."), upper(col("source")), lit(".Example.COM:443//a/./docs/"),
    (col("doc_id") % 250).cast("string"),
    lit("/?utm_source=rss&z=9&a=1&utm_medium=email#frag"))

  private val rawUrlSql =
    "'HTTPS://WWW.' || upper(source) || '.Example.COM:443//a/./docs/' || " +
      "CAST(doc_id % 250 AS VARCHAR) || " +
      "'/?utm_source=rss&z=9&a=1&utm_medium=email#frag'"

  /** q71: URL canonicalization + first-wins dedup on the canonical URL. */
  def q71(s: SparkSession, dir: String): DataFrame =
    Curation.dedupByCanonicalUrl(
        t(s, dir, "documents").select(col("doc_id"), rawUrl.as("url")),
        "doc_id", "url")
      .select(col("doc_id"), col("canon_url"), col("keep"))
      .orderBy(col("doc_id"))

  private val q72Splits =
    scala.Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  /** q72: deterministic md5-bucket train/val/test split (80/10/10). */
  def q72(s: SparkSession, dir: String): DataFrame =
    Curation.hashSplit(t(s, dir, "documents"), "doc_id", q72Splits)
      .select(col("doc_id"), col("split"))
      .orderBy(col("doc_id"))

  /** q73: corpus-wide exact line dedup, first occurrence wins, documents
    * re-assembled in original line order. */
  def q73(s: SparkSession, dir: String): DataFrame =
    Curation.lineDedupGlobal(
        t(s, dir, "documents").select(col("doc_id"), linesText.as("t2")),
        "doc_id", "t2", sep = "\n")
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** q74: deterministic global corpus shuffle — md5(id) rank via the
    * partitioned two-pass assignment (no single-partition window). */
  def q74(s: SparkSession, dir: String): DataFrame =
    Curation.deterministicShuffle(
        t(s, dir, "documents").select(col("doc_id")), "doc_id")
      .orderBy(col("doc_id"))

  /** q76: Gopher within-doc repetition — duplicate-line fraction and
    * duplicate-line CHARACTER fraction (Rae et al. 2021 §A1.1). */
  def q76(s: SparkSession, dir: String): DataFrame = {
    import graft.llmops.TextStats
    t(s, dir, "documents")
      .select(col("doc_id"), linesText.as("t2"))
      .select(col("doc_id"),
        size(split(col("t2"), "\n")).cast(org.apache.spark.sql.types.LongType)
          .as("n_lines"),
        TextStats.dupLineFrac(col("t2")).as("dup_line_frac"),
        TextStats.dupLineCharFrac(col("t2")).as("dup_line_char_frac"))
      .orderBy(col("doc_id"))
  }

  /** Text with a deterministically injected repeated tail (the first 12
    * tokens appended) so the duplicate-n-gram gates exercise nonzero
    * coverage — the raw synthetic docs have almost no 5-gram repeats. */
  private def repText = concat(col("text"), lit(" "),
    array_join(slice(split(col("text"), " "), 1, 12), " "))

  /** q85: Gopher n-gram repetition suite completion — top-n-gram
    * character fractions (n=2,3) and duplicate-n-gram character
    * fractions (n=5,10), all position-marked (Rae et al. 2021 §A1.1). */
  def q85(s: SparkSession, dir: String): DataFrame = {
    import graft.llmops.TextStats
    t(s, dir, "documents")
      .select(col("doc_id"), repText.as("t2"))
      .select(col("doc_id"),
        TextStats.topNgramCharFrac(col("t2"), 2).as("top2_frac"),
        TextStats.topNgramCharFrac(col("t2"), 3).as("top3_frac"),
        TextStats.dupNgramCharFrac(col("t2"), 5).as("dup5_frac"),
        TextStats.dupNgramCharFrac(col("t2"), 10).as("dup10_frac"))
      .orderBy(col("doc_id"))
  }

  /** q86: temperature-scaled (τ=0.5) per-language sampling weights —
    * integer-exact sqrt weights and basis-point shares. */
  def q86(s: SparkSession, dir: String): DataFrame =
    graft.llmops.Training.temperatureWeights(
        t(s, dir, "documents"), "lang", "text")
      .withColumnRenamed("source", "lang")
      .orderBy(col("lang"))

  /** q87: vocabulary head coverage — top-50 corpus tokens with
    * cumulative basis-point share of the whole token mass. */
  def q87(s: SparkSession, dir: String): DataFrame =
    graft.llmops.TextStats.vocabCoverage(t(s, dir, "documents"), "text", 50)
      .orderBy(col("rank"))

  /** q88: deterministic exact-k sample (k=40) by md5 order — the
    * reproducible reservoir-sample replacement. */
  def q88(s: SparkSession, dir: String): DataFrame =
    Curation.sampleExactK(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        "doc_id", 40)
      .orderBy(col("doc_id"))

  /** q89: over-represented-group scrub — block the 2 largest languages
    * (count desc, lang asc), flag every document. */
  def q89(s: SparkSession, dir: String): DataFrame =
    Curation.dropTopGroups(
        t(s, dir, "documents").select(col("doc_id"), col("lang")), "lang", 2)
      .orderBy(col("doc_id"))

  /** Lines with deterministic content-derived formatting salt: lines
    * whose length ≡ 0 (mod 3) get a terminal '.', else (mod 5) a '?';
    * lines whose length ≡ 0 (mod 4) get a '- ' bullet prefix (judged on
    * the ORIGINAL length). The synthetic corpus has no punctuation, so
    * the line-signal machinery needs salted structure to exercise. */
  private def saltedLines: org.apache.spark.sql.Column =
    transform(split(linesText, "\n"), l => {
      val tail = when(length(l) % 3 === 0, concat(l, lit(".")))
        .when(length(l) % 5 === 0, concat(l, lit("?")))
        .otherwise(l)
      when(length(l) % 4 === 0, concat(lit("- "), tail)).otherwise(tail)
    })

  /** q91: C4/RefinedWeb line-structure quality signals over salted
    * lines — terminal-punctuation fraction, bullet fraction, mean words
    * per line. */
  def q91(s: SparkSession, dir: String): DataFrame = {
    import graft.llmops.TextStats
    t(s, dir, "documents")
      .select(col("doc_id"), array_join(saltedLines, "\n").as("t2"))
      .select(col("doc_id") +: TextStats.lineSignals(col("t2")): _*)
      .orderBy(col("doc_id"))
  }

  /** q96: language-interleaved training order — rows cycle through the
    * languages round-robin in deterministic md5 order. */
  def q96(s: SparkSession, dir: String): DataFrame =
    Curation.interleaveGroups(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "lang", "doc_id")
      .orderBy(col("doc_id"))

  /** q97: lang × source pivot counts — the wide-format contingency table
    * (Spark `pivot`; the oracle as portable conditional aggregation). */
  def q97(s: SparkSession, dir: String): DataFrame = {
    val langs = scala.Seq("de", "en", "es", "fr", "zh")
    t(s, dir, "documents")
      .groupBy(col("source"))
      .pivot("lang", langs)
      .count()
      .na.fill(0L, langs)
      .orderBy(col("source"))
  }

  /** q99: stratified exact-fraction split — 10% of every source held
    * out by (md5, id) rank within the source (small strata keep exact
    * representation, unlike the global hash split q72). */
  def q99(s: SparkSession, dir: String): DataFrame =
    Curation.stratifiedExactSplit(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        "doc_id", "source", valFracBp = 1000)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** Per-language epoch factors in basis points (25000 = 2.5 epochs) —
    * the mixture a curriculum might assign. */
  private val q100Factors: scala.Seq[(String, Long)] = scala.Seq(
    "en" -> 25000L, "de" -> 15000L, "es" -> 10000L, "fr" -> 5000L,
    "zh" -> 30000L)

  /** q100: epoch-repetition materialization — each doc appears
    * floor(factor) times plus once more on a deterministic md5 bucket
    * for the fractional remainder ("2.5 epochs of en" made concrete). */
  def q100(s: SparkSession, dir: String): DataFrame = {
    val factor = q100Factors.tail.foldLeft(
        when(col("lang") === q100Factors.head._1, q100Factors.head._2)) {
      case (acc, (l, f)) => acc.when(col("lang") === l, f)
    }.otherwise(0L)
    graft.llmops.Training.repeatEpochs(
        t(s, dir, "documents").select(col("doc_id"), col("lang")), "doc_id",
        factor)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"), col("epoch"))
  }

  /** q101: size-balanced output shards — 8 shards dealt in snake order
    * over the (tokens DESC, id) total order. */
  def q101(s: SparkSession, dir: String): DataFrame =
    graft.llmops.Training.balancedShards(
        t(s, dir, "documents"), "doc_id",
        size(split(col("text"), " ")), nShards = 8)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** q102: recency-decay sampling weights over events — weight halves
    * every 3 days of age relative to the newest event. */
  def q102(s: SparkSession, dir: String): DataFrame =
    Curation.recencyWeights(t(s, dir, "events"), "event_id", col("ts"),
        halflifeDays = 3)
      .withColumnRenamed("id", "event_id")
      .orderBy(col("event_id"))

  /** q103: sequence-length histogram in power-of-2 token buckets — the
    * corpus profile behind max_seq_len / packing decisions. */
  def q103(s: SparkSession, dir: String): DataFrame =
    graft.llmops.TextStats.lengthHistogram(t(s, dir, "documents"), "text")
      .orderBy(col("bucket"))

  /** q111: boilerplate-line scrub — every occurrence of a line seen in
    * 3+ distinct documents is dropped (the C4/RefinedWeb df rule; q73
    * is the complementary first-occurrence-wins dedup). */
  def q111(s: SparkSession, dir: String): DataFrame =
    Curation.scrubBoilerplateLines(
        t(s, dir, "documents").select(col("doc_id"), linesText.as("t2")),
        "doc_id", "t2", minDf = 3)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** q110: split-leakage audit — val docs whose token-set fingerprint
    * (q25's near-dup key) also appears on the train side of the q99
    * stratified split: the held-out-set contamination check run before
    * any eval is trusted. Equi-joins on the fingerprint key only. */
  def q110(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val split = Curation.stratifiedExactSplit(
        docs.select(col("doc_id"), col("source")), "doc_id", "source",
        valFracBp = 1000)
      .select(col("id").as("doc_id"), col("split"))
    val fp = docs.select(col("doc_id"),
      graft.llmops.Dedup.fingerprint(col("text")).as("fp"))
    val joined = fp.join(split, "doc_id")
    val train = joined.filter(col("split") === "train")
      .select(col("fp"), col("doc_id").as("train_id"))
    joined.filter(col("split") === "val").select(col("doc_id"), col("fp"))
      .join(train, "fp")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_train_dups"),
        min(col("train_id")).as("first_train_dup"))
      .orderBy(col("doc_id"))
  }

  /** q104: per-(lang, source) byte/char/word compression profile — the
    * tokenizer-fertility heuristic corpora are triaged and re-weighted
    * by (ratios in integer basis points). */
  def q104(s: SparkSession, dir: String): DataFrame =
    graft.llmops.TextStats.compressionProfile(t(s, dir, "documents"),
        "text", scala.Seq("lang", "source"))
      .orderBy(col("lang"), col("source"))

  /** q132: the end-to-end curation pipeline as ONE composed plan —
    * length gate → exact dedup (md5, keep min id) → token-set
    * fingerprint dedup → temperature-scaled (τ=0.5) per-source mixture
    * weights. The point of the gate: the stages compose lazily into a
    * single Catalyst plan (each dedup is a semi-join against its
    * keep-set, co-keyed on (key, doc_id)); nothing materializes between
    * stages. */
  def q132(s: SparkSession, dir: String): DataFrame = {
    // the pipeline's stages self-join the survivor set repeatedly —
    // materialize the filtered input once (what a real multi-stage
    // curation job does between stages). The dedup KEYS (md5 + token-set
    // fingerprint over the full text) ride in the checkpoint too: each
    // semi-join consumes the key on BOTH sides, so computing them lazily
    // re-ran both text kernels once per side per stage (QProf: five
    // 2.5-9 s-cpu scan-side jobs per run); precomputed they cost one
    // pass and a few bytes per row. Results identical — same keys.
    val kept = t(s, dir, "documents")
      .filter(size(split(col("text"), " ")).between(20, 5000))
      .withColumn("_kmd5", md5(col("text")))
      .withColumn("_kfp", graft.llmops.Dedup.fingerprint(col("text")))
      .localCheckpoint(false)
    def dedup(df: DataFrame, key: String): DataFrame =
      df.join(
        df.groupBy(col(key)).agg(min(col("doc_id")).as("doc_id")),
        scala.Seq(key, "doc_id"), "left_semi")
    val d2 = dedup(dedup(kept, "_kmd5"), "_kfp").drop("_kmd5", "_kfp")
    graft.llmops.Training.temperatureWeights(d2, "source", "text")
      .orderBy(col("source"))
  }

  /** q133: mergeable histogram quantiles — per-lang token-length
    * p50/p90/p99 from two independently-built histogram states (doc_id
    * parity split) merged then finished; pins merge(hist(A), hist(B))
    * == hist(A ∪ B) and the integer quantile rule. */
  def q133(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Incremental
    val docs = t(s, dir, "documents").select(col("lang"), col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ntok"))
    val st = Incremental.mergeHists(scala.Seq("lang"),
      Incremental.histState(docs.filter(col("doc_id") % 2 === 0),
        scala.Seq("lang"), col("ntok"), 16L, 64),
      Incremental.histState(docs.filter(col("doc_id") % 2 === 1),
        scala.Seq("lang"), col("ntok"), 16L, 64))
    Incremental.histQuantiles(st, scala.Seq("lang"), 16L,
        scala.Seq(5000, 9000, 9900))
      .orderBy(col("lang"), col("q_bp"))
  }

  /** q136: rendezvous-hash shard profile — consistent HRW assignment of
    * documents to 8 shards (argmax of md5(id:shard)); per-shard doc and
    * token mass. */
  def q136(s: SparkSession, dir: String): DataFrame =
    graft.llmops.Training.rendezvousShards(t(s, dir, "documents"), "doc_id", 8)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("tokens"))
      .orderBy(col("shard"))

  /** q122: sequence-length bucketing — per padded-batch bucket (16/32/
    * 64/96, batch 8) doc counts, kept tokens, batch counts, and padding
    * waste in basis points; the dataloader-boundary statistic. */
  def q122(s: SparkSession, dir: String): DataFrame =
    graft.llmops.Training.paddingBuckets(t(s, dir, "documents"), "text",
      scala.Seq(16, 32, 64, 96), batch = 8)

  val queries: Map[String, Q] = Map(
    "q122_padding_buckets" -> (q122 _),
    "q132_pipeline" -> (q132 _),
    "q133_hist_quantiles" -> (q133 _),
    "q136_rendezvous" -> (q136 _),
    "q99_stratified_split" -> (q99 _),
    "q100_epoch_repeat" -> (q100 _),
    "q101_balanced_shards" -> (q101 _),
    "q102_recency_weight" -> (q102 _),
    "q103_len_histogram" -> (q103 _),
    "q104_compression" -> (q104 _),
    "q110_split_leakage" -> (q110 _),
    "q111_boilerplate" -> (q111 _),
    "q96_interleave" -> (q96 _),
    "q97_pivot" -> (q97 _),
    "q91_line_signals" -> (q91 _),
    "q85_ngram_rep" -> (q85 _),
    "q86_temp_mix" -> (q86 _),
    "q87_vocab_coverage" -> (q87 _),
    "q88_exact_sample" -> (q88 _),
    "q89_drop_top_groups" -> (q89 _),
    "q76_dup_lines" -> (q76 _),
    "q81_dedup_lines_in_doc" -> (q81 _),
    "q84_truncate_budget" -> (q84 _),
    "q69_c4_filter" -> (q69 _),
    "q70_bpe_pairs" -> (q70 _),
    "q71_url_canon" -> (q71 _),
    "q72_split" -> (q72 _),
    "q73_line_dedup" -> (q73 _),
    "q74_shuffle" -> (q74 _),
    "q151_source_similarity" -> (q151 _),
    "q152_cluster_safe_split" -> (q152 _),
    "q153_dedup_impact" -> (q153 _),
    "q154_script_profile" -> (q154 _))

  /** q154: per-language script/char-class mix — the cheap mislabeled-
    * language / junk-source signal (ASCII classes only, engine-portable). */
  def q154(s: SparkSession, dir: String): DataFrame =
    graft.llmops.TextStats.scriptProfile(t(s, dir, "documents"),
        "lang", "text")
      .withColumnRenamed("group", "lang")
      .orderBy(col("lang"))

  /** q151: source-pair exact-Jaccard similarity matrix over document
    * fingerprints — the corpus-overlap statistic behind source mixing. */
  def q151(s: SparkSession, dir: String): DataFrame =
    graft.llmops.Dedup.sourceSimilarity(t(s, dir, "documents"),
        "source", "text")
      .orderBy(col("src_a"), col("src_b"))

  /** q152: leakage-safe split — md5-bucket assignment keyed by the
    * exact-dup cluster canonical id, so byte-identical copies never
    * straddle train/eval (contrast q110, which audits the leak q72-style
    * id-keyed splits permit). */
  def q152(s: SparkSession, dir: String): DataFrame =
    Curation.clusterSafeSplit(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", q72Splits)
      .select(col("doc_id"), col("canon_id"), col("split"))
      .orderBy(col("doc_id"))

  /** q153: per-source exact-dedup impact — duplicate copies and
    * reclaimable content bytes, the "what does dedup buy us" report. */
  def q153(s: SparkSession, dir: String): DataFrame =
    graft.llmops.Dedup.dedupImpact(t(s, dir, "documents"), "source", "text")
      .orderBy(col("source"))

  private def q72SplitSql: String = splitCaseSql("doc_id")

  /** DuckDB CASE expression replicating [[Curation.hashSplit]]'s md5-bucket
    * assignment for the q72Splits fractions, keyed by `idExpr`. */
  private def splitCaseSql(idExpr: String): String = {
    val cuts = Curation.splitThresholds(q72Splits)
    val h = s"substr(md5(CAST($idExpr AS VARCHAR)), 1, 4)"
    val whens = q72Splits.init.zip(cuts).map { case ((name, _), cut) =>
      s"WHEN $h < '$cut' THEN '$name'"
    }.mkString(" ")
    s"CASE $whens ELSE '${q72Splits.last._1}' END"
  }

  /** DuckDB replica of the position-marked n-gram coverage kernel
    * ([[graft.exprs.NgramCoverExpr]]): per n, enumerate occurrences with
    * positions, count keys, select (top-1 by count with earliest-first-
    * occurrence tiebreak | every key with count ≥ 2), union the covered
    * token positions distinctly, and divide covered by total token code
    * points. Both sides divide the same two integers, so the doubles are
    * bit-identical. */
  private def q85NgramSql: String = {
    val rep = "text || ' ' || array_to_string((string_split(text, ' '))[1:12], ' ')"
    def base(n: Int) =
      s"""g$n AS (
         | SELECT doc_id, i, array_to_string(tk[i:i+${n - 1}], ' ') AS key
         | FROM (SELECT doc_id, tk,
         |   unnest(generate_series(1, greatest(len(tk)-${n - 1}, 0))) AS i
         |  FROM t) u$n),
         |c$n AS (SELECT doc_id, key, count(*) AS c, min(i) AS fp
         | FROM g$n GROUP BY doc_id, key)""".stripMargin
    def covTop(n: Int) =
      s"""sel$n AS (
         | SELECT doc_id, min_by(key, fp) AS key FROM (
         |  SELECT doc_id, key, c, fp, max(c) OVER (PARTITION BY doc_id) AS mc
         |  FROM c$n) x$n
         | WHERE c = mc GROUP BY doc_id),
         |cov$n AS (
         | SELECT p.doc_id, sum(length(t.tk[p.p])) AS cov FROM (
         |  SELECT DISTINCT doc_id, p FROM (
         |   SELECT g.doc_id, unnest(generate_series(g.i, g.i+${n - 1})) AS p
         |   FROM g$n g JOIN sel$n s ON g.doc_id = s.doc_id AND g.key = s.key) y$n) p
         | JOIN t ON p.doc_id = t.doc_id GROUP BY p.doc_id)""".stripMargin
    def covDup(n: Int) =
      s"""cov$n AS (
         | SELECT p.doc_id, sum(length(t.tk[p.p])) AS cov FROM (
         |  SELECT DISTINCT doc_id, p FROM (
         |   SELECT g.doc_id, unnest(generate_series(g.i, g.i+${n - 1})) AS p
         |   FROM g$n g JOIN c$n c ON g.doc_id = c.doc_id AND g.key = c.key
         |   WHERE c.c >= 2) y$n) p
         | JOIN t ON p.doc_id = t.doc_id GROUP BY p.doc_id)""".stripMargin
    def frac(n: Int, out: String) =
      s"""CASE WHEN tot.total > 0 THEN
         |  coalesce(CAST(cov$n.cov AS DOUBLE) / CAST(tot.total AS DOUBLE), 0.0)
         | ELSE 0.0 END AS $out""".stripMargin
    s"""WITH t AS (
       | SELECT doc_id, string_split($rep, ' ') AS tk FROM documents),
       |tot AS (
       | SELECT doc_id, list_sum(list_transform(tk, x -> length(x))) AS total
       | FROM t),
       |${base(2)},
       |${base(3)},
       |${base(5)},
       |${base(10)},
       |${covTop(2)},
       |${covTop(3)},
       |${covDup(5)},
       |${covDup(10)}
       |SELECT t.doc_id,
       | ${frac(2, "top2_frac")},
       | ${frac(3, "top3_frac")},
       | ${frac(5, "dup5_frac")},
       | ${frac(10, "dup10_frac")}
       |FROM t
       |JOIN tot ON t.doc_id = tot.doc_id
       |LEFT JOIN cov2 ON t.doc_id = cov2.doc_id
       |LEFT JOIN cov3 ON t.doc_id = cov3.doc_id
       |LEFT JOIN cov5 ON t.doc_id = cov5.doc_id
       |LEFT JOIN cov10 ON t.doc_id = cov10.doc_id
       |ORDER BY t.doc_id""".stripMargin
  }

  /** DuckDB replica of the md5 16-bit bucket scaled to basis points
    * (Spark side: conv(substr(md5(id),1,4),16,10) * 10000 div 65536). */
  private def md5BucketBpSql(idExpr: String): String = {
    val h = s"md5(CAST($idExpr AS VARCHAR))"
    val digit = (i: Int) =>
      s"(strpos('0123456789abcdef', substr($h, $i, 1)) - 1)"
    s"(CAST(4096 * ${digit(1)} + 256 * ${digit(2)} + 16 * ${digit(3)} + " +
      s"${digit(4)} AS BIGINT) * 10000 // 65536)"
  }

  private def q100FactorSql: String =
    "CASE lang " + q100Factors.map { case (l, f) =>
      s"WHEN '$l' THEN ${f}"
    }.mkString(" ") + " ELSE 0 END"

  val oracleSql: Map[String, String] = Map(
    "q136_rendezvous" ->
      """WITH x AS (
        | SELECT doc_id, text, s, md5(doc_id || ':' || s) AS h
        | FROM documents, unnest(generate_series(0, 7)) AS t(s)),
        |a AS (
        | SELECT doc_id, CAST(arg_max(s, h) AS BIGINT) AS shard,
        |  any_value(text) AS text
        | FROM x GROUP BY doc_id)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |FROM a GROUP BY shard ORDER BY shard""".stripMargin,
    "q133_hist_quantiles" ->
      """WITH v AS (
        | SELECT lang,
        |  least(len(string_split(text, ' ')) // 16, 63) AS bin
        | FROM documents),
        |h AS (
        | SELECT lang, bin, CAST(count(*) AS BIGINT) AS n
        | FROM v GROUP BY lang, bin),
        |c AS (
        | SELECT lang, bin,
        |  sum(n) OVER (PARTITION BY lang ORDER BY bin) AS cum,
        |  sum(n) OVER (PARTITION BY lang) AS total
        | FROM h),
        |q AS (
        | SELECT lang, bin, q_bp FROM c,
        |  unnest([5000, 9000, 9900]) AS t(q_bp)
        | WHERE cum * 10000 >= q_bp * total)
        |SELECT lang, CAST(q_bp AS BIGINT) AS q_bp,
        | CAST(min(bin) * 16 AS BIGINT) AS est
        |FROM q GROUP BY lang, q_bp ORDER BY lang, q_bp""".stripMargin,
    "q132_pipeline" ->
      """WITH kept AS (
        | SELECT * FROM documents
        | WHERE len(string_split(text, ' ')) BETWEEN 20 AND 5000),
        |d1 AS (
        | SELECT * FROM kept WHERE doc_id IN (
        |  SELECT min(doc_id) FROM kept GROUP BY md5(text))),
        |d2 AS (
        | SELECT * FROM d1 WHERE doc_id IN (
        |  SELECT min(doc_id) FROM d1 GROUP BY
        |   md5(array_to_string(list_sort(list_distinct(
        |     string_split(text, ' '))), ' ')))),
        |p AS (
        | SELECT source,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        | FROM d2 GROUP BY source),
        |w AS (SELECT source, tokens,
        |  CAST(floor(sqrt(tokens)) AS BIGINT) AS weight FROM p),
        |tot AS (SELECT SUM(weight) AS tw FROM w)
        |SELECT source, tokens, weight,
        | CAST(10000 * weight // tw AS BIGINT) AS share_bp
        |FROM w, tot ORDER BY source""".stripMargin,
    "q122_padding_buckets" ->
      """WITH n AS (
        | SELECT len(string_split(text, ' ')) AS nt FROM documents),
        |b AS (
        | SELECT CASE WHEN nt <= 16 THEN 16 WHEN nt <= 32 THEN 32
        |   WHEN nt <= 64 THEN 64 ELSE 96 END AS bucket_len,
        |  least(nt, 96) AS kept FROM n),
        |agg AS (
        | SELECT bucket_len, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(kept) AS BIGINT) AS sum_tokens
        | FROM b GROUP BY bucket_len),
        |x AS (
        | SELECT bucket_len, n_docs, sum_tokens,
        |  CAST((n_docs + 7) // 8 AS BIGINT) AS n_batches FROM agg),
        |y AS (
        | SELECT *, CAST(n_batches * 8 * bucket_len AS BIGINT) AS padded
        | FROM x)
        |SELECT CAST(bucket_len AS BIGINT) AS bucket_len, n_docs,
        | sum_tokens, n_batches, padded,
        | CAST((padded - sum_tokens) * 10000 // padded AS BIGINT)
        |  AS waste_bp
        |FROM y ORDER BY bucket_len""".stripMargin,
    "q99_stratified_split" ->
      """WITH r AS (
         | SELECT doc_id, source,
         |  CAST(row_number() OVER (PARTITION BY source
         |   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
         |   AS grp_rank,
         |  CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS grp_n
         | FROM documents)
         |SELECT doc_id, source, grp_n, grp_rank,
         | CASE WHEN grp_rank <= grp_n * 1000 // 10000 THEN 'val'
         |      ELSE 'train' END AS split
         |FROM r ORDER BY doc_id""".stripMargin,
    "q100_epoch_repeat" ->
      s"""WITH f AS (
         | SELECT doc_id, CAST($q100FactorSql AS BIGINT) AS fbp
         | FROM documents),
         |n AS (
         | SELECT doc_id, fbp // 10000 +
         |  (CASE WHEN ${md5BucketBpSql("doc_id")} < fbp % 10000
         |        THEN 1 ELSE 0 END) AS n_epochs
         | FROM f)
         |SELECT doc_id, CAST(n_epochs AS BIGINT) AS n_epochs,
         | CAST(unnest(generate_series(1, n_epochs)) AS BIGINT) AS epoch
         |FROM n WHERE n_epochs >= 1
         |ORDER BY doc_id, epoch""".stripMargin,
    "q101_balanced_shards" ->
      """WITH r AS (
         | SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         | FROM documents),
         |rk AS (
         | SELECT doc_id, n_tokens,
         |  CAST(row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1
         |   AS BIGINT) AS rank
         | FROM r)
         |SELECT doc_id, n_tokens, rank,
         | CASE WHEN rank % 16 < 8 THEN rank % 16 ELSE 15 - rank % 16 END
         |  AS shard
         |FROM rk ORDER BY doc_id""".stripMargin,
    "q102_recency_weight" ->
      """WITH m AS (SELECT max(ts) AS as_of FROM events),
         |a AS (
         | SELECT event_id,
         |  CAST(date_diff('day', CAST(ts AS DATE), CAST(as_of AS DATE))
         |   AS BIGINT) AS age_days
         | FROM events, m)
         |SELECT event_id, age_days, age_days // 3 AS halflives,
         | 10000 // (1::BIGINT << CAST(least(age_days // 3, 13) AS INT))
         |  AS weight_bp
         |FROM a ORDER BY event_id""".stripMargin,
    "q103_len_histogram" ->
      """WITH n AS (
         | SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
         | FROM documents),
         |b AS (SELECT tok, CAST(length(bin(tok)) - 1 AS BIGINT) AS bucket
         | FROM n)
         |SELECT bucket, CAST(1::BIGINT << CAST(bucket AS INT) AS BIGINT)
         |  AS bucket_lo,
         | CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(tok) AS BIGINT)
         |  AS tok_sum
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q111_boilerplate" ->
      s"""WITH l AS (
         | SELECT doc_id, string_split($linesSqlExpr, chr(10)) AS ls
         | FROM documents),
         |ex AS (
         | SELECT doc_id, i - 1 AS ix, ls[i] AS line
         | FROM l, unnest(generate_series(1, len(ls))) t(i)),
         |fdf AS (
         | SELECT line, count(DISTINCT doc_id) AS ldf FROM ex GROUP BY line)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
         | CAST(sum(CASE WHEN ldf >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         |  AS n_scrubbed,
         | COALESCE(array_to_string(
         |  list(ex.line ORDER BY ix) FILTER (WHERE ldf < 3), chr(10)), '')
         |  AS clean_text
         |FROM ex JOIN fdf USING (line)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q110_split_leakage" ->
      """WITH r AS (
         | SELECT doc_id, source,
         |  CAST(row_number() OVER (PARTITION BY source
         |   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
         |   AS grp_rank,
         |  CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS grp_n
         | FROM documents),
         |sp AS (
         | SELECT doc_id,
         |  CASE WHEN grp_rank <= grp_n * 1000 // 10000 THEN 'val'
         |       ELSE 'train' END AS split
         | FROM r),
         |fp AS (
         | SELECT doc_id,
         |  md5(array_to_string(list_sort(list_distinct(
         |    string_split(text, ' '))), ' ')) AS fp
         | FROM documents),
         |j AS (SELECT f.doc_id, f.fp, s.split
         |      FROM fp f JOIN sp s USING (doc_id))
         |SELECT v.doc_id, CAST(count(*) AS BIGINT) AS n_train_dups,
         | min(t.doc_id) AS first_train_dup
         |FROM j v JOIN j t ON v.fp = t.fp
         |WHERE v.split = 'val' AND t.split = 'train'
         |GROUP BY v.doc_id ORDER BY v.doc_id""".stripMargin,
    "q104_compression" ->
      """SELECT lang, source,
         | CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(strlen(text)) AS BIGINT) AS sum_bytes,
         | CAST(sum(length(text)) AS BIGINT) AS sum_chars,
         | CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_words,
         | CAST(sum(strlen(text)) * 10000 // sum(len(string_split(text, ' ')))
         |  AS BIGINT) AS bytes_per_word_bp,
         | CAST(sum(length(text)) * 10000 // sum(len(string_split(text, ' ')))
         |  AS BIGINT) AS chars_per_word_bp
         |FROM documents GROUP BY lang, source
         |ORDER BY lang, source""".stripMargin,
    "q96_interleave" ->
      """WITH r AS (
         | SELECT doc_id, lang,
         |  CAST(row_number() OVER (PARTITION BY lang
         |   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
         |   AS grp_rank
         | FROM documents)
         |SELECT doc_id, lang, grp_rank,
         | CAST(row_number() OVER (ORDER BY grp_rank, lang, doc_id) - 1
         |  AS BIGINT) AS train_rank
         |FROM r ORDER BY doc_id""".stripMargin,
    "q97_pivot" ->
      """SELECT source,
         | CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
         | CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
         | CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
         | CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
         | CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q91_line_signals" ->
      s"""WITH l AS (
         | SELECT doc_id, string_split($linesSqlExpr, chr(10)) AS ls
         | FROM documents),
         |s AS (
         | SELECT doc_id, list_transform(ls, l ->
         |  (CASE WHEN length(l) % 4 = 0 THEN '- ' ELSE '' END) ||
         |  (CASE WHEN length(l) % 3 = 0 THEN l || '.'
         |        WHEN length(l) % 5 = 0 THEN l || '?'
         |        ELSE l END)) AS ls2
         | FROM l),
         |m AS (
         | SELECT doc_id,
         |  CAST(len(ls2) AS BIGINT) AS n_lines,
         |  len(list_filter(ls2, x -> ends_with(x, '.')
         |    OR ends_with(x, '!') OR ends_with(x, '?'))) AS n_punct,
         |  len(list_filter(ls2, x -> starts_with(x, '- ')
         |    OR starts_with(x, '* '))) AS n_bullet,
         |  list_sum(list_transform(ls2, x -> len(string_split(x, ' ')))) AS words
         | FROM s)
         |SELECT doc_id, n_lines,
         | CASE WHEN n_lines > 0
         |  THEN CAST(n_punct AS DOUBLE) / CAST(n_lines AS DOUBLE)
         |  ELSE 0.0 END AS punct_line_frac,
         | CASE WHEN n_lines > 0
         |  THEN CAST(n_bullet AS DOUBLE) / CAST(n_lines AS DOUBLE)
         |  ELSE 0.0 END AS bullet_line_frac,
         | CASE WHEN n_lines > 0
         |  THEN CAST(words AS DOUBLE) / CAST(n_lines AS DOUBLE)
         |  ELSE 0.0 END AS mean_line_words
         |FROM m ORDER BY doc_id""".stripMargin,
    "q85_ngram_rep" -> q85NgramSql,
    "q86_temp_mix" ->
      """WITH p AS (
         | SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
         | FROM documents GROUP BY lang),
         |w AS (SELECT lang, tokens,
         |  CAST(floor(sqrt(tokens)) AS BIGINT) AS weight FROM p),
         |tot AS (SELECT SUM(weight) AS tw FROM w)
         |SELECT lang, tokens, weight,
         | CAST(10000 * weight // tw AS BIGINT) AS share_bp
         |FROM w, tot ORDER BY lang""".stripMargin,
    "q87_vocab_coverage" ->
      """WITH ex AS (
         | SELECT unnest(string_split(text, ' ')) AS token FROM documents),
         |v AS (SELECT token, count(*) AS n FROM ex GROUP BY token),
         |tot AS (SELECT SUM(n) AS total FROM v),
         |h AS (SELECT token, n,
         |  row_number() OVER (ORDER BY n DESC, token) AS rank
         | FROM v QUALIFY rank <= 50)
         |SELECT rank, token, n,
         | CAST(10000 * (SUM(n) OVER (ORDER BY rank)) // total AS BIGINT) AS cum_bp
         |FROM h, tot ORDER BY rank""".stripMargin,
    "q88_exact_sample" ->
      """SELECT doc_id, source FROM (
         | SELECT doc_id, source FROM documents
         | ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 40) s
         |ORDER BY doc_id""".stripMargin,
    "q89_drop_top_groups" ->
      """WITH g AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         |b AS (SELECT lang FROM g ORDER BY n DESC, lang LIMIT 2)
         |SELECT doc_id, lang,
         | (lang IN (SELECT lang FROM b)) AS blocked
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q84_truncate_budget" ->
      """WITH b AS (
         | SELECT doc_id, text, string_split(text, ' ') AS tk
         | FROM documents),
         |k AS (
         | SELECT doc_id, text,
         |  CAST(len(tk) AS BIGINT) AS n_tokens,
         |  len(tk) > 24 AS truncated,
         |  array_to_string(tk[1:24], ' ') AS kept
         | FROM b),
         |c AS (
         | SELECT doc_id, text, n_tokens, truncated, kept,
         |  CASE WHEN strpos(reverse(kept), '.') > 0
         |   THEN length(kept) - strpos(reverse(kept), '.') + 1
         |   ELSE 0 END AS cut
         | FROM k)
         |SELECT doc_id, n_tokens, truncated,
         | CASE WHEN NOT truncated THEN text
         |  WHEN cut > 0 THEN substr(kept, 1, cut)
         |  ELSE kept END AS clean_text
         |FROM c ORDER BY doc_id""".stripMargin,
    "q81_dedup_lines_in_doc" ->
      s"""WITH l AS (
         | SELECT doc_id, string_split($linesSqlExpr, chr(10)) AS ls
         | FROM documents),
         |k AS (
         | SELECT doc_id, ls,
         |  list_filter(ls, (x, i) -> list_position(ls, x) = i) AS kept
         | FROM l)
         |SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines,
         | CAST(len(kept) AS BIGINT) AS n_kept,
         | array_to_string(kept, chr(10)) AS clean_text
         |FROM k ORDER BY doc_id""".stripMargin,
    "q76_dup_lines" ->
      s"""WITH l AS (
         | SELECT doc_id, string_split($linesSqlExpr, chr(10)) AS ls
         | FROM documents),
         |c AS (
         | SELECT doc_id, ls,
         |  list_sum(list_transform(ls, x -> length(x))) AS total,
         |  list_sum(list_transform(list_distinct(ls), x -> length(x))) AS firsts
         | FROM l)
         |SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines,
         | 1 - CAST(len(list_distinct(ls)) AS DOUBLE) / CAST(len(ls) AS DOUBLE)
         |  AS dup_line_frac,
         | CASE WHEN total > 0 THEN
         |   CAST(total - firsts AS DOUBLE) / CAST(total AS DOUBLE)
         |  ELSE 0.0 END AS dup_line_char_frac
         |FROM c ORDER BY doc_id""".stripMargin,
    "q69_c4_filter" ->
      s"""WITH l AS (
         | SELECT doc_id, string_split($linesSqlExpr, chr(10)) AS ls
         | FROM documents),
         |f AS (
         | SELECT doc_id, ls,
         |  list_filter(ls, x -> len(string_split(x, ' ')) >= 10
         |   AND NOT contains(x, 'slow')) AS kept
         | FROM l)
         |SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines,
         | CAST(len(kept) AS BIGINT) AS n_kept,
         | COALESCE(array_to_string(kept, chr(10)), '') AS clean_text,
         | len(kept) >= 2 AS keep_doc
         |FROM f ORDER BY doc_id""".stripMargin,
    "q70_bpe_pairs" ->
      """WITH w AS (
        | SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        |p AS (
        | SELECT substr(word, i, 2) AS pair
        | FROM w, unnest(generate_series(1, length(word) - 1)) t(i)
        | WHERE length(word) >= 2)
        |SELECT pair, CAST(count(*) AS BIGINT) AS n
        |FROM p GROUP BY pair
        |ORDER BY n DESC, pair LIMIT 20""".stripMargin,
    "q71_url_canon" ->
      s"""WITH raw AS (
         | SELECT doc_id, $rawUrlSql AS url FROM documents),
         |s1 AS (
         | SELECT doc_id,
         |  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
         |  regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://', '') AS rest
         | FROM raw),
         |s2 AS (
         | SELECT doc_id, scheme, rest,
         |  regexp_extract(rest, '^[^/?#]*', 0) AS hostraw FROM s1),
         |s3 AS (
         | SELECT doc_id, scheme,
         |  regexp_replace(regexp_replace(lower(hostraw), '^www\\.', ''),
         |   ':(80|443)$$', '') AS host,
         |  substr(rest, length(hostraw) + 1) AS pathq FROM s2),
         |s4 AS (
         | SELECT doc_id, scheme, host,
         |  regexp_replace(regexp_replace(
         |   regexp_extract(pathq, '^[^?#]*', 0), '/+', '/', 'g'),
         |   '/\\./', '/', 'g') AS p1,
         |  regexp_extract(pathq, '\\?([^#]*)', 1) AS q0 FROM s3),
         |s5 AS (
         | SELECT doc_id, scheme, host,
         |  CASE WHEN regexp_replace(p1, '/$$', '') = '' THEN '/'
         |   ELSE regexp_replace(p1, '/$$', '') END AS path,
         |  array_to_string(list_sort(list_filter(string_split(q0, '&'),
         |   x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&') AS qs
         | FROM s4)
         |SELECT doc_id,
         | scheme || '://' || host || path ||
         |  CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS canon_url,
         | row_number() OVER (
         |  PARTITION BY scheme || '://' || host || path ||
         |   CASE WHEN qs = '' THEN '' ELSE '?' || qs END
         |  ORDER BY doc_id) = 1 AS keep
         |FROM s5 ORDER BY doc_id""".stripMargin,
    "q72_split" ->
      s"""SELECT doc_id, $q72SplitSql AS "split"
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q73_line_dedup" ->
      s"""WITH l AS (
         | SELECT doc_id, string_split($linesSqlExpr, chr(10)) AS ls
         | FROM documents),
         |ex AS (
         | SELECT doc_id, i - 1 AS ix, ls[i] AS line
         | FROM l, unnest(generate_series(1, len(ls))) t(i)),
         |mk AS (
         | SELECT doc_id, ix, line,
         |  row_number() OVER (PARTITION BY line ORDER BY doc_id, ix) AS rk
         | FROM ex)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
         | CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         | COALESCE(array_to_string(list(line ORDER BY ix) FILTER (WHERE rk = 1),
         |  chr(10)), '') AS clean_text
         |FROM mk GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q74_shuffle" ->
      """SELECT doc_id,
        | CAST(row_number() OVER (
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT)
        |  AS shuffle_rank
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q151_source_similarity" ->
      """WITH fps AS (
        | SELECT DISTINCT source AS src,
        |  md5(array_to_string(list_sort(list_distinct(string_split(text,' '))),' ')) AS fp
        | FROM documents),
        |cnt AS (SELECT src, CAST(count(*) AS BIGINT) AS n FROM fps GROUP BY src),
        |inter AS (
        | SELECT a.src AS src_a, b.src AS src_b, CAST(count(*) AS BIGINT) AS n_inter
        | FROM fps a JOIN fps b ON a.fp = b.fp AND a.src < b.src
        | GROUP BY 1, 2)
        |SELECT ca.src AS src_a, cb.src AS src_b, ca.n AS n_a, cb.n AS n_b,
        | COALESCE(i.n_inter, 0) AS n_inter,
        | CAST(COALESCE(i.n_inter, 0) * 10000 // (ca.n + cb.n - COALESCE(i.n_inter, 0)) AS BIGINT)
        |  AS jaccard_bp
        |FROM cnt ca JOIN cnt cb ON ca.src < cb.src
        |LEFT JOIN inter i ON i.src_a = ca.src AND i.src_b = cb.src
        |ORDER BY src_a, src_b""".stripMargin,
    "q152_cluster_safe_split" ->
      s"""WITH c AS (
         | SELECT doc_id,
         |  min(doc_id) OVER (PARTITION BY md5(text)) AS canon_id
         | FROM documents)
         |SELECT doc_id, canon_id, ${splitCaseSql("canon_id")} AS "split"
         |FROM c ORDER BY doc_id""".stripMargin,
    "q153_dedup_impact" ->
      """WITH cl AS (
        | SELECT source,
        |  md5(array_to_string(list_sort(list_distinct(string_split(text,' '))),' ')) AS fp,
        |  CAST(count(*) AS BIGINT) AS copies,
        |  CAST(min(strlen(text)) AS BIGINT) AS blen
        | FROM documents GROUP BY 1, 2)
        |SELECT source, CAST(sum(copies) AS BIGINT) AS n_docs,
        | CAST(count(*) AS BIGINT) AS n_clusters,
        | CAST(sum(copies) - count(*) AS BIGINT) AS dup_docs,
        | CAST(sum(copies * blen) AS BIGINT) AS bytes_total,
        | CAST(sum((copies - 1) * blen) AS BIGINT) AS bytes_saved
        |FROM cl GROUP BY source ORDER BY source""".stripMargin,
    "q154_script_profile" ->
      """WITH c AS (
        | SELECT lang, length(text) AS n,
        |  length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS lat,
        |  length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS dig,
        |  length(text) - length(regexp_replace(text, '[ ]', '', 'g')) AS spc
        | FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n) AS BIGINT) AS n_chars,
        | CAST(sum(lat) * 10000 // sum(n) AS BIGINT) AS latin_bp,
        | CAST(sum(dig) * 10000 // sum(n) AS BIGINT) AS digit_bp,
        | CAST(sum(spc) * 10000 // sum(n) AS BIGINT) AS space_bp,
        | CAST((sum(n) - sum(lat) - sum(dig) - sum(spc)) * 10000 // sum(n) AS BIGINT)
        |  AS other_bp
        |FROM c GROUP BY lang ORDER BY lang""".stripMargin)
}
