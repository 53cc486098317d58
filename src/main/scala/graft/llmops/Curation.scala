package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Web-corpus curation operators for training-data pipelines: C4-style
  * line filtering (Raffel et al. 2020 §2.2), corpus-wide exact line
  * dedup (MassiveText, Rae et al. 2021 §A1.2), URL canonicalization +
  * dedup (the Common-Crawl pre-dedup key), deterministic hash splits,
  * BPE merge-pair statistics (Sennrich et al. 2016), and a deterministic
  * global corpus shuffle.
  *
  * Everything is either a pure codegen'd Column projection or the
  * canonical word-count/shuffle shape — no UDFs, no driver loops, and
  * regex/hash primitives chosen to mean the same thing in Java regex and
  * RE2-style engines so an external SQL oracle can replicate them.
  */
object Curation {

  private def quoted(sep: String): String = java.util.regex.Pattern.quote(sep)

  // ------------------------------------------------------- C4 line filter

  /** C4-style line filtering: split each document into lines, keep lines
    * with at least `minWords` whitespace words and none of the
    * `badSubstrings`, re-join survivors, and gate the document on a
    * minimum surviving-line count. A pure projection — the corpus never
    * shuffles, and the per-line work is array lambdas inside whole-stage
    * codegen.
    *
    * Output: (id, n_lines, n_kept, clean_text, keep_doc). */
  def c4LineFilter(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n", minWords: Int = 5,
      badSubstrings: scala.Seq[String] = scala.Seq("lorem ipsum", "javascript", "{"),
      minKeptLines: Int = 3): DataFrame = {
    // null text → zero lines (size(null) is -1 with ANSI off; never let
    // that reach the counts)
    val lines = when(col(textCol).isNull,
        array().cast(ArrayType(StringType)))
      .otherwise(split(col(textCol), quoted(sep)))
    val kept = filter(lines, l =>
      badSubstrings.foldLeft(size(split(l, " ")) >= minWords) {
        (acc, b) => acc && !l.contains(b)
      })
    df.select(col(idCol).as("id"), lines.as("_ls"), kept.as("_kept"))
      .select(col("id"),
        size(col("_ls")).cast(LongType).as("n_lines"),
        size(col("_kept")).cast(LongType).as("n_kept"),
        array_join(col("_kept"), sep).as("clean_text"),
        (size(col("_kept")) >= minKeptLines).as("keep_doc"))
  }

  // ------------------------------------------- corpus-wide exact line dedup

  /** Corpus-wide exact line deduplication (the MassiveText boilerplate
    * scrub): every duplicate occurrence of a line across the WHOLE corpus
    * is removed, keeping only the first (lowest id, then line index).
    * Documents are re-assembled from their surviving lines in original
    * order.
    *
    * Scale: one explode keyed by line, one window partitioned by line
    * (high-cardinality — no global window), one re-agg by doc. The
    * line-keyed shuffle is the irreducible cost of a global-first-wins
    * rule; skew from ultra-hot lines is bounded because the window only
    * computes row_number (no buffering beyond the sort run).
    *
    * Output: (id, n_lines, n_removed, clean_text). */
  def lineDedupGlobal(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame = {
    // posexplode_outer keeps null-text docs in the output (as zero lines)
    val ex = df.select(col(idCol).as("id"),
      posexplode_outer(split(col(textCol), quoted(sep)))
        .as(scala.Seq("ix", "line")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("line")).orderBy(col("id"), col("ix"))
    ex.withColumn("_rk", row_number().over(w))
      .groupBy(col("id"))
      .agg(count(col("line")).as("n_lines"),
        sum(when(col("line").isNotNull && col("_rk") > 1, 1L).otherwise(0L))
          .as("n_removed"),
        array_join(
          transform(
            array_sort(collect_list(when(
              col("line").isNotNull && col("_rk") === 1,
              struct(col("ix"), col("line"))))),
            x => x.getField("line")),
          sep).as("clean_text"))
  }

  /** Boilerplate-line scrub by document frequency — the C4/RefinedWeb
    * rule complementing [[lineDedupGlobal]] (first-wins): a line seen in
    * `minDf` OR MORE DISTINCT documents is boilerplate (nav chrome,
    * cookie banners, license headers) and every occurrence is dropped;
    * lines below the threshold keep all their occurrences, duplicates
    * included.
    *
    * Scale: explode → distinct (id, line) → line-keyed count → equi-join
    * back → per-doc re-agg. Two line-keyed shuffles, partial aggs
    * map-side; the join is a plain hash equi-join (the line-frequency
    * relation is corpus-sized, not broadcastable — and doesn't need to
    * be).
    * Output: (id, n_lines, n_scrubbed, clean_text). */
  def scrubBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
      minDf: Int, sep: String = "\n"): DataFrame = {
    require(minDf >= 2, s"minDf must be at least 2, got $minDf")
    val ex = df.select(col(idCol).as("id"),
      posexplode_outer(split(col(textCol), quoted(sep)))
        .as(scala.Seq("ix", "line")))
    val lineDf = ex.filter(col("line").isNotNull)
      .select(col("line"), col("id")).distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("_df"))
    ex.join(lineDf, scala.Seq("line"), "left")
      .groupBy(col("id"))
      .agg(count(col("line")).as("n_lines"),
        sum(when(col("_df") >= minDf, 1L).otherwise(0L)).as("n_scrubbed"),
        array_join(
          transform(
            array_sort(collect_list(when(
              col("line").isNotNull && (col("_df") < minDf),
              struct(col("ix"), col("line"))))),
            x => x.getField("line")),
          sep).as("clean_text"))
  }

  // ---------------------------------------------------- URL canonicalization

  /** Canonicalize an absolute URL for dedup keying: lowercase scheme and
    * host, strip a leading `www.`, drop default ports (:80/:443), collapse
    * repeated slashes, resolve one level of `/./`, drop the trailing
    * slash (root stays `/`), drop the fragment, and drop `utm_*` tracking
    * params while sorting the rest.
    *
    * One chain of regexp/array primitives with identical semantics in
    * Java regex and RE2 (no backreferences or lookarounds), so a SQL
    * oracle replicates it verbatim. Nested `/./` deeper than one level is
    * intentionally NOT iterated (single regex pass, same in both engines). */
  def canonicalizeUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.\\-]*)://", 1))
    val rest = regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.\\-]*://", "")
    val hostRaw = regexp_extract(rest, "^[^/?#]*", 0)
    val host = regexp_replace(
      regexp_replace(lower(hostRaw), "^www\\.", ""), ":(80|443)$", "")
    val pathq = rest.substr(length(hostRaw) + 1, length(rest))
    val path0 = regexp_extract(pathq, "^[^?#]*", 0)
    val path1 = regexp_replace(regexp_replace(path0, "/+", "/"), "/\\./", "/")
    val path2 = regexp_replace(path1, "/$", "")
    val path = when(path2 === "", lit("/")).otherwise(path2)
    val q0 = regexp_extract(pathq, "\\?([^#]*)", 1)
    val params = filter(split(q0, "&"),
      p => p =!= "" && !p.startsWith("utm_"))
    val qs = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }

  /** URL dedup: canonicalize `urlCol`, keep the lowest-`idCol` row per
    * canonical URL. Output: input columns + (canon_url, keep). The window
    * partitions by canonical URL — high cardinality, never global. */
  def dedupByCanonicalUrl(df: DataFrame, idCol: String,
      urlCol: String): DataFrame = {
    val canon = df.withColumn("canon_url", canonicalizeUrl(col(urlCol)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("canon_url")).orderBy(col(idCol))
    canon.withColumn("keep", row_number().over(w) === 1)
  }

  // -------------------------------------------------- deterministic splits

  /** Cumulative md5-bucket thresholds (4 hex chars = 65536 buckets) for
    * [[hashSplit]] — public so oracle SQL can embed the same literals. */
  def splitThresholds(splits: scala.Seq[(String, Double)]): scala.Seq[String] = {
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    splits.map(_._2).scanLeft(0.0)(_ + _).tail.dropRight(1)
      .map(p => f"${math.floor(p * 65536).toLong}%04x")
  }

  /** Deterministic train/val/test split: rows are assigned to the named
    * split by their md5(id) prefix bucket — reproducible across runs,
    * engines, and data orderings (the hash_sample contract), and pure
    * projection (no shuffle, no RNG state). */
  def hashSplit(df: DataFrame, idCol: String,
      splits: scala.Seq[(String, Double)], out: String = "split"): DataFrame = {
    val h = substring(md5(col(idCol).cast("string")), 1, 4)
    val cuts = splitThresholds(splits)
    val assigned = splits.init.zip(cuts).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, ((name, _), cut)) =>
        when(h < lit(cut), name).otherwise(acc)
      }
    df.withColumn(out, assigned)
  }

  // ------------------------------------------------ BPE merge-pair counts

  /** One BPE merge-step statistic: corpus-wide counts of adjacent
    * character pairs inside whitespace words (Sennrich et al. 2016 — the
    * argmax pair is the next merge). The canonical word-count shape:
    * explode to pairs, map-side-combined groupBy; the shuffle carries one
    * row per distinct pair per partition, never the character stream.
    *
    * Output: (pair, n), top `k` by count (ties → pair ascending). */
  def bpePairCounts(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val words = df.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) >= 2)
    words
      .select(explode(transform(
        sequence(lit(1), length(col("word")) - 1),
        i => col("word").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)
  }

  /** Deterministic exact-k corpus sample: the k rows with the smallest
    * (md5(key), key) — the reservoir-sample replacement that is
    * reproducible across runs, engines, and input orderings. Plan shape:
    * `TakeOrderedAndProject` — each partition keeps its own top-k and
    * only k·partitions candidate rows ever move, so there is no full
    * sort and no global window at any scale. */
  def sampleExactK(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    df.withColumn("_h", md5(col(keyCol).cast(StringType)))
      .orderBy(col("_h"), col(keyCol))
      .limit(k)
      .drop("_h")
  }

  /** Over-represented-group scrub (the "drop the head domains" curation
    * step — the hard-filter complement of [[Training.capPerGroup]]):
    * derive the blocklist as the `k` largest groups by row count (count
    * desc, group asc — deterministic) and drop every row belonging to
    * them. The blocklist is k rows, so the anti-join broadcasts; the
    * corpus itself never shuffles.
    * Output: input columns + `blocked` flag (callers filter or audit). */
  def dropTopGroups(df: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k > 0, s"blocklist size must be positive, got $k")
    val top = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
      .orderBy(col("_n").desc, col(groupCol)).limit(k)
      .select(col(groupCol).as("_blocked_g"))
    df.join(broadcast(top), col(groupCol) === col("_blocked_g"), "left")
      .withColumn("blocked", col("_blocked_g").isNotNull)
      .drop("_blocked_g")
  }

  /** Group-interleaved training order (curriculum mixing): rows are
    * ranked within their group by (md5, key) — a deterministic
    * pseudo-random order — and the global order is (within-group rank,
    * group), so consecutive training rows cycle through the groups
    * round-robin instead of clustering one source. The within-group
    * window distributes across groups; the total order uses the
    * partitioned two-pass assignment (no global window).
    * Output: input columns + (grp_rank, train_rank). */
  def interleaveGroups(df: DataFrame, groupCol: String,
      keyCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast(StringType)), col(keyCol))
    val ranked = df.withColumn("grp_rank",
      row_number().over(w).cast(LongType))
    graft.model.Envelope.withGlobalSeq(ranked,
      scala.Seq(col("grp_rank"), col(groupCol), col(keyCol)), "train_rank")
  }

  // --------------------------------------------- deterministic global shuffle

  /** Deterministic global training-order shuffle: rank every row by
    * md5(id) (ties → id). Uses the partitioned two-pass sequence
    * assignment ([[graft.model.Envelope.withGlobalSeq]]: range shuffle +
    * zipWithIndex) — a total order WITHOUT a single-partition window, so
    * it holds at any scale. Reproducible across runs and engines. */
  def deterministicShuffle(df: DataFrame, idCol: String,
      out: String = "shuffle_rank"): DataFrame =
    graft.model.Envelope.withGlobalSeq(df,
      scala.Seq(md5(col(idCol).cast("string")), col(idCol)), out)

  /** Token-budget truncation with sentence awareness — the
    * context-length trim step before packing: documents over
    * `maxTokens` whitespace tokens are cut to the first `maxTokens`
    * tokens, then backed off to the last sentence end ('.') inside
    * that window when one exists (so training text doesn't end
    * mid-sentence). Pure per-row string/array arithmetic — zero
    * shuffle, bit-exact across engines.
    * Output: (id, n_tokens, truncated, clean_text). */
  def truncateToBudget(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    df.select(col(idCol).as("id"), col(textCol).as("_t"))
      .withColumn("n_tokens",
        size(split(col("_t"), " ")).cast(LongType))
      .withColumn("truncated", col("n_tokens") > maxTokens)
      .select(col("id"), col("n_tokens"), col("truncated"),
        truncatedTextCol(col("_t"), maxTokens).as("clean_text"))
  }

  /** The [[truncateToBudget]] kernel as a single Column (shared with the
    * `truncate_budget` stream processor): text over the token budget is
    * cut to the first `maxTokens` whitespace tokens, backed off to the
    * last '.' inside the window when one exists. */
  def truncatedTextCol(text: Column, maxTokens: Int): Column = {
    val tk = split(text, " ")
    val kept = array_join(slice(tk, 1, maxTokens), " ")
    // 1-based position of the last '.' in the kept window (0 = none)
    val cut = when(instr(reverse(kept), ".") > 0,
      length(kept) - instr(reverse(kept), ".") + 1).otherwise(lit(0))
    when(size(tk) <= maxTokens, text)
      .when(cut > 0, kept.substr(lit(1), cut))
      .otherwise(kept)
  }

  /** Stratified exact-fraction split: within every group (source,
    * language, …) rows are ranked by (md5(id), id) — a deterministic
    * pseudo-random order — and the first `floor(group_n · valFracBp /
    * 10000)` become the held-out split. Unlike [[hashSplit]] (globally
    * unbiased but only approximately sized per stratum), this guarantees
    * the per-group fraction exactly — the eval-set construction that
    * keeps small sources represented.
    *
    * Scale: one window partitioned BY GROUP (distributes across
    * executors; no global window) plus a broadcastable group-size
    * aggregate. Output: (id, group, grp_n, grp_rank, split). */
  def stratifiedExactSplit(df: DataFrame, idCol: String, groupCol: String,
      valFracBp: Int, valName: String = "val",
      trainName: String = "train"): DataFrame = {
    require(valFracBp >= 0 && valFracBp <= 10000,
      s"valFracBp must be in [0, 10000], got $valFracBp")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col("id").cast(StringType)), col("id"))
    val sizes = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("grp_n"))
    df.select(col(idCol).as("id"), col(groupCol))
      .withColumn("grp_rank", row_number().over(w).cast(LongType))
      .join(broadcast(sizes), groupCol)
      .select(col("id"), col(groupCol), col("grp_n"), col("grp_rank"),
        when(col("grp_rank") <= expr(s"grp_n * $valFracBp div 10000"),
          valName).otherwise(trainName).as("split"))
  }

  /** Recency-decay sampling weights (freshness weighting for a corpus
    * with a time axis): a row's weight halves every `halflifeDays`
    * relative to the newest row in the corpus. Integer-exact basis
    * points — `10000 div 2^halflives` with the shift capped so the
    * weight floors at 1 bp — so an external oracle matches
    * bit-for-bit; age is calendar-day difference (both engines count
    * day boundaries).
    *
    * Scale: the corpus max timestamp is a 1-row aggregate broadcast to
    * a pure projection — no shuffle of the data itself.
    * Output: (id, age_days, halflives, weight_bp). */
  def recencyWeights(df: DataFrame, idCol: String, tsCol: Column,
      halflifeDays: Int): DataFrame = {
    require(halflifeDays > 0, s"halflifeDays must be positive, got $halflifeDays")
    val asOf = df.agg(max(tsCol).as("_as_of"))
    df.select(col(idCol).as("id"), tsCol.as("_ts"))
      .crossJoin(broadcast(asOf))
      .select(col("id"),
        datediff(col("_as_of").cast(DateType), col("_ts").cast(DateType))
          .cast(LongType).as("age_days"))
      .select(col("id"), col("age_days"),
        expr(s"age_days div $halflifeDays").as("halflives"))
      .withColumn("weight_bp",
        expr("10000 div shiftleft(cast(1 as bigint), cast(least(halflives, 13) as int))"))
  }

  /** Within-document duplicate-line removal — the repetition SCRUB that
    * complements the Gopher dup-line FLAGS (dupLineFrac/q76): keep each
    * line's first occurrence, preserve order, rejoin on the separator.
    *
    * Pure per-row array kernel: zero shuffle at any corpus size. The
    * first-occurrence scan (`array_position` per element) is quadratic
    * in LINES PER DOCUMENT, not corpus size — bounded work per row.
    * Output: (id, n_lines, n_kept, clean_text). */
  def dedupLinesInDoc(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      split(col(textCol), quoted(sep)).as("_ls"))
    val kept = filter(col("_ls"),
      (x, i) => array_position(col("_ls"), x) === (i + 1).cast(LongType))
    base
      .withColumn("_kept", kept)
      .select(col("id"),
        size(col("_ls")).cast(LongType).as("n_lines"),
        size(col("_kept")).cast(LongType).as("n_kept"),
        array_join(col("_kept"), sep).as("clean_text"))
  }

  /** Dataset version diff — the incremental-curation primitive: given
    * two snapshots keyed by `idCol` with a content fingerprint, classify
    * every id as added / removed / changed / unchanged. One full outer
    * equi-join on the id (co-partitioned shuffle); fingerprints compare
    * as md5 strings so no text ships through the join. At 100 TB this is
    * the shape dataset versioning tools run between releases. */
  def datasetDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("id"),
      md5(col(textCol).cast(BinaryType)).as("old_fp"))
    val n = newDf.select(col(idCol).as("id"),
      md5(col(textCol).cast(BinaryType)).as("new_fp"))
    o.join(n, scala.Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("old_fp").isNull, "added")
          .when(col("new_fp").isNull, "removed")
          .when(col("old_fp") =!= col("new_fp"), "changed")
          .otherwise("unchanged").as("status"),
        col("old_fp"), col("new_fp"))
  }

  /** Leakage-safe train/val/test split: the split key is the exact-dup
    * cluster canonical id (min member id per content fingerprint), not the
    * document id — so byte-identical copies can never straddle train and
    * eval (the classic contamination-by-split bug hashSplit alone permits).
    *
    * One window min over the content fingerprint (high-cardinality
    * partition key — scales), then the same deterministic md5-bucket
    * assignment as [[hashSplit]] applied to the canonical id.
    *
    * Output: input columns + `canon_id` + `split`. */
  def clusterSafeSplit(df: DataFrame, idCol: String, textCol: String,
      splits: scala.Seq[(String, Double)], out: String = "split"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col(textCol).cast(BinaryType)))
    val withCanon = df.withColumn("canon_id", min(col(idCol)).over(w))
    val h = substring(md5(col("canon_id").cast("string")), 1, 4)
    val cuts = splitThresholds(splits)
    val assigned = splits.init.zip(cuts).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, ((name, _), cut)) =>
        when(h < lit(cut), name).otherwise(acc)
      }
    withCanon.withColumn(out, assigned)
  }
}
