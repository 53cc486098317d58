package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, MapType, StringType}
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

  /** Deterministic output order established BELOW the heavy processor
    * projection (r11, guide §7.2/§2.4): the old shape ended in
    * `.select(heavy…).orderBy(derivedKey)`, so the final range exchange
    * sat ABOVE the jq/mapping projection and its range-bound SAMPLING
    * job re-evaluated the whole processor expression — QProf measured
    * the full jq tree running twice per action (q178: two ~10 s-cpu
    * jobs reading the same exchange). Sorting the envelope by `seq`
    * (the wrap key's dense order — identical total order to the old
    * pass-through sort key) BEFORE the processor keeps row order
    * byte-identical while the sampling pass re-runs only the cheap
    * envelope chain.
    *
    * repartitionByRange + sortWithinPartitions (NOT orderBy): a plain
    * global sort's exchange is ENSURE_REQUIREMENTS, which AQE coalesces
    * by BYTES — these envelopes are small, so the whole downstream
    * CPU-dense processor collapsed onto ONE task (q178 measured 5.3 s
    * serial vs ~0.4 s at 32 partitions). The explicit partition count
    * (REPARTITION_BY_NUM, from spark.sql.shuffle.partitions, so it
    * scales with the session) keeps the processor parallel; total order
    * is unchanged (range partitions in partition-index order, sorted
    * within). */
  private def seqSorted(env: DataFrame): DataFrame = {
    val parts =
      env.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    env.repartitionByRange(parts, col(graft.model.Envelope.Seq))
      .sortWithinPartitions(col(graft.model.Envelope.Seq))
  }

  /** [[seqSorted]] for plain (un-wrapped) inputs: total order on the given
    * pass-through key columns, established below the mapping projection.
    *
    * Plain `orderBy`, unlike seqSorted's explicit repartition: these
    * inputs come from [[graft.Tables.t]], whose small-input parallelize
    * already range-partitions and sorts by the leading key — an explicit
    * repartitionByRange DOUBLED the exchange (the bench plan tripwire
    * flagged exchanges 1→2 on q10-q12). orderBy below the projection is
    * satisfied by the existing partitioning locally (no new exchange, the
    * redundant sort is eliminated) and stays a real global sort on big
    * inputs where parallelize never fires — where the exchange is also
    * big enough that AQE cannot coalesce the projection serial. */
  private def keySorted(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame =
    df.orderBy(keys: _*)

  /** Projection + derived fields + deleted()-filter over lineitem. */
  def q10(s: SparkSession, dir: String): DataFrame = {
    val m = Mapping.compile(
      """root.orderkey = this.l_orderkey
        |root.linenumber = this.l_linenumber
        |root.revenue = this.l_extendedprice * (1 - this.l_discount)
        |root.flag = this.l_returnflag.lowercase()
        |root.ship_month = this.l_shipdate.format_timestamp("2006-01")
        |root = if this.l_quantity < 10 { deleted() }""".stripMargin)
    // sort on the pass-through raw keys BELOW the mapping projection —
    // identical row order (orderkey/linenumber are l_orderkey/l_linenumber
    // verbatim), and the range-sampling pass no longer re-runs the mapping
    // (keySorted keeps the mapping parallel — see seqSorted)
    m.applyPlain(keySorted(t(s, dir, "lineitem"),
      col("l_orderkey"), col("l_linenumber")))
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
    m.applyPlain(keySorted(t(s, dir, "events"), col("event_id")))
  }

  /** Text-shaping methods over documents. */
  def q12(s: SparkSession, dir: String): DataFrame = {
    val m = Mapping.compile(
      """root.doc_id = this.doc_id
        |root.lang_uc = this.lang.uppercase()
        |root.n_words = this.text.split(" ").length()
        |root.head = this.text.slice(0, 30)
        |root.tagged = this.source + ":" + this.lang""".stripMargin)
    m.applyPlain(keySorted(t(s, dir, "documents"), col("doc_id")))
  }

  /** q161: the jq processor under an oracle — object construction,
    * `reduce g as $x (init; upd)` folding, `limit(n; g)` over a
    * collected generator, `group_by`, pipe stages, the round-6
    * update-assignments (`|=` with `.` = path value, `+=` with the root
    * on the right), and the late-round-6 tail (`@csv`/`@base64` format
    * strings, `strftime` on an epoch, `first(g)`, `any(f)`), all
    * compiled through the jq→Bloblang→Catalyst path (`blobl.Jq`) and
    * replayed by DuckDB's list functions. */
  def q161(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("words"))
    val env = seqSorted(graft.model.Envelope.wrap(docs, scala.Seq(col("doc_id"))))
    val out = graft.blobl.JqProc(
      """{id: .doc_id,
        | n_words: (.words | length),
        | total_chars: (reduce .words[] as $w (0; . + ($w | length))),
        | first3: (limit(3; .words[]) | join("-")),
        | n_len_groups: (.words | group_by(length) | length),
        | sub1: (.words | join(" ") | sub("[aeiou]"; "_")),
        | a_ix: (.words | join(" ") | index("a")),
        | n_vparts: (.words | join(" ") | splits("[aeiou]+") | length),
        | csv3: (limit(3; .words[]) | @csv),
        | b64: (first(.words[]) | @base64),
        | day: (.doc_id * 86400 | strftime("%Y-%m-%d")),
        | n_dbl: ([.doc_id + 2 | recurse(. * 2; . < 500)] | length),
        | n_scan: ([.words | join(" ") | scan("[a-z]+")] | length),
        | until3: (.doc_id + 2 | until(. > 999; . * 3)),
        | n_leafp: ([leaf_paths] | length),
        | sum_lens: ([.words[] | length] | add),
        | up3: ([limit(3; .words[]) | ascii_upcase] | join("-")),
        | any_an: (.words | any(test("an")))}
        || .n_words |= . * 10
        || .total_chars += .n_words""".stripMargin)(env)
    out.select(col("doc.id").as("doc_id"),
        col("doc.n_words").cast(org.apache.spark.sql.types.LongType).as("n_words"),
        col("doc.total_chars").cast(org.apache.spark.sql.types.LongType).as("total_chars"),
        col("doc.first3").as("first3"),
        col("doc.n_len_groups").cast(org.apache.spark.sql.types.LongType).as("n_len_groups"),
        col("doc.sub1").as("sub1"),
        col("doc.a_ix").cast(org.apache.spark.sql.types.LongType).as("a_ix"),
        col("doc.n_vparts").cast(org.apache.spark.sql.types.LongType).as("n_vparts"),
        col("doc.csv3").as("csv3"),
        col("doc.b64").as("b64"),
        col("doc.day").as("day"),
        col("doc.n_dbl").cast(org.apache.spark.sql.types.LongType).as("n_dbl"),
        col("doc.n_scan").cast(org.apache.spark.sql.types.LongType).as("n_scan"),
        col("doc.until3").cast(org.apache.spark.sql.types.LongType).as("until3"),
        col("doc.n_leafp").cast(org.apache.spark.sql.types.LongType).as("n_leafp"),
        col("doc.sum_lens").cast(org.apache.spark.sql.types.LongType).as("sum_lens"),
        col("doc.up3").as("up3"),
        col("doc.any_an").cast(org.apache.spark.sql.types.BooleanType).as("any_an"))
  }

  /** q173: the RUNTIME variant walk under an oracle — a per-row JSON
    * document (id + first-3-words array + nested meta object) is parsed
    * to a VARIANT and jq's `..` / `paths` / `paths(numbers)` /
    * `leaf_paths` walk it at runtime (the static schema walk can't see
    * inside a variant). The counts are pure structure arithmetic the
    * oracle replays from the word count: nv = 5 + min(3, n_words)
    * (root, id, the w3 array + its elements, m, m.n), np = nv − 1,
    * nnum = 2 (id, m.n), nleaf = 2 + min(3, n_words). */
  def q173(s: SparkSession, dir: String): DataFrame = {
    import graft.model.Envelope
    val docs = t(s, dir, "documents")
    val jsonCol = to_json(struct(
      col("doc_id").as("id"),
      slice(split(col("text"), " "), 1, 3).as("w3"),
      struct(length(col("text")).as("n")).as("m")))
    val env = docs.select(
      jsonCol.cast(BinaryType).as(Envelope.Content),
      try_parse_json(jsonCol).as(Envelope.Doc),
      map().cast(MapType(StringType, StringType)).as(Envelope.Meta),
      lit(null).cast(StringType).as(Envelope.Error),
      lit(0L).as(Envelope.BatchId),
      col("doc_id").as(Envelope.Seq))
    val out = graft.blobl.JqProc(
      """{nv: ([..] | length),
        | np: ([paths] | length),
        | nnum: ([paths(numbers)] | length),
        | nleaf: ([leaf_paths] | length)}""".stripMargin)(seqSorted(env))
    out.select(col(Envelope.Seq).as("doc_id"),
        col("doc.nv").cast(LongType).as("nv"),
        col("doc.np").cast(LongType).as("np"),
        col("doc.nnum").cast(LongType).as("nnum"),
        col("doc.nleaf").cast(LongType).as("nleaf"))
  }

  /** q184: the jq streaming trio under an oracle — `tostream` events
    * (leaf `[path, v]` + closing `[path]` markers, a RUNTIME variant
    * walk: closing markers need runtime container lengths),
    * `fromstream` reconstruction (roundtrip identity probed by reading
    * `.m.n` back out), and `truncate_stream` at depth 1 (the depth-1
    * `id` leaf truncates away; `m` and `w3` reconstruct separately).
    * The oracle replays the counts as structure arithmetic from the
    * word count, like q173. */
  def q184(s: SparkSession, dir: String): DataFrame = {
    import graft.model.Envelope
    val docs = t(s, dir, "documents")
    val jsonCol = to_json(struct(
      col("doc_id").as("id"),
      slice(split(col("text"), " "), 1, 3).as("w3"),
      struct(length(col("text")).as("n")).as("m")))
    val env = docs.select(
      jsonCol.cast(BinaryType).as(Envelope.Content),
      try_parse_json(jsonCol).as(Envelope.Doc),
      map().cast(MapType(StringType, StringType)).as(Envelope.Meta),
      lit(null).cast(StringType).as(Envelope.Error),
      lit(0L).as(Envelope.BatchId),
      col("doc_id").as(Envelope.Seq))
    val out = graft.blobl.JqProc(
      """. as $d |
        |{ne: ([$d | tostream] | length),
        | rn: (fromstream($d | tostream) | .m.n),
        | t0n: (fromstream(1 | truncate_stream($d | tostream)) | .[0].n),
        | t1k: (fromstream(1 | truncate_stream($d | tostream)) | .[1] | length)}""".stripMargin)(seqSorted(env))
    out.select(col(Envelope.Seq).as("doc_id"),
        col("doc.ne").cast(LongType).as("ne"),
        col("doc.rn").cast(LongType).as("rn"),
        col("doc.t0n").cast(LongType).as("t0n"),
        col("doc.t1k").cast(LongType).as("t1k"))
  }

  /** q163: the expression error channel end-to-end — parse_timestamp
    * failures are catch-able errors (not silent nulls), uncaught ones
    * flag the message `_error` while the row keeps flowing. One third of
    * the rows carry an unparseable date; the mapping recovers a caught
    * fallback AND the uncaught flag, and the oracle replays validity by
    * formula. */
  def q163(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 3 === 0, "not-a-date")
        .otherwise("2024-01-15").as("d"))
    val env = seqSorted(graft.model.Envelope.wrap(docs, scala.Seq(col("doc_id"))))
    val out = graft.ops.BloblangProc(
      """root.doc_id = this.doc_id
        |root.day = this.d.parse_timestamp("2006-01-02").format_timestamp("2006-01-02").catch("invalid")
        |root.uncaught = this.d.parse_timestamp("2006-01-02").format_timestamp("2006-01-02")
        |""".stripMargin)(env)
    out.select(col("doc.doc_id").as("doc_id"),
        col("doc.day").as("day"),
        col(graft.model.Envelope.Error).isNotNull.as("errored"))
  }

  /** q169: the jmespath processor under an oracle — multiselect-hash,
    * slice + projection, filter projection `[?expr]`, expression
    * references (`&`/`@`), negative indexes, and the function set
    * (length/join/sum/map/sort/contains/to_array), all compiled through
    * the JMESPath→Bloblang→Catalyst path (`blobl.JmesPath`) and
    * replayed by DuckDB's list functions. */
  def q169(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("words"))
    val env = seqSorted(graft.model.Envelope.wrap(docs, scala.Seq(col("doc_id"))))
    val out = graft.blobl.JmesPathProc(
      """{doc_id: doc_id,
        | n_words: length(words),
        | first3: join('-', words[0:3]),
        | n_long: length(words[?length(@) > `4`]),
        | total_chars: sum(map(&length(@), words)),
        | first_sorted: sort(words)[0],
        | last_word: words[-1],
        | has_the: contains(words, 'the'),
        | arr0: to_array(doc_id)[0]}""".stripMargin)(env)
    out.select(col("doc.doc_id").as("doc_id"),
        col("doc.n_words").cast(org.apache.spark.sql.types.LongType).as("n_words"),
        col("doc.first3").as("first3"),
        col("doc.n_long").cast(org.apache.spark.sql.types.LongType).as("n_long"),
        col("doc.total_chars").cast(org.apache.spark.sql.types.LongType).as("total_chars"),
        col("doc.first_sorted").as("first_sorted"),
        col("doc.last_word").as("last_word"),
        col("doc.has_the").cast(org.apache.spark.sql.types.BooleanType).as("has_the"),
        col("doc.arr0").cast(org.apache.spark.sql.types.LongType).as("arr0"))
  }

  /** q176: jq's row-generating forms under an oracle — a sibling ROOT
    * reference beside a bare generator ({…, b: .n} reads the
    * pre-explode row) and TWO bare generators in one constructor (jq's
    * cartesian, first varies slowest), compiled as sequential
    * sibling-preserving explodes with the elements bound as context
    * variables (r9; both were typed-error boundaries before). DuckDB
    * replays with two unnest stages. */
  def q176(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(
      col("doc_id"),
      slice(split(col("text"), " "), 1, 2).as("w2"),
      array(col("lang"), col("source")).as("tags"),
      length(col("text")).as("nchars"))
    val env = graft.model.Envelope.wrap(docs, scala.Seq(col("doc_id")))
    val out = graft.blobl.JqProc(
      "{id: .doc_id, w: .w2[], t: .tags[], n: .nchars}")(env)
    out.select(
        col("doc.id").cast(org.apache.spark.sql.types.LongType).as("id"),
        col("doc.w").as("w"),
        col("doc.t").as("t"),
        col("doc.n").cast(org.apache.spark.sql.types.LongType).as("n"))
      .orderBy(col("id"), col("w"), col("t"))
  }

  /** q177: jq processor `wrap` mode — the reference's exact PART
    * semantics (lib/processor/jq.go:231-248): the program's outputs
    * collect per part, then ZERO outputs drop the part, ONE replaces it
    * unwrapped, SEVERAL become a single array part. The program keeps
    * the ≥5-char words among each document's first two, so all three
    * arms occur across the corpus (and `wrap` also admits jq's
    * top-level stream comma, which the row-emitting default rejects).
    * DuckDB replays with list_filter + a size CASE over to_json. */
  def q177(s: SparkSession, dir: String): DataFrame = {
    import graft.model.Envelope
    val docs = t(s, dir, "documents").select(
      col("doc_id"),
      slice(split(col("text"), " "), 1, 2).as("w2"))
    val env = docs.select(
      lit(null).cast(BinaryType).as(Envelope.Content),
      struct(col("doc_id"), col("w2")).as(Envelope.Doc),
      map().cast(MapType(StringType, StringType)).as(Envelope.Meta),
      lit(null).cast(StringType).as(Envelope.Error),
      lit(0L).as(Envelope.BatchId),
      col("doc_id").as(Envelope.Seq))
    val out = graft.blobl.JqProc(".w2[] | select(length >= 5)",
      wrap = true)(env)
    out.select(col(Envelope.Seq).as("doc_id"),
        to_json(col(Envelope.Doc)).as("picks"))
      .orderBy(col("doc_id"))
  }

  /** q178: the round-9 jq builtin tail under an oracle — user `def`s
    * (inline macro expansion), `walk(f)` with static type dispatch,
    * `match` objects (string/offset/g-flag count), `indices`,
    * `explode`/`implode` codepoint round-trips, `delpaths`, `pick`
    * (jq 1.7), and `repeat(f)` under `limit` — all compiled through the
    * jq→Bloblang→Catalyst path and replayed by DuckDB string/list
    * functions. */
  def q178(s: SparkSession, dir: String): DataFrame = {
    val ws = split(col("text"), " ")
    val docs = t(s, dir, "documents").select(
      col("doc_id"),
      element_at(ws, 1).as("w1"),
      element_at(ws, 2).as("w2"),
      length(col("text")).as("nchars"),
      col("text"))
    val env = seqSorted(graft.model.Envelope.wrap(docs, scala.Seq(col("doc_id"))))
    val out = graft.blobl.JqProc(
      """def norm: ascii_downcase;
        |{id: .doc_id,
        | nrm: (.w1 | norm),
        | wob: ({a: .w1, b: {c: .w2}}
        |        | walk(if type == "string" then ascii_upcase else . end)),
        | vrun: (.w1 | match("[aeiou]+") | .string),
        | voff: (.w1 | match("[aeiou]+") | .offset),
        | nv: (.w1 | [match("[aeiou]+"; "g")] | length),
        | nsp: (.text | indices(" ") | length),
        | csr: (.w1 | explode | map(. + 1) | implode),
        | ab: ({a: .nchars, b: .doc_id, c: .w1} | delpaths([["c"]]) | .a + .b),
        | pk: ({x: {y: .doc_id}, z: .w1} | pick(.x.y) | .x.y),
        | rep: (.doc_id + 1 | [limit(5; repeat(. * 2))] | map(tonumber) | add)}""".stripMargin)(env)
    out.select(
        col("doc.id").cast(LongType).as("id"),
        col("doc.nrm").as("nrm"),
        col("doc.wob.a").as("wa"),
        col("doc.wob.b.c").as("wc"),
        col("doc.vrun").as("vrun"),
        col("doc.voff").cast(LongType).as("voff"),
        col("doc.nv").cast(LongType).as("nv"),
        col("doc.nsp").cast(LongType).as("nsp"),
        col("doc.csr").as("csr"),
        col("doc.ab").cast(LongType).as("ab"),
        col("doc.pk").cast(LongType).as("pk"),
        col("doc.rep").cast(LongType).as("rep"))
  }

  /** q180: the jq C-math tail + nth under an oracle — gamma family
    * (DuckDB has native gamma/lgamma to check the Lanczos
    * approximation), expm1/log1p, ldexp, copysign, fmin/fmax/fdim,
    * fma, modf, nth(n) and nth(n; g). Floats round(2) on both sides
    * (the standing float-compare rule). */
  def q180(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(
      col("doc_id"),
      length(col("text")).as("nchars"),
      col("text"))
    val env = seqSorted(graft.model.Envelope.wrap(docs, scala.Seq(col("doc_id"))))
    val out = graft.blobl.JqProc(
      """{id: .doc_id,
        | lg: (.nchars | lgamma),
        | tg: ((.doc_id % 6) + 2 | tgamma),
        | e1: (.nchars | log1p),
        | x1: ((.doc_id % 5) | expm1),
        | ld: ldexp(.doc_id % 7; 3),
        | cs: copysign(.nchars; -1),
        | fm: fmin(.nchars; .doc_id),
        | fx: fmax(.nchars; .doc_id),
        | fd: fdim(.nchars; .doc_id),
        | fa: fma(.doc_id % 10; 3; 1),
        | md: (.nchars / 2.5 | modf | .[1]),
        | nt: (.text | split(" ") | nth(1)),
        | ng: nth(0; .text | split(" ") | .[] | ascii_upcase)}""".stripMargin)(env)
    out.select(
        col("doc.id").cast(LongType).as("id"),
        round(col("doc.lg"), 2).as("lg"),
        round(col("doc.tg"), 2).as("tg"),
        round(col("doc.e1"), 2).as("e1"),
        round(col("doc.x1"), 2).as("x1"),
        round(col("doc.ld"), 2).as("ld"),
        round(col("doc.cs"), 2).as("cs"),
        round(col("doc.fm"), 2).as("fm"),
        round(col("doc.fx"), 2).as("fx"),
        round(col("doc.fd"), 2).as("fd"),
        round(col("doc.fa"), 2).as("fa"),
        round(col("doc.md"), 2).as("md"),
        col("doc.nt").as("nt"),
        col("doc.ng").as("ng"))
  }

  /** q183: the deprecated v3 `json` operator processor end-to-end under
    * an oracle — set / copy / split / fold_string_array /
    * fold_number_array / append / delete chained over documents, each
    * compiling onto the Bloblang mapping path (ops/JsonOps). DuckDB
    * replays with string/list functions. */
  def q183(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(
      col("doc_id"),
      length(col("text")).as("nchars"),
      col("lang"),
      col("text"))
    val env = seqSorted(graft.model.Envelope.wrap(docs, scala.Seq(col("doc_id"))))
    val out = scala.Seq[graft.ops.Processor](
      graft.ops.JsonProc("set", "tag", Some("ok")),
      graft.ops.JsonProc("copy", "lang", Some("lang2")),
      graft.ops.JsonProc("split", "text", Some(" ")),
      graft.ops.JsonProc("append", "text", Some("EOT")),
      graft.ops.JsonProc("fold_string_array", "text", Some("|")),
      graft.ops.JsonProc("set", "pair", Some(java.util.List.of(3, 4))),
      graft.ops.JsonProc("fold_number_array", "pair", None),
      graft.ops.JsonProc("delete", "nchars"))
      .foldLeft(env)((d, p) => p(d))
    out.select(
        col("doc.doc_id").cast(LongType).as("doc_id"),
        col("doc.tag").as("tag"),
        col("doc.lang2").as("lang2"),
        col("doc.text").as("joined"),
        col("doc.pair").cast(LongType).as("pair"))
  }

  val queries: Map[String, Q] = Map(
    "q184_jq_stream" -> (q184 _),
    "q183_json_proc" -> (q183 _),
    "q180_jq_mathtail" -> (q180 _),
    "q178_jq_deftail" -> (q178 _),
    "q177_jq_wrap" -> (q177 _),
    "q176_jq_generators" -> (q176 _),
    "q163_error_channel" -> (q163 _),
    "q161_jq" -> (q161 _),
    "q169_jmespath" -> (q169 _),
    "q173_variant_walk" -> (q173 _),
    "q10_blobl_lineitem" -> (q10 _),
    "q11_blobl_events" -> (q11 _),
    "q12_blobl_text" -> (q12 _))

  val oracleSql: Map[String, String] = Map(
    "q184_jq_stream" ->
      """WITH d AS (SELECT doc_id,
        |  least(3, len(string_split(text, ' '))) AS k,
        |  length(text) AS n FROM documents)
        |SELECT doc_id,
        | CAST(k + 5 AS BIGINT) AS ne,
        | CAST(n AS BIGINT) AS rn,
        | CAST(n AS BIGINT) AS t0n,
        | CAST(k AS BIGINT) AS t1k
        |FROM d ORDER BY doc_id""".stripMargin,
    "q183_json_proc" ->
      """SELECT doc_id,
        | 'ok' AS tag,
        | lang AS lang2,
        | array_to_string(list_append(string_split(text, ' '), 'EOT'), '|')
        |   AS joined,
        | CAST(7 AS BIGINT) AS pair
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q180_jq_mathtail" ->
      """WITH b AS (SELECT doc_id, length(text) AS nchars, text
        |FROM documents)
        |SELECT doc_id AS id,
        | round(lgamma(nchars), 2) AS lg,
        | round(gamma((doc_id % 6) + 2), 2) AS tg,
        | round(ln(1 + nchars), 2) AS e1,
        | round(exp(doc_id % 5) - 1, 2) AS x1,
        | round((doc_id % 7) * 8.0, 2) AS ld,
        | round(-nchars, 2) AS cs,
        | round(least(nchars, doc_id) * 1.0, 2) AS fm,
        | round(greatest(nchars, doc_id) * 1.0, 2) AS fx,
        | round(CASE WHEN nchars > doc_id THEN nchars - doc_id
        |            ELSE 0 END * 1.0, 2) AS fd,
        | round((doc_id % 10) * 3.0 + 1, 2) AS fa,
        | round(trunc(nchars / 2.5), 2) AS md,
        | string_split(text, ' ')[2] AS nt,
        | upper(string_split(text, ' ')[1]) AS ng
        |FROM b ORDER BY id""".stripMargin,
    "q178_jq_deftail" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS nchars,
        |  string_split(text, ' ') AS ws FROM documents),
        |b AS (SELECT doc_id, text, nchars, ws[1] AS w1, ws[2] AS w2 FROM d)
        |SELECT doc_id AS id,
        | lower(w1) AS nrm,
        | upper(w1) AS wa,
        | upper(w2) AS wc,
        | CASE WHEN regexp_matches(w1, '[aeiou]+')
        |      THEN regexp_extract(w1, '[aeiou]+') ELSE NULL END AS vrun,
        | CASE WHEN regexp_matches(w1, '[aeiou]+')
        |      THEN CAST(strpos(w1, regexp_extract(w1, '[aeiou]+')) - 1 AS BIGINT)
        |      ELSE NULL END AS voff,
        | CAST(len(regexp_extract_all(w1, '[aeiou]+')) AS BIGINT) AS nv,
        | CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS nsp,
        | array_to_string(list_transform(generate_series(1, length(w1)),
        |   i -> chr(ord(w1[i]) + 1)), '') AS csr,
        | CAST(nchars + doc_id AS BIGINT) AS ab,
        | CAST(doc_id AS BIGINT) AS pk,
        | CAST(31 * (doc_id + 1) AS BIGINT) AS rep
        |FROM b ORDER BY id""".stripMargin,
    "q177_jq_wrap" ->
      """WITH b AS (SELECT doc_id,
        |  list_filter(string_split(text, ' ')[1:2],
        |              w -> length(w) >= 5) AS ws FROM documents)
        |SELECT doc_id,
        | CASE WHEN len(ws) = 1 THEN to_json(ws[1]) ELSE to_json(ws) END AS picks
        |FROM b WHERE len(ws) > 0 ORDER BY doc_id""".stripMargin,
    "q176_jq_generators" ->
      """WITH b AS (SELECT doc_id, string_split(text, ' ')[1:2] AS w2,
        |  [lang, source] AS tags, length(text) AS nchars FROM documents),
        |e1 AS (SELECT doc_id, nchars, tags, unnest(w2) AS w FROM b),
        |e2 AS (SELECT doc_id, nchars, w, unnest(tags) AS t FROM e1)
        |SELECT doc_id AS id, w, t, CAST(nchars AS BIGINT) AS n
        |FROM e2 ORDER BY id, w, t""".stripMargin,
    "q173_variant_walk" ->
      """WITH d AS (SELECT doc_id,
        |  len(string_split(text, ' ')) AS nw FROM documents)
        |SELECT doc_id,
        | CAST(5 + least(nw, 3) AS BIGINT) AS nv,
        | CAST(4 + least(nw, 3) AS BIGINT) AS np,
        | CAST(2 AS BIGINT) AS nnum,
        | CAST(2 + least(nw, 3) AS BIGINT) AS nleaf
        |FROM d ORDER BY doc_id""".stripMargin,
    "q163_error_channel" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 3 = 0 THEN 'invalid' ELSE '2024-01-15' END AS day,
        | doc_id % 3 = 0 AS errored
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q169_jmespath" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |SELECT doc_id,
        | CAST(len(ws) AS BIGINT) AS n_words,
        | array_to_string(ws[1:3], '-') AS first3,
        | CAST(len(list_filter(ws, w -> len(w) > 4)) AS BIGINT) AS n_long,
        | CAST(list_sum(list_transform(ws, w -> len(w))) AS BIGINT) AS total_chars,
        | list_sort(ws)[1] AS first_sorted,
        | ws[-1] AS last_word,
        | list_contains(ws, 'the') AS has_the,
        | doc_id AS arr0
        |FROM d ORDER BY doc_id""".stripMargin,
    "q161_jq" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws,
        |  array_to_string(string_split(text, ' '), ' ') AS j FROM documents)
        |SELECT doc_id,
        | CAST(len(ws) * 10 AS BIGINT) AS n_words,
        | CAST(list_aggregate(list_transform(ws, w -> length(w)), 'sum')
        |      + len(ws) * 10 AS BIGINT) AS total_chars,
        | array_to_string(ws[1:3], '-') AS first3,
        | CAST(len(list_distinct(list_transform(ws, w -> length(w)))) AS BIGINT) AS n_len_groups,
        | regexp_replace(j, '[aeiou]', '_') AS sub1,
        | CASE WHEN strpos(j, 'a') = 0 THEN NULL
        |      ELSE CAST(strpos(j, 'a') - 1 AS BIGINT) END AS a_ix,
        | CAST(len(string_split_regex(j, '[aeiou]+')) AS BIGINT) AS n_vparts,
        | array_to_string(list_transform(ws[1:3],
        |   w -> '"' || replace(w, '"', '""') || '"'), ',') AS csv3,
        | to_base64(encode(ws[1])) AS b64,
        | strftime(to_timestamp(doc_id * 86400), '%Y-%m-%d') AS day,
        | CAST(1 + len(list_filter(generate_series(1, 16),
        |   g -> (doc_id + 2) * (1 << g) < 500)) AS BIGINT) AS n_dbl,
        | CAST(len(regexp_extract_all(j, '[a-z]+')) AS BIGINT) AS n_scan,
        | CAST(list_min(list_filter(list_transform(generate_series(0, 12),
        |   g -> (doc_id + 2) * (3 ** g)), x -> x > 999)) AS BIGINT) AS until3,
        | CAST(1 + len(ws) AS BIGINT) AS n_leafp,
        | CAST(list_aggregate(list_transform(ws, w -> length(w)), 'sum') AS BIGINT) AS sum_lens,
        | array_to_string(list_transform(ws[1:3], w -> upper(w)), '-') AS up3,
        | len(list_filter(ws, w -> regexp_matches(w, 'an'))) > 0 AS any_an
        |FROM d ORDER BY doc_id""".stripMargin,
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
