package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables.t
import graft.llmops._

/** Oracle-checked queries for the LLM-training-data operators
  * (dedup / similarity / text analysis / multimodal plumbing) over the
  * `documents` and `embeddings` tables.
  */
object LlmQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Exact dedup via token-set fingerprint (collapses word-reordered
    * near-dups; the sf0.01 corpus has 21 such groups). */
  def q25(s: SparkSession, dir: String): DataFrame =
    Dedup.exactDedupKeep(t(s, dir, "documents"), "doc_id",
        Dedup.fingerprint(col("text")))
      .orderBy(col("dedupe_key"))

  /** MinHash signatures (4 seeds over 5-gram shingles), scalar columns
    * (native one-pass expression). */
  def q26(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashSigNative(t(s, dir, "documents"), "doc_id", "text", 5, 4)
      .toDF("doc_id", "m0", "m1", "m2", "m3")
      .orderBy(col("doc_id"))

  /** MinHash+LSH near-dup pairs, exact-Jaccard verified at 0.9. The
    * oracle computes full pairwise Jaccard; LSH (128 hashes, 8 bands × 3
    * rows, 5σ estimate prefilter) has negligible false-negative
    * probability at the observed pair similarities (≥0.96 ⇒ <1e-7). */
  def q27(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashPairs(t(s, dir, "documents"), "doc_id", "text",
        shingleK = 5, threshold = 0.9)
      .orderBy(col("id_a"), col("id_b"))

  /** 16-bit SimHash per document (explode + partial-agg path). */
  def q28(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashTable(t(s, dir, "documents"), "doc_id", "text", 16)
      .toDF("doc_id", "simhash")
      .orderBy(col("doc_id"))

  /** 64-bit SimHash (the standard corpus-scale width; bits 32-63 from
    * the '#'-salted second digest). */
  def q168(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashTable(t(s, dir, "documents"), "doc_id", "text", 64)
      .toDF("doc_id", "simhash")
      .orderBy(col("doc_id"))

  /** Brute-force cosine top-5 neighbors for query vectors (vec_id < 10). */
  def q29(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding", 5)
      .orderBy(col("qid"), col("rnk"))
  }

  /** Text quality / language-ID / token-count metrics. */
  def q30(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
        col("doc_id"),
        TextStats.nTokens(col("text")).as("n_tokens"),
        TextStats.nBpePieces(col("text")).as("n_bpe"),
        TextStats.listHits(col("text"), TextStats.stopwords("en")).as("sw_hits"),
        TextStats.punctRatio(col("text")).as("punct_ratio"),
        TextStats.meanTokenLen(col("text")).as("mean_tok_len"),
        TextStats.langId(col("text")).as("lang_guess"),
        TextStats.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  /** Multimodal plumbing: binary payload + typed metadata (decode STUB). */
  def q31(s: SparkSession, dir: String): DataFrame = {
    val payload = col("text").cast(BinaryType)
    val meta = Multimodal.fakeDecode(payload)
    t(s, dir, "documents").select(
        col("doc_id"),
        meta.getField("n_bytes").as("n_bytes"),
        meta.getField("format").as("format"),
        meta.getField("width").as("width"),
        meta.getField("height").as("height"))
      .orderBy(col("doc_id"))
  }

  /** q140: REAL image decode under the oracle. Per document a canonical
    * BMP is built by hand (dims derived from doc_id, exact size formula)
    * and parsed back by the REAL javax.imageio reader
    * ([[Multimodal.decodeImage]]); the DuckDB oracle computes the
    * expected metadata from first principles — a wrong byte in the
    * encoder OR a wrong parse in the decoder flips the gate. Retires the
    * fakeDecode stub from the real-decode path (q31 keeps gating the
    * payload plumbing). */
  def q140(s: SparkSession, dir: String): DataFrame = {
    val w = (col("doc_id") % 16 + 1).cast(IntegerType)
    val h = (col("doc_id") % 8 + 1).cast(IntegerType)
    val payload = Multimodal.encodeBmp(w, h)
    val meta = Multimodal.decodeImage(payload)
    t(s, dir, "documents").select(
        col("doc_id"),
        meta.getField("n_bytes").as("n_bytes"),
        meta.getField("format").as("format"),
        meta.getField("width").as("width"),
        meta.getField("height").as("height"))
      .orderBy(col("doc_id"))
  }

  /** q141: REAL audio decode under the oracle — hand-built mono 16-bit
    * 8 kHz PCM WAV parsed back by the REAL javax.sound reader
    * ([[Multimodal.decodeAudio]]). duration_ms = frames/8 carries at
    * most 3 fractional bits, so the double is exact in both engines. */
  def q141(s: SparkSession, dir: String): DataFrame = {
    val frames = (col("doc_id") % 97 + 160).cast(IntegerType)
    val payload = Multimodal.encodeWavPcm(frames)
    val meta = Multimodal.decodeAudio(payload)
    t(s, dir, "documents").select(
        col("doc_id"),
        meta.getField("n_bytes").as("n_bytes"),
        meta.getField("format").as("format"),
        meta.getField("channels").cast(LongType).as("channels"),
        meta.getField("sample_rate").cast(LongType).as("sample_rate"),
        meta.getField("frames").as("frames"),
        meta.getField("duration_ms").as("duration_ms"))
      .orderBy(col("doc_id"))
  }

  /** q150: REAL video-container decode under the oracle — canonical
    * RIFF/AVI built by hand (variable even-padded JUNK chunk before
    * `hdrl`, so the parser must actually walk chunks) and parsed back
    * by the REAL [[Multimodal.decodeAvi]] header reader. Every output
    * is integer-exact (duration in µs = frames × µs/frame). Retires the
    * video leg of the fakeDecode stub to header-metadata honesty. */
  def q150(s: SparkSession, dir: String): DataFrame = {
    val frames = (col("doc_id") % 120 + 24).cast(IntegerType)
    val w = (lit(160) + (col("doc_id") % 8) * 16).cast(IntegerType)
    val h = (lit(120) + (col("doc_id") % 6) * 8).cast(IntegerType)
    val junk = (col("doc_id") % 32).cast(IntegerType)
    val payload = Multimodal.encodeAvi(frames, w, h, junk)
    val meta = Multimodal.decodeAvi(payload)
    t(s, dir, "documents").select(
        col("doc_id"),
        meta.getField("n_bytes").as("n_bytes"),
        meta.getField("format").as("format"),
        meta.getField("width").as("width"),
        meta.getField("height").as("height"),
        meta.getField("total_frames").as("total_frames"),
        meta.getField("usec_per_frame").as("usec_per_frame"),
        meta.getField("duration_us").as("duration_us"))
      .orderBy(col("doc_id"))
  }

  /** q160: REAL end-to-end AVI frame extraction — per document, an
    * uncompressed-stream RIFF/AVI is built whose `LIST movi` carries one
    * `00db` chunk per frame (ASCII payloads so the oracle can replay
    * them), then [[Multimodal.aviFrames]] walks the container back and
    * the gate hashes every recovered frame. This retires the byte-slice
    * stub for the uncompressed-video path: the bytes cross a real
    * container round-trip, chunk padding and all. */
  def q160(s: SparkSession, dir: String): DataFrame = {
    val nf = (col("doc_id") % 5 + 2).cast(IntegerType)
    val frames = transform(sequence(lit(0), nf - 1),
      i => concat(lit("frame-"), i.cast(StringType),
        lit("-doc-"), col("doc_id").cast(StringType)).cast(BinaryType))
    val w = (lit(160) + (col("doc_id") % 8) * 16).cast(IntegerType)
    val h = (lit(120) + (col("doc_id") % 6) * 8).cast(IntegerType)
    val junk = (col("doc_id") % 16).cast(IntegerType)
    t(s, dir, "documents")
      .select(col("doc_id"), posexplode(Multimodal.aviFrames(
        Multimodal.encodeAviMovi(frames, w, h, junk))))
      .select(col("doc_id"), col("pos").cast(LongType).as("frame_i"),
        md5(col("col")).as("frame_md5"),
        octet_length(col("col")).cast(LongType).as("n_bytes"))
      .orderBy(col("doc_id"), col("frame_i"))
  }

  /** q162: REAL FLAC sample decode — per document, deterministic 16-bit
    * PCM is compressed through the real fixed-predictor FLAC encoder
    * (rice residuals, CRC'd frames) and decoded back SAMPLE-exactly by
    * [[Flac.decode]]; the gate aggregates the recovered PCM and the
    * oracle replays the generator formula directly. This retires the
    * sample-decode stub for the lossless-audio path: actual entropy-coded
    * bits cross the container. */
  def q162(s: SparkSession, dir: String): DataFrame = {
    val n = (col("doc_id") % 300 + 20).cast(IntegerType)
    val pcm = transform(sequence(lit(0), n - 1),
      i => ((col("doc_id") * 7 + i * 13) % 256 - 128).cast(IntegerType))
    t(s, dir, "documents")
      .select(col("doc_id"),
        Multimodal.decodeFlacSamples(
          Multimodal.encodeFlacPcm16(pcm)).as("pcm"))
      .select(col("doc_id"),
        size(col("pcm")).cast(LongType).as("n_samples"),
        aggregate(col("pcm"), lit(0L), (a, x) => a + x).as("sum_s"),
        array_min(col("pcm")).cast(LongType).as("min_s"),
        array_max(col("pcm")).cast(LongType).as("max_s"))
      .orderBy(col("doc_id"))
  }

  /** q164: REAL MP4 sample extraction — per document an ISO-BMFF file is
    * built whose `stbl` carries genuine sample tables (two `stsc` runs,
    * per-sample `stsz`, absolute `stco`) over a two-chunk `mdat`;
    * [[Multimodal.mp4Samples]] resolves the tables and slices the sample
    * bytes back out, hashed per sample against the oracle's replay. The
    * demuxing half of MP4 is now real, mirroring q160's AVI path. */
  def q164(s: SparkSession, dir: String): DataFrame = {
    val nf = (col("doc_id") % 6 + 2).cast(IntegerType)
    val samples = transform(sequence(lit(0), nf - 1),
      i => concat(lit("s"), i.cast(StringType),
        lit("-d"), col("doc_id").cast(StringType)).cast(BinaryType))
    val junk = (col("doc_id") % 24).cast(IntegerType)
    t(s, dir, "documents")
      .select(col("doc_id"), posexplode(Multimodal.mp4Samples(
        Multimodal.encodeMp4Samples(samples, junk))))
      .select(col("doc_id"), col("pos").cast(LongType).as("sample_i"),
        md5(col("col")).as("sample_md5"),
        octet_length(col("col")).cast(LongType).as("n_bytes"))
      .orderBy(col("doc_id"), col("sample_i"))
  }

  /** q165: REAL MP3 frame extraction — per document an MPEG-1 Layer III
    * stream is built whose frame payloads repeat a per-frame ASCII
    * pattern to the spec frame length (144000·kbps∕rate), then
    * [[Multimodal.mp3Frames]] walks the stream re-reading every frame's
    * own header and slices the frames back; the gate hashes each frame's
    * payload (past the 4-byte header) against the oracle's replay of the
    * repeat-pattern arithmetic. Completes the demux trio with q160 (AVI)
    * and q164 (MP4). */
  def q165(s: SparkSession, dir: String): DataFrame = {
    val n = (col("doc_id") % 4 + 2).cast(IntegerType)
    val br = (col("doc_id") % 14 + 1).cast(IntegerType)
    val sr = (col("doc_id") % 3).cast(IntegerType)
    val junk = (col("doc_id") % 37).cast(IntegerType)
    val payload = Multimodal.encodeMp3Filled(n, br, sr, junk,
      concat(lit("d"), col("doc_id").cast(StringType)))
    t(s, dir, "documents")
      .select(col("doc_id"), posexplode(Multimodal.mp3Frames(payload)))
      .select(col("doc_id"), col("pos").cast(LongType).as("frame_i"),
        md5(substring(col("col"), 5, 1 << 20)).as("payload_md5"),
        octet_length(col("col")).cast(LongType).as("n_bytes"))
      .orderBy(col("doc_id"), col("frame_i"))
  }

  /** q156: REAL ISO-BMFF (MP4) box-walk decode — `ftyp` brand check,
    * sibling skip to `moov`, version-0 `mvhd` timescale/duration, `trak`
    * child count — over deterministically synthesized containers (the
    * q150 RIFF pattern applied to the other major video container).
    * Retires more of the video-metadata stub with a pure-JVM parser of
    * the published ISO/IEC 14496-12 layout. */
  def q156(s: SparkSession, dir: String): DataFrame = {
    val units = (col("doc_id") % 9000 + 1200).cast(org.apache.spark.sql.types.LongType)
    val tscale = (lit(600) + (col("doc_id") % 4) * 200).cast(IntegerType)
    val tracks = (col("doc_id") % 3 + 1).cast(IntegerType)
    val junk = (col("doc_id") % 16).cast(IntegerType)
    val meta = Multimodal.decodeMp4(
      Multimodal.encodeMp4(units, tscale, tracks, junk))
    t(s, dir, "documents").select(
        col("doc_id"),
        meta.getField("n_bytes").as("n_bytes"),
        meta.getField("brand").as("brand"),
        meta.getField("timescale").as("timescale"),
        meta.getField("duration_units").as("duration_units"),
        meta.getField("duration_ms").as("duration_ms"),
        meta.getField("n_tracks").as("n_tracks"))
      .orderBy(col("doc_id"))
  }

  /** q157: REAL MP3 (MPEG-1 Layer III) metadata parse — ID3v2 syncsafe
    * skip, sync-word validation, bitrate/sample-rate header tables,
    * constant-length frame walk — over deterministically synthesized
    * audio (the header-table parsing of the published ISO/IEC 11172-3
    * layout; retires the compressed-audio metadata stub). */
  def q157(s: SparkSession, dir: String): DataFrame = {
    val frames = (col("doc_id") % 50 + 10).cast(IntegerType)
    val brIdx = (col("doc_id") % 14 + 1).cast(IntegerType)
    val srIdx = (col("doc_id") % 3).cast(IntegerType)
    val junk = (col("doc_id") % 64).cast(IntegerType)
    val meta = Multimodal.decodeMp3(
      Multimodal.encodeMp3(frames, brIdx, srIdx, junk))
    t(s, dir, "documents").select(
        col("doc_id"),
        meta.getField("n_bytes").as("n_bytes"),
        meta.getField("bitrate_kbps").as("bitrate_kbps"),
        meta.getField("sample_rate").as("sample_rate"),
        meta.getField("n_frames").as("n_frames"),
        meta.getField("duration_ms").as("duration_ms"))
      .orderBy(col("doc_id"))
  }

  /** q158: REAL FLAC STREAMINFO parse — magic check, metadata-block
    * walk by 24-bit lengths, 64-bit field-group unpack (published FLAC
    * bitstream layout) — completing the audio-container family
    * (WAV/AIFF/AU via javax.sound, MP3 frame headers, FLAC here). */
  def q158(s: SparkSession, dir: String): DataFrame = {
    val sr = (lit(8000) + (col("doc_id") % 6) * 8000).cast(IntegerType)
    val ch = (col("doc_id") % 2 + 1).cast(IntegerType)
    val bits = (lit(16) + (col("doc_id") % 2) * 8).cast(IntegerType)
    val total = (col("doc_id") * 100 + 4410).cast(org.apache.spark.sql.types.LongType)
    val junk = (col("doc_id") % 32).cast(IntegerType)
    val meta = Multimodal.decodeFlac(
      Multimodal.encodeFlac(sr, ch, bits, total, junk))
    t(s, dir, "documents").select(
        col("doc_id"),
        meta.getField("n_bytes").as("n_bytes"),
        meta.getField("sample_rate").as("sample_rate"),
        meta.getField("channels").as("channels"),
        meta.getField("bits_per_sample").as("bits_per_sample"),
        meta.getField("total_samples").as("total_samples"),
        meta.getField("duration_ms").as("duration_ms"))
      .orderBy(col("doc_id"))
  }

  /** q142: ANN recall@k evaluation — the eval every approximate index
    * ships with: |ANN top-k ∩ exact top-k| per query, in basis points.
    * Composes the two already-gated deterministic structures (q36's
    * sign-LSH candidates, q29's exact ranking), so the DuckDB oracle
    * replays BOTH sides and the intersection bit-for-bit. The exact side
    * broadcasts the query set; the ANN side stays a bucket equi-join —
    * the recall join itself is k-bounded per query. */
  def q142(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val ann = q36Lsh.topK(queries, emb, "vec_id", "embedding", 5, probes = 1)
      .select(col("qid"), col("vid"))
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .select(col("qid"), col("vid"))
    exact.join(ann.withColumn("_hit", lit(1)), scala.Seq("qid", "vid"), "left")
      .groupBy(col("qid"))
      .agg(sum(coalesce(col("_hit"), lit(0))).as("n_hits"))
      .select(col("qid"), col("n_hits"),
        expr("n_hits * 10000 div 5").as("recall_bp"))
      .orderBy(col("qid"))
  }

  /** q148: hybrid retrieval with reciprocal-rank fusion — the RAG-stack
    * combiner: a lexical list ([[Index.overlapTopK]] distinct-token
    * overlap, the sparse-retriever candidate stage) fused with the exact
    * dense list (q29's cosine ranking) by RRF (k0=60). Scores are
    * floor(1e6/(60+rnk)) sums, integer-exact; the documents/embeddings
    * tables share the id space, so both retrievers rank the same corpus.
    * The oracle replays both rankings and the fused sum bit-for-bit. */
  def q148(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val emb = t(s, dir, "embeddings")
    val lex = Index.overlapTopK(docs.filter(col("doc_id") < 10), docs,
      "doc_id", "text", k = 5)
    val dense = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10),
      emb, "vec_id", "embedding", k = 5)
    Index.rrfFuse(scala.Seq(lex, dense), k0 = 60, topK = 5)
      .select(col("qid"), col("vid"), col("rrf_bp"),
        col("rnk").cast(LongType).as("rnk"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** q149: EXACT all-pairs word-bigram-Jaccard join at t=0.7 via prefix
    * filtering ([[Dedup.jaccardJoinExact]] — PPJoin-style, zero false
    * negatives by the prefix theorem). The oracle brute-forces ALL pairs,
    * so any candidate the prefix join dropped would flip the gate — the
    * exactness claim itself is what's under test. */
  def q149(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardJoinExact(t(s, dir, "documents"), "doc_id", "text",
        thresholdBp = 7000)
      .orderBy(col("id_a"), col("id_b"))

  /** q143: dataset version diff — old = the documents snapshot, new =
    * a deterministically derived release (drop md5-bucket 0/1, uppercase
    * buckets 2/3, append reversed 'f'-bucket docs under shifted ids),
    * classified by [[Curation.datasetDiff]]'s full-outer fingerprint
    * join. The oracle derives the same release and diff in SQL. */
  def q143(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val bucket = substring(md5(col("text").cast(BinaryType)), 1, 1)
    val kept = docs.filter(!bucket.isin("0", "1"))
      .select(col("doc_id"),
        when(bucket.isin("2", "3"), upper(col("text")))
          .otherwise(col("text")).as("text"))
    val added = docs.filter(bucket === "f")
      .select((col("doc_id") + 1000000L).as("doc_id"),
        reverse(col("text")).as("text"))
    val newDf = kept.unionByName(added)
    Curation.datasetDiff(docs, newDf, "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** q144: fill-in-the-middle (PSM) transformation — the code-model
    * pretraining op ([[Training.fimSplit]]): id-derived deterministic
    * split points, `<PRE>p<SUF>s<MID>m` re-serialization. Pure per-row
    * projection; the oracle replays the substring arithmetic. */
  def q144(s: SparkSession, dir: String): DataFrame = {
    val f = Training.fimSplit(col("text"), col("doc_id"))
    t(s, dir, "documents").select(
        col("doc_id"),
        md5(f.getField("fim").cast(BinaryType)).as("fim_md5"),
        f.getField("n_pre").as("n_pre"),
        f.getField("n_mid").as("n_mid"),
        f.getField("n_suf").as("n_suf"))
      .orderBy(col("doc_id"))
  }

  /** q145: chat-template rendering — SFT formatting: each user's events
    * become `<|type|>props` turns joined in (ts, event_id) order, with
    * the per-role loss-mask statistic (chars in response-class turns).
    * One groupBy on the conversation key; the ordered concat is an
    * array_sort over collected structs (deterministic, no window). */
  def q145(s: SparkSession, dir: String): DataFrame = {
    val turns = t(s, dir, "events").select(col("user_id"),
      unix_micros(col("ts")).as("tus"), col("event_id"),
      concat(lit("<|"), col("event_type"), lit("|>"), col("props")).as("turn"),
      col("event_type"))
    turns.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_turns"),
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("tus"), col("event_id"),
            col("turn")))),
          x => x.getField("turn"))).as("_tr"),
        sum(when(col("event_type").isin("click", "purchase"),
          length(col("turn")).cast(LongType)).otherwise(0L)).as("mask_chars"))
      .select(col("user_id"), col("n_turns"),
        md5(col("_tr").cast(BinaryType)).as("transcript_md5"),
        length(col("_tr")).cast(LongType).as("n_chars"),
        col("mask_chars"))
      .orderBy(col("user_id"))
  }

  /** q146: preference-pair assembly — the RLHF/DPO data op: per user,
    * the highest-value and lowest-value click become the
    * (chosen, rejected) tuple (ties broken by event_id; users need ≥2
    * clicks). Two rankings over ONE user-partitioned window shuffle;
    * raw parquet doubles pass through untransformed, so both engines
    * hash bit-identically. */
  def q146(s: SparkSession, dir: String): DataFrame = {
    val clicks = t(s, dir, "events")
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("value"))
    val w = Window.partitionBy(col("user_id"))
    val ranked = clicks.select(col("user_id"), col("event_id"), col("value"),
      row_number().over(w.orderBy(col("value").desc, col("event_id"))).as("_best"),
      row_number().over(w.orderBy(col("value").asc, col("event_id"))).as("_worst"),
      count(lit(1)).over(w).as("_n"))
    val chosen = ranked.filter(col("_best") === 1 && col("_n") >= 2)
      .select(col("user_id"), col("event_id").as("chosen_id"),
        col("value").as("chosen_value"))
    val rejected = ranked.filter(col("_worst") === 1 && col("_n") >= 2)
      .select(col("user_id"), col("event_id").as("rejected_id"),
        col("value").as("rejected_value"))
    chosen.join(rejected, "user_id").orderBy(col("user_id"))
  }

  /** q147: structured-output validation rate — the tool-call/JSON-mode
    * health metric: validate every event's props against a JSON schema
    * with the engine's REAL draft-07 validator
    * ([[graft.exprs.Formats.jsonSchemaError]]) and report per-type valid
    * counts; the oracle replays the k ∈ [0,50] constraint arithmetically,
    * so a validator bug flips the gate. */
  def q147(s: SparkSession, dir: String): DataFrame = {
    val schema =
      """{"type":"object","required":["k"],
        |"properties":{"k":{"type":"integer","minimum":0,"maximum":50}}}"""
        .stripMargin
    t(s, dir, "events").select(col("event_type"),
        graft.exprs.Formats.jsonSchemaError(col("props"), schema).as("_err"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("_err").isNull, 1L).otherwise(0L)).as("n_valid"))
      .select(col("event_type"), col("n"), col("n_valid"),
        expr("n_valid * 10000 div n").as("valid_bp"))
      .orderBy(col("event_type"))
  }

  /** q112: per-source corpus data card — the datasheet row a curation
    * run publishes per source: volume (docs, token mass), exact-dup rate
    * (token-set fingerprints, basis points), and language-label health
    * (stopword-langId disagreements with the declared lang column). One
    * projection + one groupBy on the source key. */
  def q112(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    docs.select(col("source"),
        TextStats.nTokens(col("text")).cast(LongType).as("_tok"),
        Dedup.fingerprint(col("text")).as("_fp"),
        (TextStats.langId(col("text")) =!= col("lang")).as("_mism"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_tok")).as("sum_tokens"),
        count_distinct(col("_fp")).as("n_unique"),
        sum(when(col("_mism"), 1L).otherwise(0L)).as("n_lang_mismatch"))
      .withColumn("dup_rate_bp",
        expr("(n_docs - n_unique) * 10000 div n_docs"))
      .orderBy(col("source"))
  }

  /** q109: video-frame sampling plumbing under an oracle — 4 evenly
    * spaced 16-byte payload slices per document (the offset schedule and
    * array-of-binary shape are the real part; a codec worker swaps in
    * for the slicer without touching this plan). Slices are compared by
    * md5 — text is ASCII in the gate data so DuckDB's char offsets equal
    * Spark's byte offsets; the oracle uses `//` (truncating) division
    * because DuckDB CAST rounds where Spark's cast truncates. */
  def q109(s: SparkSession, dir: String): DataFrame = {
    val payload = col("text").cast(BinaryType)
    t(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(Multimodal.frameSample(payload, 4)))
      .select(col("doc_id"), col("pos").cast(LongType).as("frame_i"),
        md5(col("col")).as("frame_md5"))
      .orderBy(col("doc_id"), col("frame_i"))
  }

  /** Multi-probe sign-LSH ANN — the scale path. The hyperplanes are
    * deterministic, so the DuckDB oracle replicates the bucketing and the
    * multi-probe candidate join bit-for-bit: full rows+schema+hash gate
    * (round 1 had only a rows-only check here). */
  def q36(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    q36Lsh.topK(emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding", 5,
        probes = 1)
      .orderBy(col("qid"), col("rnk"))
  }

  /** kNN label-noise detection, routed through the LSH candidate join +
    * exact re-rank (the 100 TB plan: bucket equi-join, no cross product).
    * The oracle computes the identical ANN neighbors in DuckDB. The exact
    * brute-force flavor stays oracle-covered via q29. */
  def q37(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.labelConsistencyAnn(
        emb.filter(col("vec_id") < 50), emb, "vec_id", "embedding", "label", 5,
        q37Lsh, probes = 2)
      .orderBy(col("qid"))
  }

  /** q93: hard-negative mining — for each query vector (vec_id < 50),
    * the 5 most similar corpus vectors with a DIFFERENT label; LSH
    * candidates + exact re-rank, same deterministic machinery as q37. */
  def q93(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.hardNegatives(emb.filter(col("vec_id") < 50), emb,
        "vec_id", "embedding", "label", 5, q37Lsh, probes = 2)
      .orderBy(col("qid"), col("rnk"))
  }

  /** q94: greedy document packing into 256-token bins within 16 md5
    * buckets — doc boundaries preserved (vs q47's concat-and-chunk);
    * first-fit-sequential in (md5, id) order, fully deterministic. */
  def q94(s: SparkSession, dir: String): DataFrame =
    Training.packDocs(t(s, dir, "documents"), "doc_id",
        size(split(col("text"), " ")), capacity = 256, nBuckets = 16)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** q95: budget-constrained quality selection — rank every document by
    * the q77 classifier score (desc, id tiebreak), flag docs selected
    * while the running token prefix sum fits a 20k budget. */
  def q95(s: SparkSession, dir: String): DataFrame = {
    val scored = Training.hashedNbClassifier(t(s, dir, "documents"),
        "doc_id", "text", col("lang") === "en", dim = 4096)
      .select(col("id").as("doc_id"), col("score_fp"), col("n_tokens"))
    Training.selectByBudget(scored,
        scala.Seq((-col("score_fp")).as("_ns"), col("doc_id")),
        col("n_tokens"), budget = 20000L)
      .orderBy(col("rank"))
  }

  /** q98: SOFT dedup — near-dup clusters (q52's SimHash edge set) give
    * every doc an inverse-cluster-size sampling weight instead of a
    * drop verdict (repeated data is worth less, not nothing). */
  def q98(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text",
      bits = 32, bands = 4, maxHamming = 3)
    Graph.softDedupWeights(docs, "doc_id", pairs, "id_a", "id_b")
      .orderBy(col("doc_id"))
  }

  /** Winnowing fingerprints over documents (k=5, w=4), rendered as a
    * joined string per doc for the oracle compare. */
  def q41(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
        col("doc_id"),
        array_join(TextStats.winnowFingerprints(col("text"), 5, 4), ",")
          .as("fps"))
      .orderBy(col("doc_id"))

  /** IVF-flat ANN: deterministic seed centroids → inverted-list probe →
    * exact re-rank. The oracle replicates the full structure (assignment
    * tie-breaks and probe ranking mirror exactly). */
  def q40(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.Ivf.topK(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", 5, numCentroids = 16, nprobe = 4)
      .orderBy(col("qid"), col("rnk"))
  }

  /** q113: product-quantization ADC top-k — the PQ memory layout (int8
    * quantize → 8 sub-space codebooks of 16 centroids → 8 one-byte codes
    * per vector) with asymmetric-distance search: queries precompute an
    * integer L2² lookup table, the corpus scan reads only the PQ codes.
    * Every distance is an exact integer, so encode, LUT, and ADC ranks
    * replay bit-for-bit in DuckDB. */
  def q113(s: SparkSession, dir: String): DataFrame = {
    val quant = Similarity.quantizeInt8(
      t(s, dir, "embeddings"), "vec_id", "embedding")
    val pq = Similarity.Pq(m = 8, ksub = 16)
    val cb = pq.codebook(quant)
    pq.topK(quant.filter(col("id") < 10), quant, 5, cb)
      .orderBy(col("qid"), col("rnk"))
  }

  /** q114: binary (sign-bit) quantization ANN — 64 dims packed into two
    * 32-bit words, popcount(xor) Hamming scan to 32 candidates, exact
    * cosine re-rank to top-5. Candidate selection is pure integer
    * arithmetic; floats only order the final re-rank (the q36/q40
    * precedent). */
  def q114(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.BinaryQuant.topK(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 5, nCand = 32, nWords = 2)
      .orderBy(col("qid"), col("rnk"))
  }

  /** q115: IVF-PQ — the composed production index: IVF seed-centroid
    * coarse lists (q40's structure, nprobe=4 of 16) bound the search,
    * PQ ADC (q113's integer distances) scans the probed lists without
    * touching vectors. The only float decides list membership. */
  def q115(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val quant = Similarity.quantizeInt8(emb, "vec_id", "embedding")
    val pq = Similarity.Pq(m = 8, ksub = 16)
    val cb = pq.codebook(quant)
    Similarity.ivfPqTopK(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 5, numCentroids = 16, nprobe = 4, pq, cb)
      .orderBy(col("qid"), col("rnk"))
  }

  /** q116: PMI-proxy collocations — top-100 corpus bigram phrases by
    * the integer cross-ratio score (count floor 3, ties → bigram asc):
    * the phrase-discovery pass before tokenizer/vocab decisions. */
  def q116(s: SparkSession, dir: String): DataFrame =
    TextStats.collocations(t(s, dir, "documents"), "text",
      minCount = 3, k = 100)

  /** q118: exact phrase statistics over the positional n-gram index —
    * doc and occurrence counts for a mixed 2-/3-word phrase set. */
  def q118(s: SparkSession, dir: String): DataFrame =
    Index.phraseHits(t(s, dir, "documents"), "doc_id", "text",
      Seq("hash join", "table scan", "sort merge", "slow hash batch"))

  /** q119: integer-deterministic BM25 top-20 retrieval for the query
    * {dup, hash, scan} — `dup` is the corpus's one rare term (df 25), so
    * the idf weighting decides the ranking. */
  def q119(s: SparkSession, dir: String): DataFrame =
    Index.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
        Seq("dup", "hash", "scan"), k = 20)
      .select(col("did").as("doc_id"), col("score_bp"))

  /** q120: token-commonness score (integer CCNet-style unigram signal):
    * mean corpus df of each doc's token occurrences, basis points. */
  def q120(s: SparkSession, dir: String): DataFrame =
    Index.commonnessBp(t(s, dir, "documents"), "doc_id", "text")
      .select(col("did").as("doc_id"), col("common_bp"))
      .orderBy(col("doc_id"))

  /** q126: count-min sketch point queries — build the d=4 × w=512
    * counter matrix over the corpus token stream (a mergeable partial
    * aggregate), then estimate the frequencies of a fixed probe set,
    * including one absent token (est 0 unless all 4 rows collide). */
  def q126(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
    val sk = graft.ops.Sketches.countMinSketch(toks, "tok", d = 4, w = 512)
    graft.ops.Sketches.countMinEstimate(sk,
      Seq("the", "data", "dup", "hash", "scan", "zzz-absent"), d = 4, w = 512)
  }

  /** q127: asymmetric containment pairs (quote/subset detection) — doc
    * a with ≥ 60% of its 5-gram set inside doc b; recall is exact (the
    * n-gram equi-join is the candidate generator). */
  def q127(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 5, minContainBp = 6000L)
      .orderBy(col("id_a"), col("id_b"))

  /** q138: bloom-prefiltered decontamination — drop training docs whose
    * token-set fingerprint matches any eval doc (doc_id % 50 = 0); the
    * bloom filter routes definitely-clean rows around the exact
    * anti-join. Result identical to the plain anti-join (the oracle). */
  def q138(s: SparkSession, dir: String): DataFrame = {
    // prune to (source, doc_id, fp) BEFORE the bloom join so the
    // single-scan annotated materialization never carries `text`, and
    // materialize the fingerprint projection once — train AND eval both
    // derive from it, so `documents` is scanned (and the whole-document
    // fingerprint hashed) exactly once in the entire query
    val docs = t(s, dir, "documents")
      .select(col("source"), col("doc_id"),
        Dedup.fingerprint(col("text")).as("fp"))
      .localCheckpoint()
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    val evalSet = docs.filter(col("doc_id") % 50 === 0).select(col("fp").as("efp"))
    graft.ops.Sketches.bloomAntiJoin(train, "fp", evalSet, "efp",
        expectedItems = 4096L, numBits = 65536L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source"))
  }

  /** Embedding-cosine near-dup pairs: sign-LSH bucketed self-join +
    * exact cosine verify (the semantic dedup mode). Oracle replicates
    * the LSH candidate pairs in DuckDB. */
  def q39(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        q39Lsh, probes = 2, threshold = 0.4)
      .orderBy(col("id_a"), col("id_b"))

  /** Distributed k-means (Lloyd, 2 iterations, k=8) over embeddings:
    * semantic sharding for training-mix balancing. Deterministic seed
    * centroids (lowest-id vectors) let the oracle replicate the full
    * trajectory; output is integer-only (vec_id → cluster) so the last-bit
    * float summation-order differences in the centroid means can't reach
    * the hash (assignment argmax flips would need two centroids within
    * ~1e-14 cosine — not a thing with random data). */
  def q46(s: SparkSession, dir: String): DataFrame = {
    val (assigned, _) = Training.KMeans.fit(
      t(s, dir, "embeddings"), "vec_id", "embedding", k = 8, iters = 2)
    assigned.select(col("vec_id"), col("cid")).orderBy(col("vec_id"))
  }

  /** Centroid-distance embedding outliers: k-means (q46's exact
    * trajectory), then the bottom 10% of each cluster by
    * cosine-to-own-centroid flagged (rank asc, ties → lowest id). */
  def q75(s: SparkSession, dir: String): DataFrame =
    Training.centroidOutliers(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 8, iters = 2, frac = 0.1)
      .orderBy(col("vec_id"))

  /** q77: integer-exact hashed quality classifier — train the
    * fastText-style filter model on lang='en' labels (4096 hashed
    * unigram buckets, fixed-point smoothed positive rates), then score
    * every document with the broadcast weight table. */
  def q77(s: SparkSession, dir: String): DataFrame =
    Training.hashedNbClassifier(t(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en", dim = 4096)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** q78: per-document duplicated-content fraction over winnowing
    * fingerprints (MassiveText dup-ngram-fraction gate), flagged at
    * 25% basis points. */
  def q78(s: SparkSession, dir: String): DataFrame =
    Dedup.dupSpanStats(t(s, dir, "documents"), "doc_id", "text",
        k = 5, w = 4, thresholdBp = 2500)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** q79: trigram stupid-backoff resolution histogram — the
    * integer-exact n-gram-LM perplexity-filter core. */
  def q79(s: SparkSession, dir: String): DataFrame =
    TextStats.backoffLevels(t(s, dir, "documents"), "doc_id", "text")
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** q82: QUALITY-AWARE near-dup dedup — the production composition:
    * SimHash-banded near-dup pairs → connected components → keep the
    * highest classifier-scored member of each cluster (ties → lowest
    * id). The keeper policy big curation pipelines actually run:
    * among duplicates, keep the best document, not the longest. */
  def q82(s: SparkSession, dir: String): DataFrame = {
    // classifier, simhash pairs, and the scored join each consume the
    // corpus — materialize it once (the composition is multi-branch by
    // nature, same rationale as ensembleDedup's internal checkpoint)
    val docs = t(s, dir, "documents").localCheckpoint(false)
    val scored = docs.join(
      Training.hashedNbClassifier(docs, "doc_id", "text",
          col("lang") === "en", dim = 4096)
        .select(col("id").as("doc_id"), col("score_fp")),
      "doc_id")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text",
      bits = 32, bands = 4, maxHamming = 3)
    Graph.dedupClustersBy(scored, "doc_id", col("score_fp"),
        pairs, "id_a", "id_b")
      .orderBy(col("doc_id"))
  }

  /** q83: CCNet-style head/middle/tail buckets — classifier quality
    * score ranked within each source, cut into 3 integer buckets. */
  def q83(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val scored = docs.join(
      Training.hashedNbClassifier(docs, "doc_id", "text",
          col("lang") === "en", dim = 4096)
        .select(col("id").as("doc_id"), col("score_fp")),
      "doc_id")
    Training.qualityBuckets(scored, "doc_id", "source", col("score_fp"), 3)
      .orderBy(col("doc_id"))
  }

  /** q80: cross-document duplicated-span excision — exact-substring
    * dedup as a TRANSFORM (spans shared with other docs cut out). */
  def q80(s: SparkSession, dir: String): DataFrame =
    Dedup.exciseDupSpans(t(s, dir, "documents"), "doc_id", "text",
        k = 5, w = 4)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** Concat-and-chunk sequence packing at a 2048-token budget: which
    * training sequence does each document start in. Integer arithmetic,
    * partitioned two-pass prefix sum (no global window). */
  def q47(s: SparkSession, dir: String): DataFrame =
    Training.packChunks(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", TextStats.nTokens(col("text")), budget = 2048L)
      .select(col("doc_id"), col("n_tokens"), col("chunk_id"),
        col("chunk_offset"))
      .orderBy(col("doc_id"))

  /** Weighted dataset mixing: keep all English, half the German,
    * a quarter of everything else — deterministic md5 buckets keyed on
    * doc_id (reproducible across runs AND engines). */
  def q48(s: SparkSession, dir: String): DataFrame =
    Training.mixStrata(t(s, dir, "documents"),
        col("lang"), col("doc_id"),
        Map("en" -> 1.0, "de" -> 0.5), defaultRate = 0.25)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))

  /** Benchmark-contamination scrub: eval = the src0 slice, train = the
    * rest; word 5-gram containment ≥ 0.5 flags the leaked pairs. */
  def q49(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.contaminationPairs(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "doc_id", "text", n = 5, minContainment = 0.5)
      .orderBy(col("train_id"), col("eval_id"))
  }

  /** PII detect + redact. The corpus is synthetic (no natural PII), so
    * deterministic PII is salted into the text identically on both
    * engines — the machinery under test is the detect/redact regex
    * pipeline itself. */
  def q50(s: SparkSession, dir: String): DataFrame = {
    val salted = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com or +1 555-010-"),
      lpad(col("doc_id").cast(StringType), 4, "0"),
      lit(" from 10.0."), (col("doc_id") % 256).cast(StringType), lit(".7"))
    t(s, dir, "documents").select(
        col("doc_id"),
        TextStats.piiCount(salted, TextStats.piiPatterns.toMap.apply("email")).as("n_email"),
        TextStats.piiCount(salted, TextStats.piiPatterns.toMap.apply("phone")).as("n_phone"),
        TextStats.piiCount(salted, TextStats.piiPatterns.toMap.apply("ipv4")).as("n_ip"),
        TextStats.piiRedact(salted).as("redacted"))
      .orderBy(col("doc_id"))
  }

  /** Gopher-style repetition stats: top-bigram fraction (native one-pass
    * expression) + duplicate-token fraction. */
  def q51(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
        col("doc_id"),
        TextStats.topBigramFrac(col("text")).as("top_bigram_frac"),
        TextStats.dupTokenFrac(col("text")).as("dup_tok_frac"))
      .orderBy(col("doc_id"))

  /** Int8 embedding quantization: per-vector max-abs scale + code array
    * (rendered as a joined string for the compare). */
  def q54(s: SparkSession, dir: String): DataFrame =
    Similarity.quantizeInt8(t(s, dir, "embeddings"), "vec_id", "embedding")
      .select(col("id").as("vec_id"), col("scale"),
        array_join(col("codes"), ",").as("codes"))
      .orderBy(col("vec_id"))

  /** Corpus vocabulary: top-500 tokens by frequency (count desc, token) —
    * the tokenizer-training / vocab-pruning statistic. */
  def q53(s: SparkSession, dir: String): DataFrame =
    TextStats.vocabulary(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("n").desc, col("token"))
      .limit(500)

  /** SimHash near-dup pairs: 32-bit simhash, 4 bands of 8 bits, exact
    * Hamming ≤ 3 verify — the banded-bucket plan that scales. */
  def q52(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text",
        bits = 32, bands = 4, maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))

  /** q90: exact-substring decontamination — eval passages (tokens 3..20
    * of every 50th doc) found VERBATIM inside train documents via
    * winnowing-fingerprint candidates + instr verify. The oracle
    * brute-forces containment directly; winnowing's recall guarantee
    * (shared substring ≥ w+k-1 chars ⇒ shared fingerprint) makes the
    * candidate path return the identical set. */
  def q90(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val evalDf = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"),
        array_join(slice(split(col("text"), " "), 3, 18), " ").as("text"))
    Dedup.substringContamination(docs, evalDf, "doc_id", "text")
      .orderBy(col("train_id"), col("eval_id"))
  }

  /** q92: ensemble dedup — exact md5 + token-set fingerprint + SimHash
    * Hamming edges unioned, connected components labels every doc
    * (MinHash edges gate-excluded; see [[Dedup.ensembleDedup]]). */
  def q92(s: SparkSession, dir: String): DataFrame =
    Dedup.ensembleDedup(t(s, dir, "documents"), "doc_id", "text",
        withMinhash = false)
      .orderBy(col("doc_id"))

  /** Near-dup CLUSTERS: SimHash banded pairs (the q52 edge set) →
    * distributed connected components (alternating large/small-star) →
    * every document labeled with its cluster id (= min doc id of the
    * component) and the keep/drop verdict. The oracle computes the same
    * transitive closure with a recursive CTE. */
  def q55(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text",
      bits = 32, bands = 4, maxHamming = 3)
    Graph.dedupClusters(docs, "doc_id", pairs, "id_a", "id_b")
      .orderBy(col("doc_id"))
  }

  /** Bigram-LM novelty scoring: train corpus bigram counts, score each
    * document by its rare-bigram mass (integer-exact perplexity proxy). */
  def q57(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val model = TextStats.bigramModel(docs, "text")
    TextStats.bigramNovelty(docs, "doc_id", "text", model, rareMax = 2L)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))
  }

  /** TF-IDF top-3 salient terms per document (integer-deterministic
    * ranking: tf DESC, doc-frequency ASC, token ASC; the float score is
    * API-only so the gate can't trip on cross-engine ln() ulps). */
  def q58(s: SparkSession, dir: String): DataFrame =
    TextStats.tfidfTopK(t(s, dir, "documents"), "doc_id", "text", k = 3)
      .drop("tfidf")
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"), col("rnk"))

  /** Gopher-style quality gates (word-count / mean-word-length / symbol
    * ratio / alpha fraction / stopword floor) + combined keep verdict. */
  def q59(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id") +: TextStats.gopherFlags(col("text")): _*)
      .orderBy(col("doc_id"))

  /** SemDeDup: k-means shards → within-cluster cosine pairs ≥ 0.4 →
    * connected components → keep-one-per-semantic-group. Integer output
    * (ids + boolean); the oracle replays the k-means trajectory, the
    * in-cluster pair join, and the closure with a recursive CTE. */
  def q60(s: SparkSession, dir: String): DataFrame =
    Training.semanticDedup(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 8, iters = 2, threshold = 0.4)
      .orderBy(col("vec_id"))

  /** Cross-document shared-passage detection: ≥ 8 shared winnowing
    * fingerprints (k=5, w=4), fingerprints in > 40 docs dropped as
    * boilerplate before the self-join. */
  def q61(s: SparkSession, dir: String): DataFrame =
    Dedup.sharedPassagePairs(t(s, dir, "documents"), "doc_id", "text",
        k = 5, w = 4, minShared = 8, maxDf = 40)
      .orderBy(col("id_a"), col("id_b"))

  /** Sliding-window chunking: 32-token windows every 24 tokens (25%
    * overlap), tail partials kept — context-window prep. */
  def q62(s: SparkSession, dir: String): DataFrame =
    TextStats.chunkOverlap(t(s, dir, "documents"), "doc_id", "text",
        window = 32, stride = 24)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"), col("chunk_ix"))

  /** DSIR-style importance-resampling statistic, integer-exact: per-doc
    * target-model (lang='en') and background-model unigram count masses. */
  def q63(s: SparkSession, dir: String): DataFrame =
    TextStats.importanceMass(t(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en")
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** Per-source contribution cap at 40 docs, deterministic md5-order
    * selection (the web-pipeline domain cap). */
  def q64(s: SparkSession, dir: String): DataFrame =
    Training.capPerGroup(t(s, dir, "documents"), col("source"), col("doc_id"),
        maxPerGroup = 40)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))

  /** Per-source document-length profile: counts, min/max/total tokens and
    * discrete p50/p90 (value at rank ceil(q·n) — integer-exact, no
    * interpolation so the gate can't trip on quantile conventions). */
  def q65(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("source"), TextStats.nTokens(col("text")).as("nt"), col("doc_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("nt"), col("doc_id"))
    val ranked = d.withColumn("_r", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))))
    ranked.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("nt")).as("total_tokens"),
        min(col("nt")).as("min_tokens"),
        max(col("nt")).as("max_tokens"),
        max(when(col("_r") === ceil(col("_n") * 0.5), col("nt"))).as("p50_tokens"),
        max(when(col("_r") === ceil(col("_n") * 0.9), col("nt"))).as("p90_tokens"))
      .orderBy(col("source"))
  }

  /** Keep-the-longest dedup policy: same SimHash pair graph + closure as
    * q55, but the cluster keeper is the highest-token-count doc (ties →
    * lowest id) — the quality-keeper rule production pipelines use. */
  def q68(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text",
      bits = 32, bands = 4, maxHamming = 3)
    Graph.dedupClustersBy(docs, "doc_id", TextStats.nTokens(col("text")),
        pairs, "id_a", "id_b")
      .orderBy(col("doc_id"))
  }

  /** Unicode normalization gate: documents salted with decomposed
    * diacritics (e + U+0301) and a precomposed form, then NFC-composed
    * and accent-stripped. Native UnicodeNormExpr vs DuckDB's
    * nfc_normalize/strip_accents (same Unicode canonical tables);
    * NFKC/NFKD are spec-covered (no DuckDB equivalent). */
  def q67(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      // salt: decomposed e+U+0301, precomposed U+00E9, decomposed o+U+0308
      .select(col("doc_id"),
        concat(col("text"), lit(" café café nöel")).as("_t"))
      .select(col("doc_id"),
        TextStats.normalizeUnicode(col("_t"), "NFC").as("nfc"),
        TextStats.stripAccents(col("_t")).as("plain"))
      .orderBy(col("doc_id"))

  /** Incremental near-dup scrub: the src0 slice as today's ingest batch,
    * everything else as the existing corpus — which new docs are ≥0.9
    * Jaccard copies of corpus docs. The oracle computes full pairwise
    * new×corpus Jaccard (LSH miss probability ≈ 3e-4 at 0.9, and the
    * observed matches sit ≥0.96 — see q27). */
  def q66(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.incrementalNearDup(
        docs.filter(col("source") === "src0"),
        docs.filter(col("source") =!= "src0"),
        "doc_id", "text", threshold = 0.9)
      .orderBy(col("new_id"), col("corpus_id"))
  }

  /** DuckDB replication of the q46 k-means trajectory: seed → (assign →
    * mean)×iters → final assign. Mirrors KMeans.fit exactly, including
    * the empty-cluster fallback (COALESCE onto the previous centroid). */
  private def kmeansSql(k: Int, iters: Int, dim: Int): String = {
    val (ctes, fin) = kmeansCtes(k, iters, dim)
    s"""WITH $ctes
       |SELECT vec_id, cid FROM $fin ORDER BY vec_id""".stripMargin
  }

  /** The k-means trajectory CTE chain (no WITH keyword), and the name of
    * the final assignment CTE (vec_id, ve, cid) — shared by q46 and q60. */
  private def kmeansCtes(k: Int, iters: Int, dim: Int): (String, String) = {
    val sb = new StringBuilder
    sb.append(
      s"""corpus AS (
         | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
         |c0 AS (
         | SELECT vec_id AS cid, ve AS cvec FROM corpus ORDER BY vec_id LIMIT $k)""".stripMargin)
    def assignCte(name: String, cents: String): String =
      s""",
         |$name AS (
         | SELECT vec_id, ve, cid FROM (
         |  SELECT c.vec_id, c.ve, kk.cid,
         |   row_number() OVER (PARTITION BY c.vec_id
         |    ORDER BY list_cosine_similarity(c.ve, kk.cvec) DESC, kk.cid) AS rn
         |  FROM corpus c CROSS JOIN $cents kk) WHERE rn = 1)""".stripMargin
    for (i <- 1 to iters) {
      sb.append(assignCte(s"a$i", s"c${i - 1}"))
      sb.append(
        s""",
           |u$i AS (
           | SELECT cid, list(m ORDER BY i) AS cvec FROM (
           |  SELECT cid, i, avg(ve[i]) AS m
           |  FROM a$i, generate_series(1, $dim) t(i) GROUP BY cid, i)
           | GROUP BY cid),
           |c$i AS (
           | SELECT p.cid, COALESCE(u.cvec, p.cvec) AS cvec
           | FROM c${i - 1} p LEFT JOIN u$i u ON u.cid = p.cid)""".stripMargin)
    }
    sb.append(assignCte(s"a${iters + 1}", s"c$iters"))
    (sb.toString, s"a${iters + 1}")
  }

  /** q105 oracle: the q46 k-means CTEs, then the exact-fraction
    * (md5, id)-rank split within each cluster (q99's window shape with
    * learned strata). */
  private def clusterSampleSql(k: Int, iters: Int, dim: Int,
      keepFracBp: Int): String = {
    val (ctes, fin) = kmeansCtes(k, iters, dim)
    s"""WITH $ctes,
       |r AS (
       | SELECT vec_id, cid,
       |  CAST(row_number() OVER (PARTITION BY cid
       |   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT)
       |   AS grp_rank,
       |  CAST(count(*) OVER (PARTITION BY cid) AS BIGINT) AS grp_n
       | FROM $fin)
       |SELECT vec_id, cid, grp_n, grp_rank,
       | CASE WHEN grp_rank <= grp_n * $keepFracBp // 10000 THEN 'keep'
       |      ELSE 'drop' END AS split
       |FROM r ORDER BY vec_id""".stripMargin
  }

  /** q60 oracle: the q46 k-means CTEs, then within-cluster cosine pairs
    * and the recursive-CTE transitive closure (q55's shape) over them. */
  private def semdedupSql(k: Int, iters: Int, dim: Int,
      threshold: Double): String = {
    val (ctes, fin) = kmeansCtes(k, iters, dim)
    s"""WITH RECURSIVE $ctes,
       |pairs AS (
       | SELECT a.vec_id AS ida, b.vec_id AS idb
       | FROM $fin a JOIN $fin b ON a.cid = b.cid AND a.vec_id < b.vec_id
       | WHERE list_cosine_similarity(a.ve, b.ve) >= $threshold),
       |e AS (SELECT ida AS u, idb AS v FROM pairs
       |      UNION ALL SELECT idb, ida FROM pairs),
       |reach(a, bb) AS (
       | SELECT u, v FROM e
       | UNION
       | SELECT r.a, e2.v FROM reach r JOIN e e2 ON e2.u = r.bb),
       |comp AS (SELECT a AS id, least(a, min(bb)) AS comp FROM reach GROUP BY a)
       |SELECT s.vec_id, s.cid, COALESCE(c.comp, s.vec_id) AS cluster_id,
       | s.vec_id = COALESCE(c.comp, s.vec_id) AS keep
       |FROM $fin s LEFT JOIN comp c ON c.id = s.vec_id
       |ORDER BY s.vec_id""".stripMargin
  }

  // Shipped ANN configs (fixed: the oracles embed the same hyperplanes).
  private val q36Lsh = Similarity.SignLsh(dim = 64, nPlanes = 6)
  private val q37Lsh = Similarity.SignLsh(dim = 64, nPlanes = 6)
  private val q39Lsh = Similarity.SignLsh(dim = 64, nPlanes = 6)

  /** DuckDB expression for the SignLsh bucket of `vecExpr` — the same
    * deterministic hyperplanes as the Spark side, embedded as literals, so
    * the oracle reproduces the candidate set exactly. */
  private def lshBucketSql(lsh: Similarity.SignLsh, vecExpr: String): String =
    lsh.hp.zipWithIndex.map { case (p, i) =>
      val lst = p.mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product(CAST($vecExpr AS DOUBLE[]), $lst) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")

  /** Multi-probe membership predicate: corpus bucket ∈ Hamming ball around
    * the query bucket. */
  private def probeInSql(lsh: Similarity.SignLsh, probes: Int,
      qb: String, cb: String): String =
    lsh.probeMasks(probes)
      .map(m => if (m == 0L) qb else s"xor($qb, $m)")
      .mkString(s"$cb IN (", ", ", ")")

  /** Shared ANN candidate CTEs: q (filtered queries) and cand (candidate
    * pairs with exact cosine). */
  private def annCandSql(lsh: Similarity.SignLsh, probes: Int,
      queryPred: String): String = {
    val bucket = lshBucketSql(lsh, "embedding")
    s"""WITH q AS (
       | SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv,
       |  $bucket AS qb
       | FROM embeddings WHERE $queryPred),
       |c AS (
       | SELECT vec_id AS vid, CAST(embedding AS DOUBLE[]) AS cv,
       |  $bucket AS cb
       | FROM embeddings),
       |cand AS (
       | SELECT qid, vid, list_cosine_similarity(qv, cv) AS sim
       | FROM q JOIN c ON ${probeInSql(lsh, probes, "qb", "cb")}
       |  AND c.vid != q.qid)""".stripMargin
  }

  /** q50's salted text, as a DuckDB expression (identical to the Spark
    * side's concat). */
  private val saltedSql =
    "text || ' contact user' || doc_id || '@example.com or +1 555-010-' || " +
      "lpad(CAST(doc_id AS VARCHAR), 4, '0') || ' from 10.0.' || " +
      "CAST(doc_id % 256 AS VARCHAR) || '.7'"

  /** Chained redaction matching TextStats.piiRedact's pattern order,
    * built from the SAME runtime pattern strings. */
  private val redactSql: String =
    graft.llmops.TextStats.piiPatterns.foldLeft("t") { case (acc, (name, pat)) =>
      s"regexp_replace($acc, '$pat', '[${name.toUpperCase}]', 'g')"
    }

  /** Shared PQ CTE chain (q113 ADC scan, q115 IVF-PQ): int8 quantization
    * (the q54 arithmetic), 16-seed codebooks per 8-dim subspace, integer
    * L2² distance relation for every (vector, subspace, centroid), and
    * the argmin encoding. All BIGINT — replays the Spark kernels exactly. */
  private val pqCtesSql: String =
    """v AS (
      | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
      |qt AS (
      | SELECT vec_id,
      |  CASE WHEN list_max(list_transform(ve, x -> abs(x))) = 0
      |   THEN list_transform(ve, x -> CAST(0 AS BIGINT))
      |   ELSE list_transform(ve, x -> CAST(floor(
      |     x / list_max(list_transform(ve, y -> abs(y))) * 127.0 + 0.5)
      |    AS BIGINT))
      |  END AS qc
      | FROM v),
      |cbs AS (
      | SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, qc
      | FROM (SELECT vec_id, qc FROM qt ORDER BY vec_id LIMIT 16)),
      |cb AS (
      | SELECT s.m, cbs.j, list_slice(cbs.qc, s.m*8+1, s.m*8+8) AS cv
      | FROM cbs, (SELECT unnest(range(8)) AS m) s),
      |dist AS (
      | SELECT q.vec_id, cb.m, cb.j,
      |  CAST(list_sum(list_transform(range(8),
      |    i -> (q.qc[cb.m*8+i+1] - cb.cv[i+1])
      |       * (q.qc[cb.m*8+i+1] - cb.cv[i+1]))) AS BIGINT) AS d
      | FROM qt q CROSS JOIN cb),
      |enc AS (
      | SELECT vec_id, m, j AS code FROM (
      |  SELECT vec_id, m, j,
      |   row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) AS rn
      |  FROM dist) WHERE rn = 1)""".stripMargin

  private def piiCountSql(key: String): String = {
    val pat = graft.llmops.TextStats.piiPatterns.toMap.apply(key)
    s"CAST(len(regexp_extract_all(t, '$pat')) AS BIGINT)"
  }

  val queries: Map[String, Q] = Map(
    "q60_semdedup" -> (q60 _),
    "q66_incremental_neardup" -> (q66 _),
    "q67_normalize" -> (q67 _),
    "q68_dedup_keep_longest" -> (q68 _),
    "q61_shared_passages" -> (q61 _),
    "q62_chunks" -> (q62 _),
    "q63_importance" -> (q63 _),
    "q64_source_cap" -> (q64 _),
    "q65_source_stats" -> (q65 _),
    "q55_dedup_clusters" -> (q55 _),
    "q57_lm_novelty" -> (q57 _),
    "q58_tfidf" -> (q58 _),
    "q59_gopher" -> (q59 _),
    "q49_contamination" -> (q49 _),
    "q50_pii" -> (q50 _),
    "q51_repetition" -> (q51 _),
    "q54_quantize" -> (q54 _),
    "q53_vocab" -> (q53 _),
    "q52_simhash_pairs" -> (q52 _),
    "q46_kmeans" -> (q46 _),
    "q75_embed_outliers" -> (q75 _),
    "q47_pack" -> (q47 _),
    "q48_mix" -> (q48 _),
    "q41_winnow" -> (q41 _),
    "q40_ann_ivf" -> (q40 _),
    "q39_embed_neardup" -> (q39 _),
    "q37_label_noise" -> (q37 _),
    "q36_ann_lsh" -> (q36 _),
    "q25_dedup_fingerprint" -> (q25 _),
    "q26_minhash_sig" -> (q26 _),
    "q27_minhash_lsh_pairs" -> (q27 _),
    "q28_simhash" -> (q28 _),
    "q168_simhash64" -> (q168 _),
    "q29_cosine_topk" -> (q29 _),
    "q30_text_quality" -> (q30 _),
    "q31_multimodal_meta" -> (q31 _),
    "q140_bmp_decode" -> (q140 _),
    "q141_wav_decode" -> (q141 _),
    "q150_avi_decode" -> (q150 _),
    "q160_avi_frames" -> (q160 _),
    "q162_flac_samples" -> (q162 _),
    "q164_mp4_samples" -> (q164 _),
    "q165_mp3_frames" -> (q165 _),
    "q156_mp4_decode" -> (q156 _),
    "q157_mp3_decode" -> (q157 _),
    "q158_flac_decode" -> (q158 _),
    "q142_ann_recall" -> (q142 _),
    "q143_dataset_diff" -> (q143 _),
    "q144_fim" -> (q144 _),
    "q145_chat_render" -> (q145 _),
    "q146_preference_pairs" -> (q146 _),
    "q147_schema_validate" -> (q147 _),
    "q148_rrf_fusion" -> (q148 _),
    "q149_jaccard_join" -> (q149 _),
    "q77_classifier" -> (q77 _),
    "q78_dup_spans" -> (q78 _),
    "q79_backoff" -> (q79 _),
    "q80_excise_spans" -> (q80 _),
    "q82_dedup_keep_best_quality" -> (q82 _),
    "q83_quality_buckets" -> (q83 _),
    "q90_substring_contamination" -> (q90 _),
    "q92_ensemble_dedup" -> (q92 _),
    "q93_hard_negatives" -> (q93 _),
    "q94_pack_docs" -> (q94 _),
    "q95_budget_select" -> (q95 _),
    "q98_soft_dedup" -> (q98 _),
    "q105_cluster_sample" -> (q105 _),
    "q109_frame_sample" -> (q109 _),
    "q112_data_card" -> (q112 _),
    "q113_pq_adc" -> (q113 _),
    "q114_binary_ann" -> (q114 _),
    "q115_ivfpq" -> (q115 _),
    "q116_collocations" -> (q116 _),
    "q118_phrase_search" -> (q118 _),
    "q119_bm25" -> (q119 _),
    "q120_commonness" -> (q120 _),
    "q126_count_min" -> (q126 _),
    "q127_containment" -> (q127 _),
    "q138_bloom_decontaminate" -> (q138 _))

  /** q105: cluster-balanced diversity sample — k-means strata (q46's
    * exact trajectory), then keep EXACTLY 25% of every cluster by
    * (md5, id) rank: semantic-coverage-preserving downsampling. */
  def q105(s: SparkSession, dir: String): DataFrame =
    graft.llmops.Training.clusterBalancedSample(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 8, iters = 2, keepFracBp = 2500)
      .withColumnRenamed("id", "vec_id")
      .orderBy(col("vec_id"))

  private def simhashSumsN(bits: Int) = (0 until bits).map { b =>
    // bits 32-63 read the '#'-salted second digest (SimhashExpr scheme)
    val nib = if (b < 32) s"substr(md5(tok),${b + 1},1)"
              else s"substr(md5(tok || '#'),${b - 31},1)"
    s"sum(CASE WHEN $nib IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END) AS s$b"
  }.mkString(",\n  ")
  private def simhashCombineN(bits: Int) = (0 until bits).map { b =>
    s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END"
  }.mkString(" + ")

  private val simhashSums = (0 until 16).map { b =>
    s"sum(CASE WHEN substr(md5(tok),${b + 1},1) IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END) AS s$b"
  }.mkString(",\n  ")
  private val simhashCombine = (0 until 16).map { b =>
    s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END"
  }.mkString(" + ")

  /** Winnowing-fingerprint CTE chain ending in fp(doc_id, h) — the exact
    * WinnowExpr contract (k=5, w=4, rightmost-min selection); shared by
    * q41 and q61. */
  private val winnowFpCtes: String =
    """g AS (
      | SELECT doc_id, i, substr(md5(substr(text, i, 5)), 1, 16) AS h
      | FROM documents,
      |  unnest(generate_series(1, greatest(strlen(text)-4, 1))) AS t(i)),
      |g2 AS (
      | SELECT doc_id, i, h,
      |  min(h) OVER (PARTITION BY doc_id ORDER BY i
      |   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh,
      |  count(*) OVER (PARTITION BY doc_id) AS n
      | FROM g),
      |pos AS (
      | SELECT a.doc_id, a.i AS ws, max(b.i) AS selpos
      | FROM g2 a JOIN g b ON b.doc_id = a.doc_id
      |  AND b.i BETWEEN a.i AND a.i + 3 AND b.h = a.mh
      | WHERE a.i <= greatest(a.n - 3, 1)
      | GROUP BY 1, 2),
      |fp AS (
      | SELECT DISTINCT p.doc_id, g.h
      | FROM pos p JOIN g ON g.doc_id = p.doc_id AND g.i = p.selpos)""".stripMargin

  /** SimHash banded pairs + recursive-CTE transitive closure, ending in
    * comp(id, comp) — shared by q55 and q68. Needs WITH RECURSIVE. */
  private lazy val simhashCcCtes: String =
    s"""toks AS (
       | SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |bits AS (
       | SELECT doc_id,
       |  ${simhashSumsN(32)}
       | FROM toks GROUP BY doc_id),
       |sh AS (SELECT doc_id, ${simhashCombineN(32)} AS simhash FROM bits),
       |banded AS (
       | SELECT doc_id, simhash, b, (simhash >> (b*8)) & 255 AS bv
       | FROM sh, unnest([0,1,2,3]) AS t(b)),
       |pairs AS (
       | SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |  a.simhash AS sa, b.simhash AS sb
       | FROM banded a JOIN banded b ON a.b = b.b AND a.bv = b.bv
       |  AND a.doc_id < b.doc_id),
       |pe AS (SELECT id_a, id_b FROM pairs WHERE bit_count(xor(sa, sb)) <= 3),
       |e AS (SELECT id_a AS u, id_b AS v FROM pe
       |      UNION ALL SELECT id_b, id_a FROM pe),
       |reach(a, bb) AS (
       | SELECT u, v FROM e
       | UNION
       | SELECT r.a, e2.v FROM reach r JOIN e e2 ON e2.u = r.bb),
       |comp AS (SELECT a AS id, least(a, min(bb)) AS comp FROM reach GROUP BY a)""".stripMargin

  /** SQL for the integer value of the first `n` hex chars of `e` (an
    * md5-string expression) — the engine-portable hex decode used by the
    * sketch oracles. */
  private def hexValSql(e: String, n: Int): String =
    (1 to n).foldLeft("0") { (acc, i) =>
      s"($acc * 16 + (strpos('0123456789abcdef', substr($e, $i, 1)) - 1))"
    }

  val oracleSql: Map[String, String] = Map(
    "q138_bloom_decontaminate" ->
      """WITH d AS (
        | SELECT source, doc_id,
        |  md5(array_to_string(list_sort(list_distinct(
        |    string_split(text, ' '))), ' ')) AS fp
        | FROM documents),
        |ev AS (SELECT fp FROM d WHERE doc_id % 50 = 0)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |FROM d
        |WHERE doc_id % 50 <> 0 AND fp NOT IN (SELECT fp FROM ev)
        |GROUP BY source ORDER BY source""".stripMargin,
    "q126_count_min" -> {
      val pos = s"${hexValSql("md5(j || ':' || v)", 6)} % 512"
      s"""WITH occ AS (
         | SELECT unnest(string_split(text, ' ')) AS v FROM documents),
         |pos AS (
         | SELECT j, $pos AS pos
         | FROM occ, unnest([0, 1, 2, 3]) AS t(j)),
         |sk AS (
         | SELECT j, pos, CAST(count(*) AS BIGINT) AS cnt
         | FROM pos GROUP BY j, pos),
         |probes AS (
         | SELECT * FROM (VALUES ('the'), ('data'), ('dup'), ('hash'),
         |  ('scan'), ('zzz-absent')) AS p(v)),
         |pp AS (
         | SELECT v, j, $pos AS pos
         | FROM probes, unnest([0, 1, 2, 3]) AS t(j))
         |SELECT v, CAST(min(COALESCE(cnt, 0)) AS BIGINT) AS est
         |FROM pp LEFT JOIN sk USING (j, pos)
         |GROUP BY v ORDER BY v""".stripMargin
    },
    "q127_containment" ->
      """WITH toks AS (
        | SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |ng AS (
        | SELECT doc_id, list_distinct(list_transform(
        |   generate_series(1, greatest(len(t) - 4, 0)),
        |   i -> array_to_string(t[i:i+4], ' '))) AS gs
        | FROM toks),
        |g AS (SELECT doc_id, unnest(gs) AS g FROM ng),
        |sz AS (SELECT doc_id AS id_a, CAST(len(gs) AS BIGINT) AS na FROM ng),
        |ov AS (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(count(*) AS BIGINT) AS overlap
        | FROM g a JOIN g b ON a.g = b.g AND a.doc_id <> b.doc_id
        | GROUP BY 1, 2)
        |SELECT id_a, id_b, overlap, overlap * 10000 // na AS contain_bp
        |FROM ov JOIN sz USING (id_a)
        |WHERE na > 0 AND overlap * 10000 // na >= 6000
        |ORDER BY id_a, id_b""".stripMargin,
    // q90: brute-force containment — eval is tiny, so eval×train instr
    // is fine single-node; the Spark side must reach the same set through
    // winnowing candidates (recall guarantee makes them equal).
    "q90_substring_contamination" ->
      """WITH ev AS (
         | SELECT doc_id AS eval_id,
         |  array_to_string((string_split(text, ' '))[3:20], ' ') AS et
         | FROM documents WHERE doc_id % 50 = 0)
         |SELECT d.doc_id AS train_id, ev.eval_id
         |FROM documents d, ev
         |WHERE strpos(d.text, ev.et) > 0
         |ORDER BY train_id, eval_id""".stripMargin,
    // q92: union of exact-md5, token-set fingerprint, and SimHash banded
    // pairs (q52's shape), closed transitively.
    "q92_ensemble_dedup" ->
      s"""WITH RECURSIVE toks AS (
         | SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |bits AS (
         | SELECT doc_id,
         |  ${simhashSumsN(32)}
         | FROM toks GROUP BY doc_id),
         |shh AS (SELECT doc_id, ${simhashCombineN(32)} AS simhash FROM bits),
         |banded AS (
         | SELECT doc_id, simhash, b, (simhash >> (b*8)) & 255 AS bv
         | FROM shh, unnest([0,1,2,3]) AS t(b)),
         |spairs AS (
         | SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |  a.simhash AS sa, b.simhash AS sb
         | FROM banded a JOIN banded b ON a.b = b.b AND a.bv = b.bv
         |  AND a.doc_id < b.doc_id),
         |spe AS (SELECT id_a, id_b FROM spairs WHERE bit_count(xor(sa, sb)) <= 3),
         |ek AS (SELECT doc_id, md5(text) AS k FROM documents
         |       UNION ALL
         |       SELECT doc_id, 'fp' || md5(array_to_string(
         |         list_sort(list_distinct(string_split(text, ' '))), ' ')) AS k
         |       FROM documents),
         |er AS (SELECT k, min(doc_id) AS rep FROM ek GROUP BY k),
         |epe AS (
         | SELECT DISTINCT er.rep AS id_a, ek.doc_id AS id_b
         | FROM ek JOIN er USING (k) WHERE ek.doc_id != er.rep),
         |pe AS (
         | SELECT id_a, id_b FROM spe
         | UNION SELECT id_a, id_b FROM epe),
         |e AS (SELECT id_a AS u, id_b AS v FROM pe
         |      UNION ALL SELECT id_b, id_a FROM pe),
         |reach(a, bb) AS (
         | SELECT u, v FROM e
         | UNION
         | SELECT r.a, e2.v FROM reach r JOIN e e2 ON e2.u = r.bb),
         |comp AS (SELECT a AS id, least(a, min(bb)) AS comp FROM reach GROUP BY a)
         |SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_id,
         | d.doc_id = COALESCE(c.comp, d.doc_id) AS keep
         |FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // q98: the q52 SimHash pair CTEs + closure, then inverse-cluster-size
    // weights in integer basis points.
    "q98_soft_dedup" ->
      s"""WITH RECURSIVE $simhashCcCtes,
         |lab AS (
         | SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_id
         | FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
         |sz AS (
         | SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
         | FROM lab GROUP BY cluster_id)
         |SELECT lab.doc_id, lab.cluster_id, sz.cluster_size,
         | CAST(10000 // sz.cluster_size AS BIGINT) AS weight_bp
         |FROM lab JOIN sz USING (cluster_id)
         |ORDER BY lab.doc_id""".stripMargin,
    // q55: the q52 SimHash pair CTEs, then the transitive closure via a
    // recursive CTE (min reachable id per node = the cluster label).
    "q55_dedup_clusters" ->
      s"""WITH RECURSIVE $simhashCcCtes
         |SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_id,
         | d.doc_id = COALESCE(c.comp, d.doc_id) AS keep
         |FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "q83_quality_buckets" ->
      """WITH tk AS (
        | SELECT doc_id, lang = 'en' AS y,
        |  unnest(string_split(text, ' ')) AS tok FROM documents),
        |ft AS (
        | SELECT doc_id, y, CAST(
        |   256 * (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1)
        |   + 16 * (strpos('0123456789abcdef', substr(md5(tok), 3, 1)) - 1)
        |   + (strpos('0123456789abcdef', substr(md5(tok), 4, 1)) - 1)
        |  AS BIGINT) AS f
        | FROM tk),
        |w AS (
        | SELECT f, CAST(
        |   (CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) + 1) * 1000000
        |    // (CAST(count(*) AS BIGINT) + 2) AS BIGINT) AS w
        | FROM ft GROUP BY f),
        |sc AS (
        | SELECT doc_id,
        |  CAST(CAST(sum(w) AS BIGINT) // CAST(count(*) AS BIGINT) AS BIGINT)
        |   AS score_fp
        | FROM ft JOIN w USING (f) GROUP BY doc_id),
        |r AS (
        | SELECT d.doc_id, d.source, sc.score_fp,
        |  CAST(row_number() OVER (PARTITION BY d.source
        |   ORDER BY sc.score_fp DESC, d.doc_id) AS BIGINT) AS rnk,
        |  CAST(count(*) OVER (PARTITION BY d.source) AS BIGINT) AS n
        | FROM documents d JOIN sc USING (doc_id))
        |SELECT doc_id, source, score_fp AS score,
        | CAST((rnk - 1) * 3 // n AS BIGINT) AS bucket
        |FROM r ORDER BY doc_id""".stripMargin,
    "q82_dedup_keep_best_quality" ->
      s"""WITH RECURSIVE $simhashCcCtes,
         |tk AS (
         | SELECT doc_id, lang = 'en' AS y,
         |  unnest(string_split(text, ' ')) AS tok FROM documents),
         |ft AS (
         | SELECT doc_id, y, CAST(
         |   256 * (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1)
         |   + 16 * (strpos('0123456789abcdef', substr(md5(tok), 3, 1)) - 1)
         |   + (strpos('0123456789abcdef', substr(md5(tok), 4, 1)) - 1)
         |  AS BIGINT) AS f
         | FROM tk),
         |w AS (
         | SELECT f, CAST(
         |   (CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) + 1) * 1000000
         |    // (CAST(count(*) AS BIGINT) + 2) AS BIGINT) AS w
         | FROM ft GROUP BY f),
         |sc AS (
         | SELECT doc_id,
         |  CAST(CAST(sum(w) AS BIGINT) // CAST(count(*) AS BIGINT) AS BIGINT)
         |   AS score_fp
         | FROM ft JOIN w USING (f) GROUP BY doc_id),
         |lab AS (
         | SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_id, sc.score_fp
         | FROM documents d JOIN sc USING (doc_id)
         |  LEFT JOIN comp c ON c.id = d.doc_id),
         |k AS (
         | SELECT cluster_id, doc_id AS keep_id FROM (
         |  SELECT cluster_id, doc_id,
         |   row_number() OVER (PARTITION BY cluster_id
         |    ORDER BY score_fp DESC, doc_id) AS rn
         |  FROM lab) WHERE rn = 1)
         |SELECT l.doc_id, l.cluster_id, l.score_fp AS score,
         | l.doc_id = k.keep_id AS keep
         |FROM lab l JOIN k USING (cluster_id)
         |ORDER BY l.doc_id""".stripMargin,
    "q68_dedup_keep_longest" ->
      s"""WITH RECURSIVE $simhashCcCtes,
         |d AS (
         | SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
         | FROM documents),
         |lab AS (
         | SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_id, d.nt
         | FROM d LEFT JOIN comp c ON c.id = d.doc_id),
         |k AS (
         | SELECT cluster_id, doc_id AS keep_id FROM (
         |  SELECT cluster_id, doc_id,
         |   row_number() OVER (PARTITION BY cluster_id
         |    ORDER BY nt DESC, doc_id) AS rn
         |  FROM lab) WHERE rn = 1)
         |SELECT l.doc_id, l.cluster_id, l.nt AS score,
         | l.doc_id = k.keep_id AS keep
         |FROM lab l JOIN k USING (cluster_id)
         |ORDER BY l.doc_id""".stripMargin,
    "q57_lm_novelty" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (
        | SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
        | FROM toks, unnest(generate_series(1, greatest(len(t)-1, 0))) AS s(i)),
        |model AS (SELECT g, count(*) AS n FROM bg GROUP BY g),
        |sc AS (
        | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(count(DISTINCT g) AS BIGINT) AS n_distinct_bigrams,
        |  CAST(sum(CASE WHEN n <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS rare_hits
        | FROM bg JOIN model USING (g) GROUP BY doc_id)
        |SELECT d.doc_id,
        | COALESCE(sc.n_bigrams, 0) AS n_bigrams,
        | COALESCE(sc.n_distinct_bigrams, 0) AS n_distinct_bigrams,
        | COALESCE(sc.rare_hits, 0) AS rare_hits,
        | CASE WHEN COALESCE(sc.n_bigrams, 0) = 0 THEN 0.0
        |      ELSE CAST(sc.rare_hits AS DOUBLE)/CAST(sc.n_bigrams AS DOUBLE)
        | END AS novelty
        |FROM documents d LEFT JOIN sc USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "q58_tfidf" ->
      """WITH tf AS (
        | SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        | FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |       FROM documents)
        | GROUP BY doc_id, token),
        |dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df_docs
        |        FROM tf GROUP BY token)
        |SELECT doc_id, token, tf, df_docs, rnk FROM (
        | SELECT tf.doc_id, tf.token, tf.tf, dfq.df_docs,
        |  row_number() OVER (PARTITION BY tf.doc_id
        |   ORDER BY tf.tf DESC, dfq.df_docs ASC, tf.token ASC) AS rnk
        | FROM tf JOIN dfq USING (token))
        |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "q59_gopher" ->
      """SELECT doc_id, n_words, mean_word_len, frac_alpha, n_symbols, stop_hits,
        | (n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
        |  AND (CAST(n_symbols AS DOUBLE)/CAST(n_words AS DOUBLE)) <= 0.1
        |  AND frac_alpha >= 0.8 AND stop_hits >= 2 AS keep
        |FROM (
        | SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |   / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_word_len,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE)
        |   / CAST(len(string_split(text, ' ')) AS DOUBLE) AS frac_alpha,
        |  CAST(len(regexp_extract_all(text, '#'))
        |   + len(regexp_extract_all(text, '\.\.\.')) AS BIGINT) AS n_symbols,
        |  CAST(len(list_filter(string_split(lower(text), ' '),
        |    t -> list_contains(['the','be','to','of','and','that','have','with'], t)))
        |   AS BIGINT) AS stop_hits
        | FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q49_contamination" ->
      """WITH toks AS (
        | SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |ng AS (
        | SELECT doc_id, source,
        |  list_distinct(list_transform(generate_series(1, greatest(len(t)-4, 0)),
        |   i -> array_to_string(t[i:i+4], ' '))) AS gs
        | FROM toks),
        |tr AS (SELECT doc_id AS train_id, unnest(gs) AS g FROM ng WHERE source != 'src0'),
        |ev AS (SELECT doc_id AS eval_id, unnest(gs) AS g FROM ng WHERE source = 'src0'),
        |esz AS (SELECT doc_id AS eval_id, CAST(len(gs) AS BIGINT) AS en
        |        FROM ng WHERE source = 'src0'),
        |ov AS (SELECT train_id, eval_id, CAST(count(*) AS BIGINT) AS overlap
        |       FROM tr JOIN ev USING (g) GROUP BY 1, 2)
        |SELECT train_id, eval_id, overlap,
        | CAST(overlap AS DOUBLE)/CAST(en AS DOUBLE) AS containment
        |FROM ov JOIN esz USING (eval_id)
        |WHERE CAST(overlap AS DOUBLE)/CAST(en AS DOUBLE) >= 0.5
        |ORDER BY train_id, eval_id""".stripMargin,
    "q50_pii" ->
      s"""WITH s AS (SELECT doc_id, $saltedSql AS t FROM documents)
         |SELECT doc_id,
         | ${piiCountSql("email")} AS n_email,
         | ${piiCountSql("phone")} AS n_phone,
         | ${piiCountSql("ipv4")} AS n_ip,
         | $redactSql AS redacted
         |FROM s ORDER BY doc_id""".stripMargin,
    "q51_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (
        | SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
        | FROM toks, unnest(generate_series(1, greatest(len(t)-1, 0))) AS s(i)),
        |cnt AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
        |agg AS (SELECT doc_id, max(c) AS mx, sum(c) AS n FROM cnt GROUP BY 1)
        |SELECT d.doc_id,
        | COALESCE(CAST(a.mx AS DOUBLE)/CAST(a.n AS DOUBLE), 0.0) AS top_bigram_frac,
        | CASE WHEN len(string_split(d.text, ' ')) <= 0 THEN 0.0
        |      ELSE 1.0 - CAST(len(list_distinct(string_split(d.text, ' '))) AS DOUBLE)
        |               / CAST(len(string_split(d.text, ' ')) AS DOUBLE) END AS dup_tok_frac
        |FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q54_quantize" ->
      """WITH v AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
        |s AS (
        | SELECT vec_id, ve,
        |  list_max(list_transform(ve, x -> abs(x))) AS scale
        | FROM v)
        |SELECT vec_id, scale,
        | CASE WHEN scale = 0 THEN
        |   array_to_string(list_transform(ve, x -> 0), ',')
        | ELSE
        |   array_to_string(list_transform(ve,
        |     x -> CAST(floor(x / scale * 127.0 + 0.5) AS INTEGER)), ',')
        | END AS codes
        |FROM s ORDER BY vec_id""".stripMargin,
    "q53_vocab" ->
      """SELECT token, CAST(count(*) AS BIGINT) AS n,
        | CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |      FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 500""".stripMargin,
    "q52_simhash_pairs" ->
      s"""WITH toks AS (
         | SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |bits AS (
         | SELECT doc_id,
         |  ${simhashSumsN(32)}
         | FROM toks GROUP BY doc_id),
         |sh AS (SELECT doc_id, ${simhashCombineN(32)} AS simhash FROM bits),
         |banded AS (
         | SELECT doc_id, simhash, b, (simhash >> (b*8)) & 255 AS bv
         | FROM sh, unnest([0,1,2,3]) AS t(b)),
         |pairs AS (
         | SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |  a.simhash AS sa, b.simhash AS sb
         | FROM banded a JOIN banded b ON a.b = b.b AND a.bv = b.bv
         |  AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
         |FROM pairs WHERE bit_count(xor(sa, sb)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,
    "q46_kmeans" -> kmeansSql(k = 8, iters = 2, dim = 64),
    "q105_cluster_sample" -> clusterSampleSql(k = 8, iters = 2, dim = 64,
      keepFracBp = 2500),
    "q112_data_card" ->
      """WITH sw AS (
        | SELECT source, lang, text,
        |  len(list_filter(string_split(lower(text),' '), t -> list_contains(['the','and','of','to','a','in','is','it','that','for'], t))) AS sw_en,
        |  len(list_filter(string_split(lower(text),' '), t -> list_contains(['der','die','das','und','ist','nicht','ein','mit','für','auf'], t))) AS sw_de,
        |  len(list_filter(string_split(lower(text),' '), t -> list_contains(['le','la','les','et','est','un','une','pour','dans','que'], t))) AS sw_fr,
        |  len(list_filter(string_split(lower(text),' '), t -> list_contains(['el','la','los','y','es','un','una','para','en','que'], t))) AS sw_es
        | FROM documents),
        |g AS (
        | SELECT source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
        |  md5(array_to_string(list_sort(list_distinct(string_split(text,' '))),' ')) AS fp,
        |  (CASE
        |    WHEN sw_en >= sw_de AND sw_en >= sw_fr AND sw_en >= sw_es THEN 'en'
        |    WHEN sw_de >= sw_fr AND sw_de >= sw_es THEN 'de'
        |    WHEN sw_fr >= sw_es THEN 'fr'
        |    ELSE 'es' END) <> lang AS mism
        | FROM sw)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(tok) AS BIGINT) AS sum_tokens,
        | CAST(count(DISTINCT fp) AS BIGINT) AS n_unique,
        | CAST(sum(CASE WHEN mism THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_lang_mismatch,
        | (count(*) - count(DISTINCT fp)) * 10000 // count(*) AS dup_rate_bp
        |FROM g GROUP BY source ORDER BY source""".stripMargin,
    "q113_pq_adc" ->
      s"""WITH $pqCtesSql,
        |adc AS (
        | SELECT dq.vec_id AS qid, e.vec_id AS vid,
        |  CAST(sum(dq.d) AS BIGINT) AS adc_dist
        | FROM enc e JOIN dist dq ON dq.m = e.m AND dq.j = e.code
        | WHERE dq.vec_id < 10 AND e.vec_id != dq.vec_id
        | GROUP BY 1, 2)
        |SELECT qid, vid, adc_dist, rnk FROM (
        | SELECT qid, vid, adc_dist,
        |  row_number() OVER (PARTITION BY qid ORDER BY adc_dist, vid) AS rnk
        | FROM adc) WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin,
    "q115_ivfpq" ->
      s"""WITH $pqCtesSql,
        |cents AS (
        | SELECT vec_id AS ccid, ve AS kvec FROM v ORDER BY vec_id LIMIT 16),
        |assigned AS (
        | SELECT vec_id AS vid, ccid FROM (
        |  SELECT c.vec_id, k.ccid,
        |   row_number() OVER (PARTITION BY c.vec_id
        |    ORDER BY list_cosine_similarity(c.ve, k.kvec) DESC, k.ccid) AS rn
        |  FROM v c CROSS JOIN cents k) WHERE rn = 1),
        |probes AS (
        | SELECT qid, ccid FROM (
        |  SELECT q.vec_id AS qid, k.ccid,
        |   row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(q.ve, k.kvec) DESC, k.ccid) AS rn
        |  FROM v q CROSS JOIN cents k WHERE q.vec_id < 10) WHERE rn <= 4),
        |adc AS (
        | SELECT dq.vec_id AS qid, e.vec_id AS vid,
        |  CAST(sum(dq.d) AS BIGINT) AS adc_dist
        | FROM enc e JOIN dist dq ON dq.m = e.m AND dq.j = e.code
        |  JOIN assigned a ON a.vid = e.vec_id
        |  JOIN probes p ON p.qid = dq.vec_id AND p.ccid = a.ccid
        | WHERE dq.vec_id < 10 AND e.vec_id != dq.vec_id
        | GROUP BY 1, 2)
        |SELECT qid, vid, adc_dist, rnk FROM (
        | SELECT qid, vid, adc_dist,
        |  row_number() OVER (PARTITION BY qid ORDER BY adc_dist, vid) AS rnk
        | FROM adc) WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin,
    "q114_binary_ann" ->
      """WITH v AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
        |p AS (
        | SELECT vec_id,
        |  CAST(list_sum(list_transform(range(32), i ->
        |    CASE WHEN ve[i+1] >= 0 THEN (CAST(1 AS BIGINT) << i)
        |         ELSE 0 END)) AS BIGINT) AS b0,
        |  CAST(list_sum(list_transform(range(32), i ->
        |    CASE WHEN ve[i+33] >= 0 THEN (CAST(1 AS BIGINT) << i)
        |         ELSE 0 END)) AS BIGINT) AS b1
        | FROM v),
        |ham AS (
        | SELECT q.vec_id AS qid, c.vec_id AS vid,
        |  bit_count(xor(q.b0, c.b0)) + bit_count(xor(q.b1, c.b1)) AS hm
        | FROM p q JOIN p c ON c.vec_id != q.vec_id
        | WHERE q.vec_id < 10),
        |cand AS (
        | SELECT qid, vid FROM (
        |  SELECT qid, vid,
        |   row_number() OVER (PARTITION BY qid ORDER BY hm, vid) AS rn
        |  FROM ham) WHERE rn <= 32),
        |sims AS (
        | SELECT cand.qid, cand.vid, list_cosine_similarity(q.ve, c.ve) AS sim
        | FROM cand JOIN v q ON q.vec_id = cand.qid
        |  JOIN v c ON c.vec_id = cand.vid)
        |SELECT qid, vid, rnk FROM (
        | SELECT qid, vid,
        |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vid) AS rnk
        | FROM sims) WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin,
    "q116_collocations" ->
      """WITH toks AS (
        | SELECT string_split(text, ' ') AS t FROM documents),
        |tok AS (SELECT unnest(t) AS token FROM toks),
        |uni AS (
        | SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok
        | GROUP BY token),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM tok),
        |bgc AS (
        | SELECT bigram, CAST(count(*) AS BIGINT) AS cxy FROM (
        |  SELECT array_to_string(t[i:i+1], ' ') AS bigram
        |  FROM toks,
        |   unnest(generate_series(1, greatest(len(t)-1, 0))) AS s(i))
        | GROUP BY bigram HAVING count(*) >= 3),
        |sc AS (
        | SELECT bigram, cxy, u1.c AS c1, u2.c AS c2,
        |  CAST(cxy * tot.n_total * 10000 // (u1.c * u2.c) AS BIGINT)
        |   AS pmi_bp
        | FROM bgc CROSS JOIN tot
        |  JOIN uni u1 ON u1.token = string_split(bigram, ' ')[1]
        |  JOIN uni u2 ON u2.token = string_split(bigram, ' ')[2])
        |SELECT bigram, cxy, c1, c2, pmi_bp FROM sc
        |ORDER BY pmi_bp DESC, bigram LIMIT 100""".stripMargin,
    "q118_phrase_search" ->
      """WITH toks AS (
        | SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g2 AS (
        | SELECT doc_id, array_to_string(t[i:i+1], ' ') AS phrase
        | FROM toks,
        |  unnest(generate_series(1, greatest(len(t)-1, 0))) AS s(i)),
        |g3 AS (
        | SELECT doc_id, array_to_string(t[i:i+2], ' ') AS phrase
        | FROM toks,
        |  unnest(generate_series(1, greatest(len(t)-2, 0))) AS s(i)),
        |hits AS (
        | SELECT * FROM g2
        | WHERE phrase IN ('hash join', 'table scan', 'sort merge')
        | UNION ALL
        | SELECT * FROM g3 WHERE phrase = 'slow hash batch')
        |SELECT phrase, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        | CAST(count(*) AS BIGINT) AS n_occ
        |FROM hits GROUP BY phrase ORDER BY phrase""".stripMargin,
    "q119_bm25" ->
      """WITH docs AS (
        | SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |dl AS (
        | SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM docs),
        |stats AS (
        | SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(dl) AS BIGINT) AS total_tokens FROM dl),
        |occ AS (SELECT doc_id, unnest(t) AS token FROM docs),
        |tf AS (
        | SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM occ
        | WHERE token IN ('dup', 'hash', 'scan') GROUP BY doc_id, token),
        |dfq AS (
        | SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf
        | GROUP BY token),
        |sc AS (
        | SELECT tf.doc_id,
        |  (stats.n_docs * 10000 // dfq.df) * tf.tf * 220 //
        |  (tf.tf * 100 + 120 * (100 - 75 +
        |    75 * dl.dl * stats.n_docs // stats.total_tokens)) AS s
        | FROM tf JOIN dfq USING (token)
        |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats)
        |SELECT doc_id, CAST(sum(s) AS BIGINT) AS score_bp
        |FROM sc GROUP BY doc_id
        |ORDER BY score_bp DESC, doc_id LIMIT 20""".stripMargin,
    "q120_commonness" ->
      """WITH docs AS (
        | SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |occ AS (
        | SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, unnest(t) AS token
        | FROM docs),
        |dfq AS (
        | SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        | FROM occ GROUP BY token),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
        |SELECT occ.doc_id,
        | CAST(sum(dfq.df) * 10000 // (occ.dl * n.n_docs) AS BIGINT)
        |  AS common_bp
        |FROM occ JOIN dfq USING (token) CROSS JOIN n
        |GROUP BY occ.doc_id, occ.dl, n.n_docs
        |ORDER BY occ.doc_id""".stripMargin,
    "q109_frame_sample" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS frame_i,
        | md5(substring(text, CAST(1 + strlen(text) * i // 4 AS BIGINT), 16))
        |  AS frame_md5
        |FROM documents, generate_series(0, 3) t(i)
        |ORDER BY doc_id, frame_i""".stripMargin,
    "q75_embed_outliers" -> {
      val (ctes, fin) = kmeansCtes(k = 8, iters = 2, dim = 64)
      s"""WITH $ctes,
         |sim AS (
         | SELECT a.vec_id, a.cid,
         |  list_cosine_similarity(a.ve, kk.cvec) AS csim
         | FROM $fin a JOIN c2 kk ON kk.cid = a.cid),
         |rk AS (
         | SELECT vec_id, cid,
         |  CAST(row_number() OVER (PARTITION BY cid ORDER BY csim, vec_id)
         |   AS BIGINT) AS rnk,
         |  CAST(count(*) OVER (PARTITION BY cid) AS BIGINT) AS n_c
         | FROM sim)
         |SELECT vec_id, cid, rnk, n_c, rnk <= ceil(n_c * 0.1) AS outlier
         |FROM rk ORDER BY vec_id""".stripMargin
    },
    "q47_pack" ->
      """WITH d AS (
        | SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        | FROM documents),
        |c AS (
        | SELECT doc_id, n_tokens,
        |  CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
        | FROM d)
        |SELECT doc_id, n_tokens, cb // 2048 AS chunk_id, cb % 2048 AS chunk_offset
        |FROM c ORDER BY doc_id""".stripMargin,
    "q48_mix" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE CASE lang
        | WHEN 'en' THEN TRUE
        | WHEN 'de' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000'
        | ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '4000' END
        |ORDER BY doc_id""".stripMargin,
    "q41_winnow" ->
      s"""WITH $winnowFpCtes
        |SELECT doc_id, string_agg(h, ',' ORDER BY h) AS fps
        |FROM fp GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "q60_semdedup" -> semdedupSql(k = 8, iters = 2, dim = 64, threshold = 0.4),
    "q67_normalize" ->
      """WITH s AS (
        | SELECT doc_id, text || ' cafe' || chr(769) || ' caf' || chr(233)
        |  || ' no' || chr(776) || 'el' AS t
        | FROM documents)
        |SELECT doc_id, nfc_normalize(t) AS nfc, strip_accents(t) AS plain
        |FROM s ORDER BY doc_id""".stripMargin,
    "q66_incremental_neardup" ->
      """WITH sh AS (
        | SELECT DISTINCT doc_id, source, substr(text, i, 5) AS s
        | FROM documents,
        |  unnest(generate_series(1, greatest(strlen(text)-4, 1))) AS t(i)),
        |sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
        |inter AS (
        | SELECT a.doc_id AS new_id, b.doc_id AS corpus_id, count(*) AS c
        | FROM sh a JOIN sh b ON a.s = b.s
        | WHERE a.source = 'src0' AND b.source != 'src0'
        | GROUP BY 1, 2)
        |SELECT new_id, corpus_id, CAST(c AS DOUBLE)/(x.n + y.n - c) AS jac
        |FROM inter JOIN sizes x ON x.doc_id = new_id
        | JOIN sizes y ON y.doc_id = corpus_id
        |WHERE CAST(c AS DOUBLE)/(x.n + y.n - c) >= 0.9
        |ORDER BY new_id, corpus_id""".stripMargin,
    "q61_shared_passages" ->
      s"""WITH $winnowFpCtes,
        |rare AS (SELECT h FROM fp GROUP BY h HAVING count(*) <= 40),
        |fpk AS (SELECT f.doc_id, f.h FROM fp f JOIN rare USING (h))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        | CAST(count(*) AS BIGINT) AS shared
        |FROM fpk a JOIN fpk b ON a.h = b.h AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 8
        |ORDER BY id_a, id_b""".stripMargin,
    "q62_chunks" ->
      """WITH toks AS (
        | SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |st AS (
        | SELECT doc_id, t, i,
        |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1
        |   AS BIGINT) AS chunk_ix
        | FROM toks,
        |  unnest(generate_series(1, greatest(len(t) - 31, 1), 24)) s(i))
        |SELECT doc_id, chunk_ix,
        | array_to_string(t[i:i+31], ' ') AS chunk_text,
        | CAST(least(len(t) - i + 1, 32) AS BIGINT) AS chunk_tokens
        |FROM st ORDER BY doc_id, chunk_ix""".stripMargin,
    // q94: per-bucket sequential first-fit via a recursive CTE stepping
    // rank-by-rank inside each bucket (base rk=1 opens bin 0).
    "q94_pack_docs" ->
      """WITH RECURSIVE d AS (
        | SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
        |  md5(CAST(doc_id AS VARCHAR)) AS h
        | FROM documents),
        |b AS (
        | SELECT doc_id, n, h,
        |  CAST((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) % 16 AS BIGINT)
        |   AS bucket
        | FROM d),
        |r AS (
        | SELECT doc_id, n, bucket,
        |  row_number() OVER (PARTITION BY bucket ORDER BY h, doc_id) AS rk
        | FROM b),
        |rec(bucket, rk, doc_id, n, fill, bin) AS (
        | SELECT bucket, rk, doc_id, n, n, CAST(0 AS BIGINT) FROM r WHERE rk = 1
        | UNION ALL
        | SELECT r2.bucket, r2.rk, r2.doc_id, r2.n,
        |  CASE WHEN rec.fill + r2.n > 256 THEN r2.n ELSE rec.fill + r2.n END,
        |  CASE WHEN rec.fill + r2.n > 256 THEN rec.bin + 1 ELSE rec.bin END
        | FROM rec JOIN r r2 ON r2.bucket = rec.bucket AND r2.rk = rec.rk + 1)
        |SELECT doc_id, n AS n_tokens, bucket, bin
        |FROM rec ORDER BY doc_id""".stripMargin,
    // q95: the q77 classifier score chain + global rank and running
    // token prefix sum in priority order, budget flag at 20k tokens.
    "q95_budget_select" ->
      """WITH tk AS (
        | SELECT doc_id, lang = 'en' AS y,
        |  unnest(string_split(text, ' ')) AS tok FROM documents),
        |ft AS (
        | SELECT doc_id, y, CAST(
        |   256 * (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1)
        |   + 16 * (strpos('0123456789abcdef', substr(md5(tok), 3, 1)) - 1)
        |   + (strpos('0123456789abcdef', substr(md5(tok), 4, 1)) - 1)
        |  AS BIGINT) AS f
        | FROM tk),
        |w AS (
        | SELECT f, CAST(
        |   (CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) + 1) * 1000000
        |    // (CAST(count(*) AS BIGINT) + 2) AS BIGINT) AS w
        | FROM ft GROUP BY f),
        |per AS (
        | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(CAST(sum(w) AS BIGINT) // CAST(count(*) AS BIGINT) AS BIGINT)
        |   AS score_fp
        | FROM ft JOIN w USING (f) GROUP BY doc_id),
        |r AS (
        | SELECT doc_id, score_fp, n_tokens,
        |  CAST(row_number() OVER (ORDER BY score_fp DESC, doc_id) AS BIGINT)
        |   AS rank,
        |  CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY score_fp DESC, doc_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |   AS cum_before
        | FROM per)
        |SELECT doc_id, score_fp, n_tokens, rank, cum_before,
        | cum_before + n_tokens <= 20000 AS selected
        |FROM r ORDER BY rank""".stripMargin,
    "q77_classifier" ->
      """WITH tk AS (
        | SELECT doc_id, lang = 'en' AS y,
        |  unnest(string_split(text, ' ')) AS tok FROM documents),
        |ft AS (
        | SELECT doc_id, y, CAST(
        |   256 * (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1)
        |   + 16 * (strpos('0123456789abcdef', substr(md5(tok), 3, 1)) - 1)
        |   + (strpos('0123456789abcdef', substr(md5(tok), 4, 1)) - 1)
        |  AS BIGINT) AS f
        | FROM tk),
        |w AS (
        | SELECT f, CAST(
        |   (CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) + 1) * 1000000
        |    // (CAST(count(*) AS BIGINT) + 2) AS BIGINT) AS w
        | FROM ft GROUP BY f),
        |per AS (
        | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(w) AS BIGINT) AS ws
        | FROM ft JOIN w USING (f) GROUP BY doc_id)
        |SELECT doc_id, n_tokens,
        | CAST(ws // n_tokens AS BIGINT) AS score_fp,
        | 2 * ws > n_tokens * 1000000 AS pred
        |FROM per ORDER BY doc_id""".stripMargin,
    "q78_dup_spans" ->
      s"""WITH $winnowFpCtes,
        |dfc AS (SELECT h, CAST(count(*) AS BIGINT) AS dfn FROM fp GROUP BY h),
        |per AS (
        | SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_fp,
        |  CAST(sum(CASE WHEN dfn >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
        | FROM fp f JOIN dfc USING (h) GROUP BY f.doc_id)
        |SELECT doc_id, n_fp, n_shared,
        | CAST(n_shared * 10000 // n_fp AS BIGINT) AS dup_bp,
        | n_shared * 10000 // n_fp >= 2500 AS flagged
        |FROM per ORDER BY doc_id""".stripMargin,
    "q79_backoff" ->
      """WITH tk AS (
        | SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |tri AS (
        | SELECT doc_id,
        |  ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g3,
        |  ts[i+1] || ' ' || ts[i+2] AS g2,
        |  ts[i+2] AS g1
        | FROM tk, unnest(generate_series(1, greatest(len(ts) - 2, 0))) s(i)),
        |m3 AS (SELECT g3, CAST(count(*) AS BIGINT) AS c3 FROM tri GROUP BY g3),
        |bi AS (
        | SELECT ts[i] || ' ' || ts[i+1] AS g2 FROM tk,
        |  unnest(generate_series(1, greatest(len(ts) - 1, 0))) s(i)),
        |m2 AS (SELECT g2, CAST(count(*) AS BIGINT) AS c2 FROM bi GROUP BY g2),
        |un AS (SELECT unnest(ts) AS g1 FROM tk),
        |m1 AS (SELECT g1, CAST(count(*) AS BIGINT) AS c1 FROM un GROUP BY g1),
        |lvl AS (
        | SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tri,
        |  CAST(sum(CASE WHEN c3 >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS l3,
        |  CAST(sum(CASE WHEN c3 < 2 AND c2 >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS l2,
        |  CAST(sum(CASE WHEN c3 < 2 AND c2 < 2 AND c1 >= 2 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS l1,
        |  CAST(sum(CASE WHEN c3 < 2 AND c2 < 2 AND c1 < 2 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS l0
        | FROM tri t JOIN m3 USING (g3) JOIN m2 USING (g2) JOIN m1 USING (g1)
        | GROUP BY t.doc_id)
        |SELECT d.doc_id, CAST(COALESCE(n_tri, 0) AS BIGINT) AS n_tri,
        | CAST(COALESCE(l3, 0) AS BIGINT) AS l3,
        | CAST(COALESCE(l2, 0) AS BIGINT) AS l2,
        | CAST(COALESCE(l1, 0) AS BIGINT) AS l1,
        | CAST(COALESCE(l0, 0) AS BIGINT) AS l0
        |FROM documents d LEFT JOIN lvl ON lvl.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "q80_excise_spans" ->
      """WITH g AS (
        | SELECT doc_id, i, substr(md5(substr(text, i, 5)), 1, 16) AS h
        | FROM documents,
        |  unnest(generate_series(1, greatest(strlen(text)-4, 1))) AS t(i)),
        |g2 AS (
        | SELECT doc_id, i, h,
        |  min(h) OVER (PARTITION BY doc_id ORDER BY i
        |   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh,
        |  count(*) OVER (PARTITION BY doc_id) AS n
        | FROM g),
        |pos AS (
        | SELECT a.doc_id, a.i AS ws, max(b.i) AS selpos
        | FROM g2 a JOIN g b ON b.doc_id = a.doc_id
        |  AND b.i BETWEEN a.i AND a.i + 3 AND b.h = a.mh
        | WHERE a.i <= greatest(a.n - 3, 1)
        | GROUP BY 1, 2),
        |fpp AS (
        | SELECT DISTINCT p.doc_id, p.selpos AS p, g.h
        | FROM pos p JOIN g ON g.doc_id = p.doc_id AND g.i = p.selpos),
        |shared AS (
        | SELECT h FROM (SELECT DISTINCT doc_id, h FROM fpp)
        | GROUP BY h HAVING count(*) >= 2),
        |sp AS (SELECT doc_id, p, p + 4 AS q FROM fpp JOIN shared USING (h)),
        |cm AS (SELECT doc_id, p, q,
        |  max(q) OVER (PARTITION BY doc_id ORDER BY p, q
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM sp),
        |i1 AS (SELECT doc_id, p, q,
        |  sum(CASE WHEN pm IS NULL OR p > pm THEN 1 ELSE 0 END)
        |   OVER (PARTITION BY doc_id ORDER BY p, q) AS iid FROM cm),
        |isl AS (SELECT doc_id, iid, min(p) AS s, max(q) AS e
        | FROM i1 GROUP BY 1, 2),
        |seg AS (SELECT doc_id, s, e,
        |  coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) AS pe
        | FROM isl),
        |per AS (
        | SELECT seg.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |  string_agg(substr(d.text, pe + 1, s - pe - 1), '' ORDER BY s) AS head,
        |  max(e) AS laste
        | FROM seg JOIN documents d ON d.doc_id = seg.doc_id
        | GROUP BY seg.doc_id)
        |SELECT d.doc_id, CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
        | CASE WHEN p.doc_id IS NULL THEN d.text
        |  ELSE coalesce(p.head, '') || substr(d.text, p.laste + 1) END AS clean_text
        |FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "q63_importance" ->
      """WITH tk AS (
        | SELECT doc_id, lang = 'en' AS tgt,
        |  unnest(string_split(text, ' ')) AS tok FROM documents),
        |model AS (
        | SELECT tok, CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct,
        |  CAST(count(*) AS BIGINT) AS cb
        | FROM tk GROUP BY tok)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        | CAST(sum(ct) AS BIGINT) AS target_mass,
        | CAST(sum(cb) AS BIGINT) AS background_mass
        |FROM tk t JOIN model USING (tok)
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    "q64_source_cap" ->
      """SELECT doc_id, source FROM (
        | SELECT doc_id, source,
        |  row_number() OVER (PARTITION BY source
        |   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        | FROM documents) WHERE rk <= 40
        |ORDER BY doc_id""".stripMargin,
    "q65_source_stats" ->
      """WITH d AS (
        | SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
        |  doc_id FROM documents),
        |r AS (
        | SELECT source, nt,
        |  row_number() OVER (PARTITION BY source ORDER BY nt, doc_id) AS rr,
        |  count(*) OVER (PARTITION BY source) AS n FROM d)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(nt) AS BIGINT) AS total_tokens,
        | min(nt) AS min_tokens, max(nt) AS max_tokens,
        | max(CASE WHEN rr = CAST(ceil(n * 0.5) AS BIGINT) THEN nt END) AS p50_tokens,
        | max(CASE WHEN rr = CAST(ceil(n * 0.9) AS BIGINT) THEN nt END) AS p90_tokens
        |FROM r GROUP BY source ORDER BY source""".stripMargin,
    "q40_ann_ivf" ->
      """WITH cents AS (
        | SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
        | FROM embeddings ORDER BY vec_id LIMIT 16),
        |corpus AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
        |assigned AS (
        | SELECT vec_id AS vid, ve, cid FROM (
        |  SELECT c.vec_id, c.ve, k.cid,
        |   row_number() OVER (PARTITION BY c.vec_id
        |    ORDER BY list_cosine_similarity(c.ve, k.cvec) DESC, k.cid) AS rn
        |  FROM corpus c CROSS JOIN cents k) WHERE rn = 1),
        |probes AS (
        | SELECT qid, qv, cid FROM (
        |  SELECT q.vec_id AS qid, q.ve AS qv, k.cid,
        |   row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(q.ve, k.cvec) DESC, k.cid) AS rn
        |  FROM corpus q CROSS JOIN cents k WHERE q.vec_id < 10) WHERE rn <= 4),
        |cand AS (
        | SELECT p.qid, a.vid, list_cosine_similarity(p.qv, a.ve) AS sim
        | FROM probes p JOIN assigned a ON a.cid = p.cid AND a.vid != p.qid)
        |SELECT qid, vid, rnk FROM (
        | SELECT qid, vid,
        |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vid) AS rnk
        | FROM cand) WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    "q39_embed_neardup" -> {
      val bucket = lshBucketSql(q39Lsh, "embedding")
      s"""WITH v AS (
         | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve,
         |  $bucket AS b
         | FROM embeddings)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         | list_cosine_similarity(a.ve, b.ve) AS sim
         |FROM v a JOIN v b
         | ON ${probeInSql(q39Lsh, 2, "a.b", "b.b")} AND a.vec_id < b.vec_id
         |WHERE list_cosine_similarity(a.ve, b.ve) >= 0.4
         |ORDER BY id_a, id_b""".stripMargin
    },
    "q36_ann_lsh" ->
      s"""${annCandSql(q36Lsh, probes = 1, queryPred = "vec_id < 10")}
         |SELECT qid, vid, rnk FROM (
         | SELECT qid, vid,
         |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vid) AS rnk
         | FROM cand)
         |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    "q93_hard_negatives" ->
      s"""${annCandSql(q37Lsh, probes = 2, queryPred = "vec_id < 50")},
         |lab AS (
         | SELECT qid, vid, sim FROM cand
         | JOIN embeddings ql ON ql.vec_id = cand.qid
         | JOIN embeddings cl ON cl.vec_id = cand.vid
         | WHERE ql.label != cl.label)
         |SELECT qid, vid, rnk FROM (
         | SELECT qid, vid,
         |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vid) AS rnk
         | FROM lab)
         |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    "q37_label_noise" ->
      s"""${annCandSql(q37Lsh, probes = 2, queryPred = "vec_id < 50")},
         |nn AS (
         | SELECT qid, vid FROM (
         |  SELECT qid, vid,
         |   row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vid) AS rnk
         |  FROM cand) WHERE rnk <= 5),
         |votes AS (
         | SELECT qid, e.label AS n_label, count(*) AS votes
         | FROM nn JOIN embeddings e ON e.vec_id = nn.vid GROUP BY 1, 2),
         |knn AS (
         | SELECT qid, n_label AS knn_label FROM (
         |  SELECT qid, n_label,
         |   row_number() OVER (PARTITION BY qid ORDER BY votes DESC, n_label) AS rk
         |  FROM votes) WHERE rk = 1)
         |SELECT e.vec_id AS qid, e.label, knn.knn_label,
         | e.label = knn.knn_label AS agree
         |FROM embeddings e JOIN knn ON knn.qid = e.vec_id
         |ORDER BY qid""".stripMargin,
    "q25_dedup_fingerprint" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(string_split(text,' '))),' ')) AS dedupe_key,
        | min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY dedupe_key""".stripMargin,
    "q26_minhash_sig" ->
      """WITH sh AS (
        | SELECT doc_id, md5(substr(text, i, 5)) AS h
        | FROM documents, unnest(generate_series(1, greatest(strlen(text)-4, 1))) AS t(i))
        |SELECT doc_id,
        | min(h) AS m0,
        | min(substr(h, 9) || substr(h, 1, 8)) AS m1,
        | min(substr(h, 17) || substr(h, 1, 16)) AS m2,
        | min(substr(h, 25) || substr(h, 1, 24)) AS m3
        |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q27_minhash_lsh_pairs" ->
      """WITH sh AS (
        | SELECT DISTINCT doc_id, substr(text, i, 5) AS s
        | FROM documents, unnest(generate_series(1, greatest(strlen(text)-4, 1))) AS t(i)),
        |sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
        |inter AS (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        | FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        | GROUP BY 1, 2)
        |SELECT id_a, id_b, CAST(c AS DOUBLE)/(x.n + y.n - c) AS jac
        |FROM inter JOIN sizes x ON x.doc_id = id_a JOIN sizes y ON y.doc_id = id_b
        |WHERE CAST(c AS DOUBLE)/(x.n + y.n - c) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,
    "q28_simhash" ->
      s"""WITH toks AS (
         | SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |bits AS (
         | SELECT doc_id,
         |  $simhashSums
         | FROM toks GROUP BY doc_id)
         |SELECT doc_id, $simhashCombine AS simhash
         |FROM bits ORDER BY doc_id""".stripMargin,
    "q168_simhash64" ->
      s"""WITH toks AS (
         | SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |bits AS (
         | SELECT doc_id,
         |  ${simhashSumsN(64)}
         | FROM toks GROUP BY doc_id)
         |SELECT doc_id, ${simhashCombineN(64)} AS simhash
         |FROM bits ORDER BY doc_id""".stripMargin,
    "q29_cosine_topk" ->
      """WITH sims AS (
        | SELECT q.vec_id AS qid, c.vec_id AS vid,
        |  list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS sim
        | FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
        | WHERE q.vec_id < 10)
        |SELECT qid, vid, rnk FROM (
        | SELECT qid, vid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vid) AS rnk
        | FROM sims)
        |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    "q30_text_quality" ->
      """SELECT doc_id,
        | len(string_split(text, ' ')) AS n_tokens,
        | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpe,
        | len(list_filter(string_split(lower(text), ' '),
        |     t -> list_contains(['the','and','of','to','a','in','is','it','that','for'], t))) AS sw_hits,
        | CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / CAST(length(text) AS DOUBLE) AS punct_ratio,
        | CAST(length(text) - (len(string_split(text,' ')) - 1) AS DOUBLE) / CAST(len(string_split(text,' ')) AS DOUBLE) AS mean_tok_len,
        | CASE
        |  WHEN sw_en >= sw_de AND sw_en >= sw_fr AND sw_en >= sw_es THEN 'en'
        |  WHEN sw_de >= sw_fr AND sw_de >= sw_es THEN 'de'
        |  WHEN sw_fr >= sw_es THEN 'fr'
        |  ELSE 'es' END AS lang_guess,
        | least(CAST(length(text) AS DOUBLE)/500.0, 1.0) * 0.4
        |  + least((CAST(sw_en AS DOUBLE)/CAST(len(string_split(text,' ')) AS DOUBLE)) * 5.0, 1.0) * 0.3
        |  + greatest(0.0, 1.0 - (CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)/CAST(length(text) AS DOUBLE)) * 10.0) * 0.3 AS quality
        |FROM (
        | SELECT *,
        |  len(list_filter(string_split(lower(text),' '), t -> list_contains(['the','and','of','to','a','in','is','it','that','for'], t))) AS sw_en,
        |  len(list_filter(string_split(lower(text),' '), t -> list_contains(['der','die','das','und','ist','nicht','ein','mit','für','auf'], t))) AS sw_de,
        |  len(list_filter(string_split(lower(text),' '), t -> list_contains(['le','la','les','et','est','un','une','pour','dans','que'], t))) AS sw_fr,
        |  len(list_filter(string_split(lower(text),' '), t -> list_contains(['el','la','los','y','es','un','una','para','en','que'], t))) AS sw_es
        | FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q146_preference_pairs" ->
      """WITH c AS (
        | SELECT user_id, event_id, value,
        |  row_number() OVER (PARTITION BY user_id
        |   ORDER BY value DESC, event_id) AS best,
        |  row_number() OVER (PARTITION BY user_id
        |   ORDER BY value ASC, event_id) AS worst,
        |  count(*) OVER (PARTITION BY user_id) AS n
        | FROM events WHERE event_type = 'click')
        |SELECT ch.user_id,
        | ch.event_id AS chosen_id, ch.value AS chosen_value,
        | rj.event_id AS rejected_id, rj.value AS rejected_value
        |FROM (SELECT * FROM c WHERE best = 1 AND n >= 2) ch
        |JOIN (SELECT * FROM c WHERE worst = 1 AND n >= 2) rj
        | USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "q147_schema_validate" ->
      """WITH v AS (
        | SELECT event_type,
        |  CASE WHEN json_type(json_extract(props, '$.k')) IN
        |    ('INTEGER', 'UBIGINT', 'BIGINT')
        |   AND CAST(json_extract(props, '$.k') AS BIGINT) BETWEEN 0 AND 50
        |   THEN 1 ELSE 0 END AS ok
        | FROM events)
        |SELECT event_type,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(ok) AS BIGINT) AS n_valid,
        | CAST(sum(ok) * 10000 // count(*) AS BIGINT) AS valid_bp
        |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q148_rrf_fusion" ->
      """WITH qd AS (
        | SELECT doc_id AS qid, list_distinct(string_split(text, ' ')) AS qt
        | FROM documents WHERE doc_id < 10),
        |cd AS (
        | SELECT doc_id AS vid, list_distinct(string_split(text, ' ')) AS ct
        | FROM documents),
        |ov AS (
        | SELECT qid, vid, len(list_intersect(qt, ct)) AS ov
        | FROM qd JOIN cd ON vid != qid),
        |lex AS (
        | SELECT qid, vid, rnk FROM (
        |  SELECT qid, vid,
        |   row_number() OVER (PARTITION BY qid ORDER BY ov DESC, vid) AS rnk
        |  FROM ov WHERE ov > 0) WHERE rnk <= 5),
        |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |      WHERE vec_id < 10),
        |c AS (SELECT vec_id AS vid, embedding AS cv FROM embeddings),
        |dense AS (
        | SELECT qid, vid, rnk FROM (
        |  SELECT q.qid, c.vid,
        |   row_number() OVER (PARTITION BY q.qid
        |    ORDER BY list_cosine_similarity(qv, cv) DESC, vid) AS rnk
        |  FROM q JOIN c ON c.vid != q.qid) WHERE rnk <= 5),
        |u AS (
        | SELECT qid, vid, 1000000 // (60 + rnk) AS s FROM lex
        | UNION ALL
        | SELECT qid, vid, 1000000 // (60 + rnk) AS s FROM dense),
        |f AS (
        | SELECT qid, vid, CAST(sum(s) AS BIGINT) AS rrf_bp
        | FROM u GROUP BY qid, vid)
        |SELECT qid, vid, rrf_bp, rnk FROM (
        | SELECT qid, vid, rrf_bp,
        |  row_number() OVER (PARTITION BY qid
        |   ORDER BY rrf_bp DESC, vid) AS rnk
        | FROM f) WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin,
    // EXACT oracle, but prefix-filtered like the query under test so it
    // finishes at sf0.1 (the old all-pairs brute force DNF'd there:
    // 12.5M pairs × list_intersect > 68 min; this runs ~2.5 min). The
    // prefix theorem gives zero false negatives under ANY total token
    // order, so the oracle's (document-frequency, bigram) order needn't
    // match the query's dictionary encoding — both are exact, and the
    // independent candidate paths still cross-check each other's
    // exactness claim: a pair either side's filter wrongly dropped
    // would flip the gate.
    "q149_jaccard_join" ->
      """WITH toks AS (
        | SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |s AS (
        | SELECT doc_id,
        |  list_distinct([tk[i] || ' ' || tk[i+1]
        |                 for i in range(1, len(tk))]) AS ts
        | FROM toks WHERE len(tk) >= 2),
        |s2 AS (SELECT doc_id, ts, len(ts) AS sz FROM s WHERE len(ts) > 0),
        |el AS (SELECT doc_id, unnest(ts) AS g, sz FROM s2),
        |df AS (SELECT g, count(*) AS c FROM el GROUP BY g),
        |ord AS (
        | SELECT e.doc_id, e.g, e.sz,
        |  row_number() OVER (PARTITION BY e.doc_id ORDER BY d.c, e.g)
        |   AS pos
        | FROM el e JOIN df d USING (g)),
        |pref AS (
        | SELECT doc_id, g, sz, pos FROM ord
        | WHERE pos <= sz - (7000 * sz + 9999) // 10000 + 1),
        |cand AS (
        | SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        | FROM pref a JOIN pref b ON a.g = b.g AND a.doc_id < b.doc_id
        | WHERE a.sz * 7000 <= b.sz * 10000
        |   AND b.sz * 7000 <= a.sz * 10000),
        |p AS (
        | SELECT id_a, id_b,
        |  CAST(len(list_intersect(x.ts, y.ts)) AS BIGINT) AS i,
        |  CAST(x.sz + y.sz - len(list_intersect(x.ts, y.ts)) AS BIGINT)
        |   AS u
        | FROM cand JOIN s2 x ON x.doc_id = id_a
        |  JOIN s2 y ON y.doc_id = id_b)
        |SELECT id_a, id_b, CAST(i * 10000 // u AS BIGINT) AS jac_bp
        |FROM p WHERE i * 10000 >= 7000 * u
        |ORDER BY id_a, id_b""".stripMargin,
    "q144_fim" ->
      """WITH f AS (
        | SELECT doc_id, text, length(text) AS len,
        |  length(text) * (doc_id % 30 + 20) // 100 AS p,
        |  length(text) * (doc_id % 25 + 55) // 100 AS m
        | FROM documents)
        |SELECT doc_id,
        | md5('<PRE>' || substr(text, 1, p) || '<SUF>' || substr(text, m + 1)
        |  || '<MID>' || substr(text, p + 1, m - p)) AS fim_md5,
        | CAST(p AS BIGINT) AS n_pre,
        | CAST(m - p AS BIGINT) AS n_mid,
        | CAST(len - m AS BIGINT) AS n_suf
        |FROM f ORDER BY doc_id""".stripMargin,
    "q145_chat_render" ->
      """WITH t AS (
        | SELECT user_id, ts, event_id,
        |  '<|' || event_type || '|>' || props AS turn, event_type
        | FROM events)
        |SELECT user_id,
        | CAST(count(*) AS BIGINT) AS n_turns,
        | md5(string_agg(turn, chr(10) ORDER BY ts, event_id))
        |  AS transcript_md5,
        | CAST(length(string_agg(turn, chr(10) ORDER BY ts, event_id))
        |  AS BIGINT) AS n_chars,
        | CAST(sum(CASE WHEN event_type IN ('click', 'purchase')
        |  THEN length(turn) ELSE 0 END) AS BIGINT) AS mask_chars
        |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q142_ann_recall" ->
      s"""${annCandSql(q36Lsh, probes = 1, queryPred = "vec_id < 10")},
         |ann AS (
         | SELECT qid, vid FROM (
         |  SELECT qid, vid,
         |   row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vid) AS rnk
         |  FROM cand)
         | WHERE rnk <= 5),
         |ex AS (
         | SELECT qid, vid FROM (
         |  SELECT q.qid, c.vid,
         |   row_number() OVER (PARTITION BY q.qid
         |    ORDER BY list_cosine_similarity(qv, cv) DESC, vid) AS rnk
         |  FROM q JOIN c ON c.vid != q.qid)
         | WHERE rnk <= 5)
         |SELECT ex.qid,
         | CAST(count(ann.vid) AS BIGINT) AS n_hits,
         | CAST(count(ann.vid) * 10000 // 5 AS BIGINT) AS recall_bp
         |FROM ex LEFT JOIN ann ON ann.qid = ex.qid AND ann.vid = ex.vid
         |GROUP BY ex.qid ORDER BY ex.qid""".stripMargin,
    "q143_dataset_diff" ->
      """WITH old AS (
        | SELECT doc_id, md5(text) AS old_fp, substr(md5(text),1,1) AS b
        | FROM documents),
        |nw AS (
        | SELECT doc_id,
        |  md5(CASE WHEN b IN ('2','3') THEN upper(text) ELSE text END) AS new_fp
        | FROM (SELECT doc_id, text, substr(md5(text),1,1) AS b FROM documents)
        | WHERE b NOT IN ('0','1')
        | UNION ALL
        | SELECT doc_id + 1000000, md5(reverse(text))
        | FROM documents WHERE substr(md5(text),1,1) = 'f')
        |SELECT COALESCE(old.doc_id, nw.doc_id) AS doc_id,
        | CASE WHEN old.doc_id IS NULL THEN 'added'
        |      WHEN nw.doc_id IS NULL THEN 'removed'
        |      WHEN old_fp != new_fp THEN 'changed'
        |      ELSE 'unchanged' END AS status,
        | old_fp, new_fp
        |FROM old FULL JOIN nw ON old.doc_id = nw.doc_id
        |ORDER BY doc_id""".stripMargin,
    "q140_bmp_decode" ->
      """SELECT doc_id,
        | CAST(54 + (doc_id % 8 + 1) *
        |   ((( doc_id % 16 + 1) * 3 + 3) // 4 * 4) AS BIGINT) AS n_bytes,
        | 'bmp' AS format,
        | CAST(doc_id % 16 + 1 AS BIGINT) AS width,
        | CAST(doc_id % 8 + 1 AS BIGINT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q141_wav_decode" ->
      """SELECT doc_id,
        | CAST(44 + 2 * (doc_id % 97 + 160) AS BIGINT) AS n_bytes,
        | 'wav' AS format,
        | CAST(1 AS BIGINT) AS channels,
        | CAST(8000 AS BIGINT) AS sample_rate,
        | CAST(doc_id % 97 + 160 AS BIGINT) AS frames,
        | CAST(doc_id % 97 + 160 AS DOUBLE) / 8 AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q158_flac_decode" ->
      """SELECT doc_id,
        | CAST(46 + (doc_id % 32) AS BIGINT) AS n_bytes,
        | CAST(8000 + (doc_id % 6) * 8000 AS BIGINT) AS sample_rate,
        | CAST(doc_id % 2 + 1 AS BIGINT) AS channels,
        | CAST(16 + (doc_id % 2) * 8 AS BIGINT) AS bits_per_sample,
        | CAST(doc_id * 100 + 4410 AS BIGINT) AS total_samples,
        | CAST((doc_id * 100 + 4410) * 1000 // (8000 + (doc_id % 6) * 8000) AS BIGINT)
        |  AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q157_mp3_decode" ->
      """WITH p AS (
        | SELECT doc_id,
        |  ([32,40,48,56,64,80,96,112,128,160,192,224,256,320])[CAST(doc_id % 14 + 1 AS INT)] AS kbps,
        |  ([44100,48000,32000])[CAST(doc_id % 3 + 1 AS INT)] AS rate,
        |  doc_id % 50 + 10 AS frames,
        |  doc_id % 64 AS junk
        | FROM documents)
        |SELECT doc_id,
        | CAST(10 + junk + frames * (144000 * kbps // rate) AS BIGINT) AS n_bytes,
        | CAST(kbps AS BIGINT) AS bitrate_kbps,
        | CAST(rate AS BIGINT) AS sample_rate,
        | CAST(frames AS BIGINT) AS n_frames,
        | CAST(frames * 1152 * 1000 // rate AS BIGINT) AS duration_ms
        |FROM p ORDER BY doc_id""".stripMargin,
    "q156_mp4_decode" ->
      """SELECT doc_id,
        | CAST(148 + (doc_id % 16) + 16 * (doc_id % 3 + 1) AS BIGINT) AS n_bytes,
        | 'isom' AS brand,
        | CAST(600 + (doc_id % 4) * 200 AS BIGINT) AS timescale,
        | CAST(doc_id % 9000 + 1200 AS BIGINT) AS duration_units,
        | CAST((doc_id % 9000 + 1200) * 1000 // (600 + (doc_id % 4) * 200) AS BIGINT)
        |  AS duration_ms,
        | CAST(doc_id % 3 + 1 AS BIGINT) AS n_tracks
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q165_mp3_frames" ->
      """WITH p AS (
        | SELECT doc_id,
        |  list_extract([32,40,48,56,64,80,96,112,128,160,192,224,256,320],
        |    CAST(doc_id % 14 + 1 AS INT)) AS kbps,
        |  list_extract([44100,48000,32000], CAST(doc_id % 3 + 1 AS INT)) AS rate,
        |  unnest(range(0, doc_id % 4 + 2)) AS i
        | FROM documents),
        |q AS (
        | SELECT doc_id, i, 144000 * kbps // rate AS flen,
        |  'f' || i || '-d' || doc_id AS pat
        | FROM p)
        |SELECT doc_id, CAST(i AS BIGINT) AS frame_i,
        | md5(substr(repeat(pat, CAST((flen - 4) // length(pat) AS INT) + 1),
        |   1, CAST(flen - 4 AS INT))) AS payload_md5,
        | CAST(flen AS BIGINT) AS n_bytes
        |FROM q ORDER BY doc_id, frame_i""".stripMargin,
    "q164_mp4_samples" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS sample_i,
        | md5('s' || i || '-d' || doc_id) AS sample_md5,
        | CAST(length('s' || i || '-d' || doc_id) AS BIGINT) AS n_bytes
        |FROM (SELECT doc_id, unnest(range(0, doc_id % 6 + 2)) AS i FROM documents)
        |ORDER BY doc_id, sample_i""".stripMargin,
    "q162_flac_samples" ->
      """WITH g AS (
        | SELECT doc_id, unnest(range(0, doc_id % 300 + 20)) AS i FROM documents)
        |SELECT doc_id,
        | CAST(count(*) AS BIGINT) AS n_samples,
        | CAST(sum((doc_id*7 + i*13) % 256 - 128) AS BIGINT) AS sum_s,
        | CAST(min((doc_id*7 + i*13) % 256 - 128) AS BIGINT) AS min_s,
        | CAST(max((doc_id*7 + i*13) % 256 - 128) AS BIGINT) AS max_s
        |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q160_avi_frames" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS frame_i,
        | md5('frame-' || i || '-doc-' || doc_id) AS frame_md5,
        | CAST(length('frame-' || i || '-doc-' || doc_id) AS BIGINT) AS n_bytes
        |FROM (SELECT doc_id, unnest(range(0, doc_id % 5 + 2)) AS i FROM documents)
        |ORDER BY doc_id, frame_i""".stripMargin,
    "q150_avi_decode" ->
      """SELECT doc_id,
        | CAST(108 + (doc_id % 32) + ((doc_id % 32) % 2) AS BIGINT) AS n_bytes,
        | 'avi' AS format,
        | CAST(160 + (doc_id % 8) * 16 AS BIGINT) AS width,
        | CAST(120 + (doc_id % 6) * 8 AS BIGINT) AS height,
        | CAST(doc_id % 120 + 24 AS BIGINT) AS total_frames,
        | CAST(33333 AS BIGINT) AS usec_per_frame,
        | CAST((doc_id % 120 + 24) * 33333 AS BIGINT) AS duration_us
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q31_multimodal_meta" ->
      """SELECT doc_id,
        | strlen(text) AS n_bytes,
        | CASE WHEN ascii(substr(md5(text),1,1)) % 3 = 0 THEN 'png'
        |      WHEN ascii(substr(md5(text),1,1)) % 3 = 1 THEN 'jpeg'
        |      ELSE 'webp' END AS format,
        | 320 + (ascii(substr(md5(text),2,1)) % 16) * 64 AS width,
        | 240 + (ascii(substr(md5(text),3,1)) % 16) * 48 AS height
        |FROM documents ORDER BY doc_id""".stripMargin)
}
