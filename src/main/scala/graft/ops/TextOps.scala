package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language-ID, quality scoring, token counting, fingerprinting — all
  * pure `functions._` column expressions (whole-stage codegen, zero UDFs)
  * with value-identical DuckDB SQL oracles (see SparkEntry.oracleSql).
  */
object TextOps {

  /** 60-bit integer hash from md5 — the cross-engine hash primitive
    * (DuckDB: ('0x'||substr(md5(s),1,15))::BIGINT). Implemented as the
    * native codegen'd [[H60Expr]]: value-identical to the
    * `conv(substring(md5(c),1,15),16,10)` chain every oracle replays
    * (asserted in tests) but ~4× cheaper per row — no MessageDigest
    * allocation, no hex-string materialization, no base-16 parse. Every
    * md5-deterministic operator (minhash, simhash, sampling, splits,
    * sketches, fingerprints) rides this one function.
    */
  def hexInt(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      H60Expr(org.apache.spark.sql.GraftColumnBridge.expression(
        c.cast("string"))))

  /** JVM twin of [[hexInt]] for typed kernels: first 15 hex chars of md5
    * = top 60 bits of the digest (first 8 bytes big-endian >>> 4) —
    * bit-identical to the column form and the DuckDB oracle. Callers pass
    * a reusable MessageDigest (one per partition, reset per call).
    */
  def h60(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  private val tlMd = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** [[h60]] over a UTF8String with a thread-local digest — the static
    * target [[H60Expr]]'s generated code calls. Digesting the UTF-8
    * bytes directly is byte-identical to `s.getBytes(UTF_8)` (UTF8String
    * IS the UTF-8 encoding) and allocates neither a String nor a
    * MessageDigest per row.
    */
  def h60Tl(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = tlMd.get()
    md.reset()
    val d = md.digest(s.getBytes)
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  /** Exact word-occurrence count via array filter (identical lambda
    * semantics in DuckDB's list_filter).
    */
  def wordCount(text: Column, word: String): Column =
    size(filter(split(text, " "), w => w === lit(word))).cast("long")

  private val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "is"),
    "de" -> Seq("der", "und", "das"),
    "fr" -> Seq("le", "et", "la"),
    "es" -> Seq("el", "y", "la"))

  /** Row-local language vote over a text column — the argmax CASE of
    * [[langId]] as a single Column, so cascades ([[Filters
    * .curationFunnel]]) can evaluate it inline without a join back.
    */
  def langPredCol(text: Column): Column = {
    def score(l: String) = markers(l).map(w => wordCount(text, w)).reduce(_ + _)
    val best = greatest(markers.keys.toSeq.sorted.map(score): _*)
    when(score("en") === best, "en")
      .when(score("de") === best, "de")
      .when(score("fr") === best, "fr")
      .otherwise("es")
  }

  /** Heuristic language-ID: marker-word occurrence scores, argmax with
    * fixed tie order en > de > fr > es.
    */
  def langId(docs: DataFrame): DataFrame = {
    val scored = markers.foldLeft(docs) { case (df, (lang, ws)) =>
      df.withColumn(s"score_$lang",
        ws.map(w => wordCount(col("text"), w)).reduce(_ + _))
    }
    scored.select(
      col("doc_id"),
      col("score_en"), col("score_de"), col("score_fr"), col("score_es"),
      langPredCol(col("text")).as("lang_pred"))
  }

  /** Stopword list shared with the DuckDB oracle (en + de heads). */
  val stopwords: Seq[String] = Seq(
    "the", "and", "is", "of", "to", "in",
    "der", "die", "das", "und", "ist", "ein")

  /** Quality scoring: length/alpha/digit ratios, mean token length, and
    * the stopword ratio (rounded for cross-engine float stability).
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val nChars = length(col("text")).cast("double")
    val nAlpha = length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("double")
    val nDigit = length(regexp_replace(col("text"), "[^0-9]", "")).cast("double")
    val nTokens = size(split(col("text"), " ")).cast("double")
    val nStop = stopwords.map(w => wordCount(col("text"), w)).reduce(_ + _)
      .cast("double")
    docs.select(
      col("doc_id"),
      nChars.cast("long").as("n_chars_obs"),
      round(nAlpha / nChars, 6).as("alpha_ratio"),
      round(nDigit / nChars, 6).as("digit_ratio"),
      round((nChars - nTokens + 1) / nTokens, 6).as("mean_token_len"),
      round(nStop / nTokens, 6).as("stopword_ratio"),
      round(nAlpha / nChars * least(nTokens / lit(50.0), lit(1.0)), 6).as("quality"))
  }

  /** BPE-ish token counting: a GPT-2-style pre-tokenizer regex (leading-
    * space word / number / punctuation runs) counted via
    * regexp_extract_all — the whitespace count's subword-aware sibling.
    * Restricted to ASCII classes so the Java and RE2 (DuckDB) engines
    * agree.
    */
  val bpePattern = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  def bpeTokenCount(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit(bpePattern), lit(0)))
        .cast("long").as("n_bpe_tokens"))

  /** Word n-gram shingles of a text column (slice is 1-based; DuckDB twin
    * uses 1-based list slicing over the same index range).
    *
    * r8: implemented as the native codegen'd [[ShinglesNExpr]]. The
    * previous HOF form — `transform(sequence(0, size(w)-n), i =>
    * concat_ws(" ", slice(w, i+1, n)))` with `w = split(text, " ")` —
    * was hiding a QUADRATIC: higher-order functions evaluate
    * interpreted, and every subtree inside the lambda is re-evaluated
    * per element, including the full `split(text)` feeding the slice
    * (stack-sampled: `StringSplit.nullSafeEval` under
    * `ArrayTransform.eval` inside ConcatWs — one complete re-split of
    * the document PER SHINGLE, O(words²) per row). The kernel splits
    * once and windows in one pass; output arrays are byte-identical
    * (same UTF8String.split, same concat-ws-with-space join, same
    * empty-array contract for < n words and null text), so every
    * oracle replays unchanged.
    */
  def shinglesN(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      ShinglesNExpr(org.apache.spark.sql.GraftColumnBridge.expression(text), n))

  /** JVM kernel of [[ShinglesNExpr]]: split once, window in one pass.
    * Null text yields the empty array — replaying the old column form's
    * `when(size(w) >= n, …).otherwise(array())`, where a null `w` fails
    * the predicate and falls to the empty-array branch.
    */
  private val shingleSpace = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
  private val emptyShingles =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
  def shinglesNKernel(text: org.apache.spark.unsafe.types.UTF8String,
                      n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (text == null) return emptyShingles
    val w = text.split(shingleSpace, -1)
    if (w.length < n) return emptyShingles
    val out = new Array[Any](w.length - n + 1)
    var i = 0
    while (i < out.length) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(shingleSpace,
        java.util.Arrays.copyOfRange(w, i, i + n): _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Word-3-gram shingles (the dedup family's unit). */
  def shingles3(text: Column): Column = shinglesN(text, 3)

  /** Document fingerprint: min/max over word-3-gram hashes + full md5 —
    * a locality-insensitive content signature (rolling-hash analog).
    */
  def fingerprintShingles(docs: DataFrame): DataFrame = {
    docs.select(col("doc_id"), explode(shingles3(col("text"))).as("shingle"))
      .groupBy("doc_id")
      .agg(
        min(hexInt(col("shingle"))).as("min_hash"),
        max(hexInt(col("shingle"))).as("max_hash"),
        count(lit(1)).as("n_shingles"))
  }

  /** Sliding-window document chunking — the context-window packer of a
    * RAG / pretraining pipeline: each doc's token stream becomes
    * fixed-size chunks of `chunkTokens` with `overlap` tokens shared
    * between neighbours (stride = chunkTokens − overlap); the final
    * chunk is the window ENDING at the last token, so coverage is total
    * and no chunk underruns except on short docs. Pure column algebra
    * (one explode, zero shuffles, zero UDFs); chunk count per doc is
    * `1 + ceil((n − chunk)/stride)` in exact integer math, so the layout
    * replays in any SQL engine.
    */
  def chunkDocs(docs: DataFrame, chunkTokens: Int = 64,
                overlap: Int = 16): DataFrame = {
    val stride = chunkTokens - overlap
    require(stride > 0, s"overlap $overlap must be < chunkTokens $chunkTokens")
    Par.fanOut(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        filter(split(col("text"), " "), w => w =!= "").as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("n"))
      .where(col("n") > 0)
      .withColumn("n_chunks",
        when(col("n") <= chunkTokens, lit(1L)).otherwise(
          expr(s"1L + (n - $chunkTokens + ${stride - 1}) div $stride")))
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("n_chunks") - 1)))
      // the last chunk is right-aligned to the doc end; earlier chunks
      // start on stride boundaries
      .withColumn("start_tok",
        when(col("chunk_idx") === col("n_chunks") - 1,
          greatest(col("n") - chunkTokens, lit(0L)))
          .otherwise(col("chunk_idx") * stride))
      .select(col("doc_id"), col("chunk_idx"),
        (col("start_tok") + 1).as("start_tok"),
        least(lit(chunkTokens.toLong), col("n") - col("start_tok"))
          .as("n_tokens"),
        element_at(col("toks"), (col("start_tok") + 1).cast("int"))
          .as("first_token"),
        element_at(col("toks"),
          (col("start_tok") +
            least(lit(chunkTokens.toLong), col("n") - col("start_tok")))
            .cast("int")).as("last_token"))
  }

  /** Per-document n-gram NOVELTY — the dedup-adjacent curation metric
    * "how much of this doc's content appears in any earlier doc"
    * (earlier = smaller doc_id, a total deterministic order): novelty_ppm
    * = distinct 8-grams whose FIRST holder (min doc_id over the corpus)
    * is this doc, over the doc's distinct 8-grams. Shape: a gram is
    * novel for EXACTLY its min doc, so the novel count per doc is an
    * aggregation of the gram→min-doc table — the corpus-sized
    * grams⋈first-holder join a naive formulation would pay never
    * exists. Three keyed aggregations (gram-keyed, doc-keyed ×2) plus a
    * doc-keyed join of two doc-sized tables.
    *
    * TOTAL over the corpus: a doc with fewer than n words has zero
    * grams, but still gets an explicit (0, 0, 0) row (like
    * [[graft.ops.Filters.contamination]]'s n_hits=0 rows) — silently
    * dropping it would skew any per-source novelty average joined back
    * onto the corpus.
    */
  def ngramNovelty(docs: DataFrame, n: Int = 8): DataFrame = {
    // r8: per-doc gram counts are ROW-LOCAL (size(array_distinct(...)))
    // — the previous shape exploded grams into a localCheckpoint (a
    // corpus-sized materialization at scale) and paid a doc-keyed
    // shuffle + an extra join just to count them. Now the exploded
    // stream has ONE consumer (the gram-keyed novelty aggregation), so
    // no checkpoint; the fan-out parallelizes the shingle kernel on
    // narrow inputs (identity at scale).
    val base = Par.fanOut(docs.select(col("doc_id"), col("text")))
    val novelPerDoc = base
      .select(col("doc_id").cast("long").as("doc_id"),
        explode(array_distinct(shinglesN(col("text"), n))).as("gram"))
      .groupBy("gram")
      .agg(min(col("doc_id")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
    base.select(col("doc_id").cast("long").as("doc_id"),
        size(array_distinct(shinglesN(col("text"), n))).cast("long")
          .as("n_grams"))
      .join(novelPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        when(col("n_grams") > 0,
          expr("(1000000L * n_novel) div n_grams"))
          .otherwise(lit(0L)).as("novelty_ppm"))
  }
}
