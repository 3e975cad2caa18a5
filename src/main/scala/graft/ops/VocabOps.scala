package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary construction + coverage evaluation — the corpus side of
  * tokenizer preparation (the reference ships a fixed vocab.txt and
  * builds pre-training corpora around it; a from-scratch pipeline has to
  * BUILD that vocabulary from the corpus and measure its coverage).
  */
object VocabOps {

  /** Top-k vocabulary by corpus frequency, ties broken by word: one
    * word-count aggregation (map-side combined) + a bounded TakeOrdered —
    * the global rank window runs over k rows, never the corpus.
    */
  def buildVocab(docs: DataFrame, k: Int = 1000): DataFrame = {
    val counts = docs
      .select(explode(split(col("text"), " ")).as("word"))
      // consecutive/leading/trailing spaces split into empty tokens —
      // filtered like invertedIndex/freqSpectrum, or '' would claim a
      // top-k vocab slot on any corpus with irregular spacing
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("word")).limit(k)
    counts.withColumn("rank",
        row_number().over(Window.orderBy(desc("freq"), asc("word")))
          .cast("long"))
      .select("rank", "word", "freq")
  }

  /** Top-k character-pair merge candidates — ONE step of BPE tokenizer
    * training (Sennrich et al. 2016, public algorithm): count every
    * adjacent character pair across the corpus, weighted by word
    * frequency; the most frequent pair is what a BPE trainer would merge
    * next. The pair scan runs over the VOCABULARY (distinct words ×
    * word length), never the corpus — the corpus is touched once by the
    * map-side-combined word count, which is why real BPE trainers work
    * off the word-frequency table. The per-word fan-out (one row per
    * character position) is bounded by vocabulary size, not corpus size.
    *
    * Returns (rank, pair, weight), ties broken by pair asc; the rank
    * window runs over k rows like [[buildVocab]].
    */
  def bpeMergePairs(docs: DataFrame, k: Int = 20): DataFrame = {
    val freq = docs.select(explode(split(col("text"), " ")).as("word"))
      .where(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("f"))
    val top = freq.select(col("f"),
        explode(expr(
          "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
          .as("pair"))
      .groupBy("pair").agg(sum("f").as("weight"))
      .orderBy(desc("weight"), asc("pair")).limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(desc("weight"), asc("pair")))
          .cast("long"))
      .select("rank", "pair", "weight")
  }

  /** Inverted-index posting statistics: one row per (word, doc) with
    * term frequency and first position — the index-construction core of
    * a retrieval stack (BM25/TF-IDF prep), exactly the shape a
    * downstream ranking function consumes. One positional explode + one
    * map-side-combined aggregation; at corpus scale the output is
    * naturally partitioned by word, which IS the posting-list layout
    * (all of a term's postings co-located, ready for bucketed writes).
    */
  def invertedIndex(docs: DataFrame): DataFrame =
    Par.fanOut(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("p0", "word")))
      .where(col("word") =!= "")
      .groupBy("word", "doc_id")
      .agg(count(lit(1)).as("tf"),
        (min(col("p0")) + 1).cast("long").as("first_pos"))

  /** Integer-quantized BM25 ranking over the inverted index — the
    * retrieval scorer the posting lists of [[invertedIndex]] exist for
    * (reference analog: the corpus/vocabulary plumbing of
    * models/corpus.py + pregenerate_training_data.py feeding ranked
    * selection). Every quantity is FIXED-POINT INTEGER so the score is
    * engine- and partitioning-invariant (the PageRank micro-unit
    * discipline): truncating division only, and the IDF's logarithm is
    * the deterministic linear-mantissa base-2 approximation
    *
    *   log2_fp16(x) = ilog2(x)·2^16 + (x·2^16) div 2^ilog2(x) − 2^16,
    *   ilog2(x) = length(bin(x)) − 1
    *
    * exact at powers of two, ≤ 0.086 bits absolute error between them,
    * and replayable bit-for-bit in any SQL engine with `bin`/`<<`.
    * Formula (Robertson/Spärck Jones BM25, k1 = 1.2, b = 0.75 as
    * milli-rationals):
    *
    *   idf_fp16   = log2_fp16( ((2(N−df)+1)·2^16) div (2df+1), floor 1 )
    *   tfsat_milli = (1000·tf·(k1m+1000)) div
    *                 (1000·tf + (k1m·(1000−bm+(bm·dl·1000) div avgdl_milli)) div 1000)
    *   score_milli = (idf_fp16 · tfsat_milli) div 2^16,  summed per doc
    *
    * The query is the `nTerms` most-frequent corpus terms (df desc, word
    * asc — deterministic); scoring touches ONLY those terms' posting
    * lists (a broadcast semi-join prunes the index scan), then one
    * per-doc aggregation and a bounded top-k — never a corpus-wide sort.
    */
  def bm25(docs: DataFrame, nTerms: Int = 5, topDocs: Int = 50,
           k1Milli: Long = 1200, bMilli: Long = 750): DataFrame = {
    val idx = invertedIndex(docs).localCheckpoint(eager = false, graft.ops.Par.cutLevel) // df stats + postings
    val dl = docs.select(col("doc_id"),
      size(filter(split(col("text"), " "), w => w =!= ""))
        .cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
      .selectExpr("n_docs", "(1000 * sum_dl) div n_docs AS avgdl_milli")
    val dfTab = idx.groupBy("word").agg(count(lit(1)).as("df"))
    val query = dfTab.orderBy(desc("df"), asc("word")).limit(nTerms)
    idx.join(broadcast(query), "word")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .selectExpr("doc_id", "word", "tf", "dl", "df", "n_docs", "avgdl_milli",
        "greatest(((2 * (n_docs - df) + 1) * 65536) div (2 * df + 1), 1L) AS ratio")
      .selectExpr("doc_id", "word", "tf", "dl", "avgdl_milli",
        "length(bin(ratio)) - 1 AS ilog", "ratio")
      .selectExpr("doc_id", "word", "tf", "dl", "avgdl_milli",
        "ilog * 65536 + (ratio * 65536) div shiftleft(CAST(1 AS BIGINT), ilog) - 65536 AS idf_fp16")
      .selectExpr("doc_id", "word", "idf_fp16",
        s"""(1000 * tf * ($k1Milli + 1000)) div
           | (1000 * tf + ($k1Milli * (1000 - $bMilli +
           |   ($bMilli * dl * 1000) div avgdl_milli)) div 1000)
           | AS tfsat_milli""".stripMargin)
      .selectExpr("doc_id", "word",
        "(idf_fp16 * tfsat_milli) div 65536 AS score_milli")
      .groupBy("doc_id")
      .agg(sum("score_milli").as("bm25_milli"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(desc("bm25_milli"), asc("doc_id"))
      .limit(topDocs)
  }

  /** Token frequency spectrum (count-of-counts): for each occurrence
    * count f, how many distinct words occur exactly f times — the
    * Zipf/heap diagnostic a corpus-growth or vocab-sizing decision reads
    * (the long tail of f = 1 hapaxes is what BPE vocab budgets trade
    * against). Two map-side-combined aggregations, the second over the
    * vocab-sized table.
    */
  def freqSpectrum(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .groupBy("freq").agg(count(lit(1)).as("n_words"))
      .select(col("freq"), col("n_words"))

  /** Out-of-vocabulary rate per source against the top-k vocabulary —
    * the coverage loop a tokenizer's vocab size is tuned with. The vocab
    * is dictionary-sized (broadcast); tokens stream through one
    * left-anti-style membership check and a per-source count.
    */
  def oovRate(docs: DataFrame, k: Int = 100): DataFrame = {
    val vocab = buildVocab(docs, k).select("word")
    // ONE stats pass over the tokenized stream (total + OOV counted in
    // the same aggregation via a broadcast vocab membership join) —
    // the previous shape scanned and re-tokenized the corpus separately
    // for totals and for OOV; empty tokens filtered like buildVocab so
    // numerator and denominator agree with the vocab's own universe
    val toks = docs.select(col("source"),
        explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "")
    toks.join(broadcast(vocab.withColumn("iv", lit(true))), Seq("word"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("iv").isNull, 1)).as("n_oov"))
      .select(col("source"), col("n_tokens"), col("n_oov"),
        round(col("n_oov") / col("n_tokens"), 6).as("oov_rate"))
  }
}
