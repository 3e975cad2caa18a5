package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language-ID, quality scoring, token counting, fingerprinting — all
  * pure `functions._` column expressions (whole-stage codegen, zero UDFs)
  * with value-identical DuckDB SQL oracles (see SparkEntry.oracleSql).
  */
object TextOps {

  /** 60-bit integer hash from md5 hex — the cross-engine hash primitive
    * (DuckDB: ('0x'||substr(md5(s),1,15))::BIGINT).
    */
  def hexInt(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

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

  /** Heuristic language-ID: marker-word occurrence scores, argmax with
    * fixed tie order en > de > fr > es.
    */
  def langId(docs: DataFrame): DataFrame = {
    val scored = markers.foldLeft(docs) { case (df, (lang, ws)) =>
      df.withColumn(s"score_$lang",
        ws.map(w => wordCount(col("text"), w)).reduce(_ + _))
    }
    val best = greatest(markers.keys.toSeq.sorted.map(l => col(s"score_$l")): _*)
    scored.select(
      col("doc_id"),
      col("score_en"), col("score_de"), col("score_fr"), col("score_es"),
      when(col("score_en") === best, "en")
        .when(col("score_de") === best, "de")
        .when(col("score_fr") === best, "fr")
        .otherwise("es").as("lang_pred"))
  }

  /** Quality scoring: length/alpha/digit/whitespace ratios + mean token
    * length (rounded for cross-engine float stability).
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val nChars = length(col("text")).cast("double")
    val nAlpha = length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("double")
    val nDigit = length(regexp_replace(col("text"), "[^0-9]", "")).cast("double")
    val nTokens = size(split(col("text"), " ")).cast("double")
    docs.select(
      col("doc_id"),
      nChars.cast("long").as("n_chars_obs"),
      round(nAlpha / nChars, 6).as("alpha_ratio"),
      round(nDigit / nChars, 6).as("digit_ratio"),
      round((nChars - nTokens + 1) / nTokens, 6).as("mean_token_len"),
      round(nAlpha / nChars * least(nTokens / lit(50.0), lit(1.0)), 6).as("quality"))
  }

  /** Word-3-gram shingles of a text column (slice is 1-based; DuckDB twin
    * uses 1-based list slicing over the same index range).
    */
  def shingles3(text: Column): Column = {
    val w = split(text, " ")
    when(size(w) >= 3,
      transform(sequence(lit(0), size(w) - 3),
        i => concat_ws(" ", slice(w, i + 1, lit(3)))))
      .otherwise(array().cast("array<string>"))
  }

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
}
