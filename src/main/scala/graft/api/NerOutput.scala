package graft.api

import graft.model.Sentence
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Output contract of the reference's REST surface (K6 — webapp/app.py:317,
  * README.md:121-163): `/ner` responds with
  * `ARRAY<ARRAY<STRUCT<word,prediction>>>` — one inner array per sentence,
  * concat of words = original text sans spaces (app.py:306-313);
  * `/ner-bert-tokens` is the wordpiece-granular, html-escaped variant
  * (app.py:196-207, F8).
  */
object NerOutput {

  /** F8 — html escape (app.py:203 uses html.escape defaults). */
  def htmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("'", "&#x27;")

  /** Tagged sentences → the /ner JSON document shape: one row per doc,
    * `response` = JSON array of sentence arrays of {word, prediction}.
    */
  def nerJson(spark: SparkSession, tagged: Dataset[(String, Array[String], Array[String])]): DataFrame = {
    import spark.implicits._
    // (guid=doc/offset/sent, words, tags)
    tagged
      .map { case (guid, words, tags) =>
        // sort key carries BOTH guid fields: the raw-ingestion path pins
        // span offset to 0 for every sentence (guid doc/0/sidx), and a
        // sort on offset alone would fall through to comparing the pairs
        // arrays lexicographically — sentence CONTENT, not position
        val parts = guid.split('/')
        (parts(0), parts(1).toInt, parts(2).toInt, words.zip(tags))
      }
      .toDF("doc_id", "off", "sidx", "pairs")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(
        struct(col("off"), col("sidx"), col("pairs")))).as("sents"))
      .select(col("doc_id"),
        to_json(expr(
          "transform(sents, s -> transform(s.pairs, p -> named_struct('word', p._1, 'prediction', p._2)))"))
          .as("response"))
  }

  /** Wordpiece-granular variant with html-escaped tokens. */
  def bertTokensJson(spark: SparkSession,
                     windows: Dataset[(String, Array[String], Array[String])]): DataFrame = {
    import spark.implicits._
    windows.map { case (guid, tokens, preds) =>
      val body = tokens.zip(preds)
        .filterNot(tp => tp._1 == "[CLS]" || tp._1 == "[SEP]" || tp._1 == "[PAD]")
        .map { case (t, p) =>
          s"""{"token":"${htmlEscape(t)}","prediction":"$p"}"""
        }.mkString("[", ",", "]")
      (guid, body)
    }.toDF("guid", "response")
  }
}
