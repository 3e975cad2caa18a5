package graft.etl

import graft.model.GtToken
import graft.text.Tags
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-format parsers → the GT token relation (SURVEY §2.1 S1-S4).
  *
  * Each parser re-expresses one reference ETL script as a lazy Spark plan:
  * `spark.read.text` → line filters → running-sum window for sentence
  * segmentation → tag normalization — instead of the reference's
  * imperative per-line loops (ground_truth/conll.py:7-48,
  * germeval.py:6-44, europeana_historic.py:7-47, wikiner.py:6-45).
  *
  * Sentence ids are `base + dense index` with the reference's disjoint
  * per-corpus bases (europeana 100000, germeval 200000, conll 300000,
  * wikiner 1000000 — *.py:8 in each parser).
  *
  * Scale note: line-oriented formats with cross-line state (blank-line
  * sentence breaks) are windowed per FILE — corpus files are the natural
  * parallelism unit, matching the reference's one-file-per-corpus layout;
  * WikiNER (one sentence per line) needs no window and parallelizes by
  * line.
  */
object Parsers {

  // GLOBAL sentence-id namespace (Assembly groups by nsentence alone, so
  // ids must be disjoint across corpora AND across files of one corpus):
  // each corpus owns a 1e9-wide range, each FILE within it a 1e7-wide
  // stride (capacity: 100 files/corpus, 1e7 sentences/file — far beyond
  // the reference's one-file-per-corpus layout). Before the stride,
  // sentence counters restarted at the corpus base PER FILE, so two
  // files of one corpus collided and Assembly merged unrelated
  // sentences.
  val EUROPEANA_BASE = 1000000000L
  val GERMEVAL_BASE = 2000000000L
  val CONLL_BASE = 3000000000L
  val WIKINER_BASE = 4000000000L
  val WIKIPEDIA_BASE = 5000000000L
  val FILE_STRIDE = 10000000L

  /** Deterministic per-file index (0-based, file-name order) — the tiny
    * distinct-file table ranked and broadcast back; never a corpus-wide
    * window.
    */
  private def fileIndex(ln: DataFrame): DataFrame =
    ln.select("file").distinct()
      .withColumn("fileIdx",
        row_number().over(Window.orderBy("file")).cast("long") - 1)

  private def lines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .withColumn("file", input_file_name())
      .withColumn("lineNo", monotonically_increasing_id())

  /** Shared skeleton: blank-line-separated token-per-line formats.
    * extractWordTag must yield (word, rawTag) columns from `value`.
    */
  private def tokenPerLine(
      spark: SparkSession, path: String, base: Long, dataset: String,
      skipLine: org.apache.spark.sql.Column,
      word: org.apache.spark.sql.Column, rawTag: org.apache.spark.sql.Column,
      truncate5: Boolean): Dataset[GtToken] = {
    import spark.implicits._
    val ln = lines(spark, path)
    val isBlank = length(trim(col("value"))) === 0
    val wFile = Window.partitionBy("file").orderBy("lineNo")
    val seg = ln
      .withColumn("segId", sum(when(isBlank, 1).otherwise(0)).over(wFile))
      .where(!isBlank && !skipLine)
      .withColumn("word", word)
      .withColumn("rawTag", rawTag)
      .where(col("word").isNotNull && length(col("word")) > 0)
    val wSent = Window.partitionBy("file").orderBy("segId")
    val wWord = Window.partitionBy("file", "segId").orderBy("lineNo")
    val bcTrunc = truncate5
    seg
      .join(broadcast(fileIndex(ln)), "file")
      .withColumn("nsentence",
        dense_rank().over(wSent).cast("long") - 1 + base +
          col("fileIdx") * FILE_STRIDE)
      .withColumn("nword", (row_number().over(wWord) - 1))
      .select(col("nsentence"), col("nword"), col("word"), col("rawTag"))
      .as[(Long, Int, String, String)]
      .map { case (ns, nw, w, t) =>
        GtToken(ns, nw, w, Tags.normalize(t, bcTrunc), dataset)
      }
  }

  /** S1 — CoNLL-2003: whitespace-separated, word first, tag last; skip
    * `-DOCSTART-`; blank line = sentence break (conll.py:7-48).
    */
  def conll(spark: SparkSession, path: String, dataset: String): Dataset[GtToken] = {
    val fields = split(trim(col("value")), "\\s+")
    tokenPerLine(spark, path, CONLL_BASE, dataset,
      skipLine = trim(col("value")).startsWith("-DOCSTART-"),
      word = fields.getItem(0),
      rawTag = element_at(fields, -1),
      truncate5 = false)
  }

  /** S2 — GermEval TSV: `idx word tag nestedTag`; `#` comments skipped;
    * tags truncated to 5 chars (germeval.py:6-44).
    */
  def germeval(spark: SparkSession, path: String, dataset: String): Dataset[GtToken] = {
    val fields = split(col("value"), "\t")
    tokenPerLine(spark, path, GERMEVAL_BASE, dataset,
      skipLine = trim(col("value")).startsWith("#"),
      word = fields.getItem(1),
      rawTag = fields.getItem(2),
      truncate5 = true)
  }

  /** S3 — Europeana .bio: `word tag` lines; malformed lines become a word
    * tagged O (europeana_historic.py:19-22); sentence ends where the word
    * matches `.*[.?!]$` unless numeric/short-token guards fire
    * (europeana_historic.py:35-44). Cross-line state → per-file
    * flatMapGroups (SURVEY §2.5 W2).
    */
  def europeana(spark: SparkSession, path: String, dataset: String): Dataset[GtToken] = {
    import spark.implicits._
    val ln0 = lines(spark, path)
    // per-file id stride (driver map: corpus file lists are tiny)
    val idxMap = fileIndex(ln0).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bcIdx = spark.sparkContext.broadcast(idxMap)
    val raw = ln0
      .select(col("file"), col("lineNo"), col("value"))
      .as[(String, Long, String)]
    raw.groupByKey(_._1).flatMapGroups { (file, it) =>
      val sorted = it.toSeq.sortBy(_._2)
      val out = scala.collection.mutable.ArrayBuffer.empty[GtToken]
      var sent = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var ns = EUROPEANA_BASE + bcIdx.value(file) * FILE_STRIDE
      def flush(): Unit = {
        if (sent.nonEmpty) {
          sent.zipWithIndex.foreach { case ((w, t), i) =>
            out += GtToken(ns, i, w, Tags.normalize(t, truncate5 = false), dataset)
          }
          ns += 1
          sent = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        }
      }
      sorted.foreach { case (_, _, line) =>
        val tr = line.trim
        if (tr.nonEmpty) {
          val parts = tr.split("\\s+")
          val (w, t) = if (parts.length == 2) (parts(0), parts(1)) else (tr, "O")
          sent += ((w, t))
          // end of sentence: word ends in ./?/! and is not numeric-ish
          val endPunct = w.matches(".*[.?!]$")
          val numericGuard = w.length > 1 && w.dropRight(1).forall(_.isDigit)
          val shortGuard = w.length <= 2 && w.endsWith(".")
          if (endPunct && !numericGuard && !shortGuard) flush()
        }
      }
      flush()
      out
    }
  }

  /** S4 — WikiNER: one sentence per line; tokens `word|pos|tag`;
    * leading I-X repaired to B-X (wikiner.py:6-45). No cross-line state →
    * fully line-parallel.
    */
  def wikiner(spark: SparkSession, path: String, dataset: String): Dataset[GtToken] = {
    import spark.implicits._
    val ln0 = lines(spark, path).where(length(trim(col("value"))) > 0)
    val ln = ln0
      .join(broadcast(fileIndex(ln0)), "file")
      .withColumn("sentIdx",
        row_number().over(Window.partitionBy("file").orderBy("lineNo")).cast("long") - 1 +
          col("fileIdx") * FILE_STRIDE)
      .select(col("sentIdx"), col("value")).as[(Long, String)]
    ln.flatMap { case (sentIdx, line) =>
      val toks = line.trim.split("\\s+").flatMap { t =>
        val parts = t.split('|')
        if (parts.length >= 3) Some((parts(0), parts(parts.length - 1)))
        else if (parts.nonEmpty && parts(0).nonEmpty) Some((parts(0), "O"))
        else None
      }
      val tags = Tags.repairBio(toks.map(t => Tags.normalize(t._2, truncate5 = true)))
      toks.zipWithIndex.map { case ((w, _), i) =>
        GtToken(WIKINER_BASE + sentIdx, i, w, tags(i), dataset)
      }
    }
  }

  /** U1 — GT union across corpora (join_gt.py:15-25). */
  def joinGt(parts: Dataset[GtToken]*): Dataset[GtToken] =
    parts.reduce(_ unionByName _)
}
