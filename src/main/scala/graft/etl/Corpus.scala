package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus collection ETL — the Spark re-expression of `collectcorpus`
  * (reference: qurator/sbb_ner/models/corpus.py:128-157): fulltext pages
  * → selection semi-join → null guard → line reflow → ordered text sink.
  * The reference's 6-process pool + per-worker selection index
  * (corpus.py:57-64, 125-127) becomes task parallelism + one broadcast
  * semi-join.
  */
object Corpus {

  /** P4/J3 — selection semi-join: keep pages flagged in the selection
    * frame, matched on (ppn, filename) (corpus.py:42-46, 57-64).
    */
  def selectPages(fulltext: DataFrame, selection: DataFrame): DataFrame =
    fulltext
      .where(col("text").isNotNull) // P8 null/typing guard (corpus.py:39-40)
      .join(broadcast(selection.where(col("selected"))
        .select("ppn", "filename")), Seq("ppn", "filename"), "left_semi")

  /** W8 — document reflow (corpus.py:99-118): accumulate words into lines
    * until the line reaches `minLineLen` AND the word ends a sentence
    * (non-digit before final '.'). Stateful scan within one document →
    * pure per-row function in a typed map.
    */
  def reflow(text: String, minLineLen: Int = 80): Array[String] = {
    val words = graft.text.TextCore.whitespaceTokenize(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val line = new StringBuilder
    words.foreach { w =>
      if (line.nonEmpty) line.append(' ')
      line.append(w)
      val sentenceEnd = w.length >= 2 && w.endsWith(".") &&
        !w.charAt(w.length - 2).isDigit // regex ([^0-9])[.]$ (corpus.py:114)
      if (line.length >= minLineLen && sentenceEnd) {
        out += line.toString
        line.clear()
      }
    }
    if (line.nonEmpty) out += line.toString
    out.toArray
  }

  /** Full chain: selected pages → reflowed corpus lines, ordered by the
    * original (ppn, filename) so the text sink is reproducible (K2 —
    * corpus.py:141-156 writes in chunk order).
    */
  def collect(spark: SparkSession, fulltext: DataFrame, selection: DataFrame,
              minLineLen: Int = 80): Dataset[String] = {
    import spark.implicits._
    selectPages(fulltext, selection)
      .select("ppn", "filename", "text")
      .as[(String, String, String)]
      .flatMap { case (ppn, fn, text) =>
        // per-doc line index as the THIRD sort key: Spark's sort makes
        // no relative-order promise for equal-key rows, so without it a
        // document's reflowed lines could interleave arbitrarily after
        // the range shuffle. The empty sentinel line (index MaxValue —
        // always last within its doc) is the K2 blank-line document
        // separator the sink contract documents.
        reflow(text, minLineLen).zipWithIndex.map { case (l, i) =>
          (ppn, fn, i, l)
        } :+ ((ppn, fn, Int.MaxValue, ""))
      }
      .orderBy("_1", "_2", "_3")
      .map(_._4)
  }

  /** K2 — corpus text sink: documents separated by blank lines, single
    * ordered file (coalesce(1) mirrors the reference's one output file;
    * at scale drop the coalesce and keep per-partition ordering via
    * sortWithinPartitions).
    */
  def writeCorpus(spark: SparkSession, lines: Dataset[String], path: String): Unit =
    lines.coalesce(1).write.mode("overwrite").text(path)
}
