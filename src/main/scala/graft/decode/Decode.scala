package graft.decode

import graft.model._
import graft.text.{Realigner, Tags}

/** Decode side: window re-glue + word re-alignment + BIO→mention spans.
  *
  * Runs entirely inside one task (no shuffle): windows of a sentence are
  * produced adjacently by the encode flatMap, so re-glue by guid is an
  * in-partition grouping — the Spark expression of the reference's
  * "keep features and predictions zipped in one process" design
  * (webapp/app.py:76-87, SURVEY.md §2.4 J5).
  */
object Decode {

  /** Re-glue tagged windows (pre-sorted by winIdx) and re-align onto the
    * sentence's original words; returns one tag per word.
    */
  def decodeSentence(realigner: Realigner, sent: Sentence,
                     windows: Seq[TaggedWindow]): Array[(String, String)] = {
    val glued = realigner.reglue(
      windows.sortBy(_.winIdx).map(w => (w.tokens, w.preds)))
    realigner.realign(sent.words, glued._1, glued._2)
  }

  /** Word-level tags → mentions. guid format: doc_id/spanOffset/sentIdx. */
  def mentionsOf(guid: String, words: Array[String], tags: Array[String]): Seq[Mention] = {
    val parts = guid.split('/')
    val docId = parts(0); val off = parts(1).toInt; val sidx = parts(2).toInt
    Tags.bioToSpans(tags).toSeq.map { case (a, b, typ) =>
      Mention(docId, off, sidx, a, b, words.slice(a, b).mkString(" "), typ)
    }
  }
}
