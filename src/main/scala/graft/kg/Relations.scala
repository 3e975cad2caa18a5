package graft.kg

import graft.model.Mention

/** Rule-based typed relation extraction: for each pair of CONSECUTIVE
  * mentions in a sentence, the token gap between them is matched against
  * a verb-pattern lexicon (exact sequence match). This is the
  * deterministic stand-in for a learned relation classifier — same
  * operator shape (per-sentence, consumes detected mentions + words),
  * pluggable like the MentionTagger.
  */
object Relations {

  /** gap token sequence → relation name. Must stay in sync with the
    * generator's template relations (CorpusGen.templateRelations).
    */
  val lexicon: Map[Seq[String], String] = Map(
    Seq("besuchte") -> "visited",
    Seq("wurde", "in") -> "founded_in",
    Seq("arbeitet", "für") -> "works_for",
    Seq("traf") -> "met",
    Seq("sprach", "mit") -> "spoke_with",
    Seq("eröffnete", "ein", "Haus", "in") -> "opened_in")

  private val maxGap = lexicon.keysIterator.map(_.length).max

  /** (subj, relation, obj) over consecutive mention pairs of one sentence. */
  def extract(words: Array[String], mentions: Seq[Mention]): Seq[(Mention, String, Mention)] = {
    val sorted = mentions.sortBy(_.start_word)
    (0 until sorted.length - 1).flatMap { i =>
      val a = sorted(i); val b = sorted(i + 1)
      val gapLen = b.start_word - a.end_word
      if (gapLen >= 1 && gapLen <= maxGap) {
        val gap = words.slice(a.end_word, b.start_word).toSeq
        lexicon.get(gap).map(rel => (a, rel, b)).toSeq
      } else Seq.empty
    }
  }
}
