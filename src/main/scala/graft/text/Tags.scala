package graft.text

/** BIO tag normalization + label vocabulary + BIO→span conversion.
  *
  * Tag normalization re-expresses the four GT parsers' shared cleanup
  * (reference: ground_truth/conll.py:37-42, germeval.py:30-37,
  * europeana_historic.py:25-30, wikiner.py:27-34): uppercase, `_`/`.`→`-`,
  * optionally truncate to 5 chars (GermEval's `B-LOCderiv`→`B-LOC`,
  * WikiNER), and whitelist {B,I}×{PER,LOC,ORG} else `O`.
  */
object Tags {
  val whitelist: Set[String] =
    Set("B-PER", "I-PER", "B-LOC", "I-LOC", "B-ORG", "I-ORG")

  /** The reference's fixed label vocabulary (data_processor.py:243-245). */
  val labelList: Array[String] = Array(
    "O", "B-PER", "I-PER", "B-LOC", "I-LOC", "B-ORG", "I-ORG",
    "X", "[CLS]", "[SEP]")
  val labelMap: Map[String, Int] = labelList.zipWithIndex.toMap
  val invLabelMap: Array[String] = labelList

  def normalize(raw: String, truncate5: Boolean): String = {
    var t = raw.toUpperCase.replace('_', '-').replace('.', '-')
    if (truncate5 && t.length > 5) t = t.substring(0, 5)
    if (whitelist.contains(t)) t else "O"
  }

  /** I-without-B repair (wikiner.py:37-40): I-X whose predecessor is
    * neither B-X nor I-X becomes B-X.
    */
  def repairBio(tags: Array[String]): Array[String] = {
    val out = new Array[String](tags.length)
    var prev = "O"
    var i = 0
    while (i < tags.length) {
      val t = tags(i)
      out(i) =
        if (t.startsWith("I-") && prev != "B-" + t.substring(2) && prev != "I-" + t.substring(2))
          "B-" + t.substring(2)
        else t
      prev = out(i)
      i += 1
    }
    out
  }

  /** BIO tag sequence → entity spans (startWord, endWordExclusive, type).
    * conlleval span semantics (reference feeds conlleval at
    * models/bert.py:276-278): a span starts at B-X (or an I-X that does
    * not continue the previous tag) and extends over following I-X.
    */
  def bioToSpans(tags: Array[String]): Array[(Int, Int, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
    var i = 0
    while (i < tags.length) {
      val t = tags(i)
      if (t.length > 2 && (t.startsWith("B-") || t.startsWith("I-"))) {
        val typ = t.substring(2)
        val start = i
        i += 1
        while (i < tags.length && tags(i) == "I-" + typ) i += 1
        out += ((start, i, typ))
      } else i += 1
    }
    out.toArray
  }
}
