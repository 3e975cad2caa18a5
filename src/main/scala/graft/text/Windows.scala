package graft.text

import graft.model.EncodedWindow

/** Sentence → fixed-length encoded windows.
  *
  * Re-expresses `convert_examples_to_features`
  * (reference: qurator/sbb_ner/ground_truth/data_processor.py:377-437):
  * per-word wordpiece with `X` labels on continuation pieces
  * (:388-402), packing into ≤(maxSeqLen-2)-token windows that never end
  * mid-word — back off while the token after the cut starts with `##`,
  * with a fallback to a hard cut if backoff reaches length 1
  * (:404-418) — then `[CLS]`/`[SEP]` bracketing and zero-padding of
  * ids/mask/segments/labels to exactly maxSeqLen (:420-434).
  */
final class WindowEncoder(
    wp: Wordpiece,
    vocabIds: Map[String, Int],
    labelMap: Map[String, Int],
    val maxSeqLen: Int = 128,
    val doLowerCase: Boolean = true) extends Serializable {
  // [CLS] + at least one body token + [SEP]; below 3 the packing loop
  // could never advance (body = maxSeqLen - 2 <= 0 → an infinite
  // zero-width window) — fail at construction, not in an executor
  require(maxSeqLen >= 3, s"maxSeqLen must be >= 3, got $maxSeqLen")

  private val unkId = vocabIds("[UNK]")
  private def id(tok: String): Int = vocabIds.getOrElse(tok, unkId)

  /** Full tokenize of one original word: basic (clean/lower/accent-strip/
    * punct-split) then wordpiece per sub-token — the reference's
    * `FullTokenizer.tokenize` composition (tokenization.py:117-127).
    */
  def tokenizeWord(word: String): Array[String] =
    TextCore.basicTokenize(word, doLowerCase).flatMap(wp.tokenizeWord)

  /** Memoized variant for per-TASK use (natural-language word frequency
    * is Zipfian, so hit rates are high). The cache must be task-local —
    * the encoder itself is broadcast and shared across executor threads.
    */
  def tokenizeWordCached(word: String,
                         cache: java.util.HashMap[String, Array[String]]): Array[String] = {
    val hit = cache.get(word)
    if (hit != null) hit
    else {
      val pieces = tokenizeWord(word)
      if (cache.size < 65536) cache.put(word, pieces) // bound task memory
      pieces
    }
  }

  /** Wordpiece an original word sequence; the FIRST piece of each word
    * carries its tag, every continuation piece gets label `X`
    * (data_processor.py:388-402).
    */
  def tokenizeWithLabels(words: Array[String], tags: Array[String]): (Array[String], Array[String]) = {
    // delegate — one accumulation loop, so the first-piece-label rule
    // cannot fork between the counted and uncounted paths
    val (toks, labs, _) = tokenizeWithCounts(words, tags)
    (toks, labs)
  }

  /** Pack a token sequence into window slices [start, end) that never end
    * mid-word (## backoff with window_len==1 fallback,
    * data_processor.py:404-418).
    */
  def windowBounds(tokens: Array[String]): Array[(Int, Int)] = {
    val body = maxSeqLen - 2
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var start = 0
    while (start < tokens.length) {
      var end = math.min(start + body, tokens.length)
      if (end < tokens.length) {
        while (end > start + 1 && tokens(end).startsWith("##")) end -= 1
        // backoff exhausted → hard-cut to a full window UNCONDITIONALLY,
        // exactly like the reference (data_processor.py:414-415 resets on
        // window_len==1 regardless of what the boundary token looks like)
        if (end == start + 1)
          end = math.min(start + body, tokens.length)
      }
      out += ((start, end))
      start = end
    }
    out.toArray
  }

  /** Like [[tokenizeWithLabels]] but also returns pieces-per-word, so the
    * decode stage can re-align by construction instead of re-tokenizing
    * (the fused-stage fast path; Realigner.realignWithCounts).
    */
  def tokenizeWithCounts(words: Array[String], tags: Array[String],
                         cache: java.util.HashMap[String, Array[String]] = null)
      : (Array[String], Array[String], Array[Int]) = {
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    val labs = scala.collection.mutable.ArrayBuffer.empty[String]
    val counts = new Array[Int](words.length)
    var i = 0
    while (i < words.length) {
      val pieces =
        if (cache == null) tokenizeWord(words(i))
        else tokenizeWordCached(words(i), cache)
      counts(i) = pieces.length
      var j = 0
      while (j < pieces.length) {
        toks += pieces(j)
        labs += (if (j == 0) tags(i) else "X")
        j += 1
      }
      i += 1
    }
    (toks.toArray, labs.toArray, counts)
  }

  /** Full encode of one sentence; guid keys windows back to the sentence
    * (webapp/app.py:76-87).
    */
  def encode(guid: String, words: Array[String], tags: Array[String]): Seq[EncodedWindow] =
    encodeWithCounts(guid, words, tags)._1

  /** Encode + pieces-per-word (fused-stage fast path); pass a task-local
    * cache to memoize word→pieces across the task's sentences.
    */
  def encodeWithCounts(guid: String, words: Array[String], tags: Array[String],
                       cache: java.util.HashMap[String, Array[String]] = null)
      : (Seq[EncodedWindow], Array[Int]) = {
    val (toks, labs, counts) = tokenizeWithCounts(words, tags, cache)
    val wins = windowBounds(toks).zipWithIndex.map { case ((s, e), w) =>
      val t = Array("[CLS]") ++ toks.slice(s, e) ++ Array("[SEP]")
      val l = Array("[CLS]") ++ labs.slice(s, e) ++ Array("[SEP]")
      val n = t.length
      val pad = maxSeqLen - n
      val inputIds = t.map(id) ++ Array.fill(pad)(0)
      val mask = Array.fill(n)(1) ++ Array.fill(pad)(0)
      val seg = Array.fill(maxSeqLen)(0)
      val labelIds = l.map(labelMap) ++ Array.fill(pad)(0)
      require(inputIds.length == maxSeqLen && mask.length == maxSeqLen &&
        seg.length == maxSeqLen && labelIds.length == maxSeqLen,
        s"feature-shape invariant violated for $guid") // data_processor.py:431-434
      EncodedWindow(guid, w, inputIds, mask, seg, labelIds, t)
    }.toSeq
    (wins, counts)
  }
}

/** Window re-glue + word re-alignment (decode side).
  *
  * Re-glue: concatenate windows of equal guid in winIdx order, stripping
  * `[CLS]`/`[SEP]` (webapp/app.py:76-87: `tokens[1:-1]`).
  *
  * Re-alignment re-expresses webapp/app.py:221-317: map per-wordpiece
  * predictions back onto the ORIGINAL words. Where the reference replays
  * character positions against the original text (with `[UNK]` recovery
  * :252-267 and lost-character repair :275-288), we consume each token's
  * known character width against the normalized view of each word — an
  * exact inverse because the reference's per-char-[UNK] wordpiece variant
  * guarantees token widths sum to the normalized word length. Tag choice:
  * the last non-`X` prediction of the word wins (app.py:292-293); a word
  * whose predictions are all `X`/`[SEP]` gets `O` (app.py:236-237).
  */
final class Realigner(wp: Wordpiece, doLowerCase: Boolean = true) extends Serializable {

  /** Glue per-window (tokens, preds) into one sequence, dropping
    * [CLS]/[SEP]/[PAD] positions. Windows must be pre-sorted by winIdx.
    */
  def reglue(windows: Seq[(Array[String], Array[String])]): (Array[String], Array[String]) = {
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    val preds = scala.collection.mutable.ArrayBuffer.empty[String]
    windows.foreach { case (t, p) =>
      var i = 0
      while (i < t.length) {
        if (t(i) != "[CLS]" && t(i) != "[SEP]" && t(i) != "[PAD]") {
          toks += t(i); preds += p(i)
        }
        i += 1
      }
    }
    (toks.toArray, preds.toArray)
  }

  /** One (word, tag) per original word. Invariant: output words ARE the
    * input words — concat equality with the original sentence holds by
    * construction (the reference asserts it at app.py:301-313).
    */
  def realign(words: Array[String], tokens: Array[String], preds: Array[String]): Array[(String, String)] = {
    val out = new Array[(String, String)](words.length)
    var ti = 0
    var wi = 0
    while (wi < words.length) {
      // normalized width of this word = what the tokenizer consumed
      val normLen = TextCore.basicTokenize(words(wi), doLowerCase).map(_.length).sum
      var consumed = 0
      var tag = "O"
      while (consumed < normLen && ti < tokens.length) {
        consumed += wp.tokenLen(tokens(ti))
        val p = preds(ti)
        if (p != "X" && p != "[SEP]" && p != "[CLS]") tag = p
        ti += 1
      }
      out(wi) = (words(wi), tag)
      wi += 1
    }
    out
  }

  /** Fast exact variant used by the fused encode→tag→decode stage: each
    * word's token count is known from encoding, so consume exactly that
    * many predictions per word — no re-tokenization. Semantically
    * identical to [[realign]] (property-tested).
    */
  def realignWithCounts(words: Array[String], piecesPerWord: Array[Int],
                        preds: Array[String]): Array[(String, String)] = {
    val out = new Array[(String, String)](words.length)
    var ti = 0
    var wi = 0
    while (wi < words.length) {
      var k = piecesPerWord(wi)
      var tag = "O"
      while (k > 0 && ti < preds.length) {
        val p = preds(ti)
        if (p != "X" && p != "[SEP]" && p != "[CLS]") tag = p
        ti += 1
        k -= 1
      }
      out(wi) = (words(wi), tag)
      wi += 1
    }
    out
  }

  /** Rebuild the normalized text from tokens with [UNK] recovery from the
    * original (app.py:252-267) — used by property tests to assert the
    * reconstruction invariant (app.py:301-304).
    */
  def reconstruct(normalized: String, tokens: Array[String]): String = {
    val b = new StringBuilder
    var pos = 0
    tokens.foreach { t =>
      if (t == wp.unk) {
        if (pos < normalized.length) b.append(normalized.charAt(pos))
        pos += 1
      } else {
        val piece = if (t.startsWith("##")) t.substring(2) else t
        b.append(piece)
        pos += piece.length
      }
    }
    b.toString
  }
}
