package graft.text

/** Greedy longest-match wordpiece tokenizer.
  *
  * Re-expresses the reference WordpieceTokenizer
  * (qurator/sbb_ner/models/tokenization.py:326-379) including its
  * load-bearing modification vs the upstream BERT code: on a failed match
  * the reference emits a PER-CHARACTER `[UNK]` and advances one character
  * (tokenization.py:347-349, 365-369) instead of replacing the whole word
  * with a single `[UNK]`. This keeps |consumed original chars| recoverable
  * from the token stream, which is what makes word re-alignment
  * (webapp/app.py:221-317) an exact inverse.
  */
final class Wordpiece(vocab: Set[String]) extends Serializable {

  val unk = "[UNK]"

  /** Char-trie for zero-allocation longest-match scans (the naive
    * substring probe is O(L²) allocations per word — measurably the hot
    * path at bench scale). Rebuilt lazily per executor after broadcast
    * deserialization.
    */
  private final class TNode {
    var isWord = false
    var children: java.util.HashMap[Char, TNode] = null
    def child(c: Char): TNode = if (children == null) null else children.get(c)
    def add(c: Char): TNode = {
      if (children == null) children = new java.util.HashMap[Char, TNode](4)
      var n = children.get(c)
      if (n == null) { n = new TNode; children.put(c, n) }
      n
    }
  }
  @transient private lazy val (rootStart, rootCont) = {
    val rs = new TNode; val rc = new TNode
    vocab.foreach { piece =>
      val (root, body) =
        if (piece.startsWith("##")) (rc, piece.substring(2)) else (rs, piece)
      if (body.nonEmpty) {
        var n = root
        var i = 0
        while (i < body.length) { n = n.add(body.charAt(i)); i += 1 }
        n.isWord = true
      }
    }
    (rs, rc)
  }

  /** Longest vocab match starting at word(start); returns end index
    * (exclusive) or -1.
    */
  private def longestMatch(word: String, start: Int): Int = {
    var n = if (start == 0) rootStart else rootCont
    var best = -1
    var i = start
    while (i < word.length && n != null) {
      n = n.child(word.charAt(i))
      i += 1
      if (n != null && n.isWord) best = i
    }
    best
  }

  /** Tokenize one already-basic-tokenized word into wordpieces. The
    * reference COMMENTED OUT both the >max_input_chars_per_word all-[UNK]
    * shortcut and the is_bad whole-word-UNK path (tokenization.py:347-349,
    * 373-376): every word, however long, runs the longest-match loop with
    * per-char [UNK] fallback (:368) — matched here exactly.
    */
  def tokenizeWord(word: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    while (start < word.length) {
      val end = longestMatch(word, start)
      if (end < 0) { out += unk; start += 1 } // per-char UNK, advance 1
      else {
        out += (if (start > 0) "##" + word.substring(start, end)
                else word.substring(start, end))
        start = end
      }
    }
    out.toArray
  }

  /** chars of original word consumed by one token ([UNK] consumes 1). */
  def tokenLen(tok: String): Int =
    if (tok == unk) 1
    else if (tok.startsWith("##")) tok.length - 2
    else tok.length
}

/** Deterministic built-in vocabulary (no external files in this sandbox;
  * mirrors the shape of the reference's vocab.txt load,
  * tokenization.py:50-62). Covers all lowercase latin letters, digits,
  * common punctuation and German chars both as word-starts and as `##`
  * continuations, plus frequent German word(piece)s, so wordpiece always
  * terminates; a few characters (e.g. Cyrillic) are deliberately absent to
  * exercise the per-char-[UNK] + re-alignment recovery path.
  */
object Vocab {
  val specials: Array[String] = Array("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]")

  private val chars: Seq[String] =
    (('a' to 'z') ++ ('0' to '9') ++ "äöüß.,:;!?-()\"'/&%".toSeq).map(_.toString)

  private val words: Seq[String] = Seq(
    "der", "die", "das", "und", "in", "von", "zu", "mit", "auf", "für",
    "ist", "im", "den", "nicht", "ein", "eine", "als", "auch", "es", "an",
    "herr", "frau", "stadt", "berlin", "paris", "münchen", "hamburg",
    "wien", "london", "deutschland", "frankreich", "europa", "amerika",
    "müller", "schmidt", "meyer", "wagner", "becker", "hoffmann", "schulz",
    "bank", "verlag", "universität", "gesellschaft", "verein", "kaiser",
    "könig", "graf", "professor", "doktor", "minister", "president",
    "besuchte", "wurde", "gegründet", "sagte", "arbeitet", "lebt", "reiste",
    "traf", "sprach", "schrieb", "kaufte", "verkaufte", "eröffnete",
    "geboren", "gestorben", "heute", "gestern", "morgen", "jahr", "jahre",
    "##er", "##en", "##e", "##n", "##s", "##t", "##te", "##ten", "##ung",
    "##lich", "##isch", "##chen", "##stadt", "##berg", "##burg", "##dorf",
    "##heim", "##hausen", "##mann", "##sohn", "##feld", "##bach", "##see",
  )

  /** token → id; ids are line numbers like the reference's vocab load.
    * Word entries are accent-stripped to match the do_lower_case pipeline
    * (basicTokenize lowercases + NFD-strips before wordpiece), so "müller"
    * is stored — and matched — as "muller".
    */
  val tokenToId: Map[String, Int] = {
    val norm = words.map { w =>
      if (w.startsWith("##")) "##" + TextCore.stripAccents(w.substring(2))
      else TextCore.stripAccents(w)
    }
    val all = (specials ++ chars ++ chars.map("##" + _) ++ norm).distinct
    all.zipWithIndex.toMap
  }
  val idToToken: Array[String] = {
    val inv = new Array[String](tokenToId.size)
    tokenToId.foreach { case (t, i) => inv(i) = t }
    inv
  }
  val asSet: Set[String] = tokenToId.keySet

  def default: Wordpiece = new Wordpiece(asSet)
}
