package graft.text

import java.text.Normalizer

/** Pure-Scala text normalization core.
  *
  * Re-expresses the behavior of the reference BasicTokenizer
  * (reference: qurator/sbb_ner/models/tokenization.py:176-315) as pure
  * functions with zero Spark dependencies, so they can run inside typed
  * `map`/`flatMap`/`mapPartitions` stages (whole-stage-codegen-adjacent;
  * never a row-at-a-time SQL UDF).
  *
  * Exact char-class semantics matter: the downstream word re-alignment
  * invariant (webapp/app.py:301-313) relies on knowing precisely which
  * characters the tokenizer can drop (control chars) or inject (spaces).
  */
object TextCore {

  /** Whitespace per the reference (tokenization.py:382-391):
    * space, tab, newline, CR, or Unicode category Zs.
    */
  def isWhitespace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' ||
      Character.getType(c) == Character.SPACE_SEPARATOR

  /** Control per the reference (tokenization.py:393-404): Cc/Cf categories,
    * but tab/newline/CR are treated as whitespace, not control.
    */
  def isControl(c: Char): Boolean = {
    if (c == '\t' || c == '\n' || c == '\r') false
    else {
      val t = Character.getType(c)
      t == Character.CONTROL || t == Character.FORMAT
    }
  }

  /** Punctuation per the reference (tokenization.py:406-419): the four
    * ASCII non-alphanumeric ranges plus any Unicode P* category.
    */
  def isPunctuation(c: Char): Boolean = {
    val cp = c.toInt
    if ((cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
        (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126)) true
    else {
      val t = Character.getType(c)
      t == Character.DASH_PUNCTUATION || t == Character.START_PUNCTUATION ||
      t == Character.END_PUNCTUATION || t == Character.CONNECTOR_PUNCTUATION ||
      t == Character.OTHER_PUNCTUATION || t == Character.INITIAL_QUOTE_PUNCTUATION ||
      t == Character.FINAL_QUOTE_PUNCTUATION
    }
  }

  /** CJK ideograph block test (tokenization.py:283-302). */
  def isCjk(cp: Int): Boolean =
    (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
    (cp >= 0x20000 && cp <= 0x2A6DF) || (cp >= 0x2A700 && cp <= 0x2B73F) ||
    (cp >= 0x2B740 && cp <= 0x2B81F) || (cp >= 0x2B820 && cp <= 0x2CEAF) ||
    (cp >= 0xF900 && cp <= 0xFAFF) || (cp >= 0x2F800 && cp <= 0x2FA1F)

  /** Drop NUL/0xFFFD/control chars; map whitespace to ' '
    * (tokenization.py:304-315).
    */
  def cleanText(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '\u0000' && c != '\ufffd' && !isControl(c)) {
        b.append(if (isWhitespace(c)) ' ' else c)
      }
      i += 1
    }
    b.toString
  }

  /** Pad CJK codepoints with spaces (tokenization.py:269-282). */
  def tokenizeChineseChars(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      if (isCjk(cp)) { b.append(' '); b.append(s.substring(i, i + n)); b.append(' ') }
      else b.append(s.substring(i, i + n))
      i += n
    }
    b.toString
  }

  /** Strip + split on whitespace (tokenization.py:65-71). */
  def whitespaceTokenize(s: String): Array[String] = {
    val t = s.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  /** NFD-normalize then drop combining marks (Mn), used after lowercasing
    * (tokenization.py:236-245).
    */
  def stripAccents(s: String): String = {
    val n = Normalizer.normalize(s, Normalizer.Form.NFD)
    val b = new StringBuilder(n.length)
    var i = 0
    while (i < n.length) {
      val c = n.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) b.append(c)
      i += 1
    }
    b.toString
  }

  /** Split a token into alternating non-punct / single-punct pieces
    * (tokenization.py:247-267).
    */
  def splitOnPunc(s: String): Array[String] = {
    // the reference's _run_split_on_punc("") is [] (it joins an empty
    // char list), NOT [""] — a phantom empty piece would miscount
    // tokens for any caller that doesn't filter empties afterwards
    if (s.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isPunctuation(c)) {
        if (cur.nonEmpty) { out += cur.toString; cur.clear() }
        out += c.toString
      } else cur.append(c)
      i += 1
    }
    if (cur.nonEmpty) out += cur.toString
    out.toArray
  }

  /** Canonical surface normalization shared by the generator, the
    * broadcast linker, and the native Catalyst expression
    * (graft.kg.NormalizeSurfaceExpr): lowercase + NFD accent strip + trim.
    */
  def normalizeSurface(s: String): String = stripAccents(s.toLowerCase).trim

  /** Full basic tokenization of one raw text (tokenization.py:195-226):
    * clean → CJK-pad → whitespace split → [lower+accent-strip] →
    * punct split → re-split on whitespace.
    */
  def basicTokenize(text: String, doLowerCase: Boolean): Array[String] = {
    val cleaned = tokenizeChineseChars(cleanText(text))
    whitespaceTokenize(cleaned).flatMap { tok =>
      val t = if (doLowerCase) stripAccents(tok.toLowerCase) else tok
      splitOnPunc(t)
    }.filter(_.nonEmpty)
  }
}
