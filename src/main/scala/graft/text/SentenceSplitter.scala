package graft.text

/** Deterministic word tokenizer + rule-based sentence splitter — the
  * in-scope subset of the reference's SoMaJo usage
  * (webapp/app.py:104-123: `Tokenizer(split_camel_case=True)` +
  * `SentenceSplitter`). Defines the sentence boundaries of the raw-text
  * ingestion path; the GT corpora path arrives pre-tokenized.
  */
object SentenceSplitter {

  private val abbrevs = Set(
    "dr", "prof", "nr", "st", "bzw", "z.b", "u.a", "ca", "vgl", "usw",
    "etc", "hr", "fr", "geb", "gest")

  // PROTECTED token classes (SoMaJo's URL/email/emoticon/XML-tag token
  // classes, the documented behavior of its tokenizer): these survive
  // tokenization as single tokens — no punctuation detachment, no
  // camel-case split — and never terminate a sentence.
  // must END on a word/URL-structural char: a glued sentence-final
  // period is NOT part of the URL (SoMaJo detaches it), so the
  // trailing-punct strip below can fire
  private val urlRe =
    "(?i)^(?:https?://|ftp://|www\\.)\\S*[\\w/=&%#~-]$".r.pattern
  private val emailRe =
    "^[\\w.+-]+@[\\w-]+(?:\\.[\\w-]+)+$".r.pattern
  private val emoticonRe =
    "^(?:[:;=][-o^*']?[()\\[\\]dDpPoO/\\\\|]+|<3|\\^\\^|[xX][dD])$".r.pattern
  // SoMaJo's social-media token classes: hashtags and @-mentions stay
  // single tokens (no leading-punct detach)
  private val tagMentionRe =
    "^[#@][\\p{L}\\p{N}_][\\p{L}\\p{N}_-]*$".r.pattern
  // XML/HTML character entities (&amp; &#228; &#xE4;) — SoMaJo's
  // XML-entity class keeps them whole
  private val xmlEntityRe =
    "^&(?:[A-Za-z]\\w*|#\\d+|#x[0-9A-Fa-f]+);$".r.pattern
  // truncated compound parts in German coordination ("Vor- und
  // Nachteile", "Ein- und Ausgang"): SoMaJo's Wortteil class keeps the
  // trailing/leading hyphen attached to the word part
  private val truncatedRe =
    "^(?:\\p{L}[\\p{L}\\p{N}]*-|-\\p{L}[\\p{L}\\p{N}]*)$".r.pattern

  // SoMaJo's ordinal token class keeps number+dot as ONE token ("12.",
  // "1.000.", "XVIII.", "Karl V.") and such a token never ends a
  // sentence. Three stem shapes: plain digits, thousand-grouped digits,
  // and a strict roman numeral (all-upper or all-lower — never mixed, so
  // ordinary words like "Mix" don't match).
  private val groupedDigitsRe = "^\\d{1,3}(?:\\.\\d{3})+$".r.pattern
  private val romanStrict =
    "^M{0,3}(?:CM|CD|D?C{0,3})(?:XC|XL|L?X{0,3})(?:IX|IV|V?I{0,3})$".r.pattern
  // lowercase stems that are VALID strict roman numerals but are far more
  // often unit abbreviations or ordinary words ("5 mm.", "auf cd.",
  // "ein mix."): never ordinals. Uppercase forms stay ordinals — regnal
  // numbers ("Karl V.", "MM.") are the whole point of the class.
  private val lowerRomanStopwords =
    Set("cm", "mm", "dm", "ml", "cl", "dl", "cd", "cc", "dc", "mi", "li",
      "mix")

  def isOrdinalStem(stem: String): Boolean =
    stem.nonEmpty && (
      stem.forall(_.isDigit) ||
      groupedDigitsRe.matcher(stem).matches() ||
      ((stem.forall(_.isUpper) ||
        (stem.forall(_.isLower) && !lowerRomanStopwords.contains(stem))) &&
        romanStrict.matcher(stem.toUpperCase).matches()))

  def isProtected(tok: String): Boolean =
    urlRe.matcher(tok).matches() || emailRe.matcher(tok).matches() ||
    emoticonRe.matcher(tok).matches() ||
    tagMentionRe.matcher(tok).matches() ||
    xmlEntityRe.matcher(tok).matches() ||
    truncatedRe.matcher(tok).matches() ||
    (tok.length > 2 && tok.charAt(0) == '<' && tok.last == '>' &&
      !tok.substring(1, tok.length - 1).exists(c => c == '<' || c == '>'))

  /** Camel-case split ("EisenbahnGesellschaft" → two tokens), mirroring
    * SoMaJo's split_camel_case=True option.
    */
  def splitCamelCase(tok: String): Seq[String] = {
    if (tok.length < 2) return Seq(tok)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    while (i < tok.length) {
      val c = tok.charAt(i)
      if (i > 0 && c.isUpper && tok.charAt(i - 1).isLower) {
        out += cur.toString; cur.clear()
      }
      cur.append(c)
      i += 1
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq
  }

  /** Word-tokenize one raw text: whitespace split, then detach leading/
    * trailing punctuation as separate tokens (keeping internal hyphens
    * and abbreviation dots), then camel-case split.
    */
  def tokenizeWords(text: String): Array[String] = {
    TextCore.whitespaceTokenize(TextCore.cleanText(text)).flatMap { raw =>
      // protected classes keep the token whole, but SENTENCE punctuation
      // glued to a protected token still detaches (SoMaJo: the final
      // period after a sentence-ending URL is its own token): strip
      // trailing punctuation UNTIL the remaining stem is protected (so
      // "url)." sheds '.' then ')', while "Ein-," stops at the protected
      // truncated-compound stem "Ein-"); if a protected stem emerges,
      // emit stem + detached punct, else fall back to the generic path
      // on the ORIGINAL token
      var stem = raw
      val trailP = scala.collection.mutable.ArrayBuffer.empty[String]
      if (!isProtected(raw)) {
        while (stem.length > 1 && TextCore.isPunctuation(stem.last) &&
               !isProtected(stem)) {
          trailP += stem.substring(stem.length - 1); stem = stem.dropRight(1)
        }
      }
      if (isProtected(stem)) Seq(stem) ++ trailP.reverse else {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var s = raw
      // leading punct
      while (s.nonEmpty && TextCore.isPunctuation(s.charAt(0)) && s.length > 1) {
        out += s.substring(0, 1); s = s.substring(1)
      }
      // trailing punct (collect then reverse); the dot stays ATTACHED on
      // abbreviations and on ordinals ("12." — SoMaJo's ordinal token
      // class keeps number+dot as one token), so the sentence splitter's
      // numeric guard can see them
      def keepDot(x: String): Boolean = x.charAt(x.length - 1) == '.' && {
        val stem = x.dropRight(1)
        abbrevs.contains(stem.toLowerCase) || isOrdinalStem(stem)
      }
      val trail = scala.collection.mutable.ArrayBuffer.empty[String]
      while (s.nonEmpty && TextCore.isPunctuation(s.charAt(s.length - 1)) &&
             !keepDot(s) && s.length > 1) {
        trail += s.substring(s.length - 1); s = s.dropRight(1)
      }
      if (s.nonEmpty) out ++= splitCamelCase(s)
      out ++= trail.reverse
      out.toSeq
      }
    }.filter(_.nonEmpty)
  }

  /** Sentence-split a token sequence: boundary after `.`/`!`/`?` not
    * belonging to an abbreviation or a number, mirroring the regex
    * end-of-sentence rule of europeana_historic.py:35-44 (word matches
    * `.*[.?!]$` with numeric/short-token guards — the reference rule has
    * no colon boundary, and neither does this).
    */
  def splitSentences(tokens: Array[String]): Array[Array[String]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
    val cur = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      cur += t
      val isEnd = (t == "." || t == "!" || t == "?") ||
        (t.length > 1 && ".!?".contains(t.last) && !isProtected(t) &&
          !(t.last == '.' && isOrdinalStem(t.dropRight(1))) &&
          !abbrevs.contains(t.dropRight(1).toLowerCase))
      if (isEnd && cur.nonEmpty) {
        out += cur.toArray; cur.clear()
      }
      i += 1
    }
    if (cur.nonEmpty) out += cur.toArray
    out.filter(_.nonEmpty).toArray // app.py:118-119: drop empties
  }

  def sentences(text: String): Array[Array[String]] =
    splitSentences(tokenizeWords(text))
}
