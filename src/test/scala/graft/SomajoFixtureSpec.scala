package graft

import graft.text.SentenceSplitter
import org.scalatest.funsuite.AnyFunSuite

/** F7 fidelity fixture — hand-derived from the reference's SoMaJo usage
  * (webapp/app.py:104-123: `Tokenizer(split_camel_case=True)` →
  * `SentenceSplitter.split` → per-token `tok.replace(" ", "")` → drop
  * empty sentences). Each case checks one behavior of that chain.
  *
  * Documented divergences vs full SoMaJo (approved in SURVEY §7: the GT
  * corpora path arrives pre-tokenized, so raw-text fidelity is
  * best-effort): SoMaJo's emoticon/URL/XML token classes are out of
  * scope; the abbreviation list is the subset that appears in the
  * historic-newspaper domain.
  */
class SomajoFixtureSpec extends AnyFunSuite {

  test("camel-case words split like SoMaJo split_camel_case=True") {
    assert(SentenceSplitter.splitCamelCase("EisenbahnGesellschaft") ==
      Seq("Eisenbahn", "Gesellschaft"))
    // all-caps and ordinary words stay whole
    assert(SentenceSplitter.splitCamelCase("BERLIN") == Seq("BERLIN"))
    assert(SentenceSplitter.splitCamelCase("Zeitung") == Seq("Zeitung"))
    assert(SentenceSplitter.sentences("Die PreussischeStaatsbahn fuhr .")
      .head.toSeq == Seq("Die", "Preussische", "Staatsbahn", "fuhr", "."))
  }

  test("abbreviations do not end sentences; punctuation detaches") {
    val s = SentenceSplitter.sentences(
      "Dr. Müller besuchte u.a. Berlin, Potsdam und Wien. Dann kam Prof. Schmidt.")
    assert(s.length == 2)
    assert(s(0).toSeq == Seq("Dr.", "Müller", "besuchte", "u.a.", "Berlin",
      ",", "Potsdam", "und", "Wien", "."))
    assert(s(1).toSeq == Seq("Dann", "kam", "Prof.", "Schmidt", "."))
  }

  test("numbers with trailing dot are not sentence ends (ordinal guard)") {
    val s = SentenceSplitter.sentences("Am 12. Mai 1871 endete es! Neu begann es.")
    assert(s.length == 2)
    assert(s(0).toSeq ==
      Seq("Am", "12.", "Mai", "1871", "endete", "es", "!"))
  }

  test("tokens never contain spaces; empty sentences are dropped (app.py:116-119)") {
    val s = SentenceSplitter.sentences("  Ein Wort .  .  ")
    assert(s.nonEmpty && s.forall(_.nonEmpty))
    assert(s.flatten.forall(t => !t.contains(" ") && t.nonEmpty))
  }

  test("multi-dot abbreviations survive whole mid-sentence (z.B., u.a.)") {
    val s = SentenceSplitter.sentences(
      "Es gab z.B. viele Seiten. Danach kam mehr.")
    assert(s.length == 2)
    assert(s(0).toSeq == Seq("Es", "gab", "z.B.", "viele", "Seiten", "."))
  }

  test("parentheses detach; hyphenated compounds stay whole") {
    val s = SentenceSplitter.sentences(
      "Die Nord-Süd-Verbindung (siehe Anhang). Ende.")
    assert(s.length == 2)
    assert(s(0).toSeq == Seq("Die", "Nord-Süd-Verbindung", "(",
      "siehe", "Anhang", ")", "."))
  }

  test("question/exclamation/colon-free flow keeps one sentence") {
    val s = SentenceSplitter.sentences("Wien ist gross und Berlin ist alt")
    assert(s.length == 1)
    assert(s(0).toSeq == Seq("Wien", "ist", "gross", "und", "Berlin", "ist", "alt"))
  }

  test("protected token classes: URLs, emails, emoticons, XML tags") {
    import graft.text.SentenceSplitter._
    // survive tokenization whole — no punct detachment, no camel split
    assert(tokenizeWords("siehe https://Example.de/Pfad.html?q=1 dort").toSeq ==
      Seq("siehe", "https://Example.de/Pfad.html?q=1", "dort"))
    assert(tokenizeWords("mail an Hans.Meier@post.de bitte").toSeq ==
      Seq("mail", "an", "Hans.Meier@post.de", "bitte"))
    assert(tokenizeWords("super :-) oder ;-( naja").toSeq ==
      Seq("super", ":-)", "oder", ";-(", "naja"))
    assert(tokenizeWords("ein <br/> Umbruch <NAME> hier").toSeq ==
      Seq("ein", "<br/>", "Umbruch", "<NAME>", "hier"))
    // a sentence-final period glued to a URL detaches (SoMaJo) and ends
    // the sentence; the URL itself stays whole and is never a boundary
    val sents = sentences("Siehe www.beispiel.de/seite. Danach kam mehr .")
    assert(sents.length == 2, sents.map(_.mkString("|")).mkString(" // "))
    assert(sents(0).toSeq == Seq("Siehe", "www.beispiel.de/seite", "."))
    // mid-sentence URL: no boundary, token whole
    assert(sentences("Siehe www.beispiel.de dort .").length == 1)
    // URL buried under MULTIPLE trailing punct chars still protects whole
    assert(tokenizeWords("( www.MeinShop.de). dann").toSeq ==
      Seq("(", "www.MeinShop.de", ")", ".", "dann"))
    // digit-paren is NOT an emoticon — the paren detaches normally
    assert(tokenizeWords("( siehe Abb. 8) hier").count(_ == ")") == 1)
    assert(tokenizeWords("Abb 8) hier").toSeq == Seq("Abb", "8", ")", "hier"))
    // but ordinary sentences still split
    assert(sentences("Das ist gut . Das auch .").length == 2)
  }

  test("hashtags and @-mentions stay whole (SoMaJo social-media classes)") {
    import graft.text.SentenceSplitter._
    assert(tokenizeWords("folgt @Anna_M und #Berlin2020 heute").toSeq ==
      Seq("folgt", "@Anna_M", "und", "#Berlin2020", "heute"))
    // glued sentence punctuation still detaches; no boundary mid-tag
    val s = sentences("Lest #AltBerlin. Dann mehr .")
    assert(s.length == 2 && s(0).toSeq == Seq("Lest", "#AltBerlin", "."))
    // bare # / @ are ordinary punctuation, not protected
    assert(tokenizeWords("a # b @ c").toSeq == Seq("a", "#", "b", "@", "c"))
  }

  test("XML entities stay whole (SoMaJo XML-entity class)") {
    import graft.text.SentenceSplitter._
    assert(tokenizeWords("Meier &amp; Sohn &#228; und &#xE4; hier").toSeq ==
      Seq("Meier", "&amp;", "Sohn", "&#228;", "und", "&#xE4;", "hier"))
    // entity + glued period: entity survives, period detaches and ends
    val s = sentences("Firma Meier &amp;. Neuer Satz .")
    assert(s(0).toSeq == Seq("Firma", "Meier", "&amp;", "."), s(0).toSeq)
    // non-entities fall through to the generic path
    assert(tokenizeWords("&nope x").head == "&")
  }

  test("truncated compounds keep their hyphen (SoMaJo Wortteil class)") {
    import graft.text.SentenceSplitter._
    // "Vor- und Nachteile": the coordinated part keeps its hyphen
    assert(tokenizeWords("Die Vor- und Nachteile der Bahn").toSeq ==
      Seq("Die", "Vor-", "und", "Nachteile", "der", "Bahn"))
    assert(tokenizeWords("Ein- und Ausgang").toSeq ==
      Seq("Ein-", "und", "Ausgang"))
    // leading-hyphen part ("-bau") also protected
    assert(tokenizeWords("Neu- oder -umbau").toSeq ==
      Seq("Neu-", "oder", "-umbau"))
    // trailing-hyphen part with glued comma: strip stops at the
    // protected stem (the isProtected-aware strip loop)
    assert(tokenizeWords("Vor-, Nachteile").toSeq ==
      Seq("Vor-", ",", "Nachteile"))
    // a bare dash between words is NOT a word part
    assert(tokenizeWords("Berlin - Potsdam").toSeq ==
      Seq("Berlin", "-", "Potsdam"))
    // internal hyphens unaffected
    assert(tokenizeWords("Nord-Süd-Achse bleibt").toSeq ==
      Seq("Nord-Süd-Achse", "bleibt"))
  }

  test("roman-numeral and grouped ordinals keep their dot (SoMaJo ordinal class)") {
    import graft.text.SentenceSplitter._
    // regnal numbers: "Karl V." stays one token and is no boundary
    val s = sentences("Kaiser Karl V. regierte lange. Dann kam Ferdinand I. an die Macht.")
    assert(s.length == 2, s.map(_.mkString("|")).mkString(" // "))
    assert(s(0).toSeq ==
      Seq("Kaiser", "Karl", "V.", "regierte", "lange", "."))
    assert(s(1).toSeq ==
      Seq("Dann", "kam", "Ferdinand", "I.", "an", "die", "Macht", "."))
    // lowercase roman ordinals ("im xviii. Jahrhundert") also hold
    assert(sentences("Im xviii. Jahrhundert war es anders .").length == 1)
    // thousand-grouped ordinal keeps its final dot
    assert(tokenizeWords("der 1.000. Besucher kam").toSeq ==
      Seq("der", "1.000.", "Besucher", "kam"))
    assert(sentences("Der 1.000. Besucher kam heute an .").length == 1)
    // mixed-case words ending in roman letters are NOT ordinals
    val mix = sentences("Das war der Mix. Danach kam mehr .")
    assert(mix.length == 2, mix.map(_.mkString("|")).mkString(" // "))
    // lowercase roman-shaped UNIT abbreviations are not ordinals either
    // ("mm" = MM = 2000, but "Es misst 5 mm." ends a sentence)
    val mmS = sentences("Es misst 5 mm. Danach kam mehr .")
    assert(mmS.length == 2, mmS.map(_.mkString("|")).mkString(" // "))
    assert(sentences("Alles auf cd. Danach kam mehr .").length == 2)
    // '!' and '?' always end — the ordinal guard is dot-only (mirrors the
    // reference's `[0-9]+[.]$` guard, europeana_historic.py:37)
    assert(sentences("Es waren 1871 ! Neu begann es .").length == 2)
  }

  test("dates, times and grouped numbers survive as single tokens") {
    import graft.text.SentenceSplitter._
    assert(tokenizeWords("Am 01.01.1871 um 12:30 Uhr").toSeq ==
      Seq("Am", "01.01.1871", "um", "12:30", "Uhr"))
    assert(tokenizeWords("Preis 1.000,50 Mark").toSeq ==
      Seq("Preis", "1.000,50", "Mark"))
    // a date at sentence end: the FINAL dot is sentence punctuation
    // (stem contains non-digits, so the ordinal guard does not hold it)
    val s = sentences("Es geschah am 01.01.1871. Danach kam mehr .")
    assert(s.length == 2, s.map(_.mkString("|")).mkString(" // "))
    assert(s(0).toSeq == Seq("Es", "geschah", "am", "01.01.1871", "."))
  }
}
