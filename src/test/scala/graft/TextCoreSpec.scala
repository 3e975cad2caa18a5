package graft

import graft.text._
import org.scalatest.funsuite.AnyFunSuite

class TextCoreSpec extends AnyFunSuite {

  test("cleanText drops control chars and normalizes whitespace") {
    assert(TextCore.cleanText("a\u0007b") == "ab") // BEL is control, dropped
    assert(TextCore.cleanText("a\u0000b") == "ab") // NUL dropped
    assert(TextCore.cleanText("a\tb\nc") == "a b c") // tab/nl to space
    assert(TextCore.cleanText("a\ufffdb") == "ab") // replacement char dropped
  }

  test("punctuation classes: ascii ranges + unicode P*") {
    assert(TextCore.isPunctuation('!'))
    assert(TextCore.isPunctuation('@'))
    assert(TextCore.isPunctuation('['))
    assert(TextCore.isPunctuation('{'))
    assert(TextCore.isPunctuation('–')) // en-dash (Pd)
    assert(!TextCore.isPunctuation('a'))
    assert(!TextCore.isPunctuation('ä'))
  }

  test("splitOnPunc splits at each punct char") {
    assert(TextCore.splitOnPunc("don't").toSeq == Seq("don", "'", "t"))
    assert(TextCore.splitOnPunc("a.b.c").toSeq == Seq("a", ".", "b", ".", "c"))
    assert(TextCore.splitOnPunc("abc").toSeq == Seq("abc"))
    assert(TextCore.splitOnPunc("..").toSeq == Seq(".", "."))
  }

  test("stripAccents removes combining marks after NFD") {
    assert(TextCore.stripAccents("über") == "uber")
    assert(TextCore.stripAccents("café") == "cafe")
    assert(TextCore.stripAccents("straße") == "straße") // ß is not a mark
  }

  test("CJK chars are space-padded") {
    assert(TextCore.tokenizeChineseChars("ab中cd") == "ab 中 cd")
  }

  test("basicTokenize composes clean/lower/accent/punct") {
    assert(TextCore.basicTokenize("Müller besuchte, Paris!", doLowerCase = true).toSeq ==
      Seq("muller", "besuchte", ",", "paris", "!"))
    assert(TextCore.basicTokenize("Müller", doLowerCase = false).toSeq == Seq("Müller"))
  }

  test("whitespaceTokenize") {
    assert(TextCore.whitespaceTokenize("  a  b\tc ").toSeq == Seq("a", "b", "c"))
    assert(TextCore.whitespaceTokenize("   ").isEmpty)
  }
}

class WordpieceSpec extends AnyFunSuite {
  val wp = new Wordpiece(Set("un", "##aff", "##able", "aff", "a", "##b", "b"))

  test("greedy longest match with ## continuations") {
    assert(wp.tokenizeWord("unaffable").toSeq == Seq("un", "##aff", "##able"))
  }

  test("per-char UNK on miss (modified variant, tokenization.py:365-369)") {
    // 'x' not in vocab: each missing char becomes its own [UNK]; pieces
    // after position 0 keep the ## continuation prefix
    val wp2 = new Wordpiece(Set("a", "##a", "##b"))
    assert(wp2.tokenizeWord("xab").toSeq == Seq("[UNK]", "##a", "##b"))
    assert(wp2.tokenizeWord("axb").toSeq == Seq("a", "[UNK]", "##b"))
    assert(wp2.tokenizeWord("xx").toSeq == Seq("[UNK]", "[UNK]"))
  }

  test("tokenLen recovers consumed character counts") {
    assert(wp.tokenizeWord("unaffable").map(wp.tokenLen).sum == 9)
    assert(wp.tokenizeWord("xab").map(wp.tokenLen).sum == 3)
  }

  test("words beyond 100 chars tokenize normally (reference commented out the shortcut, tokenization.py:347-349)") {
    val long = "ab" * 80 // 160 chars
    val wp3 = new Wordpiece(Set("a", "##b", "##a"))
    val toks = wp3.tokenizeWord(long)
    assert(toks.length == 160 && !toks.contains("[UNK]"))
    assert(toks.head == "a" && toks.tail.forall(_.startsWith("##")))
  }

  test("default vocab covers all lowercase latin + digits") {
    val dv = Vocab.default
    for (w <- Seq("qwertzuiop", "donaudampfschiff", "x9y3"))
      assert(!dv.tokenizeWord(w).contains("[UNK]"), s"UNK in $w")
  }
}

class TagsSpec extends AnyFunSuite {
  test("normalize: upper, _/.→-, truncate5, whitelist") {
    assert(Tags.normalize("b_per", truncate5 = false) == "B-PER")
    assert(Tags.normalize("B-LOCderiv", truncate5 = true) == "B-LOC")
    assert(Tags.normalize("B-LOCderiv", truncate5 = false) == "O")
    assert(Tags.normalize("b.org", truncate5 = false) == "B-ORG")
    assert(Tags.normalize("B-MISC", truncate5 = false) == "O")
    assert(Tags.normalize("O", truncate5 = true) == "O")
  }

  test("repairBio: I without B becomes B (wikiner.py:37-40)") {
    assert(Tags.repairBio(Array("O", "I-PER", "I-PER", "O")).toSeq ==
      Seq("O", "B-PER", "I-PER", "O"))
    assert(Tags.repairBio(Array("I-LOC")).toSeq == Seq("B-LOC"))
    assert(Tags.repairBio(Array("B-PER", "I-LOC")).toSeq == Seq("B-PER", "B-LOC"))
  }

  test("bioToSpans: conlleval span semantics") {
    assert(Tags.bioToSpans(Array("O", "B-PER", "I-PER", "O", "B-LOC")).toSeq ==
      Seq((1, 3, "PER"), (4, 5, "LOC")))
    // orphan I- starts a span too
    assert(Tags.bioToSpans(Array("I-ORG", "I-ORG")).toSeq == Seq((0, 2, "ORG")))
    // B B = two spans
    assert(Tags.bioToSpans(Array("B-PER", "B-PER")).toSeq ==
      Seq((0, 1, "PER"), (1, 2, "PER")))
  }
}

class SentenceSplitterSpec extends AnyFunSuite {
  test("tokenize detaches punctuation, keeps abbreviations") {
    assert(SentenceSplitter.tokenizeWords("Dr. Müller kam.").toSeq ==
      Seq("Dr.", "Müller", "kam", "."))
  }
  test("camel-case split") {
    assert(SentenceSplitter.splitCamelCase("EisenbahnGesellschaft") ==
      Seq("Eisenbahn", "Gesellschaft"))
    assert(SentenceSplitter.splitCamelCase("Berlin") == Seq("Berlin"))
  }
  test("sentence boundaries at ./!/? with numeric guard") {
    val s = SentenceSplitter.sentences("Er kam. Sie ging! Gut.")
    assert(s.length == 3)
    assert(s(0).toSeq == Seq("Er", "kam", "."))
    // "3.5" style numerics do not end a sentence
    val t = SentenceSplitter.splitSentences(Array("Um", "3.", "Uhr", "kam", "er", "."))
    assert(t.length == 1)
  }
}
