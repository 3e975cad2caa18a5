package graft

import graft.model.Sentence
import graft.tag.GoldLabelTagger
import graft.text._
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

class WindowsSpec extends AnyFunSuite {
  private def check(p: Prop): Unit = {
    val r = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  val wp = Vocab.default
  val enc = new WindowEncoder(wp, Vocab.tokenToId, Tags.labelMap, maxSeqLen = 16)
  val realigner = new Realigner(wp)

  test("windowBounds partitions exactly and never ends mid-word") {
    val words = Array.fill(10)("donaudampfschiff") // multi-piece words
    val (toks, _) = enc.tokenizeWithLabels(words, Array.fill(10)("O"))
    val bounds = enc.windowBounds(toks)
    assert(bounds.head._1 == 0 && bounds.last._2 == toks.length)
    bounds.sliding(2).foreach {
      case Array((_, e1), (s2, _)) => assert(e1 == s2)
      case _ =>
    }
    // no window ends mid-word (next token after cut is not ##) unless fallback
    bounds.dropRight(1).foreach { case (_, e) =>
      assert(!toks(e).startsWith("##") || (e - bounds.find(_._2 == e).get._1) == 14)
    }
  }

  test("fallback hard cut when a single word exceeds the window") {
    // one word with > 14 wordpieces: backoff would reach window_len 1
    val word = "a" * 40 // "a" + 39 × "##a"
    val (toks, _) = enc.tokenizeWithLabels(Array(word), Array("O"))
    assert(toks.length == 40)
    val bounds = enc.windowBounds(toks)
    assert(bounds.map { case (s, e) => e - s }.sum == 40)
    assert(bounds.forall { case (s, e) => e - s <= 14 && e > s })
  }

  test("encode shape invariants (data_processor.py:431-434)") {
    val ws = enc.encode("g/0/0", Array("Anna", "besuchte", "Paris", "."),
      Array("B-PER", "O", "B-LOC", "O"))
    ws.foreach { w =>
      assert(w.inputIds.length == 16 && w.inputMask.length == 16 &&
        w.segmentIds.length == 16 && w.labelIds.length == 16)
      assert(w.tokens.head == "[CLS]" && w.tokens.last == "[SEP]")
    }
  }

  // -- property: realign inverts encode for arbitrary sentences ----------
  private val wordGen: Gen[String] = Gen.oneOf(
    Gen.oneOf("Anna", "Müller", "besuchte", "Paris", "und", "das", "Jahr"),
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).suchThat(_.nonEmpty),
    Gen.oneOf("Straße,", "don't", "Ж!", "a.b", "x9y", "ÉCOLE"),
    Gen.const("z" * 30) // multi-window forcing
  )
  private val tagGen: Gen[String] =
    Gen.oneOf("O", "O", "O", "B-PER", "B-LOC", "B-ORG", "I-PER")

  test("property: encode → gold-tag → reglue → realign recovers words and tags") {
    val sentGen = for {
      n <- Gen.choose(1, 12)
      words <- Gen.listOfN(n, wordGen)
      tags <- Gen.listOfN(n, tagGen)
    } yield (words.toArray, Tags.repairBio(tags.toArray))
    val tagger = new GoldLabelTagger(Tags.invLabelMap)
    check(Prop.forAll(sentGen) { case (words, tags) =>
      val wins = enc.encode("d/0/0", words, tags)
      val tagged = tagger.tagBatch(wins)
      val glued = realigner.reglue(tagged.sortBy(_.winIdx).map(w => (w.tokens, w.preds)))
      val out = realigner.realign(words, glued._1, glued._2)
      val wordsOk = out.map(_._1).sameElements(words)
      // each word carries its tag; a word that tokenizes to nothing → O
      val tagsOk = out.indices.forall { i =>
        out(i)._2 == tags(i) ||
          (out(i)._2 == "O" && TextCore.basicTokenize(words(i), true).isEmpty)
      }
      wordsOk && tagsOk
    })
  }

  test("property: reconstruction invariant with [UNK] recovery (app.py:301-304)") {
    check(Prop.forAll(Gen.nonEmptyListOf(wordGen)) { wordsList =>
      val words = wordsList.toArray
      words.forall { w =>
        val norm = TextCore.basicTokenize(w, doLowerCase = true).mkString("")
        val toks = TextCore.basicTokenize(w, doLowerCase = true).flatMap(wp.tokenizeWord)
        realigner.reconstruct(norm, toks) == norm
      }
    })
  }

  test("property: realignWithCounts equals the re-tokenizing realign") {
    val sentGen = for {
      n <- Gen.choose(1, 10)
      words <- Gen.listOfN(n, wordGen)
      tags <- Gen.listOfN(n, tagGen)
    } yield (words.toArray, Tags.repairBio(tags.toArray))
    val tagger = new GoldLabelTagger(Tags.invLabelMap)
    check(Prop.forAll(sentGen) { case (words, tags) =>
      val (wins, counts) = enc.encodeWithCounts("d/0/0", words, tags)
      val tagged = tagger.tagBatch(wins)
      val (toks, preds) = realigner.reglue(tagged.map(w => (w.tokens, w.preds)))
      val a = realigner.realign(words, toks, preds).toSeq
      val b = realigner.realignWithCounts(words, counts, preds).toSeq
      a == b
    })
  }

  test("reglue strips [CLS]/[SEP]/[PAD] and preserves order across windows") {
    val words = Array.fill(6)("donaudampfschiff")
    val tags = Array.fill(6)("O")
    val wins = enc.encode("d/0/0", words, tags)
    assert(wins.length > 1)
    val tagged = new GoldLabelTagger(Tags.invLabelMap).tagBatch(wins)
    val (toks, _) = realigner.reglue(tagged.map(w => (w.tokens, w.preds)))
    val (expected, _) = enc.tokenizeWithLabels(words, tags)
    assert(toks.toSeq == expected.toSeq)
  }
}
