package graft

import graft.etl.{Assembly, Parsers}
import graft.model._
import graft.tag.GoldLabelTagger
import graft.text.{Realigner, Tags, Vocab, WindowEncoder}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

class EtlSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def writeFixture(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft_etl")
    val f = dir.resolve(name)
    Files.writeString(f, content)
    f.toString
  }

  test("S1 conll: DOCSTART skip, blank-line breaks, tag last, whitelist") {
    val p = writeFixture("conll.txt",
      """-DOCSTART- -X- O O
        |
        |Paris NNP I-NP B-LOC
        |ist VERB I-VP O
        |schön ADJ I-AP O
        |. . O O
        |
        |Anna NNP I-NP B-PER
        |Müller NNP I-NP I-PER
        |kam VERB I-VP B-MISC
        |""".stripMargin)
    val got = Parsers.conll(spark, p, "TEST-CONLL").collect()
      .sortBy(t => (t.nsentence, t.nword))
    assert(got.map(_.word).toSeq ==
      Seq("Paris", "ist", "schön", ".", "Anna", "Müller", "kam"))
    assert(got.map(_.tag).toSeq ==
      Seq("B-LOC", "O", "O", "O", "B-PER", "I-PER", "O")) // B-MISC → O
    assert(got.map(_.nsentence).distinct.toSeq ==
      Seq(Parsers.CONLL_BASE, Parsers.CONLL_BASE + 1))
    assert(got.filter(_.nsentence == Parsers.CONLL_BASE).map(_.nword).toSeq ==
      Seq(0, 1, 2, 3))
    assert(got.forall(_.dataset == "TEST-CONLL"))
  }

  test("S2 germeval: comments, tab fields, truncate-to-5") {
    val p = writeFixture("germ.tsv",
      "# comment line\n" +
      "1\tBerliner\tB-LOCderiv\tO\n" +
      "2\tKind\tO\tO\n" +
      "\n" +
      "1\tSiemens\tB-ORGpart\tO\n")
    val got = Parsers.germeval(spark, p, "GERM-TEST").collect()
      .sortBy(t => (t.nsentence, t.nword))
    assert(got.map(_.word).toSeq == Seq("Berliner", "Kind", "Siemens"))
    assert(got.map(_.tag).toSeq == Seq("B-LOC", "O", "B-ORG"))
    assert(got.map(_.nsentence).distinct.length == 2)
  }

  test("S3 europeana: malformed→O, regex sentence end with guards") {
    val p = writeFixture("eu.bio",
      """Wien B-LOC
        |ist O
        |gross. O
        |malformedline
        |Ende O
        |3. O
        |Mai O
        |war. O
        |""".stripMargin)
    val got = Parsers.europeana(spark, p, "EU-TEST").collect()
      .sortBy(t => (t.nsentence, t.nword))
    // sentence 1 ends at "gross." (regex .*[.?!]$); "3." blocked by the
    // numeric guard so sentence 2 runs to "war."
    val s0 = got.filter(_.nsentence == Parsers.EUROPEANA_BASE)
    val s1 = got.filter(_.nsentence == Parsers.EUROPEANA_BASE + 1)
    assert(s0.map(_.word).toSeq == Seq("Wien", "ist", "gross."))
    assert(s0.map(_.tag).toSeq == Seq("B-LOC", "O", "O"))
    assert(s1.map(_.word).toSeq == Seq("malformedline", "Ende", "3.", "Mai", "war."))
    assert(s1.head.tag == "O") // malformed line tagged O
  }

  test("S4 wikiner: word|pos|tag, one sentence per line, I→B repair") {
    val p = writeFixture("wiki.txt",
      "Paris|NPP|I-LOC ist|V|O schön|ADJ|O\n" +
      "Anna|NPP|B-PER Müller|NPP|I-PER\n")
    val got = Parsers.wikiner(spark, p, "WIKI-TEST").collect()
      .sortBy(t => (t.nsentence, t.nword))
    val s0 = got.filter(_.nsentence == Parsers.WIKINER_BASE)
    assert(s0.map(_.tag).toSeq == Seq("B-LOC", "O", "O")) // I-LOC repaired
    val s1 = got.filter(_.nsentence == Parsers.WIKINER_BASE + 1)
    assert(s1.map(_.tag).toSeq == Seq("B-PER", "I-PER"))
  }

  test("U1 joinGt unions corpora with disjoint sentence id ranges") {
    val c = Parsers.conll(spark,
      writeFixture("c.txt", "Paris NNP B-LOC\n"), "C")
    val g = Parsers.germeval(spark,
      writeFixture("g.tsv", "1\tWien\tB-LOC\tO\n"), "G")
    val u = Parsers.joinGt(c, g).collect()
    assert(u.length == 2)
    assert(u.map(_.dataset).toSet == Set("C", "G"))
    assert(u.map(_.nsentence).toSet ==
      Set(Parsers.CONLL_BASE, Parsers.GERMEVAL_BASE))
  }

  test("eval path roundtrip: GT → sentences → windows → gold tagger → spans F1=1.0") {
    // synthesized GT through the generator (no external data)
    val gt = graft.gen.CorpusGen.gtTokens(spark, 60, parts = 4)
    val sents = Assembly.sentences(spark, gt)
    val enc = new WindowEncoder(Vocab.default, Vocab.tokenToId, Tags.labelMap)
    val realigner = new Realigner(Vocab.default)
    val tagger = new GoldLabelTagger(Tags.invLabelMap)
    // decode each sentence through the full encode→tag→decode machinery
    val pred = sents.flatMap { s =>
      val (wins, counts) = enc.encodeWithCounts(s.guid, s.words, s.tags)
      val tagged = tagger.tagBatch(wins)
      val (_, preds) = realigner.reglue(tagged.map(w => (w.tokens, w.preds)))
      val tags = realigner.realignWithCounts(s.words, counts, preds).map(_._2)
      graft.decode.Decode.mentionsOf(s.guid, s.words, tags)
    }
    val gold = sents.flatMap { s =>
      graft.decode.Decode.mentionsOf(s.guid, s.words, s.tags)
    }
    val goldAsGm = gold.map(m => GoldMention(m.doc_id, m.span_offset,
      m.sentence_idx, m.start_word, m.end_word, m.surface, m.entity_type, "E"))
    val rows = graft.eval.SpanMetrics.evaluateMentions(spark, pred, goldAsGm).collect()
    val all = rows.find(_.slot == "ALL").get
    assert(all.f1 == 1.0 && all.tp > 0, rows.mkString("\n"))
  }

  test("A2 label inference: distinct sorted with UNK→0") {
    val gt = spark.createDataset(Seq(
      GtToken(1, 0, "a", "B-PER", "D"), GtToken(1, 1, "b", "O", "D")))
    val m = Assembly.inferLabelMap(gt)
    assert(m("UNK") == 0)
    assert(m.contains("B-PER") && m.contains("O") && m.contains("X"))
  }
}
