package graft

import graft.api.NerOutput
import graft.etl.{Assembly, Corpus, WikipediaGt}
import graft.eval.CrossVal
import graft.model.GtToken
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusApiSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("W8 reflow: lines break at minLen + sentence-final word") {
    val text = ("word " * 20 + "ende. " + "mehr " * 20 + "schluss.").trim
    val lines = Corpus.reflow(text, minLineLen = 80)
    assert(lines.length == 2)
    assert(lines(0).endsWith("ende."))
    assert(lines(1).endsWith("schluss."))
    // numeric guard: "3." does not end a line
    val l2 = Corpus.reflow(("x " * 40 + "3. " + "y " * 10 + "z.").trim, 40)
    assert(!l2(0).endsWith("3."))
  }

  test("P4 selection semi-join + P8 null guard + K2 ordered sink") {
    val fulltext = Seq(
      ("p1", "f1", "a " * 30 + "ende."),
      ("p2", "f2", null.asInstanceOf[String]),
      ("p3", "f3", "not selected text here.")
    ).toDF("ppn", "filename", "text")
    val selection = Seq(("p1", "f1", true), ("p2", "f2", true), ("p3", "f3", false))
      .toDF("ppn", "filename", "selected")
    val lines = Corpus.collect(spark, fulltext, selection, 20).collect()
    // content lines + exactly one blank document separator per selected
    // doc with text (K2 contract: documents separated by blank lines)
    assert(lines.nonEmpty && lines.last == "")
    assert(lines.count(_.isEmpty) == 1) // p1 only: p2 has null text, p3 unselected
    assert(lines.init.forall(_.nonEmpty))
    assert(!lines.exists(_.contains("not selected")))
    val out = Files.createTempDirectory("graft_corpus").toString + "/corpus"
    Corpus.writeCorpus(spark, Corpus.collect(spark, fulltext, selection, 20), out)
    assert(spark.read.text(out).count() == lines.length)
  }

  test("S8 wikipedia GT CSV: from_json + arrays_zip + stratified filter") {
    val dir = Files.createTempDirectory("graft_wiki")
    val sent = (1 to 12).map(i => s"w$i").mkString(" ")
    val tags = ("O " * 11 + "B-PER").trim
    val sentsJson = "[" + (1 to 25).map(_ => "\"" + sent + "\"").mkString(",") + "]"
    val tagsJson = "[" + (1 to 25).map(_ => "\"" + tags + "\"").mkString(",") + "]"
    val csv = "page_id,text,tags\n" +
      s"""7,"${sentsJson.replace("\"", "\"\"")}","${tagsJson.replace("\"", "\"\"")}"\n"""
    val p = dir.resolve("wiki.csv"); Files.writeString(p, csv)
    val parsed = WikipediaGt.parse(spark, p.toString, minSenLen = 10, minArticleLen = 20)
    assert(parsed.count() == 25)
    val gt = WikipediaGt.toGt(spark, parsed, "WIKI-GT").collect()
    assert(gt.count(_.tag == "B-PER") == 25)
    assert(gt.forall(_.dataset == "WIKI-GT"))
    // subset filter drops unknown pages
    val sub = Seq(99L).toDF("page_id")
    assert(WikipediaGt.filterPages(parsed, sub).count() == 0)
    // stratify keeps entity sentences always
    assert(WikipediaGt.stratify(parsed, 0.0).count() == 25)
  }

  test("K6 ner output contract: nested word/prediction arrays, html escape") {
    val tagged = Seq(
      ("d1/0/0", Array("Anna", "kam", "."), Array("B-PER", "O", "O")),
      ("d1/1/1", Array("Paris", "!"), Array("B-LOC", "O"))).toDS()
    val j = NerOutput.nerJson(spark, tagged).collect()
    assert(j.length == 1)
    val resp = j(0).getString(1)
    assert(resp.startsWith("[[") && resp.contains("\"word\":\"Anna\"") &&
      resp.contains("\"prediction\":\"B-PER\""))
    // sentence order preserved by offset
    assert(resp.indexOf("Anna") < resp.indexOf("Paris"))
    assert(NerOutput.htmlEscape("<a&b>") == "&lt;a&amp;b&gt;")
    val bt = NerOutput.bertTokensJson(spark,
      Seq(("g", Array("[CLS]", "an", "##na", "[SEP]"), Array("O", "B-PER", "X", "O"))).toDS())
      .collect()(0).getString(1)
    assert(bt == """[{"token":"an","prediction":"B-PER"},{"token":"##na","prediction":"X"}]""")
  }

  test("J7/A7 cross-validation: contiguous grouped folds, TEST partition rotates") {
    val gt = spark.createDataset((0L until 10L).flatMap { s =>
      Seq(GtToken(s, 0, "w", "O", "D"), GtToken(s, 1, "x", "B-PER", "D"))
    })
    val folds = CrossVal.foldAssignment(spark, gt, 5)
    assert(folds.groupBy("fold").count().collect().forall(_.getLong(1) == 2))
    val results = CrossVal.run(spark, gt, 5) { (fold, f) =>
      fold.where(col("dataset") === "CV-TEST")
        .groupBy().agg(count(lit(1)).as("n_test_tokens"))
    }
    val rows = results.collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getLong(0) == 4)) // 2 sentences × 2 tokens per fold
  }

  test("ST1 seeded epoch shuffle: deterministic, epoch-dependent") {
    val sents = graft.pipeline.KgPipeline.sentences(spark,
      graft.gen.CorpusGen.docs(spark, 10, parts = 2))
    val e0a = Assembly.shuffledEpoch(sents, 0, 42).collect().map(_.guid).toSeq
    val e0b = Assembly.shuffledEpoch(sents, 0, 42).collect().map(_.guid).toSeq
    val e1 = Assembly.shuffledEpoch(sents, 1, 42).collect().map(_.guid).toSeq
    assert(e0a == e0b)
    assert(e0a != e1)
    assert(e0a.toSet == e1.toSet)
  }
}
