package graft.gen

import graft.kg.Triples
import graft.model._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-side SEQUENTIAL golden replays for the KG driver queries.
  *
  * The KG stages have no SQL equivalent, so their DuckDB oracles read a
  * golden parquet written here at verify time. Each golden is computed
  * single-threaded on the driver from PLANT-TIME knowledge (the
  * generator's gold mentions / expected triples — FIXTURES.md §1/§6) or a
  * sequential replay of the documented linking rule — never by running
  * the distributed pipeline under test. The driver's rows+schema+hash
  * compare then proves the distributed plan reproduces the sequential
  * semantics exactly, under any partitioning.
  */
object Goldens {

  /** Golden-parquet root. Default is PER-USER + PER-PROCESS under
    * java.io.tmpdir (a fixed world-shared /tmp literal let concurrent
    * verify runs overwrite each other mid-compare, and any local user
    * pre-create/poison it). graft.Verify overrides it with a path under
    * its own outDir; SparkEntry.oracleSql interpolates whatever is
    * current when the oracle JSON is dumped — queries and oracles always
    * agree because Verify sets this before running either.
    */
  @volatile var root: String =
    s"${System.getProperty("java.io.tmpdir")}/graft_goldens_${System.getProperty("user.name", "u")}_${ProcessHandle.current().pid()}"

  /** Golden writes are memoized per (root, name): Verify writes each
    * golden exactly once per outDir, and a BENCHED query whose lambda
    * plants a golden (q89) must not re-pay the sequential replay on
    * every timed iteration — without this the bench measures golden
    * generation, not the distributed query.
    */
  private val written = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def write(spark: SparkSession, name: String, df: DataFrame): Unit = {
    val key = s"$root/$name"
    if (!written.contains(key)) {
      // mark AFTER the write succeeds — a failed/interrupted write must
      // not poison the memo and silently skip the retry
      df.coalesce(1).write.mode("overwrite").parquet(key)
      written.add(key)
    }
  }

  private def docs(n: Int): Seq[CorpusGen.GenDoc] =
    (0 until n).map(i => CorpusGen.genDoc(i.toLong))

  case class TripleGold(subj: String, pred: String, obj: String,
                        doc_id: String, bucket: Int, conf: Double)

  /** Expected pipeline triples incl. the deterministic bucket column and
    * the triple confidence: `mentions` triples carry the max linked-alias
    * prior over the entity's occurrences in the doc (sequential replay of
    * the documented scoring rule, plant-time derivable); all other
    * triple families are emitted with conf 1.0 by construction.
    */
  def writeTriples(spark: SparkSession, n: Int, buckets: Int): Unit = {
    import spark.implicits._
    val dict = CorpusGen.aliasDict.groupBy(_.surface_norm)
    def prior(surface: String, typ: String): Double =
      goldenBest(dict.getOrElse(CorpusGen.normSurface(surface), Seq.empty), typ)
        .map(_.prior).getOrElse(0.0)
    val rows = docs(n).flatMap { gd =>
      val confByCanon = gd.gold.groupBy(_.entity_id + "#0").map {
        case (c, ms) => c -> ms.map(m => prior(m.surface, m.entity_type)).max
      }
      CorpusGen.expectedTriples(gd).map { t =>
        val conf = if (t.pred == "mentions") confByCanon(t.obj) else 1.0
        TripleGold(t.subj, t.pred, t.obj, t.doc_id,
          Triples.bucketOf(t.doc_id, buckets), conf)
      }
    }
    write(spark, "kg_triples", spark.createDataset(rows).toDF())
  }

  /** Plant-time gold mentions, shaped like the detect stage's output. */
  def writeMentions(spark: SparkSession, n: Int): Unit = {
    import spark.implicits._
    val rows = docs(n).flatMap(_.gold).map(m => Mention(m.doc_id,
      m.span_offset, m.sentence_idx, m.start_word, m.end_word,
      m.surface, m.entity_type))
    write(spark, "kg_mentions", spark.createDataset(rows).toDF())
  }

  /** Raw-text ingestion golden (the reference's `/ner` entry point,
    * webapp/app.py:215-317): each doc's text spans concatenated into ONE
    * raw string, sentence-split and mention-detected SEQUENTIALLY on the
    * driver — one sentence per encode/tag/re-glue/re-align round trip,
    * single-threaded, no Spark. The distributed q89 plan must reproduce
    * these rows exactly under any partitioning and any cross-sentence
    * batch grouping (the fused detect stage batches 64 sentences per
    * tagger call; this golden proves that batching is semantics-free).
    */
  def writeRawNer(spark: SparkSession, n: Int): Unit = {
    import graft.text._
    val enc = new WindowEncoder(Vocab.default, Vocab.tokenToId, Tags.labelMap)
    val realigner = new Realigner(Vocab.default)
    val tagger = new graft.tag.GazetteerTagger(
      graft.pipeline.KgPipeline.defaultGazetteer)
    val rows = docs(n).flatMap { gd =>
      val raw = gd.doc.spans.filter(_.kind == "text").sortBy(_.offset)
        .map(_.text).mkString(" ")
      SentenceSplitter.sentences(raw).zipWithIndex.flatMap {
        case (words, sidx) =>
          val guid = s"${gd.doc.doc_id}/0/$sidx"
          val (wins, counts) =
            enc.encodeWithCounts(guid, words, Array.fill(words.length)("O"))
          val tagged = tagger.tagBatch(wins)
          val (_, preds) = realigner.reglue(tagged.map(w => (w.tokens, w.preds)))
          val tags = realigner.realignWithCounts(words, counts, preds).map(_._2)
          graft.decode.Decode.mentionsOf(guid, words, tags)
      }
    }
    write(spark, "q89_raw_ner", {
      import spark.implicits._
      spark.createDataset(rows).toDF()
    })
  }

  /** The documented candidate-scoring rule (type match > max prior >
    * min entity id), re-derived INDEPENDENTLY of Linker.bestCandidate so
    * the golden does not share code with the operator under test (the
    * round-2 verdict's recorded caveat).
    */
  private def goldenBest(cands: Seq[Alias], typ: String): Option[Alias] = {
    val typed = cands.filter(_.entity_type == typ)
    val pool = if (typed.nonEmpty) typed else cands
    pool.sortBy(a => (-a.prior, a.entity_id)).headOption
  }

  /** Sequential replay of the linking rule over gold mentions. The salted
    * join aggregates per (doc, span, sentence, surface, type) — replicate
    * that key-distinctness, then apply [[goldenBest]].
    */
  def writeLinked(spark: SparkSession, n: Int): Unit = {
    import spark.implicits._
    val dict = CorpusGen.aliasDict.groupBy(_.surface_norm)
    val rows = docs(n).flatMap(_.gold)
      .map(m => (m.doc_id, m.span_offset, m.sentence_idx, m.surface, m.entity_type))
      .distinct
      .flatMap { case (d, so, si, surf, typ) =>
        goldenBest(dict.getOrElse(CorpusGen.normSurface(surf), Seq.empty), typ)
          .map(a => LinkedMention(d, so, si, surf, typ, a.entity_id, a.prior))
      }
    write(spark, "kg_linked_salted", spark.createDataset(rows).toDF())
  }

  /** Expected eval rows for an exact detector: per-type distinct span-key
    * counts with P = R = F1 = 1.0 (key = the full-outer-join key of
    * SpanMetrics.evaluateMentions).
    */
  def evalGolden(n: Int): Seq[EvalRow] = {
    val keys = docs(n).flatMap(_.gold)
      // same 6-field span identity as SpanMetrics.evaluateMentions
      // (sentence_idx included — start/end_word are sentence-relative)
      .map(m => (m.doc_id, m.span_offset, m.sentence_idx, m.start_word,
        m.end_word, m.entity_type))
      .distinct
    val perType = keys.groupBy(_._6).toSeq.map { case (t, ks) =>
      EvalRow(t, 1.0, 1.0, 1.0, ks.size.toLong, 0L, 0L)
    }
    (perType :+ EvalRow("ALL", 1.0, 1.0, 1.0, keys.size.toLong, 0L, 0L))
      .sortBy(_.slot)
  }

  def writeEval(spark: SparkSession, name: String, n: Int): Unit = {
    import spark.implicits._
    write(spark, name, spark.createDataset(evalGolden(n)).toDF())
  }

  /** Context-disambiguation INPUT fixtures (mention stream + the
    * ambiguous dictionary), written sequentially on the driver so the
    * DuckDB oracle re-derives the whole anchor/candidate scoring chain
    * in SQL independently of the Spark plan under test.
    */
  def writeCtxFixture(spark: SparkSession, n: Int): Unit = {
    import spark.implicits._
    val ments = (0 until n).flatMap(i => CorpusGen.genCtxMentions(i.toLong))
    write(spark, "ctx_mentions", spark.createDataset(ments)
      .toDF("doc_id", "span_offset", "sentence_idx", "surface_norm",
        "entity_type"))
    write(spark, "ctx_aliases",
      spark.createDataset(CorpusGen.ctxAliasDict).toDF())
  }

  /** Language-planted INPUT corpus, written sequentially on the driver so
    * the DuckDB oracle can recompute the whole langid confusion matrix
    * from the text independently of the Spark plan under test.
    */
  def writeLangDocs(spark: SparkSession, n: Int): Unit = {
    import spark.implicits._
    val rows = (0 until n).map(i => CorpusGen.genLangDoc(i.toLong))
    write(spark, "lang_docs",
      spark.createDataset(rows).toDF("doc_id", "lang", "text"))
  }
}
