package graft.tools

import graft.Bench
import graft.gen.CorpusGen
import graft.kg.Linker
import graft.pipeline.KgPipeline
import graft.tag.GazetteerTagger

/** Stage-by-stage wall-clock breakdown of the salted linking path — the
  * measurement tool behind the persist/skew/join trade-offs documented in
  * KgPipeline (run manually; not part of the driver contract).
  */
object SaltedProfile {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    val n = args.headOption.map(_.toLong).getOrElse(60000L)
    val parts = 256
    val aliases = CorpusGen.aliases(spark)
    val ctx = Some(KgPipeline.prepareLinkContext(spark, aliases))
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[salted-profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def docs = CorpusGen.docs(spark, n, parts)
    def sents = KgPipeline.sentences(spark, docs)
    def tagger = new GazetteerTagger(KgPipeline.defaultGazetteer)
    // warm-up
    KgPipeline.run(spark, docs, aliases, ctx = ctx).count()
    time("detect only (count)") {
      KgPipeline.detectRows(spark, sents, tagger, KgPipeline.Config()).count()
    }
    val mentions = KgPipeline.detectMentions(spark, sents, tagger)
    time("mentions persist+count") { mentions.persist(); mentions.count() }
    time("skew infer (on cache)") { Linker.inferSkewKeys(spark, mentions) }
    time("salted join (on cache)") {
      Linker.linkSaltedJoin(spark, mentions, aliases).count()
    }
    mentions.unpersist()
    spark.catalog.clearCache()
    time("broadcast full run") {
      KgPipeline.run(spark, docs, aliases, ctx = ctx).count()
    }
    spark.catalog.clearCache()
    time("salted full run") {
      KgPipeline.run(spark, docs, aliases,
        cfg = KgPipeline.Config(broadcastLink = false), ctx = ctx).count()
    }
    // replicate the salted branch step-by-step
    spark.catalog.clearCache()
    locally {
      import graft.kg.Triples.{DocUnit, SlimMention, SlimRelation}
      val cfg = KgPipeline.Config(broadcastLink = false)
      val context = ctx.get
      val bcDict = spark.sparkContext.broadcast(context.dict)
      val bcCanon = spark.sparkContext.broadcast(context.canon)
      def linkCanon(surface: String, typ: String): Option[(String, Double)] = {
        val cands = bcDict.value.getOrElse(CorpusGen.normSurface(surface), Seq.empty)
        Linker.bestCandidate(cands, typ).map { a =>
          (bcCanon.value.getOrElse(a.entity_id, a.entity_id), a.prior)
        }
      }
      time("step detectRows count") {
        KgPipeline.detectRows(spark, sents, tagger, cfg).count()
      }
      val skew = time("step skew sample") {
        Linker.inferSkewKeys(spark,
          KgPipeline.detectMentions(spark, sents.sample(0.01, 42), tagger, cfg),
          sampleFraction = 1.0)
      }
      val slim = KgPipeline.detectRows(spark, sents, tagger, cfg)
        .flatMap { row =>
          if (row.mention != null) {
            val m = row.mention
            Iterator.single(KgPipeline.SaltedRow(m.doc_id, m.span_offset,
              m.sentence_idx, CorpusGen.normSurface(m.surface),
              m.entity_type, null))
          } else {
            val r = row.relation
            (for {
              (s, _) <- linkCanon(r.subj_surface, r.subj_type)
              (o, _) <- linkCanon(r.obj_surface, r.obj_type)
            } yield KgPipeline.SaltedRow(r.doc_id, -1, -1, null, null,
              SlimRelation(r.span_offset, r.sentence_idx, s, r.rel, o))).iterator
          }
        }
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("step slim materialize") { slim.count() }
      val mentions = slim.filter(_.r == null).toDF()
        .select("doc_id", "span_offset", "sentence_idx", "surface_norm",
          "entity_type")
      val linked = Linker.linkSaltedSlim(spark, mentions, aliases,
        cfg.saltBuckets, Some(skew))
      time("step slim link count") { linked.count() }
      val mUnits = linked.map { lm =>
        DocUnit(lm.doc_id, SlimMention(lm.span_offset, lm.sentence_idx,
          bcCanon.value.getOrElse(lm.entity_id, lm.entity_id), lm.conf), null)
      }
      val rUnits = slim.filter(_.r != null).map(s => DocUnit(s.doc_id, null, s.r))
      val units = mUnits.unionByName(rUnits)
      time("step cogroup+count") {
        graft.kg.Triples.buildUnits(spark, units,
          KgPipeline.mediaSpans(spark, docs), cfg.buckets).count()
      }
    }
    spark.stop()
  }
}
