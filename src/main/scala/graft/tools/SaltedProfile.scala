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
    // step-by-step breakdown of the (de-drivered) salted branch
    spark.catalog.clearCache()
    locally {
      import org.apache.spark.sql.functions._
      val cfg = KgPipeline.Config(broadcastLink = false)
      time("step detectRows count") {
        KgPipeline.detectRows(spark, sents, tagger, cfg).count()
      }
      val slim = KgPipeline.detectRows(spark, sents, tagger, cfg)
        .map { row =>
          if (row.mention != null) {
            val m = row.mention
            KgPipeline.SaltedRow(m.doc_id, m.span_offset, m.sentence_idx,
              CorpusGen.normSurface(m.surface), m.entity_type,
              null, null, null, null, null)
          } else {
            val r = row.relation
            KgPipeline.SaltedRow(r.doc_id, r.span_offset, r.sentence_idx,
              null, null, r.rel, CorpusGen.normSurface(r.subj_surface),
              r.subj_type, CorpusGen.normSurface(r.obj_surface), r.obj_type)
          }
        }
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("step slim materialize") { slim.count() }
      val skew = time("step skew from cache") {
        Linker.inferSkewKeysNorm(spark,
          slim.toDF().where(org.apache.spark.sql.functions.col("rel").isNull)
            .select("surface_norm"))
      }
      val canonDF = time("step canonical map (CC)") {
        val c = graft.kg.ConnectedComponents.canonicalMap(spark, aliases.toDF())
        c.count(); c
      }
      val cacheDF = slim.toDF()
      // mirror run()'s packed single-column carry
      val relKey = concat_ws("\u0001", col("rel"), col("subj_norm"),
        col("subj_type"), col("obj_norm"), col("obj_type"))
      val mentionSide = cacheDF.where(col("rel").isNull)
        .select(col("doc_id"), col("span_offset"), col("sentence_idx"),
          col("surface_norm"), col("entity_type"), lit("m").as("role"),
          lit(null).cast("string").as("rel_key"))
      def endpoint(role: String, surf: String, typ: String) =
        cacheDF.where(col("rel").isNotNull)
          .select(col("doc_id"), col("span_offset"), col("sentence_idx"),
            col(surf).as("surface_norm"), col(typ).as("entity_type"),
            lit(role).as("role"), relKey.as("rel_key"))
      val joinIn = mentionSide
        .unionByName(endpoint("s", "subj_norm", "subj_type"))
        .unionByName(endpoint("o", "obj_norm", "obj_type"))
      val linked = Linker.linkSaltedCarry(spark, joinIn, aliases,
        cfg.saltBuckets, Some(skew), canon = Some(canonDF))
      time("step carry link count") { linked.count() }
    }
    spark.stop()
  }
}
