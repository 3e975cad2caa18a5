package graft

import graft.gen.CorpusGen
import graft.kg.Linker
import graft.model.Alias
import graft.pipeline.KgPipeline
import graft.store.DictStore
import graft.streaming.StreamIngest
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot-keyed scored-dictionary store: content fingerprinting,
  * build-once/read-many amortization (the round-4 weak item), parity of
  * the store-backed salted path with the inline and broadcast paths, and
  * torn-write healing.
  */
class DictStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("fingerprint: distributed == driver-side, order-independent, content-sensitive") {
    val rows = Seq(
      Alias("acme corp", "e1", "ORG", 0.9),
      Alias("acme", "e1", "ORG", 0.7),
      Alias("berlin", "e2", "LOC", 0.95))
    val ds = spark.createDataset(rows)
    val fp = DictStore.fingerprint(spark, ds)
    assert(fp == DictStore.fingerprintLocal(rows))
    // order/partitioning independence
    assert(fp == DictStore.fingerprint(spark,
      spark.createDataset(rows.reverse).repartition(3)))
    assert(fp == DictStore.fingerprintLocal(rows.permutations.drop(2).next()))
    // any content change moves the id
    assert(fp != DictStore.fingerprintLocal(rows.take(2)))
    assert(fp != DictStore.fingerprintLocal(
      rows.updated(0, rows(0).copy(prior = 0.91))))
    // matches the LinkContext-carried id (zero-extra-job path)
    val ctx = KgPipeline.prepareLinkContext(spark, ds)
    assert(ctx.dictSnapshotId.contains(fp))
    // multiplicity-sensitive: xor alone would collide {R,Q,Q} with
    // {R,R,R} (duplicates cancel pairwise) — the sum term must not
    val r = rows(0); val q = rows(1)
    assert(DictStore.fingerprintLocal(Seq(r, q, q)) !=
      DictStore.fingerprintLocal(Seq(r, r, r)))
    assert(DictStore.fingerprintLocal(Seq(r, r)) !=
      DictStore.fingerprintLocal(Seq(r)))
    // field boundaries are unambiguous (\u0001-joined rowKey): a
    // boundary shift between adjacent fields must move the id — an
    // unseparated concat would hash surface 'a' + entity 'b1'
    // identically to surface 'ab' + entity '1' and a replacement of one
    // by the other would silently skip a real refresh
    assert(DictStore.fingerprintLocal(Seq(Alias("a", "b1", "LOC", 0.5))) !=
      DictStore.fingerprintLocal(Seq(Alias("ab", "1", "LOC", 0.5))))
    assert(DictStore.fingerprintLocal(Seq(Alias("a", "b", "XLOC", 0.5))) !=
      DictStore.fingerprintLocal(Seq(Alias("a", "bX", "LOC", 0.5))))
  }

  test("broadcast path rejects a salted-only context instead of linking nothing") {
    val root = tmp("graft_salted_guard")
    val aliases = CorpusGen.aliases(spark)
    val ctx = KgPipeline.prepareSaltedContext(spark, aliases, root)
    val docs = CorpusGen.docs(spark, 10, parts = 2)
    val e = intercept[IllegalArgumentException] {
      KgPipeline.run(spark, docs, aliases,
        cfg = KgPipeline.Config(), ctx = Some(ctx)).count()
    }
    assert(e.getMessage.contains("salted-regime"))
  }

  test("store-backed salted pipeline: parity with inline + broadcast, built once") {
    val root = tmp("graft_dict_store")
    val docs = CorpusGen.docs(spark, 120, parts = 4)
    val aliases = CorpusGen.aliases(spark)
    def rows(cfg: KgPipeline.Config) =
      KgPipeline.run(spark, docs, aliases, cfg = cfg, ctx = None)
        .map(t => (t.subj, t.pred, t.obj, t.doc_id, t.conf,
          t.span_offset, t.sentence_idx)).collect().toSet
    val viaInline = rows(KgPipeline.Config(broadcastLink = false))
    spark.catalog.clearCache()
    val storeCfg = KgPipeline.Config(broadcastLink = false,
      dictStore = Some(root))
    val b0 = Linker.scoredDictBuilds.get()
    val first = rows(storeCfg)       // store miss → build + write
    spark.catalog.clearCache()
    val second = rows(storeCfg)      // store hit → read, NO rebuild
    spark.catalog.clearCache()
    assert(Linker.scoredDictBuilds.get() == b0 + 1,
      "scored dictionary was rebuilt on a warm store")
    assert(first == viaInline && second == viaInline && viaInline.nonEmpty)
    assert(rows(KgPipeline.Config()) == viaInline) // broadcast parity
    spark.catalog.clearCache()
  }

  test("prepareSaltedContext: steady-state ctx, no driver dictionary, parity") {
    val root = tmp("graft_salted_ctx")
    val docs = CorpusGen.docs(spark, 120, parts = 4)
    val aliases = CorpusGen.aliases(spark)
    val lcBefore = KgPipeline.linkContextCalls.get()
    val ctx = KgPipeline.prepareSaltedContext(spark, aliases, root)
    assert(KgPipeline.linkContextCalls.get() == lcBefore,
      "salted context collected the driver dictionary")
    assert(ctx.dict.isEmpty && ctx.canon.isEmpty &&
      ctx.bloomBits.isDefined && ctx.dictSnapshotId.isDefined)
    val cfg = KgPipeline.Config(broadcastLink = false, dictStore = Some(root))
    val b0 = Linker.scoredDictBuilds.get()
    def rows(c: Option[KgPipeline.LinkContext]) =
      KgPipeline.run(spark, docs, aliases, cfg = cfg, ctx = c)
        .map(t => (t.subj, t.pred, t.obj, t.doc_id, t.conf,
          t.span_offset, t.sentence_idx)).collect().toSet
    val withCtx = rows(Some(ctx))
    spark.catalog.clearCache()
    assert(Linker.scoredDictBuilds.get() == b0, "ctx run rebuilt the dict")
    // identical to broadcast ground truth
    val viaBroadcast = KgPipeline.run(spark, docs, aliases,
        cfg = KgPipeline.Config())
      .map(t => (t.subj, t.pred, t.obj, t.doc_id, t.conf,
        t.span_offset, t.sentence_idx)).collect().toSet
    assert(withCtx == viaBroadcast && withCtx.nonEmpty)
    spark.catalog.clearCache()
  }

  test("streaming: second micro-batch reuses the scored dictionary") {
    val root = tmp("graft_stream_dict")
    val aliases = CorpusGen.aliases(spark)
    val ctx = KgPipeline.prepareLinkContext(spark, aliases)
    val cfg = KgPipeline.Config(buckets = 8, broadcastLink = false)
    val all = CorpusGen.docs(spark, 60, parts = 4)
    val b0 = all.filter(_.doc_id < CorpusGen.docId(30))
    val b1 = all.filter(_.doc_id >= CorpusGen.docId(30))
    val builds0 = Linker.scoredDictBuilds.get()
    StreamIngest.commitBatch(spark, b0, 0L, root, ctx, aliases, cfg)
    val afterFirst = Linker.scoredDictBuilds.get()
    assert(afterFirst == builds0 + 1, "first batch must materialize the dict")
    StreamIngest.commitBatch(spark, b1, 1L, root, ctx, aliases, cfg)
    assert(Linker.scoredDictBuilds.get() == afterFirst,
      "second micro-batch recomputed the scored dictionary")
    // both batches actually produced triples through the store-backed path
    val triples = StreamIngest.readStreamTriples(spark, root)
    assert(triples.count() > 0)
    spark.catalog.clearCache()
  }

  test("mid-stream dictionary refresh: CDC snapshot swap between micro-batches") {
    import org.apache.spark.sql.functions.col
    val root = tmp("graft_stream_cdc")
    val v1 = CorpusGen.aliases(spark)
    val ctx1 = KgPipeline.prepareSaltedContext(spark, v1, root)
    val cfg = KgPipeline.Config(buckets = 8, broadcastLink = false,
      dictStore = Some(root))
    val all = CorpusGen.docs(spark, 60, parts = 4)
    val b0 = all.filter(_.doc_id < CorpusGen.docId(30))
    val b1 = all.filter(_.doc_id >= CorpusGen.docId(30))
    StreamIngest.commitBatch(spark, b0, 0L, root, ctx1, v1, cfg)
    // dictionary push: every alias of the head location surface dropped
    val dropSurf = CorpusGen.normSurface(
      CorpusGen.locations.head._2.mkString(" "))
    val v2 = v1.filter(_.surface_norm != dropSurf)
    val builds = Linker.scoredDictBuilds.get()
    val snap2 = DictStore.applyDiff(spark, root, ctx1.dictSnapshotId.get, v2)
    assert(Linker.scoredDictBuilds.get() == builds + 1) // subgraph-only rescore
    val ctx2 = KgPipeline.prepareSaltedContext(spark, v2, root)
    assert(ctx2.dictSnapshotId.contains(snap2))
    StreamIngest.commitBatch(spark, b1, 1L, root, ctx2, v2, cfg)
    // neither the context prep nor the batch rebuilt the scored dict
    assert(Linker.scoredDictBuilds.get() == builds + 1)
    def triples(df: org.apache.spark.sql.DataFrame) = df
      .select("subj", "pred", "obj", "doc_id")
      .as[(String, String, String, String)].collect().toSet
    val got = triples(spark.read.parquet(StreamIngest.streamPath(root))
      .where(col("batch") === 1))
    // batch 1 linked against the REFRESHED dictionary == broadcast ground
    // truth over v2, and differs from what v1 would have produced
    val wantV2 = triples(KgPipeline.run(spark, b1, v2,
      cfg = KgPipeline.Config(buckets = 8)).toDF())
    val wantV1 = triples(KgPipeline.run(spark, b1, v1,
      cfg = KgPipeline.Config(buckets = 8)).toDF())
    assert(got == wantV2 && got.nonEmpty)
    assert(got != wantV1, "dictionary drop not visible in stream output")
    spark.catalog.clearCache()
  }

  test("refresh: full build, CDC advance, and no-op all move the CURRENT pointer") {
    val root = tmp("graft_dict_refresh")
    val v1 = CorpusGen.aliases(spark)
    assert(DictStore.readCurrent(spark, root).isEmpty)
    val id1 = DictStore.refresh(spark, root, v1)
    assert(DictStore.readCurrent(spark, root).contains(id1))
    assert(id1 == DictStore.fingerprint(spark, v1))
    // no-op refresh: same content → same head, no rebuild
    val b0 = Linker.scoredDictBuilds.get()
    assert(DictStore.refresh(spark, root, v1) == id1)
    assert(Linker.scoredDictBuilds.get() == b0)
    // changed dictionary → CDC path (one subgraph-only build), head moves
    val dropSurf = CorpusGen.normSurface(
      CorpusGen.locations.head._2.mkString(" "))
    val v2 = v1.filter(_.surface_norm != dropSurf)
    val id2 = DictStore.refresh(spark, root, v2)
    assert(id2 != id1 && DictStore.readCurrent(spark, root).contains(id2))
    assert(Linker.scoredDictBuilds.get() == b0 + 1)
    // the refreshed snapshot's scored table no longer knows the surface
    val surfaces = spark.read.parquet(DictStore.scoredPath(root, id2))
      .select("surface_norm").as[String].collect().toSet
    assert(!surfaces.contains(dropSurf))
    spark.catalog.clearCache()
  }

  test("torn write (no _SUCCESS) heals: next ensureScored rebuilds") {
    val root = tmp("graft_dict_torn")
    val aliases = CorpusGen.aliases(spark)
    val snap = DictStore.fingerprint(spark, aliases)
    val b0 = Linker.scoredDictBuilds.get()
    DictStore.ensureScored(spark, root, snap, aliases, None)
    assert(Linker.scoredDictBuilds.get() == b0 + 1)
    // simulate a crash between write and commit: remove the marker
    val marker = java.nio.file.Paths.get(
      DictStore.scoredPath(root, snap), "_SUCCESS")
    java.nio.file.Files.delete(marker)
    DictStore.ensureScored(spark, root, snap, aliases, None)
    assert(Linker.scoredDictBuilds.get() == b0 + 2, "uncommitted store not rebuilt")
    // and a committed store is not touched again
    DictStore.ensureScored(spark, root, snap, aliases, None)
    assert(Linker.scoredDictBuilds.get() == b0 + 2)
  }

  test("dictionary CDC: applyDiff == full rebuild for add/remove/re-alias/bridge/split") {
    import org.apache.spark.sql.DataFrame
    val base = Seq(
      Alias("acme corp", "e1", "ORG", 0.9), Alias("acme", "e1", "ORG", 0.7),
      Alias("acme", "e2", "ORG", 0.8), Alias("acme inc", "e2", "ORG", 0.85),
      Alias("berlin", "e3", "LOC", 0.95),
      Alias("mueller", "e4", "PER", 0.6), Alias("anna mueller", "e4", "PER", 0.9),
      Alias("wien", "e5", "LOC", 0.9))
    val root = tmp("graft_cdc")
    val dsOld = spark.createDataset(base)
    val oldId = DictStore.fingerprint(spark, dsOld)
    DictStore.ensureScored(spark, root, oldId, dsOld,
      Some(graft.kg.ConnectedComponents.canonicalMap(spark, dsOld.toDF())))

    def normScored(df: DataFrame) = df.selectExpr("surface_norm",
        "to_json(array_sort(map_entries(by_type))) AS bt",
        "to_json(any_best) AS ab")
      .as[(String, String, String)].collect().toSet
    def normCanon(df: DataFrame) =
      df.select("entity_id", "canonical_id")
        .as[(String, String)].collect().toSet

    def check(label: String, next: Seq[Alias]): Unit = {
      val dsNew = spark.createDataset(next)
      val gotId = DictStore.applyDiff(spark, root, oldId, dsNew)
      assert(gotId == DictStore.fingerprint(spark, dsNew), label)
      // full rebuild in a separate root = the ground truth
      val root2 = tmp("graft_cdc_full")
      val full = DictStore.ensureScored(spark, root2, gotId, dsNew,
        Some(graft.kg.ConnectedComponents.canonicalMap(spark, dsNew.toDF())))
      val viaDiff = spark.read.parquet(DictStore.scoredPath(root, gotId))
      assert(normScored(viaDiff) == normScored(full), label)
      assert(normCanon(spark.read.parquet(DictStore.canonPath(root, gotId))) ==
        normCanon(DictStore.readCanon(spark, root2, gotId).get), label)
    }

    // re-alias (prior change only — no topology change)
    check("re-alias", base.map(a =>
      if (a.surface_norm == "berlin") a.copy(prior = 0.5) else a))
    // bridge: a new shared surface merges {e1,e2} with {e3}
    check("bridge", base ++ Seq(
      Alias("hq", "e2", "ORG", 0.4), Alias("hq", "e3", "LOC", 0.6)))
    // split: removing e2's "acme" alias detaches e2 from e1
    check("split", base.filterNot(a =>
      a.surface_norm == "acme" && a.entity_id == "e2"))
    // add a brand-new entity + surface; remove an entity entirely
    check("add+remove", base.filterNot(_.entity_id == "e5") :+
      Alias("paris", "e9", "LOC", 0.9))
    // everything at once (closure across multiple affected components)
    check("combined",
      base.filterNot(_.entity_id == "e5")
        .map(a => if (a.surface_norm == "mueller") a.copy(prior = 0.65) else a) ++
      Seq(Alias("hq", "e2", "ORG", 0.4), Alias("hq", "e3", "LOC", 0.6),
        Alias("paris", "e9", "LOC", 0.9)))

    // EMPTY diff: same content (reordered) → same snapshot id, no write
    val reordered = spark.createDataset(base.reverse).repartition(2)
    assert(DictStore.applyDiff(spark, root, oldId, reordered) == oldId)
  }

  test("scored table round-trips through parquet bit-identically") {
    val aliases = CorpusGen.aliases(spark)
    val root = tmp("graft_dict_rt")
    val canon = Some(graft.kg.ConnectedComponents.canonicalMap(spark, aliases.toDF()))
    val direct = Linker.scoredDict(spark, aliases, canon)
    val snap = DictStore.fingerprint(spark, aliases)
    val stored = DictStore.ensureScored(spark, root, snap, aliases, canon)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("surface_norm",
          // map_entries order reflects aggregation order (nondeterministic);
          // sort before comparing — lookup semantics are order-independent
          "to_json(array_sort(map_entries(by_type))) AS bt",
          "to_json(any_best) AS ab")
        .as[(String, String, String)].collect().toSet
    assert(norm(direct) == norm(stored) && norm(direct).nonEmpty)
    // the persisted canon + alias sidecars read back complete
    assert(DictStore.readCanon(spark, root, snap).get.count() ==
      canon.get.count())
    assert(DictStore.readAliases(spark, root, snap).get.count() ==
      aliases.count())
  }
}
