package graft

import graft.gen.CorpusGen
import graft.model.Doc
import graft.pipeline.KgPipeline
import graft.store.LineageStore
import org.apache.spark.sql.SparkSession

/** spark-submit entry point — the deployable surface of the engine
  * (north rule: "run via spark-submit on a multi-executor cluster").
  *
  * Modes:
  *   run <docsParquetDir|gen:N> <outRoot> [buckets]
  *     batch KG construction with lineage + exact resume: rerunning after
  *     a kill processes only buckets missing from the lineage table.
  *   stream <docsStreamDir> <outRoot> <checkpointDir>
  *     Structured-Streaming ingestion (exactly-once micro-batches).
  *   mlm <docsParquetDir> <outDir> [epochs]
  *     masked-LM pre-training instance pregeneration (epoch JSONL files
  *     with sidecar metrics, seeded per-epoch shuffle)
  *   compact <outRoot>
  *     store maintenance: rewrite each triple bucket partition's
  *     accumulated small files as one subj-sorted file per bucket (rows
  *     + lineage unchanged; subject lookups gain row-group pruning),
  *     and merge near-dup gate state below the head batch into the
  *     reserved batch=-1 partition.
  *   dict <aliasesParquetDir|gen> <storeRoot>
  *     scored-dictionary maintenance: bring the snapshot-keyed
  *     DictStore up to the given alias table — CDC delta from the
  *     CURRENT snapshot when possible, full build otherwise, no-op
  *     when already current — and advance the head pointer.
  *   lookup <outRoot> <subject>
  *     triple-store point read for one subject (row-group-pruned on a
  *     compacted store).
  *   serve [port]
  *     HTTP NER surface (GET /models, POST /ner[/id]) over the built-in
  *     registry; blocks until killed.
  *   verify <sfDir> <outDir>   — driver correctness dump (graft.Verify)
  *   bench                      — graft.Bench (env-configured)
  *   status <outRoot>
  *     operational snapshot of a stream/batch root: snapshot chain,
  *     per-batch stage metrics, current canonical-map size.
  *
  * Every verb accepts `--limit N` (the reference's `--dry_run` analog,
  * models/bert.py:165-169, 207-209): run/mlm cap their input docs,
  * verify/bench cap every driver-table read — smoke runs only (oracle
  * compares are not meaningful under a limit).
  *
  * No master/config is set here: spark-submit supplies them (the local
  * test harnesses configure their own sessions).
  */
object Main {

  /** Strip a `--limit N` flag (any position) from the argv — the
    * `--dry_run` analog (models/bert.py:165-169, 207-209): cap input
    * docs/tables for smoke runs. Returns (limit, remaining args);
    * rejects a malformed or missing N loudly rather than silently
    * running the full job.
    */
  def parseLimit(args: Array[String]): (Option[Int], Array[String]) = {
    // strip EVERY occurrence (last value wins): a repeated flag must not
    // leave its second pair in argv to be consumed as positional args
    var rest = args
    var limit: Option[Int] = None
    var i = rest.indexOf("--limit")
    while (i >= 0) {
      require(i + 1 < rest.length && rest(i + 1).toIntOption.exists(_ > 0),
        "--limit requires a positive integer")
      limit = Some(rest(i + 1).toInt)
      rest = rest.patch(i, Nil, 2)
      i = rest.indexOf("--limit")
    }
    (limit, rest)
  }

  private def capped[T](ds: org.apache.spark.sql.Dataset[T],
                        limit: Option[Int]): org.apache.spark.sql.Dataset[T] =
    limit.fold(ds)(ds.limit)

  /** The `curate` verb body: funnel verdicts to `out`, return the stage
    * histogram (desc by count, ties by stage for a stable print).
    */
  private[graft] def runCurate(spark: org.apache.spark.sql.SparkSession,
                               input: String, out: String, lang: String,
                               minWords: Long,
                               limit: Option[Int]): Seq[(String, Long)] = {
    import spark.implicits._
    val txt: org.apache.spark.sql.DataFrame =
      if (input.startsWith("gen:"))
        capped(CorpusGen.docs(spark, input.stripPrefix("gen:").toLong,
            spark.sparkContext.defaultParallelism * 4), limit)
          .map(d => (d.doc_id, d.spans.filter(_.kind == "text")
            .sortBy(_.offset).map(_.text).mkString(" ")))
          .toDF("doc_id", "text")
      else {
        val raw = spark.read.parquet(input).select("doc_id", "text")
        limit.map(raw.limit).getOrElse(raw)
      }
    graft.ops.Filters.curationFunnel(txt, lang, minWords)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
    spark.read.parquet(out).groupBy("drop_stage").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (s, n) => (-n, s) }.toSeq
  }

  /** The `cv` verb body: per fold, re-tag the GT to CV-TRAIN/CV-TEST
    * (GroupKFold over contiguous sentence blocks, bert.py:452-468), run
    * the production detect stage (gazetteer tagger) on the TEST
    * sentences, score span-level P/R/F1 against gold, and concatenate
    * the per-fold metric frames with a `split` key — the
    * eval_results-shaped table of bert.py:489-500, written to `outDir`
    * as parquet and printed. Returns the row count (k folds × slots).
    */
  def runCv(spark: SparkSession, outDir: String, nSents: Long, k: Int,
            limit: Option[Int] = None): Long = {
    import spark.implicits._
    val gt = capped(CorpusGen.gtTokens(spark, nSents, parts = 8), limit)
    val results = graft.eval.CrossVal.run(spark, gt, k) { (fold, _) =>
      val test = fold.toDF()
        .where(org.apache.spark.sql.functions.col("dataset") === "CV-TEST")
        .as[graft.model.GtToken]
      val sents = graft.etl.Assembly.sentences(spark, test)
      val pred = KgPipeline.detectMentions(spark, sents,
        new graft.tag.GazetteerTagger(KgPipeline.defaultGazetteer))
      val gold = sents.flatMap(sn =>
        graft.decode.Decode.mentionsOf(sn.guid, sn.words, sn.tags))
        .map(m => graft.model.GoldMention(m.doc_id, m.span_offset,
          m.sentence_idx, m.start_word, m.end_word, m.surface,
          m.entity_type, "E"))
      graft.eval.SpanMetrics.evaluateMentions(spark, pred, gold).toDF()
    }.orderBy("split", "slot")
    results.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(outDir)
    val rows = spark.read.parquet(outDir).orderBy("split", "slot").collect()
    rows.foreach { r =>
      println(f"fold ${r.getAs[Int]("split")}%d ${r.getAs[String]("slot")}%-5s " +
        f"p=${r.getAs[Double]("precision")}%.4f r=${r.getAs[Double]("recall")}%.4f " +
        f"f1=${r.getAs[Double]("f1")}%.4f tp=${r.getAs[Long]("tp")}%d " +
        f"fp=${r.getAs[Long]("fp")}%d fn=${r.getAs[Long]("fn")}%d")
    }
    rows.length.toLong
  }

  /** spark-submit supplies the master; SPARK_MASTER env enables local
    * smoke runs (e.g. SPARK_MASTER=local[8] sbt "runMain graft.Main ...").
    */
  private def session(name: String): SparkSession = {
    val b = SparkSession.builder().appName(name)
    sys.env.get("SPARK_MASTER").foreach { m =>
      b.master(m).config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors().toString)
    }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(argv: Array[String]): Unit = {
    val (limit, args) = parseLimit(argv)
    // smoke cap for the verify/bench verbs: SparkEntry's table reads
    // honor this property (oracle compares are not meaningful under it)
    limit.foreach(n => sys.props("graft.limit") = n.toString)
    dispatch(args, limit)
  }

  /** Minimum argv length (verb included) per verb: a missing operand
    * falls through to the usage message instead of surfacing as an
    * ArrayIndexOutOfBoundsException from args(i).
    */
  private val minArgs = Map(
    "run" -> 3, "stream" -> 4, "mlm" -> 3, "compact" -> 2, "dict" -> 3,
    "lookup" -> 3, "serve" -> 1, "status" -> 2, "verify" -> 3,
    "bench" -> 1, "cv" -> 2, "curate" -> 3)

  private def usage(): Nothing = {
    System.err.println("usage: graft.Main run|stream|mlm|compact|dict|lookup|cv|curate|serve|verify|bench|status ... [--limit N]")
    sys.exit(2)
  }

  private def dispatch(args: Array[String], limit: Option[Int]): Unit = {
    args.headOption.foreach { verb =>
      if (minArgs.get(verb).exists(args.length < _)) usage()
    }
    dispatchChecked(args, limit)
  }

  private def dispatchChecked(args: Array[String], limit: Option[Int]): Unit = args.headOption match {
    case Some("run") =>
      val spark = session("graft-kg-run")
      import spark.implicits._
      val docs: org.apache.spark.sql.Dataset[Doc] = capped(
        if (args(1).startsWith("gen:"))
          CorpusGen.docs(spark, args(1).stripPrefix("gen:").toLong,
            spark.sparkContext.defaultParallelism * 4)
        else spark.read.parquet(args(1)).as[Doc], limit)
      val outRoot = args(2)
      val buckets = if (args.length > 3) args(3).toInt else 64
      val aliases = CorpusGen.aliases(spark)
      val ctx = KgPipeline.prepareLinkContext(spark, aliases)
      val cfg = KgPipeline.Config(buckets = buckets)
      val snap = graft.store.Snapshots.configHash(cfg.toString, args(1))
      val n = LineageStore.runResumable(spark, outRoot, "triples", docs,
        ds => KgPipeline.run(spark, ds, aliases, cfg = cfg, ctx = Some(ctx)),
        buckets, snap)
      println(s"processed $n new bucket(s); triples at ${LineageStore.triplesPath(outRoot)}")
      spark.stop()

    case Some("stream") =>
      val spark = session("graft-kg-stream")
      import spark.implicits._
      val aliases = CorpusGen.aliases(spark)
      val ctx = KgPipeline.prepareLinkContext(spark, aliases)
      val schema = org.apache.spark.sql.Encoders.product[Doc].schema
      val stream = spark.readStream.schema(schema).parquet(args(1)).as[Doc]
      val q = graft.streaming.StreamIngest.run(spark, stream, args(2), ctx,
        aliases, KgPipeline.Config(), args(3))
      q.awaitTermination()
      spark.stop()

    case Some("mlm") =>
      // masked-LM pregeneration over a documents table: one JSONL file +
      // sidecar metrics per epoch (pregenerate_training_data.py:278-298;
      // epochs differ by their seeded shuffle key, the columns are
      // deterministic per doc)
      val spark = session("graft-mlm-pregen")
      val docs = capped(spark.read.parquet(args(1)), limit)
      val outDir = args(2)
      val epochs = if (args.length > 3) args(3).toInt else 3
      val pairs = graft.ops.MlmGen.nspPairs(docs)
      (0 until epochs).foreach { ep =>
        val shuffled = pairs.orderBy(
          org.apache.spark.sql.functions.xxhash64(
            org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.lit(ep)))
        val n = graft.ops.MlmGen.writeEpochJson(spark, shuffled, outDir, ep)
        println(s"epoch $ep: $n instances")
      }
      spark.stop()

    case Some("compact") =>
      val spark = session("graft-compact")
      if (graft.store.Fs.exists(spark, LineageStore.triplesPath(args(1)))) {
        // heal a previous compaction killed between its two renames
        LineageStore.recoverCompaction(spark, args(1))
        val (before, after) = LineageStore.compactTriples(spark, args(1))
        println(s"compacted ${LineageStore.triplesPath(args(1))}: $before -> $after data files")
      }
      // near-dup gate state: merge every batch below the head (the only
      // batch foreachBatch may still retry) into the reserved batch=-1
      graft.ops.Dedup.nearDupHeadBatch(spark, args(1)).foreach { head =>
        val (b, a) = graft.ops.Dedup.nearDupCompact(spark, args(1), head)
        println(s"compacted near-dup gate state: $b -> $a batch partition(s)")
      }
      spark.stop()

    case Some("dict") =>
      val spark = session("graft-dict-refresh")
      import spark.implicits._
      val aliases =
        if (args(1) == "gen") CorpusGen.aliases(spark)
        else spark.read.parquet(args(1)).as[graft.model.Alias]
      val id = graft.store.DictStore.refresh(spark, args(2), aliases)
      println(s"scored dictionary head: $id at " +
        graft.store.DictStore.snapPath(args(2), id))
      spark.stop()

    case Some("lookup") =>
      // lookup <outRoot> <subject> [pred] — the entity-page access
      // path: a pushed-down point read served by manifest file pruning
      // + row-group skipping when the store has been compacted
      // (subj-sorted zone maps); with a predicate, the composite
      // (subj, pred) read. Output is subject-degree-sized — bounded,
      // safe to print.
      val spark = session("graft-lookup")
      val rows = (if (args.length > 3)
        graft.store.LineageStore.lookupBySubjectPred(spark, args(1),
          args(2), args(3))
      else graft.store.LineageStore.lookupBySubject(spark, args(1), args(2)))
        .collect().sortBy(t => (t.doc_id, t.pred, t.obj))
      rows.foreach(t => println(
        s"${t.subj}\t${t.pred}\t${t.obj}\tdoc=${t.doc_id}\tconf=${t.conf}"))
      println(s"${rows.length} triple(s) for subject ${args(2)}")
      spark.stop()

    case Some("serve") =>
      // serve [port] — the reference's webapp surface (/models, /ner)
      // over the built-in gazetteer registry; blocks until killed
      val spark = session("graft-ner-serve")
      val registry = new graft.api.ModelRegistry(
        Seq(graft.api.ModelSpec("gazetteer", 1, "builtin", 7, default = true)),
        _ => new graft.tag.GazetteerTagger(KgPipeline.defaultGazetteer))
      val srv = new graft.api.NerServer(spark, registry,
        if (args.length > 1) args(1).toInt else 8080)
      val port = srv.start()
      println(s"graft NER serving on :$port (GET /models, POST /ner)")
      Thread.currentThread.join()

    case Some("status") =>
      val spark = session("graft-status")
      val root = args(1)
      // batch lineage first: a `run` root has no snapshot chain, and
      // status must still answer "what's committed / what resumes"
      if (graft.store.Fs.exists(spark, graft.store.LineageStore.lineagePath(root))) {
        val lineage = graft.store.LineageStore.readLineage(spark, root).collect()
        lineage.groupBy(_.stage).toSeq.sortBy(_._1).foreach { case (stage, rs) =>
          println(s"lineage $stage: ${rs.map(_.partition_id).distinct.length} " +
            s"bucket(s), ${rs.map(_.triple_count).sum} triples, " +
            s"${rs.map(_.rows_in).sum} rows in")
        }
      }
      val snaps = graft.store.Snapshots.read(spark, root).collect()
        .sortBy(_.snapshot_id)
      snaps.foreach(s => println(
        s"snapshot ${s.snapshot_id} (parent ${s.parent_id}): ${s.n_rows} rows"))
      val metrics = graft.store.StageMetrics.read(spark, root).collect()
      metrics.groupBy(_.snapshot_id).toSeq.sortBy(_._1).foreach {
        case (snap, ms) =>
          val kv = ms.sortBy(_.metric)
            .map(m => s"${m.metric}=${m.value}").mkString(" ")
          println(s"metrics $snap: $kv")
      }
      if (graft.store.Fs.exists(spark,
          graft.streaming.StreamIngest.canonPath(root))) {
        val canon = graft.streaming.StreamIngest.readCanonMap(spark, root)
        println(s"canonical map: ${canon.count()} entities")
      }
      spark.stop()

    case Some("curate") =>
      // curate <docsParquet|gen:N> <outDir> [lang] [minWords] — run the
      // CCNet-style curation funnel over a (doc_id, text) corpus, write
      // the per-doc verdict table and print the stage histogram (the
      // funnel report a corpus pipeline publishes per ingest batch).
      val spark = session("graft-curate")
      runCurate(spark, args(1), args(2),
        if (args.length > 3) args(3) else "de",
        if (args.length > 4) args(4).toLong else 5L, limit)
        .foreach { case (stage, n) => println(f"$stage%-12s $n") }
      spark.stop()

    case Some("cv") =>
      // cv <outDir> [nSents] [k] — grouped k-fold cross-validation over
      // the synthetic GT relation (the reference's GroupKFold run,
      // models/bert.py:440-500); see [[runCv]].
      val spark = session("graft-cv")
      runCv(spark, args(1),
        if (args.length > 2) args(2).toLong else 300L,
        if (args.length > 3) args(3).toInt else 5, limit)
      spark.stop()

    case Some("verify") => Verify.main(args.drop(1))
    case Some("bench") => Bench.main(Array.empty)
    case _ => usage()
  }
}
