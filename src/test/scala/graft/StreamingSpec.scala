package graft

import graft.gen.CorpusGen
import graft.pipeline.KgPipeline
import graft.streaming.StreamIngest
import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("micro-batch ingestion equals the batch pipeline; replay is idempotent") {
    val root = Files.createTempDirectory("graft_stream").toString
    val aliases = CorpusGen.aliases(spark)
    val ctx = KgPipeline.prepareLinkContext(spark, aliases)
    val cfg = KgPipeline.Config(buckets = 8)
    // three micro-batches of docs (the third folds into a canon map that
    // has already been incrementally updated once — the bridge case)
    val all40 = CorpusGen.docs(spark, 40, parts = 2)
    val b0 = all40.filter(_.doc_id < CorpusGen.docId(14))
    val b1 = all40.filter(d => d.doc_id >= CorpusGen.docId(14) &&
      d.doc_id < CorpusGen.docId(27))
    val b2 = all40.filter(_.doc_id >= CorpusGen.docId(27))
    StreamIngest.commitBatch(spark, b0, 0L, root, ctx, aliases, cfg)
    StreamIngest.commitBatch(spark, b1, 1L, root, ctx, aliases, cfg)
    StreamIngest.commitBatch(spark, b2, 2L, root, ctx, aliases, cfg)
    // replay batch 0 (simulated recovery) — must be a no-op
    StreamIngest.commitBatch(spark, b0, 0L, root, ctx, aliases, cfg)
    val streamed = StreamIngest.readStreamTriples(spark, root)
      .select("subj", "pred", "obj", "doc_id").collect().toSet
    val full = KgPipeline.run(spark, CorpusGen.docs(spark, 40, parts = 2),
      aliases, cfg = cfg, ctx = Some(ctx))
      .select("subj", "pred", "obj", "doc_id").collect().toSet
    assert(streamed == full)
    // lineage has exactly one snapshot row-set per batch
    val snaps = graft.store.LineageStore.readLineage(spark, root)
      .collect().map(_.snapshot_id).distinct.sorted
    assert(snaps.toSeq == Seq("batch-0", "batch-1", "batch-2"))
    // quality-monitor sidecar: KMV distinct-doc/entity rows ACCUMULATE
    // per batch (replayed batch 0 overwrote its own partition, no dups)
    import org.apache.spark.sql.functions.col
    val q = StreamIngest.readQuality(spark, root)
    assert(q.select("batch").distinct().collect().map(_.getInt(0)).sorted
      .toSeq == Seq(0, 1, 2))
    assert(q.columns.toSet == Set("pred", "n_triples", "approx_docs",
      "approx_subjects", "approx_objects", "batch"))
    // time travel: as-of batch 1 excludes batch 2's rows
    assert(StreamIngest.readQuality(spark, root, asOfBatch = Some(1L))
      .select("batch").distinct().count() == 2)
    // below k distinct the KMV sketch is EXACT: per-pred distinct docs
    // of batch 0's sidecar equal the store's own exact counts
    // canon time travel: as-of beyond the head falls back to the latest
    // snapshot AT OR BELOW it (an exact-id probe returned an EMPTY map)
    val canonLatest = StreamIngest.readCanonMap(spark, root)
      .collect().map(r => r.getString(0) -> r.getString(1)).toSet
    val canonAsOf5 = StreamIngest.readCanonMap(spark, root, Some(5L))
      .collect().map(r => r.getString(0) -> r.getString(1)).toSet
    assert(canonAsOf5 == canonLatest && canonLatest.nonEmpty)
    assert(StreamIngest.readCanonMap(spark, root, Some(0L)).count() > 0)
    intercept[IllegalArgumentException] {
      StreamIngest.readCanonMap(spark, root, Some(-1L)).count()
    }
    val sidecar0 = q.where(col("batch") === 0)
      .select("pred", "approx_docs").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct0 = spark.read.parquet(StreamIngest.streamPath(root))
      .where(col("batch") === 0).groupBy("pred")
      .agg(org.apache.spark.sql.functions.countDistinct(col("doc_id")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sidecar0 == direct0 && sidecar0.nonEmpty)
    // existence probes go through the Hadoop FileSystem API: lineage and
    // snapshots must resolve through a URI-qualified path exactly as they
    // would on hdfs:// or s3a:// (a java.io.File probe would return false
    // there and silently disable resume)
    assert(graft.store.LineageStore.readLineage(spark, "file:" + root).count() ==
      graft.store.LineageStore.readLineage(spark, root).count())
    assert(graft.store.Snapshots.read(spark, "file:" + root).count() == 3)
    assert(graft.store.LineageStore
      .readLineage(spark, "file:" + root + "_nonexistent").isEmpty)
    // snapshot chain: each batch points at its predecessor; current is batch-2
    val chain = graft.store.Snapshots.read(spark, root).collect()
      .sortBy(_.snapshot_id)
    assert(chain.map(_.snapshot_id).toSeq ==
      Seq("batch-0", "batch-1", "batch-2"))
    assert(chain(0).parent_id == "none" && chain(1).parent_id == "batch-0" &&
      chain(2).parent_id == "batch-1")
    assert(graft.store.Snapshots.current(spark, root, "stream_triples")
      .get.snapshot_id == "batch-2")
    // time travel: AS OF batch-0 shows only batch-0 triples
    val asOf0 = graft.store.Snapshots.readStreamAsOf(spark, root, "batch-0")
      .select("doc_id").distinct().collect().map(_.getString(0))
    assert(asOf0.forall(_ < CorpusGen.docId(14)) && asOf0.nonEmpty)
    // incremental canonical map: after batch 1 (folded incrementally into
    // batch 0's converged assignment) it must equal a from-scratch CC over
    // the co-mention edges of ALL streamed triples
    import org.apache.spark.sql.functions.{least, greatest, col}
    val allEdges = StreamIngest.readStreamTriples(spark, root).toDF()
      .where(col("subj") =!= col("obj"))
      .select(least(col("subj"), col("obj")).as("src"),
        greatest(col("subj"), col("obj")).as("dst")).distinct()
    val fullCc = graft.kg.ConnectedComponents.run(spark, allEdges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val streamedCc = StreamIngest.readCanonMap(spark, root)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(streamedCc == fullCc && streamedCc.nonEmpty)
    // canon snapshots time-travel per batch: the batch-0 snapshot holds
    // only batch-0 entities (strictly fewer than the current snapshot)
    val canon0 = StreamIngest.readCanonMap(spark, root, asOfBatch = Some(0L))
    assert(canon0.count() > 0 && canon0.count() < streamedCc.size)
    // stage-metrics sidecar: one capture per COMMITTED batch (the
    // replayed batch-0 added nothing), with real task totals
    val metrics = graft.store.StageMetrics.read(spark, root).collect()
    assert(metrics.map(_.snapshot_id).distinct.sorted.toSeq ==
      Seq("batch-0", "batch-1", "batch-2"))
    assert(metrics.count(_.snapshot_id == "batch-0") ==
      metrics.count(_.snapshot_id == "batch-1"))
    val m0 = metrics.filter(_.snapshot_id == "batch-0")
      .map(m => m.metric -> m.value).toMap
    assert(m0("tasks") > 0 && m0("task_time_ms") > 0, m0)
  }

  test("triple-store schema evolution: partitions missing an added column read back with its default") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft_evolve").toString
    // batch 0 written by an "old" engine version WITHOUT conf; batch 1
    // by the current schema — the Iceberg add-column analog
    val oldRows = Seq(("PER_000#0", "co_occurs_with", "LOC_000#0", "d0"))
      .toDF("subj", "pred", "obj", "doc_id")
      .withColumn("span_offset", lit(0)).withColumn("sentence_idx", lit(0))
      .withColumn("batch", lit(0L)).withColumn("bucket", lit(1))
    val newRows = oldRows
      .withColumn("conf", lit(0.9)).withColumn("batch", lit(1L))
    oldRows.write.partitionBy("batch", "bucket")
      .parquet(StreamIngest.streamPath(root))
    newRows.write.mode("append").partitionBy("batch", "bucket")
      .parquet(StreamIngest.streamPath(root))
    val got = StreamIngest.readStreamTriples(spark, root)
      .collect().map(t => t.doc_id match { case _ => (t.conf, t.subj) })
    assert(got.toSet == Set((0.0, "PER_000#0"), (0.9, "PER_000#0")), got.toSeq)
  }

  test("streaming doc source end-to-end via AvailableNow trigger") {
    val root = Files.createTempDirectory("graft_stream2").toString
    val docsDir = s"$root/docs_in"
    val aliases = CorpusGen.aliases(spark)
    val ctx = KgPipeline.prepareLinkContext(spark, aliases)
    CorpusGen.docs(spark, 30, parts = 2).write.parquet(docsDir)
    val schema = spark.read.parquet(docsDir).schema
    val stream = spark.readStream.schema(schema).parquet(docsDir)
      .as[graft.model.Doc]
    val q = StreamIngest.run(spark, stream, root, ctx, aliases,
      KgPipeline.Config(buckets = 8), s"$root/ckpt")
    q.awaitTermination(120000)
    val streamed = StreamIngest.readStreamTriples(spark, root)
      .select("subj", "pred", "obj", "doc_id").collect().toSet
    val batch = KgPipeline.run(spark, CorpusGen.docs(spark, 30, parts = 2),
      aliases, ctx = Some(ctx), cfg = KgPipeline.Config(buckets = 8))
      .select("subj", "pred", "obj", "doc_id").collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming curation funnel: kept set equals the batch funnel on ordered arrival") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_sfunnel").toString
    val en20 = (0 until 20).map(i => s"wort$i").mkString(" ") + " the and is"
    // b0: keep / lang-drop / pii-drop; b1: exact copy of doc 1 (state
    // crosses the batch boundary) + a fresh keeper
    val b0 = Seq(
      (1L, en20),
      (2L, "der und das der und das der und das der und das der und das der und das der und das"),
      (3L, en20 + " extra mail me a@b.de"))
    val b1 = Seq((4L, en20), (5L, en20 + " neu"))
    def write(rows: Seq[(Long, String)], p: String) =
      spark.createDataset(rows).toDF("doc_id", "text")
        .withColumn("ts", to_timestamp(lit("2026-01-01 10:00:00")))
        .coalesce(1).write.parquet(p)
    write(b0, s"$dir/in/b0"); Thread.sleep(1100); write(b1, s"$dir/in/b1")
    val schema = spark.read.parquet(s"$dir/in/b0").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet").option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/in/*")
    val q = graft.ops.Filters.curationFunnelStreaming(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sfunnel")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val kept = spark.sql("SELECT doc_id FROM sfunnel")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L), s"got $kept")
    // parity: the batch funnel over the union keeps the same set
    // (arrival order == id order, so first-wins == min-id keeper)
    val batchKept = graft.ops.Filters.curationFunnel(
        spark.createDataset(b0 ++ b1).toDF("doc_id", "text"))
      .where(col("drop_stage") === "kept")
      .collect().map(_.getLong(0)).toSet
    assert(batchKept == kept)
  }

  test("streaming exact dedup: duplicates across micro-batches collapse within the watermark") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_sdedup").toString
    // 30 docs, every text duplicated under two doc ids, spread over 2 files
    val base = spark.range(0, 30)
      .select(col("id").as("doc_id"),
        concat(lit("text_"), col("id") % 15).as("text"),
        to_timestamp(lit("2026-01-01 10:00:00")).as("ts"))
    base.where($"doc_id" < 15).write.parquet(s"$dir/in/b0")
    base.where($"doc_id" >= 15).write.parquet(s"$dir/in/b1")
    val schema = spark.read.parquet(s"$dir/in/b0").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet").parquet(s"$dir/in/*")
    val q = graft.ops.Dedup.streamingExact(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sdedup")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.sql("SELECT content_hash, count(*) n FROM sdedup GROUP BY 1")
      .collect()
    assert(out.length == 15, s"expected 15 unique hashes, got ${out.length}")
    assert(out.forall(_.getLong(1) == 1L), "a duplicate survived dedup")
    spark.sql("DROP TABLE IF EXISTS sdedup")
  }

  test("streaming near-dup gate: batch-sequence equals the global gate; replay idempotent") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft_neardup").toString
    // 60 docs over 3 id-ordered micro-batches; ids ≡ 0 (mod 3) repeat one
    // of 7 texts (near-dup families spanning batches), the rest unique
    val docs = spark.range(0, 60).select(col("id").as("doc_id"),
      when(col("id") % 3 === 0,
          concat(lit("alpha beta gamma delta shared text nr "), col("id") % 7))
        .otherwise(concat(lit("unique words for document number "), col("id"),
          lit(" tail"))).as("text"))
      .localCheckpoint()
    val batches = Seq(0L -> docs.where($"doc_id" < 20),
      1L -> docs.where($"doc_id" >= 20 && $"doc_id" < 40),
      2L -> docs.where($"doc_id" >= 40))
    val streamed = batches.flatMap { case (id, b) =>
      graft.ops.Dedup.nearDupGateBatch(spark, root, id, b)
        .select("doc_id").collect().map(_.getLong(0))
    }.toSet
    val global = graft.ops.Dedup.nearDupGate(docs)
      .where($"kept" === 1L).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(streamed == global, s"streamed=$streamed global=$global")
    assert(streamed.size < 60 && streamed.size > 7) // gate actually dropped
    // replay of the LAST batch (retry after a crash): same kept set,
    // state partition overwritten not duplicated
    val replay = graft.ops.Dedup.nearDupGateBatch(spark, root, 2L,
        batches(2)._2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val thirdKept = streamed.filter(_ >= 40)
    assert(replay == thirdKept, s"replay=$replay expected=$thirdKept")
    val state = spark.read.parquet(s"$root/_neardup")
    assert(state.groupBy("batch", "band", "band_key").count()
      .where($"count" > 1).isEmpty, "replay duplicated state rows")
    // a FIRST batch with no shingleable docs must not poison the state
    // dir (schema-less _neardup would fail the next batch's read)
    val root2 = Files.createTempDirectory("graft_neardup2").toString
    val short0 = Seq((1L, "too short")).toDF("doc_id", "text")
    val k0 = graft.ops.Dedup.nearDupGateBatch(spark, root2, 0L, short0)
    assert(k0.collect().map(_.getLong(0)).toSeq == Seq(1L)) // kept
    val k1 = graft.ops.Dedup.nearDupGateBatch(spark, root2, 1L,
      docs.where($"doc_id" < 10))
    assert(k1.count() > 0) // state read after the empty batch works

    // ---- state compaction: batches below the head merge into the
    //      reserved batch=-1 partition; gate results are unchanged and
    //      the head batch stays replay-idempotent ----
    val head = graft.ops.Dedup.nearDupHeadBatch(spark, root)
    assert(head.contains(2L))
    val (pb, pa) = graft.ops.Dedup.nearDupCompact(spark, root, 2L)
    assert(pb == 3L && pa == 2L, s"$pb -> $pa") // {0,1,2} -> {-1,2}
    val partIds = spark.read.parquet(s"$root/_neardup")
      .select("batch").distinct().collect().map(_.get(0).toString.toLong).toSet
    assert(partIds == Set(-1L, 2L), partIds)
    // replay of the head AFTER compaction: identical kept set (its own
    // partition was not merged, so it cannot see its own bands as prior)
    val replay2 = graft.ops.Dedup.nearDupGateBatch(spark, root, 2L,
        batches(2)._2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(replay2 == thirdKept, s"post-compact replay=$replay2")
    // the NEXT batch sees compacted state identically to an uncompacted
    // twin root fed the same sequence
    val rootU = Files.createTempDirectory("graft_neardup_u").toString
    batches.foreach { case (id, b) =>
      graft.ops.Dedup.nearDupGateBatch(spark, rootU, id, b).count()
    }
    val next = docs.select(($"doc_id" + 60).as("doc_id"), $"text")
    val kC = graft.ops.Dedup.nearDupGateBatch(spark, root, 3L, next)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val kU = graft.ops.Dedup.nearDupGateBatch(spark, rootU, 3L, next)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kC == kU, s"compacted=$kC uncompacted=$kU")
    // compaction is idempotent / converges after a partial delete
    val (pb2, pa2) = graft.ops.Dedup.nearDupCompact(spark, root, 3L)
    assert(pa2 == 2L, s"$pb2 -> $pa2") // {-1,2,3} -> {-1,3}
  }

  test("gate compaction killed mid-swap recovers without losing band keys") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft_neardup_rec").toString
    val docs = spark.range(0, 30).select(col("id").as("doc_id"),
      when(col("id") % 3 === 0,
          concat(lit("alpha beta gamma delta shared text nr "), col("id") % 5))
        .otherwise(concat(lit("unique words for document number "), col("id"),
          lit(" tail"))).as("text"))
      .localCheckpoint()
    Seq(0L -> docs.where($"doc_id" < 10),
        1L -> docs.where($"doc_id" >= 10 && $"doc_id" < 20),
        2L -> docs.where($"doc_id" >= 20)).foreach { case (id, b) =>
      graft.ops.Dedup.nearDupGateBatch(spark, root, id, b).count()
    }
    // compact once: -1 now holds keys whose SOURCE partitions are gone —
    // the rows a crashed in-place re-compaction would have lost
    graft.ops.Dedup.nearDupCompact(spark, root, 2L)
    val statePath = s"$root/_neardup"
    val keysBefore = spark.read.parquet(statePath)
      .select("band", "band_key").distinct().count()
    val fs = new org.apache.hadoop.fs.Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    // simulate a re-compaction crash BETWEEN the two renames: staging
    // written (full merged set), live -1 moved aside, install not done
    spark.read.parquet(s"$statePath/batch=-1")
      .write.parquet(s"$root/_neardup__compact_tmp")
    assert(fs.rename(p(s"$statePath/batch=-1"), p(s"$root/_neardup__compact_old")))
    // the next gate read heals the gap (rolls the staging forward) and
    // sees every band key
    val next = docs.select(($"doc_id" + 30).as("doc_id"), $"text")
    graft.ops.Dedup.nearDupGateBatch(spark, root, 3L, next).count()
    val keysAfter = spark.read.parquet(statePath)
      .where($"batch" < 3L).select("band", "band_key").distinct().count()
    assert(keysAfter == keysBefore, s"lost keys: $keysBefore -> $keysAfter")
    assert(!fs.exists(p(s"$root/_neardup__compact_tmp")))
    assert(!fs.exists(p(s"$root/_neardup__compact_old")))
    // rollback window too: -1 moved aside, NO staging → recover restores it
    assert(fs.rename(p(s"$statePath/batch=-1"), p(s"$root/_neardup__compact_old")))
    graft.ops.Dedup.nearDupRecover(spark, root)
    val keysRolled = spark.read.parquet(statePath)
      .where($"batch" < 3L).select("band", "band_key").distinct().count()
    assert(keysRolled == keysBefore)
  }

  test("streaming windowed aggregation with watermark (events)") {
    // stream source must be a directory
    val evDir = Files.createTempDirectory("graft_events").toString
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$evDir/events.parquet"))
    val out = StreamIngest.eventsHourly(spark, evDir)
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("ev_hourly")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.sql(
      """SELECT count(*) AS n_windows, sum(n) AS n_events FROM ev_hourly""")
      .collect()(0)
    val expected = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
    assert(got.getLong(1) == expected)
    assert(got.getLong(0) > 0)
    spark.sql("DROP TABLE IF EXISTS ev_hourly")
  }
}

/** Stateful streaming: mapGroupsWithState counters across micro-batches. */
class StatefulStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._
  import graft.ops.Sessionize

  test("flatMapGroupsWithState gap sessions match the batch sessionizer for closed sessions") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_fsess").toString
    def ev(user: Long, id: Long, minute: Long) =
      (user, id, java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2026, 1, 1, 10, 0).plusMinutes(minute)))
    // two users, two sessions each; session 2 starts > 30min after
    // session 1's last event and arrives in a LATER micro-batch
    val b0 = Seq(ev(1, 1, 0), ev(1, 2, 5), ev(2, 10, 0))
    val b1 = Seq(ev(1, 3, 60), ev(1, 4, 62), ev(2, 11, 90))
    val sch = spark.createDataset(b0).toDF("user_id", "event_id", "ts").schema
    // one part-file per batch: maxFilesPerTrigger=1 must see b0 whole,
    // then b1 whole (closure-by-successor assumes per-user event-time
    // order ACROSS batches, like a log-compacted ingest)
    spark.createDataset(b0).toDF("user_id", "event_id", "ts")
      .coalesce(1).write.parquet(s"$dir/in/b0")
    Thread.sleep(1100) // distinct mod times: file source orders by them
    spark.createDataset(b1).toDF("user_id", "event_id", "ts")
      .coalesce(1).write.parquet(s"$dir/in/b1")
    val stream = spark.readStream.schema(sch)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", 1) // keep the batches separate
      .parquet(s"$dir/in/*").as[Sessionize.TimedEvent]
    val q = Sessionize.gapSessions(spark, stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("fsess")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.sql(
      "SELECT user_id, session_start, session_end, n_events FROM fsess")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // batch truth: all sessions except each user's LAST (still open)
    val all = spark.createDataset(b0 ++ b1).toDF("user_id", "event_id", "ts")
    val batch = Sessionize.sessions(all)
      .withColumn("rk", org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(desc("session_id")) match {
          case w => row_number().over(w)
        })
      .where(col("rk") > 1)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch && streamed.nonEmpty, s"streamed=$streamed batch=$batch")
    spark.sql("DROP TABLE IF EXISTS fsess")
  }

  test("a late cross-batch event never moves an open session's bounds backward") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_lsess").toString
    def ev(user: Long, id: Long, minute: Long) =
      (user, id, java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2026, 1, 1, 10, 0).plusMinutes(minute)))
    // batch 0: session open with last = minute 10; batch 1 delivers a
    // LATE minute-5 event (inside the session) plus the minute-60 event
    // that closes it. A state that let `last` regress to 5 would then
    // emit session_end = minute 5 instead of minute 10.
    val b0 = Seq(ev(1, 1, 0), ev(1, 2, 10))
    val b1 = Seq(ev(1, 3, 5), ev(1, 4, 60))
    val sch = spark.createDataset(b0).toDF("user_id", "event_id", "ts").schema
    spark.createDataset(b0).toDF("user_id", "event_id", "ts")
      .coalesce(1).write.parquet(s"$dir/in/b0")
    Thread.sleep(1100)
    spark.createDataset(b1).toDF("user_id", "event_id", "ts")
      .coalesce(1).write.parquet(s"$dir/in/b1")
    val stream = spark.readStream.schema(sch)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/in/*").as[Sessionize.TimedEvent]
    val q = Sessionize.gapSessions(spark, stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("lsess")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.sql(
      "SELECT user_id, session_start, session_end, n_events FROM lsess")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val start = ev(1, 1, 0)._3.getTime / 1000
    val end = ev(1, 2, 10)._3.getTime / 1000 // NOT the late minute-5 time
    assert(got == Set((1L, start, end, 3L)), got)
    spark.sql("DROP TABLE IF EXISTS lsess")
  }

  test("EventTimeTimeout flushes an idle user's tail session on watermark advance") {
    val dir = Files.createTempDirectory("graft_tsess").toString
    def ev(user: Long, id: Long, minute: Long) =
      (user, id, java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2026, 1, 1, 10, 0).plusMinutes(minute)))
    def t(minute: Long) = ev(0, 0, minute)._3.getTime / 1000
    // user 1 goes idle after minute 5; user 2's later events advance the
    // watermark far past user 1's last+gap — the tail session must flush
    // WITHOUT any successor event from user 1. Third batch needed: the
    // watermark from b1 takes effect in the next micro-batch.
    val b0 = Seq(ev(1, 1, 0), ev(1, 2, 5))
    val b1 = Seq(ev(2, 10, 120))
    val b2 = Seq(ev(2, 11, 121))
    val sch = spark.createDataset(b0).toDF("user_id", "event_id", "ts").schema
    for ((b, i) <- Seq(b0, b1, b2).zipWithIndex) {
      spark.createDataset(b).toDF("user_id", "event_id", "ts")
        .coalesce(1).write.parquet(s"$dir/in/b$i")
      Thread.sleep(1100) // distinct mod times: file source orders by them
    }
    val stream = spark.readStream.schema(sch)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/in/*").as[Sessionize.TimedEvent]
    val q = Sessionize.gapSessionsEventTime(spark, stream,
        watermarkDelay = "1 second")
      .writeStream.outputMode("append")
      .format("memory").queryName("tsess")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.sql(
      "SELECT user_id, session_start, session_end, n_events FROM tsess")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // user 1's idle tail session flushed by the timeout; user 2's session
    // is still live (watermark has not passed ITS last+gap)
    assert(got == Set((1L, t(0), t(5), 2L)), s"got=$got")
    spark.sql("DROP TABLE IF EXISTS tsess")
  }

  test("mapGroupsWithState running counts match batch aggregation") {
    val dir = Files.createTempDirectory("graft_state").toString
    val all = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"user_id", $"event_id", $"value").as[Sessionize.UserEvent]
    // first micro-batch lands before the query starts; the second lands
    // while the SAME query is live — state carries across batches
    all.where($"event_id" % 2 === 0).write.parquet(s"$dir/in/b0")
    val stream = spark.readStream
      .schema(all.schema).option("pathGlobFilter", "*.parquet")
      .parquet(s"$dir/in/*").as[Sessionize.UserEvent]
    val q = Sessionize.runningUserCounts(spark, stream)
      .writeStream.outputMode("update")
      .format("memory").queryName("running_counts")
      .start()
    q.processAllAvailable()
    all.where($"event_id" % 2 === 1).write.parquet(s"$dir/in/b1")
    q.processAllAvailable()
    q.stop()
    // latest state per user = batch aggregation over ALL events
    val streamed = spark.sql(
      "SELECT user_id, max(n_events) AS n FROM running_counts GROUP BY user_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = all.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch, s"streamed=$streamed\nbatch=$batch")
    spark.sql("DROP TABLE IF EXISTS running_counts")
  }

  test("quality drift alerts fire on a planted volume collapse, stay quiet otherwise") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft_drift").toString
    val aliases = CorpusGen.aliases(spark)
    val ctx = KgPipeline.prepareLinkContext(spark, aliases)
    val cfg = KgPipeline.Config(buckets = 8)
    val all = CorpusGen.docs(spark, 66, parts = 2)
    // batch 0: 30 docs; batch 1: 30 comparable docs; batch 2: 6 docs —
    // a planted ~5x collapse in per-pred triple volume
    val b0 = all.filter(_.doc_id < CorpusGen.docId(30))
    val b1 = all.filter(d => d.doc_id >= CorpusGen.docId(30) &&
      d.doc_id < CorpusGen.docId(60))
    val b2 = all.filter(_.doc_id >= CorpusGen.docId(60))
    StreamIngest.commitBatch(spark, b0, 0L, root, ctx, aliases, cfg)
    StreamIngest.commitBatch(spark, b1, 1L, root, ctx, aliases, cfg)
    StreamIngest.commitBatch(spark, b2, 2L, root, ctx, aliases, cfg)
    val alerts = StreamIngest.qualityDrift(spark, root, tolerance = 4.0)
    // the collapse batch alerts; the comparable 0->1 pair includes no
    // head-predicate volume alerts (rare preds may appear/vanish — those
    // rows carry a null side rather than a ratio breach)
    val batch2Alerts = alerts.where(col("batch") === 2)
    assert(batch2Alerts.count() > 0, "planted collapse not flagged")
    val headVolumeAlertsB1 = alerts.where(col("batch") === 1 &&
      col("triple_ratio").isNotNull &&
      (col("triple_ratio") > 4.0 || col("triple_ratio") < 0.25))
    assert(headVolumeAlertsB1.count() == 0,
      "comparable batches flagged as drift")
    spark.catalog.clearCache()
  }

  test("an ALL-EMPTY micro-batch is visible to quality drift (vanish + rebound alerts)") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft_drift_empty").toString
    val aliases = CorpusGen.aliases(spark)
    val ctx = KgPipeline.prepareLinkContext(spark, aliases)
    val cfg = KgPipeline.Config(buckets = 8)
    val all = CorpusGen.docs(spark, 30, parts = 2)
    val b0 = all.filter(_.doc_id < CorpusGen.docId(15))
    val empty = all.filter(_ => false)
    val b2 = all.filter(_.doc_id >= CorpusGen.docId(15))
    StreamIngest.commitBatch(spark, b0, 0L, root, ctx, aliases, cfg)
    StreamIngest.commitBatch(spark, empty, 1L, root, ctx, aliases, cfg)
    StreamIngest.commitBatch(spark, b2, 2L, root, ctx, aliases, cfg)
    // the marker row makes batch 1 PRESENT in the adjacency list: the
    // total outage surfaces as vanishing alerts at 1 and appearing
    // alerts at 2 — the exact scenario a silent gap would hide
    val alerts = StreamIngest.qualityDrift(spark, root, tolerance = 4.0)
    assert(alerts.where(col("batch") === 1 &&
      col("n_triples").isNull).count() > 0, "outage batch not flagged")
    assert(alerts.where(col("batch") === 2 &&
      col("prev_triples").isNull).count() > 0, "rebound batch not flagged")
    // the marker itself never leaks: not in readQuality, not in alerts
    assert(StreamIngest.readQuality(spark, root)
      .where(col("pred") === StreamIngest.QualityMarker).count() == 0)
    assert(alerts.where(col("pred") === StreamIngest.QualityMarker)
      .count() == 0)
    spark.catalog.clearCache()
  }
}
