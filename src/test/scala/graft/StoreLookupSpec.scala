package graft

import graft.gen.CorpusGen
import graft.pipeline.KgPipeline
import graft.store.LineageStore
import org.scalatest.funsuite.AnyFunSuite

/** The triple-store point-lookup access path: after compaction sorts
  * each bucket file by subj, a subject-equality lookup must be served
  * by parquet row-group min/max skipping — the scan DECODES a fraction
  * of the store, not all of it (the Iceberg zone-map rung; this is the
  * access path every KG consumer — entity page, API lookup — hits
  * first).
  */
class StoreLookupSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  test("subject point lookup: pushed filter + row-group pruning reads a fraction of the store") {
    val root = java.nio.file.Files.createTempDirectory("graft_lookup").toString
    val docs = CorpusGen.docs(spark, 2000, parts = 8)
    LineageStore.runResumable(spark, root, "triples", docs,
      ds => KgPipeline.run(spark, ds, CorpusGen.aliases(spark)),
      KgPipeline.Config().buckets, "lk")
    // tiny row groups so each bucket file carries MANY groups — the
    // pruning granule the 128 MB default provides at real scale — and a
    // file-split cap so each bucket holds SEVERAL subj-disjoint files
    // (the multi-file-per-bucket shape a 100 TB partition always has;
    // one file per bucket would span the whole subject alphabet and
    // leave the manifest nothing to prune)
    LineageStore.compactTriples(spark, root, rowGroupBytes = Some(16L * 1024),
      maxRecordsPerFile = Some(256L))

    val all = LineageStore.readTriples(spark, root).collect()
    val total = all.length.toLong
    assert(total > 2000, s"store too small to exercise pruning ($total rows)")
    // a TAIL subject, not the head entity: a head subject appears in
    // nearly every row group by construction, so nothing could be
    // skipped regardless of layout — the point-lookup access pattern is
    // "one entity out of millions", i.e. the tail
    val subj = all.groupBy(_.subj).collect {
      case (s, rs) if rs.length <= 3 => s
    }.min
    val expect = all.filter(_.subj == subj)
      .map(t => (t.pred, t.obj, t.doc_id)).sorted.toSeq

    // the subj order survived the writer (FileFormatWriter would inject
    // its own bucket-only sort if the sort prefix didn't match): every
    // compacted file's subj column is non-decreasing
    import org.apache.spark.sql.functions.{col, input_file_name}
    import spark.implicits._
    val outOfOrder = spark.read.parquet(LineageStore.triplesPath(root))
      .select(input_file_name().as("f"), col("subj"))
      .as[(String, String)]
      .mapPartitions { it =>
        // rows of one file are contiguous and in file order within a
        // scan partition — count per-file order violations
        var last = Map.empty[String, String]
        var bad = 0L
        it.foreach { case (f, s) =>
          if (last.get(f).exists(_ > s)) bad += 1
          last += f -> s
        }
        Iterator.single(bad)
      }.collect().sum
    assert(outOfOrder == 0L, s"$outOfOrder rows out of subj order")

    val df = LineageStore.lookupBySubject(spark, root, subj)
    val got = df.collect().map(t => (t.pred, t.obj, t.doc_id)).sorted.toSeq
    assert(got == expect)
    assert(got.nonEmpty)

    // the equality predicate reached the parquet scan
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("PushedFilters") &&
      planStr.contains("EqualTo(subj"), planStr.take(800))

    // and row-group statistics actually pruned: the scan's output-row
    // metric counts rows DECODED from surviving row groups — far fewer
    // than the store (without subj-sorted groups every group's min/max
    // straddles every subject and nothing can be skipped)
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .find(_.metrics.contains("numOutputRows"))
      .getOrElse(fail("no scan leaf with numOutputRows"))
    val scanned = scan.metrics("numOutputRows").value
    assert(scanned > 0, "metric not populated")
    assert(scanned * 3 <= total,
      s"scan decoded $scanned of $total rows — row groups not pruned")

    // ---- manifest FILE pruning: non-matching files are never opened
    //      (RELATIVE paths throughout — base part names repeat across
    //      bucket dirs) ----
    def rel(uri: String) = uri.split('/').takeRight(2).mkString("/")
    val allFiles = graft.store.Fs.listFilesRelative(spark,
      LineageStore.triplesPath(root)).filter(_.endsWith(".parquet")).toSet
    val opened = df.inputFiles.map(rel).toSet
    assert(opened.nonEmpty && opened.subsetOf(allFiles))
    assert(opened.size < allFiles.size,
      s"manifest pruned nothing: opened ${opened.size}/${allFiles.size} files")
    // the pruned set is exactly the manifest's subj-range matches
    val manifest = spark.read.parquet(LineageStore.fileManifestPath(root))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSeq
    val expectFiles = manifest.collect {
      case (f, lo, hi) if subj >= lo && subj <= hi => f
    }.toSet
    assert(opened == expectFiles, s"opened=$opened expected=$expectFiles")

    // a subject below every range: answered from the manifest alone
    val none = LineageStore.lookupBySubject(spark, root, "\u0000")
    assert(none.count() == 0 && none.inputFiles.isEmpty)

    // ---- composite (subj, pred) lookup over the same store ----
    val pred = expect.head._1
    val gotSP = LineageStore.lookupBySubjectPred(spark, root, subj, pred)
      .collect().map(t => (t.pred, t.obj, t.doc_id)).sorted.toSeq
    assert(gotSP == expect.filter(_._1 == pred) && gotSP.nonEmpty)

    // ---- manifest memo: repeat lookups must NOT re-read the manifest
    //      parquet (a Spark job per point lookup otherwise); the memo
    //      key is the manifest dir's metadata signature, so the
    //      in-place rewrite below must invalidate it ----
    val readsBefore = LineageStore.manifestReads.get()
    LineageStore.lookupBySubject(spark, root, subj).collect()
    LineageStore.lookupBySubjectPred(spark, root, subj, pred).collect()
    assert(LineageStore.manifestReads.get() == readsBefore,
      "repeat lookups re-read the manifest despite the memo")

    // ---- STALE manifest (file set drifted since compaction): lookups
    //      must detect the mismatch and fall back to the full scan ----
    val mPath = LineageStore.fileManifestPath(root)
    val mRows = spark.read.parquet(mPath).collect()
    val schema = spark.read.parquet(mPath).schema
    spark.createDataFrame(
        spark.sparkContext.parallelize(mRows.drop(1).toSeq), schema)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(mPath)
    val dfStale = LineageStore.lookupBySubject(spark, root, subj)
    val gotStale = dfStale.collect().map(t => (t.pred, t.obj, t.doc_id))
      .sorted.toSeq
    assert(gotStale == expect)
    assert(dfStale.inputFiles.map(rel).toSet == allFiles,
      "stale manifest was trusted instead of falling back to the full scan")
    // the rewrite changed the manifest signature → exactly one re-read
    assert(LineageStore.manifestReads.get() == readsBefore + 1,
      "manifest rewrite did not invalidate the memo (or re-read more than once)")
  }

  test("object lookup over the inverted twin index: file + row-group pruning, fallback when absent or stale") {
    val root = java.nio.file.Files.createTempDirectory("graft_objlk").toString
    val docs = CorpusGen.docs(spark, 2000, parts = 8)
    LineageStore.runResumable(spark, root, "triples", docs,
      ds => KgPipeline.run(spark, ds, CorpusGen.aliases(spark)),
      KgPipeline.Config().buckets, "olk")
    LineageStore.compactTriples(spark, root, rowGroupBytes = Some(16L * 1024),
      maxRecordsPerFile = Some(256L))
    LineageStore.buildObjIndex(spark, root, rowGroupBytes = Some(16L * 1024),
      maxRecordsPerFile = Some(256L))

    val all = LineageStore.readTriples(spark, root).collect()
    val total = all.length.toLong
    // a TAIL object (same rationale as the subj test: the access
    // pattern is one entity out of millions, not a hub)
    val obj = all.groupBy(_.obj).collect {
      case (o, rs) if rs.length <= 3 => o
    }.min
    val expect = all.filter(_.obj == obj)
      .map(t => (t.subj, t.pred, t.doc_id)).sorted.toSeq

    val df = LineageStore.lookupByObject(spark, root, obj)
    val got = df.collect().map(t => (t.subj, t.pred, t.doc_id)).sorted.toSeq
    assert(got == expect && got.nonEmpty)

    // pushed filter + row-group pruning on the (obucket, obj, pred) sort
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("PushedFilters") &&
      planStr.contains("EqualTo(obj"), planStr.take(800))
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .find(_.metrics.contains("numOutputRows"))
      .getOrElse(fail("no scan leaf with numOutputRows"))
    val scanned = scan.metrics("numOutputRows").value
    assert(scanned > 0 && scanned * 3 <= total,
      s"scan decoded $scanned of $total rows — row groups not pruned")

    // manifest FILE pruning against the obj manifest
    def rel(uri: String) = uri.split('/').takeRight(2).mkString("/")
    val idxFiles = graft.store.Fs.listFilesRelative(spark,
      LineageStore.objIndexPath(root)).filter(_.endsWith(".parquet")).toSet
    val opened = df.inputFiles.map(rel).toSet
    assert(opened.nonEmpty && opened.subsetOf(idxFiles))
    assert(opened.size < idxFiles.size,
      s"obj manifest pruned nothing: ${opened.size}/${idxFiles.size}")
    val manifest = spark.read.parquet(LineageStore.objManifestPath(root))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val expectFiles = manifest.collect {
      case (f, lo, hi) if obj >= lo && obj <= hi => f
    }.toSet
    assert(opened == expectFiles, s"opened=$opened expected=$expectFiles")

    // an object below every range: answered from the manifest alone
    val none = LineageStore.lookupByObject(spark, root, " ")
    assert(none.count() == 0 && none.inputFiles.isEmpty)

    // STALE obj manifest → fall back to the PRIMARY store (pushed scan,
    // unpruned but correct)
    val mPath = LineageStore.objManifestPath(root)
    val mRows = spark.read.parquet(mPath).collect()
    val schema = spark.read.parquet(mPath).schema
    spark.createDataFrame(
        spark.sparkContext.parallelize(mRows.drop(1).toSeq), schema)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(mPath)
    val primFiles = graft.store.Fs.listFilesRelative(spark,
      LineageStore.triplesPath(root)).filter(_.endsWith(".parquet")).toSet
    val dfStale = LineageStore.lookupByObject(spark, root, obj)
    assert(dfStale.collect().map(t => (t.subj, t.pred, t.doc_id))
      .sorted.toSeq == expect)
    assert(dfStale.inputFiles.map(rel).toSet == primFiles,
      "stale obj manifest was trusted instead of falling back")

    // ABSENT index → the same primary-store fallback
    val fs = new org.apache.hadoop.fs.Path(LineageStore.objIndexPath(root))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(LineageStore.objIndexPath(root)), true)
    val dfNoIdx = LineageStore.lookupByObject(spark, root, obj)
    assert(dfNoIdx.collect().map(t => (t.subj, t.pred, t.doc_id))
      .sorted.toSeq == expect)
  }
}
