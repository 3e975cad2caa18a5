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
    // pruning granule the 128 MB default provides at real scale
    LineageStore.compactTriples(spark, root, rowGroupBytes = Some(16L * 1024))

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
  }
}
