package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input hardening for the late round-3 operators: empty
  * tables and singleton inputs must yield empty/valid results, never
  * throw — at 10^12-document scale SOME partition, source or snapshot
  * is always empty, and an operator that dies on it kills the job.
  */
class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[Row],
    StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("source", StringType))))

  test("set-similarity join: empty corpus and singleton corpus") {
    assert(graft.ops.Dedup.setSimJoinPrefix(emptyDocs).count() == 0)
    val one = Seq((1L, "a b c d e", "s")).toDF("doc_id", "text", "source")
    assert(graft.ops.Dedup.setSimJoinPrefix(one).count() == 0)
  }

  test("fuzzy join, histogram quantiles, inverted index, BPE on empty input") {
    assert(graft.ops.FuzzyJoin.nearTokens(emptyDocs).count() == 0)
    assert(graft.ops.Scans.histogramQuantiles(
      emptyDocs.selectExpr("source", "doc_id AS len"),
      "source", "len", 64L, Seq(0.5)).count() == 0)
    assert(graft.ops.VocabOps.invertedIndex(emptyDocs).count() == 0)
    assert(graft.ops.VocabOps.bpeMergePairs(emptyDocs).count() == 0)
  }

  test("k-hop BFS and neighbourhood jaccard on an empty triple store") {
    val none = spark.emptyDataset[graft.model.Triple]
    assert(graft.kg.GraphOps.kHopDistances(none).count() == 0)
    assert(graft.kg.GraphOps.neighborhoodJaccard(none).count() == 0)
    assert(graft.kg.GraphOps.clusteringCoefficient(none).count() == 0)
  }

  test("range join and snapshot diff with one empty side") {
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val some = Seq((1L, 10L, t(1000))).toDF("k", "lid", "lts")
    val none = some.where("false")
    assert(graft.ops.RangeJoin.windowJoin(some,
      none.toDF("k", "rid", "rts"), "k", "lid", "rid", "lts", "rts",
      100L).count() == 0)
    assert(graft.ops.RangeJoin.windowJoin(none, some.toDF("k", "rid", "rts"),
      "k", "lid", "rid", "lts", "rts", 100L).count() == 0)
    val diff = graft.ops.SnapshotDiff.diff(
      none.selectExpr("k", "lid AS v"), some.selectExpr("k", "lid AS v"),
      "k", "v").collect()
    assert(diff.map(_.getString(1)).toSeq == Seq("added"))
  }

  test("salted join with an empty fact side") {
    val fact = Seq(("u", 1L)).toDF("uid", "event_id").where("false")
    val dim = Seq(("u", "a")).toDF("uid", "attr")
    assert(graft.ops.SaltedJoin
      .saltedEquiJoin(fact, dim, "uid", heavyThreshold = 1L).count() == 0)
  }
}
