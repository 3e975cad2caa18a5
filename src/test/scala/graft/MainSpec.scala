package graft

import org.scalatest.funsuite.AnyFunSuite

/** The `--limit N` smoke flag (the reference's `--dry_run` analog,
  * models/bert.py:165-169): argv parsing + the driver-table cap it
  * switches on.
  */
class MainSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  test("--limit parses anywhere in argv and rejects malformed values") {
    val (l0, rest0) = Main.parseLimit(Array("run", "gen:100", "/o"))
    assert(l0.isEmpty && rest0.toSeq == Seq("run", "gen:100", "/o"))
    val (l1, rest1) = Main.parseLimit(Array("run", "--limit", "10", "gen:100", "/o"))
    assert(l1.contains(10) && rest1.toSeq == Seq("run", "gen:100", "/o"))
    val (l2, rest2) = Main.parseLimit(Array("verify", "/sf", "/out", "--limit", "3"))
    assert(l2.contains(3) && rest2.toSeq == Seq("verify", "/sf", "/out"))
    // a REPEATED flag: every pair is stripped, the last value wins
    val (l3, rest3) = Main.parseLimit(
      Array("run", "--limit", "5", "gen:100", "--limit", "9", "/o"))
    assert(l3.contains(9) && rest3.toSeq == Seq("run", "gen:100", "/o"))
    assertThrows[IllegalArgumentException](Main.parseLimit(Array("run", "--limit")))
    assertThrows[IllegalArgumentException](
      Main.parseLimit(Array("run", "--limit", "zero")))
    assertThrows[IllegalArgumentException](
      Main.parseLimit(Array("run", "--limit", "-4")))
  }

  test("cv verb: k folds x (per-type + ALL) metric rows, ALL row per fold") {
    val out = java.nio.file.Files.createTempDirectory("graft_cv").toString
    val n = Main.runCv(spark, out, nSents = 120, k = 5)
    val rows = spark.read.parquet(out).collect()
    assert(n == rows.length.toLong)
    val bySplit = rows.groupBy(_.getAs[Int]("split"))
    assert(bySplit.keySet == (0 until 5).toSet)
    // every fold carries the ALL row plus at least one per-type row,
    // and the detect stage actually found spans (tp+fp+fn > 0)
    bySplit.foreach { case (f, rs) =>
      val slots = rs.map(_.getAs[String]("slot")).toSet
      assert(slots.contains("ALL") && slots.size >= 2, s"fold $f: $slots")
      val all = rs.find(_.getAs[String]("slot") == "ALL").get
      assert(all.getAs[Long]("tp") + all.getAs[Long]("fp") +
        all.getAs[Long]("fn") > 0L, s"fold $f empty")
    }
  }

  test("curate verb: verdict table written, histogram totals the corpus") {
    val out = java.nio.file.Files.createTempDirectory("graft_curate").toString
    val hist = Main.runCurate(spark, "gen:100", out, "de", 5L, None)
    val rows = spark.read.parquet(out)
    assert(rows.count() == 100L)
    assert(hist.map(_._2).sum == 100L)
    val stages = hist.map(_._1).toSet
    assert(stages.contains("kept") && stages.subsetOf(
      Set("kept", "lang", "length", "repetition", "pii", "duplicate")))
    // --limit caps the generated corpus
    val histL = Main.runCurate(spark, "gen:100", out, "de", 5L, Some(20))
    assert(histL.map(_._2).sum == 20L)
  }

  test("graft.limit caps every driver-table read (smoke verify/bench)") {
    val sf = "/root/testdata/sf0.001"
    val full = SparkEntry.queries("q02_filter")(spark, sf).count()
    sys.props("graft.limit") = "5"
    try {
      val capped = SparkEntry.queries("q02_filter")(spark, sf).count()
      assert(capped <= 5L)
      assert(full > capped) // the cap actually bit
    } finally sys.props.remove("graft.limit")
  }
}
