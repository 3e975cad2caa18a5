package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() yields rows, EVERY queries entry
  * executes at the smoke SF, and every oracle key has a query twin —
  * the exact checks the round driver performs.
  */
class EntrySpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  val sf = "/root/testdata/sf0.001"

  test("entry (flagship KG pipeline) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query executes at smoke scale") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("every oracle key has a query; names match") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle keys without queries: $missing")
  }

  test("every query has an oracle (no rows-only checks left)") {
    val unproven = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unproven.isEmpty, s"queries without a DuckDB oracle: $unproven")
  }
}
