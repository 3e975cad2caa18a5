package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** spark.sql.extensions deployment route: a session built with
  * GraftExtensions has the native function without any runtime
  * register() call.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects normalize_surface at session build") {
    val base = SparkTest.spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // new SparkSession instance over the SAME SparkContext.
      // `spark.sql.extensions` is a STATIC conf read from the
      // SparkContext's conf (set at spark-submit time in production);
      // the test context predates it, so use the equivalent
      // programmatic route — same injection code either way.
      val s2 = SparkSession.builder()
        .master("local[4]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne base)
      val got = s2.sql("SELECT normalize_surface('Anna MÜLLER') AS n")
        .head().getString(0)
      assert(got == "anna muller")
      // codegen'd native expression, not a UDF
      val plan = s2.sql("SELECT normalize_surface('x')")
        .queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("normalizesurface"), plan)
      // do NOT s2.stop(): it shares base's SparkContext
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
