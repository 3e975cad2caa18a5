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
      // injected optimizer rule: nested idempotent normalizations
      // collapse to ONE native call on a non-foldable input (a literal
      // would be constant-folded away and prove nothing)
      s2.range(2).selectExpr("concat('MÜLLER_', id) AS c")
        .createOrReplaceTempView("ext_t")
      val opt = s2.sql(
        "SELECT normalize_surface(normalize_surface(c)) AS n FROM ext_t")
        .queryExecution.optimizedPlan
      val calls = opt.expressions.flatMap(_.collect {
        case e: graft.kg.NormalizeSurfaceExpr => e
      })
      assert(calls.size == 1, opt.toString)
      // and the idempotency property the rule relies on
      val rnd = new scala.util.Random(7)
      val alphabet = "aÄü ö.É́Zß¿N\t" // NB: 13 UTF-16 units (É́ = E+combining)
      (1 to 500).foreach { _ =>
        val s = (1 to rnd.nextInt(12))
          .map(_ => alphabet.charAt(rnd.nextInt(alphabet.length))).mkString
        val once = graft.text.TextCore.normalizeSurface(s)
        assert(graft.text.TextCore.normalizeSurface(once) == once, s)
      }
      // do NOT s2.stop(): it shares base's SparkContext
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("InjectDeterministicBloom fires on q04_semi's shape; rows unchanged") {
    val base = SparkTest.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .appName("graft-ext-bloom-test")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import org.apache.spark.sql.functions.col
      val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
      // the toy fixture's probe (customer) is SMALLER than its build
      // (orders) — at production scale the probe is the corpus. Relax
      // the asymmetry guard so the rewrite itself is exercised here; the
      // default-ratio guard gets its own negative assertion below.
      s2.conf.set("spark.graft.bloomInject.minProbeRatio", "0")
      def q(s: SparkSession) = {
        val c = s.read.parquet(s"$sf/customer.parquet")
        val o = s.read.parquet(s"$sf/orders.parquet")
          .where(col("o_totalprice") > 100000)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      }
      val df = q(s2)
      // rule fired: the probe side gained a filter holding the bitset
      // scalar subquery (marker alias) and the md5 probe chain
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("__graft_bloom_bits"), opt)
      // membership probes run through the native codegen'd h60 hash
      assert(opt.toLowerCase.contains("h60expr"), opt)
      // exactness: identical rows vs the same query with the rule off
      val got = df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      s2.conf.set("spark.graft.bloomInject.enabled", "false")
      val off = q(s2)
      assert(!off.queryExecution.optimizedPlan.toString
        .contains("__graft_bloom_bits"))
      val want = off.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      s2.conf.set("spark.graft.bloomInject.enabled", "true")
      assert(got == want && got.nonEmpty)
      // STACKED independent semi-joins: each gets its OWN bloom filter
      // (the idempotency check must not let the inner join's marker
      // suppress the outer injection)
      val o2 = s2.read.parquet(s"$sf/orders.parquet")
        .where(col("o_totalprice") > 50000)
      val c2 = s2.read.parquet(s"$sf/customer.parquet")
      val o1 = s2.read.parquet(s"$sf/orders.parquet")
        .where(col("o_totalprice") > 100000)
      val stacked = c2.join(o1, c2("c_custkey") === o1("o_custkey"), "left_semi")
        .join(o2, c2("c_custkey") === o2("o_custkey"), "left_semi")
      val sp = stacked.queryExecution.optimizedPlan.toString
      val subqIds = "scalar-subquery#(\\d+)".r.findAllMatchIn(sp)
        .map(_.group(1)).toSet
      assert(subqIds.size == 2, s"expected 2 injected bitsets, plan:\n$sp")
      // INNER join with a big probe side: same rewrite, rows unchanged
      val big = s2.read.parquet(s"$sf/lineitem.parquet")
      val pk = s2.read.parquet(s"$sf/part.parquet")
        .where(col("p_size") < 10).select("p_partkey", "p_name")
      val inner = big.join(pk, big("l_partkey") === pk("p_partkey"))
        .select("l_orderkey", "p_name")
      val ip = inner.queryExecution.optimizedPlan.toString
      assert(ip.contains("__graft_bloom_bits"), ip)
      val innerRows = inner.count()
      s2.conf.set("spark.graft.bloomInject.enabled", "false")
      val offRows = big.join(pk, big("l_partkey") === pk("p_partkey"))
        .select("l_orderkey", "p_name").count()
      s2.conf.set("spark.graft.bloomInject.enabled", "true")
      assert(innerRows == offRows && innerRows > 0)
      // DISJUNCTIVE condition: the equi-pair under the OR is not a
      // conjunct — injecting on it would drop rows; the rule must skip
      val disj = c2.join(o1,
        c2("c_custkey") === o1("o_custkey") ||
          c2("c_nationkey") === o1("o_custkey"), "left_semi")
      assert(!disj.queryExecution.optimizedPlan.toString
        .contains("__graft_bloom_bits"))
      // ANTI join: never eligible — its kept rows are the ones a bloom
      // would drop
      val anti = c2.join(o1, c2("c_custkey") === o1("o_custkey"), "left_anti")
      assert(!anti.queryExecution.optimizedPlan.toString
        .contains("__graft_bloom_bits"))
      // PROBE-SIZE guard (default ratio): a probe comparable to its
      // build must NOT be bloomed — the two md5 probes per row plus the
      // second build-side pass would cost more than they prune
      s2.conf.set("spark.graft.bloomInject.minProbeRatio", "4")
      val small = q(s2)
      assert(!small.queryExecution.optimizedPlan.toString
        .contains("__graft_bloom_bits"),
        "semi-join with a small probe side should skip bloom injection")
      // and the build sub-plan of an injected bloom aggregates over the
      // KEY COLUMN ONLY (explicit Project so the re-optimized subquery
      // prunes every other build column from its scan)
      s2.conf.set("spark.graft.bloomInject.minProbeRatio", "0")
      val again = q(s2).queryExecution.optimizedPlan
      val subAggs = again.collect { case p => p.expressions }
        .flatten.flatMap(_.collect {
        case sq: org.apache.spark.sql.catalyst.expressions.ScalarSubquery
            if sq.plan.output.exists(_.name == "__graft_bloom_bits") => sq.plan
      })
      assert(subAggs.nonEmpty)
      subAggs.foreach { p =>
        val scans = p.collectLeaves()
        assert(scans.nonEmpty)
        // after the Project, only the join key feeds the aggregate
        val projected = p.collect {
          case pr: org.apache.spark.sql.catalyst.plans.logical.Project =>
            pr.projectList.map(_.name)
        }
        assert(projected.exists(_ == Seq("o_custkey")),
          s"expected a key-only Project in the bloom build sub-plan:\n$p")
      }
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
