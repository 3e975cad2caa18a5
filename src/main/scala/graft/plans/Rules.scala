package graft.plans

import graft.kg.NormalizeSurfaceExpr
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType}

/** Engine-specific Catalyst optimizer rules, injected through
  * [[graft.GraftExtensions]] — the `injectOptimizerRule` rung of the
  * extension ladder (function < optimizer rule < strategy); the engine
  * needs exactly one algebraic rule, and no custom strategy (every
  * operator's physical shape is already expressible declaratively).
  */
object Rules {

  /** `normalize_surface` is IDEMPOTENT: lowercase is, trim is, and the
    * NFD-accent-strip maps onto its own fixpoint set (the output is NFD
    * text with no Mn marks left, so a second pass is the identity) —
    * property-tested in ExtensionsSpec. Defensive double-normalization
    * arises when a pre-normalized dictionary flows through a generic
    * path that normalizes its join key again; collapsing the nested
    * call removes a per-row pass from the hot link-join key.
    */
  object CollapseNormalizeSurface extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformAllExpressions {
        case NormalizeSurfaceExpr(inner: NormalizeSurfaceExpr) => inner
      }
  }

  /** Runtime Bloom-filter injection for semi-joins — the engine's
    * deterministic mirror of Spark's `InjectRuntimeFilter`: for
    * `probe LEFT SEMI JOIN build ON pk = bk` where the build side's
    * estimated size fits the Bloom regime, rewrite the probe side to
    *
    *   Filter(md5-bloom-test(pk, ScalarSubquery(bitset-agg over build)),
    *          probe)
    *
    * so non-matching probe rows die at the scan, before shuffle/build
    * machinery — at 100 TB the probe-side scan-to-shuffle volume IS the
    * semi-join's cost. Differences from Spark's rule, on purpose:
    * the hash family is the engine-wide md5-derived one
    * ([[graft.ops.Bloom]], Kirsch-Mitzenmacher double hashing), so the
    * pruned superset is bit-identical across engines, partitionings and
    * reruns (Spark's `BloomFilterAggregate` hashing is
    * implementation-defined), and the trigger is a plain logical-stats
    * threshold rather than runtime-filter heuristics — deterministic
    * plan in, deterministic plan out. The join above the filter is
    * untouched, so output rows are EXACTLY those of the original join
    * (false positives fall out in the join; a Bloom has no false
    * negatives). Scope: LEFT SEMI and INNER equi-joins whose probe
    * (left) side is estimated ≥ 4× the build side — the asymmetry guard
    * keeps the two-hashes-per-row cost strictly where it buys
    * scan-to-shuffle volume (blooming a probe comparable to its build —
    * semi or inner — is pure per-row cost plus a second build pass).
    * NEVER anti-joins — their kept rows are the ones a Bloom would drop.
    *
    * Session knobs: `spark.graft.bloomInject.enabled` (default true),
    * `spark.graft.bloomInject.maxBuildBytes` (default 256 MB estimated),
    * `spark.graft.bloomInject.minProbeRatio` (default 4 — the probe/build
    * size asymmetry below which injection is pure overhead).
    * Runs ONCE in the pre-CBO batch (after filter inference, before
    * join reorder — NOT a fixed point); the already-injected marker
    * check (the subquery's output alias) keeps a replanned query from
    * stacking a second filter on the same probe chain.
    */
  object InjectDeterministicBloom extends Rule[LogicalPlan] {
    import graft.ops.Bloom
    val M = 1 << 16
    val K = 4
    private val marker = "__graft_bloom_bits"

    private def enabled: Boolean =
      SQLConf.get.getConfString("spark.graft.bloomInject.enabled", "true")
        .toBoolean
    private def maxBuildBytes: BigInt =
      BigInt(SQLConf.get.getConfString(
        "spark.graft.bloomInject.maxBuildBytes", (256L << 20).toString))
    /** Probe must be estimated ≥ this × build before a bloom pays. */
    private def minProbeRatio: Int =
      SQLConf.get.getConfString("spark.graft.bloomInject.minProbeRatio", "4")
        .toInt

    /** Idempotency check over the probe's UNARY chain (filters,
      * projects, aggregates, sorts, repartitions...) — deep enough that
      * a re-run of the rule on an already-rewritten plan sees its own
      * marker even after later batches move the filter below a unary
      * operator, but stopping at binary/leaf nodes so a SECOND,
      * independent semi-join stacked above an injected one (probe = the
      * inner JOIN node) still gets its own filter. NB: the loop hazard a
      * subtree-wide scan was guarding against no longer exists — the
      * rule runs in the once-per-plan pre-CBO batch, not a fixed point.
      */
    private def alreadyInjected(p: LogicalPlan): Boolean = p match {
      case Filter(cond, child) =>
        cond.exists {
          case s: ScalarSubquery => s.plan.output.exists(_.name == marker)
          case _ => false
        } || alreadyInjected(child)
      case u: UnaryNode => alreadyInjected(u.child)
      case _ => false
    }

    /** Top 60 bits of md5 — the engine-wide hash primitive, as the
      * native codegen'd expression (value-identical to
      * [[graft.ops.TextOps.hexInt]]'s md5/conv chain, ~4× cheaper).
      */
    private def hexIntE(e: Expression): Expression = graft.ops.H60Expr(e)

    private def bloomPredicate(probeKey: Expression,
                               build: LogicalPlan,
                               buildKey: NamedExpression): Expression = {
      // bitset build over the build side's keys, as a scalar subquery —
      // one O(build) aggregation producing an m-bit array plan value.
      // The udaf invocation is a lazily-converted column node, so the
      // sub-plan goes through the ANALYZER (ofRows + agg) to become a
      // fully-resolved Aggregate before it may enter the optimized plan.
      // The build side is projected to THE KEY COLUMN ONLY first: this
      // rule runs after the main pruning batches, so without the
      // explicit Project the subquery (re-optimized at physical
      // planning) would still anchor column pruning on the full build
      // output and the extra bitset pass would scan every build column.
      val keyOnly = Project(Seq(buildKey), build)
      val aggCol = Bloom.bitsAggUdaf(M, K)
        .apply(GraftColumnBridge.column(Cast(buildKey.toAttribute, StringType)))
      val aggPlan = GraftColumnBridge
        .ofRows(org.apache.spark.sql.SparkSession.active, keyOnly)
        .agg(aggCol.as(marker))
        .queryExecution.analyzed
      val bits = ScalarSubquery(aggPlan)
      val keyS = Cast(probeKey, StringType)
      val mL = Literal(M.toLong)
      val h1 = Remainder(hexIntE(Concat(Seq(keyS, Literal("_h1")))), mL)
      val h2 = Remainder(hexIntE(Concat(Seq(keyS, Literal("_h2")))), mL)
      val probes = (0 until K).map { j =>
        val pos = Remainder(Add(h1, Multiply(Literal(j.toLong), h2)), mL)
        val word = ElementAt(bits,
          Add(Cast(IntegralDivide(pos, Literal(64L)), IntegerType), Literal(1)))
        val bit = Cast(Remainder(pos, Literal(64L)), IntegerType)
        EqualTo(BitwiseAnd(ShiftRight(word, bit), Literal(1L)), Literal(1L))
      }
      // keys can't be NULL-matched by an equi-join anyway; guard so the
      // md5 chain never sees NULL (it would yield NULL, filtering the
      // row — same outcome, but keep the predicate three-valued-clean)
      And(IsNotNull(probeKey), probes.reduce(And))
    }

    /** Rewrite one eligible join: find an equi-pair between the sides
      * and gate the probe behind the bloom predicate.
      */
    /** TOP-LEVEL conjuncts only: an EqualTo nested under Or/Not is NOT a
      * conjunctive equi-key — gating the probe on it would drop rows the
      * disjunction's other branch matches.
      */
    private def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }

    private def inject(j: Join, probe: LogicalPlan,
                       build: LogicalPlan): Join = {
      val equi = conjuncts(j.condition.get).collectFirst {
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if probe.outputSet.contains(a) && build.outputSet.contains(b) =>
          (a, b)
        case EqualTo(b: AttributeReference, a: AttributeReference)
            if probe.outputSet.contains(a) && build.outputSet.contains(b) =>
          (a, b)
      }
      equi match {
        case Some((pk, bk)) =>
          j.copy(left = Filter(bloomPredicate(pk, build, bk), probe))
        case None => j
      }
    }

    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (!enabled) return plan
      plan.transformUp {
        // semi join: the output IS the filtered probe — eligible when
        // the build fits the Bloom regime AND the probe is big enough
        // that pruning it pays for the second build pass + 2 hashes per
        // probe row (same ≥ 4× asymmetry guard as the inner case)
        case j @ Join(probe, build, LeftSemi, Some(_), _)
            if !alreadyInjected(probe) &&
              build.stats.sizeInBytes <= maxBuildBytes &&
              probe.stats.sizeInBytes >
                build.stats.sizeInBytes * minProbeRatio =>
          inject(j, probe, build)
        // inner join: filtering probe rows that cannot match preserves
        // the output exactly; additionally require the probe side to be
        // estimated ≥ 4× the build so the two hashes per probed row buy
        // scan-to-shuffle volume (blooming a small probe is pure cost)
        case j @ Join(probe, build, org.apache.spark.sql.catalyst.plans.Inner,
            Some(_), _)
            if !alreadyInjected(probe) &&
              build.stats.sizeInBytes <= maxBuildBytes &&
              probe.stats.sizeInBytes >
                build.stats.sizeInBytes * minProbeRatio =>
          inject(j, probe, build)
      }
    }
  }
}
