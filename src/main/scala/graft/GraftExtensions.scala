package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extensions injector — the production deployment route for the
  * engine's native Catalyst pieces: a cluster sets
  * `spark.sql.extensions=graft.GraftExtensions` and every session gets
  * `normalize_surface` as a REAL function (codegen'd
  * [[graft.kg.NormalizeSurfaceExpr]]) without any runtime register call.
  * The optimizer-rule rung is exercised too:
  * [[graft.plans.Rules.CollapseNormalizeSurface]] collapses idempotent
  * nested normalizations on the link-join key. No custom `SparkStrategy`
  * is needed — every operator's physical shape is already expressible
  * declaratively (native expressions + typed mapPartitions stages).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.Rules.CollapseNormalizeSurface)
    // pre-CBO, not the operator batch: runs ONCE after the
    // infer-filters batches, so the injected probe-side filter is never
    // constraint-propagated onto the build side (a bloom test of the
    // build keys against their own bitset — semantically a no-op that
    // would cost two hashes per build row) and fixed-point re-entry
    // cannot occur by construction (the deep marker check in the rule
    // stays as a second line of defense)
    ext.injectPreCBORule(_ => graft.plans.Rules.InjectDeterministicBloom)
    ext.injectFunction((
      FunctionIdentifier(graft.kg.NormalizeSurface.fnName),
      new ExpressionInfo(classOf[graft.kg.NormalizeSurfaceExpr].getName,
        graft.kg.NormalizeSurface.fnName),
      (exprs: Seq[Expression]) => graft.kg.NormalizeSurfaceExpr(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("cosine6"),
      new ExpressionInfo(classOf[graft.ops.Cosine6Expr].getName, "cosine6"),
      (exprs: Seq[Expression]) => graft.ops.Cosine6Expr(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("dot6"),
      new ExpressionInfo(classOf[graft.ops.Dot6Expr].getName, "dot6"),
      (exprs: Seq[Expression]) => graft.ops.Dot6Expr(exprs(0), exprs(1))))
  }
}
