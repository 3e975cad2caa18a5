package graft.plans

import graft.kg.NormalizeSurfaceExpr
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

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
}
