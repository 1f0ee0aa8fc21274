package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.FoldTextExpr

/** Optimizer-rule exemplar (the `Rule[LogicalPlan]` tier of the
  * extension stack): `graft_fold_text` is idempotent — folding a
  * fold is the inner fold — so nested applications collapse to one.
  * Arises naturally when a view pre-folds a match key and a consumer
  * defensively folds again; the rule removes the second O(len) pass
  * per row. Registered through [[graft.GraftExtensions]]
  * (`injectOptimizerRule`). */
object FoldTextIdempotence extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case FoldTextExpr(inner @ FoldTextExpr(_)) => inner
    }
}
