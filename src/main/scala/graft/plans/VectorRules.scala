package graft.plans

import graft.functions.{VecCosine, VecNormalize}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Algebraic optimizer rules for the vector expressions, injected via
  * [[graft.GraftExtensions]] (`injectOptimizerRule`).
  *
  * Cosine similarity is invariant under positive scaling of either
  * argument, so an explicit L2-normalize feeding a cosine is dead work —
  * a common user pattern ported straight from the reference notebooks
  * (normalize everything up front, chunk_similarities.ipynb:77, then take
  * sklearn cosine_similarity). The zero-vector edge agrees too: cosine is
  * NaN against a zero vector whether or not it went through normalize
  * (normalize maps 0 → 0).
  *
  * Saves one O(d) pass + one array materialization per row per side —
  * at 10^11 rows that is real cluster time, for free at plan time.
  */
object EliminateNormalizeUnderCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // idempotent normalize chains collapse first
      case VecNormalize(VecNormalize(x)) => VecNormalize(x)
      case VecCosine(VecNormalize(a), VecNormalize(b)) => VecCosine(a, b)
      case VecCosine(VecNormalize(a), b) => VecCosine(a, b)
      case VecCosine(a, VecNormalize(b)) => VecCosine(a, b)
    }
}
