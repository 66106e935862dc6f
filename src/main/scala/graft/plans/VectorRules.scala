package graft.plans

import graft.functions.VectorExprs.{DotVec, Norm2}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Algebraic rewrites for graft's vector expressions, injected into the
  * Catalyst optimizer by [[graft.functions.GraftExtensions]].
  *
  * `dot_vec(a, a)` ≡ `norm2_sq(a)` by definition (Σ aᵢ·aᵢ = Σ aᵢ²), and
  * both accumulate left-to-right in double, so the rewrite is
  * bit-identical — but Norm2 reads each element once instead of twice
  * and drops one null check, roughly halving per-row work. The pattern
  * arises naturally when a shared cosine/similarity helper is called with
  * the same column on both sides (e.g. self-similarity edges of a
  * pairwise template), where the author gets the cheap form for free.
  *
  * `semanticEquals` (not `==`) so cosmetic differences — attribute
  * capitalization, qualifiers — still match, mirroring how Spark's own
  * expression-level rules (e.g. ReplaceExpressions) compare children. */
object VectorRules {

  object DotSelfToNorm extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformAllExpressions {
        case DotVec(l, r) if l.semanticEquals(r) => Norm2(l)
      }
  }
}
