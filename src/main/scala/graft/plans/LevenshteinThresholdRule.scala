package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite edit-distance range predicates to Spark's
  * threshold-bounded Levenshtein.
  *
  * `levenshtein(a, b) <= k` computes the FULL O(|a|*|b|) dynamic
  * program and then compares; the thresholded form
  * `levenshtein(a, b, k)` runs the banded O(min(|a|,|b|)*k) algorithm
  * and returns -1 as soon as the distance provably exceeds k. On a
  * fuzzy-dedup scan over long documents that is the difference
  * between quadratic and linear per-pair cost, so the engine rewrites
  * the natural spelling into the bounded one wherever it appears:
  *
  *   levenshtein(a, b) <= k   ==>   levenshtein(a, b, k) >= 0
  *   levenshtein(a, b) <  k   ==>   levenshtein(a, b, k-1) >= 0
  *   (and the mirrored k >= / k > forms)
  *
  * Semantics are identical, including nulls: a null input makes both
  * sides of each equivalence null. The rewritten form carries
  * `threshold = Some(_)`, which no pattern here matches, so the rule
  * is idempotent by construction.
  */
object LevenshteinThresholdRule extends Rule[LogicalPlan] {

  private def bounded(lev: Levenshtein, k: Int): Expression =
    GreaterThanOrEqual(
      Levenshtein(lev.left, lev.right, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(lev @ Levenshtein(_, _, None),
          Literal(k: Int, IntegerType)) if k >= 1 =>
        bounded(lev, k)
      case LessThan(lev @ Levenshtein(_, _, None),
          Literal(k: Int, IntegerType)) if k >= 2 =>
        bounded(lev, k - 1)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType),
          lev @ Levenshtein(_, _, None)) if k >= 1 =>
        bounded(lev, k)
      case GreaterThan(Literal(k: Int, IntegerType),
          lev @ Levenshtein(_, _, None)) if k >= 2 =>
        bounded(lev, k - 1)
    }
}
