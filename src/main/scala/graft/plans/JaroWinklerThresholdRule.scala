package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.expressions.JaroWinkler
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: push a high `jaro_winkler(a, b) >= t` threshold
  * into the expression so disqualified pairs skip the O(|a|*|b|)
  * match loop.
  *
  * The kernel's cost is the match window scan; but jw >= t implies a
  * length-ratio bound — min(|a|,|b|)/max(|a|,|b|) >= 5t - 4 (see
  * JaroWinklerUtil.similarityBounded for the two-line derivation) —
  * checkable in O(1) from the operand lengths. On a blocked linkage
  * scan (d15's shape: every candidate pair in a block runs the
  * kernel) the guard eliminates the kernel for every pair the bound
  * rejects, exactly like the banded rewrite in
  * [[LevenshteinThresholdRule]].
  *
  *   jaro_winkler(a, b) >= t   ==>   jaro_winkler(a, b, t) >= t
  *   (and the mirrored t <= / < / > forms), for t > 0.8
  *
  * Semantics are identical: the bounded form returns 0.0 (< t) only
  * for pairs the bound PROVES are below t; nulls propagate the same.
  * The rewritten expression carries `threshold = Some(_)`, which no
  * pattern here matches — idempotent by construction.
  */
object JaroWinklerThresholdRule extends Rule[LogicalPlan] {

  private def bounded(jw: JaroWinkler, t: Double, cmp: Expression => Expression): Expression =
    cmp(jw.copy(threshold = Some(t)))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GreaterThanOrEqual(jw @ JaroWinkler(_, _, None),
          lit @ Literal(t: Double, DoubleType)) if t > 0.8 =>
        bounded(jw, t, GreaterThanOrEqual(_, lit))
      case GreaterThan(jw @ JaroWinkler(_, _, None),
          lit @ Literal(t: Double, DoubleType)) if t > 0.8 =>
        bounded(jw, t, GreaterThan(_, lit))
      case LessThanOrEqual(lit @ Literal(t: Double, DoubleType),
          jw @ JaroWinkler(_, _, None)) if t > 0.8 =>
        bounded(jw, t, LessThanOrEqual(lit, _))
      case LessThan(lit @ Literal(t: Double, DoubleType),
          jw @ JaroWinkler(_, _, None)) if t > 0.8 =>
        bounded(jw, t, LessThan(lit, _))
    }
}
