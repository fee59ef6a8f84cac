// Lives under org.apache.spark.sql — see FloatDotProduct.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: bounded edit-distance predicates get (a) a free
  * length-gap prefilter and (b) Spark's banded early-exit algorithm.
  *
  * `levenshtein(a, b) <= k` forces the full O(|a|·|b|) dynamic program on
  * every pair, even those that a glance at the lengths already rejects.
  * The rule rewrites the predicate to
  * `abs(length(a) - length(b)) <= k AND levenshtein(a, b, k) >= 0`:
  * the length gap is a necessary condition evaluated in O(1) (And
  * short-circuits the distance entirely), and the surviving pairs run the
  * THRESHOLD form of Levenshtein — Spark's banded O(k·min(|a|,|b|))
  * algorithm that returns -1 the moment the distance provably exceeds k.
  * NULL/false semantics are preserved exactly (see the spec's
  * truth-table check), so the rewrite is valid in ANY boolean context —
  * join conditions included — not just Filter, hence
  * `transformAllExpressions`.
  *
  * Idempotent by construction: the rewritten predicate carries
  * `threshold = Some(_)`, which no longer matches the `None` pattern —
  * safe under the optimizer's run-to-fixpoint batches.
  *
  * This is the second `Rule[LogicalPlan]` of the custom-operator ladder
  * (alongside AsOfJoinPushDown): a semantics-preserving cost rewrite the
  * built-in optimizer does not know, registered via
  * `SparkSessionExtensions.injectOptimizerRule`.
  */
object LevenshteinBoundRewrite extends Rule[LogicalPlan] {

  private def bounded(a: Expression, b: Expression, k: Int): Expression =
    And(
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), Literal(k)),
      GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k))), Literal(0)))

  /** The rewrite duplicates both operands (length prefilter + threshold
    * form), which is only semantics-preserving when they are deterministic
    * — a non-deterministic operand could evaluate to different values in
    * the two copies (the same guard Spark's own duplicating rules use). */
  private def dup(a: Expression, b: Expression): Boolean =
    a.deterministic && b.deterministic

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 0 && dup(a, b) =>
        bounded(a, b, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 0 && dup(a, b) =>
        bounded(a, b, k)
      case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 1 && dup(a, b) =>
        bounded(a, b, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 1 && dup(a, b) =>
        bounded(a, b, k - 1)
    }
}
