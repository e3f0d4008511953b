package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: bounded edit-distance comparisons get the banded
  * algorithm.
  *
  * `levenshtein(a, b) <= k` computes the FULL O(|a|·|b|) dynamic
  * program and then throws away everything but one bit. Spark's
  * three-argument `levenshtein(a, b, k)` runs the banded O(max(|a|,
  * |b|)·k) program that abandons a row as soon as the distance
  * provably exceeds `k`, returning -1 — but users (and the blocked
  * [[graft.operators.FuzzyJoin]] verify step) naturally write the
  * two-argument comparison. This rule rewrites every
  *
  *   `levenshtein(a, b) <= k`  (k a non-negative int/long literal)
  *   `levenshtein(a, b) <  k`
  *
  * (and their literal-on-the-left mirrors) into
  *
  *   `levenshtein(a, b, k') >= 0`   with k' the inclusive bound,
  *
  * wherever the comparison appears — filter, join condition, or a
  * projected boolean. NULL behavior is unchanged (both forms are null
  * on null input); a `Cast` between the distance and the comparison
  * (e.g. the fuzzy join's `.cast("long")`) is preserved around the
  * rewritten call. The rewrite only fires on a threshold-less
  * Levenshtein, so it is idempotent under the optimizer's fixpoint.
  */
object BoundedLevenshteinRewrite extends Rule[LogicalPlan] {

  /** levenshtein(a,b) possibly wrapped in a numeric Cast; yields the
    * bare expression and a function that re-applies the wrapper.
    */
  private object LevMaybeCast {
    def unapply(e: Expression): Option[(Levenshtein, Expression => Expression)] =
      e match {
        case lev @ Levenshtein(_, _, None) => Some((lev, identity))
        case c @ Cast(lev @ Levenshtein(_, _, None), _, _, _) =>
          Some((lev, inner => c.withNewChildren(Seq(inner))))
        case _ => None
      }
  }

  private object IntBound {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Long, LongType) => Some(v)
      case _ => None
    }
  }

  private def banded(lev: Levenshtein, rewrap: Expression => Expression,
      inclusiveBound: Long): Expression = {
    val t = Literal(inclusiveBound.toInt, IntegerType)
    val zero = rewrap(lev).dataType match {
      case LongType => Literal(0L, LongType)
      case _ => Literal(0, IntegerType)
    }
    GreaterThanOrEqual(rewrap(Levenshtein(lev.left, lev.right, Some(t))), zero)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(LevMaybeCast(lev, w), IntBound(k))
          if k >= 0 && k <= Int.MaxValue =>
        banded(lev, w, k)
      case LessThan(LevMaybeCast(lev, w), IntBound(k))
          if k >= 1 && k <= Int.MaxValue =>
        banded(lev, w, k - 1)
      case GreaterThanOrEqual(IntBound(k), LevMaybeCast(lev, w))
          if k >= 0 && k <= Int.MaxValue =>
        banded(lev, w, k)
      case GreaterThan(IntBound(k), LevMaybeCast(lev, w))
          if k >= 1 && k <= Int.MaxValue =>
        banded(lev, w, k - 1)
    }
}
