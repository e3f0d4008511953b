package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: the declarative dot product gets the codegen kernel.
  *
  * The natural DataFrame spelling of a dot product over two
  * `array<float>` columns —
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *             0d, (acc, v) -> acc + v)
  *
  * — runs INTERPRETED: higher-order lambdas cannot join whole-stage
  * codegen, and this exact shape measured 30× slower than
  * [[DotProductFloat]] (which is why every graft operator calls
  * `graft_dot` directly). Users writing the declarative form shouldn't
  * need to know that. This rule rewrites the pattern to
  *
  *   IF(size(a) = size(b), <kernel>(a, b), NULL)
  *
  * where the kernel is [[DotProductFloat]] for non-nullable elements
  * and [[DotProductFloatNullAware]] (same loop, aborts to NULL on a
  * NULL slot — the HOF's element semantics) when the array type admits
  * nulls, which is what parquet sources always report.
  *
  * The size guard preserves `zip_with`'s ragged-array semantics
  * exactly: the else branch is reached only when the sizes differ
  * (zip_with NULL-pads the shorter side, the padded product is NULL,
  * and the whole sum collapses to NULL) or when an input is NULL (the
  * guard is NULL, and the aggregate would be NULL) — in every
  * reachable else case the original expression is NULL, so a NULL
  * literal is the original, minus an infinite self-match. Equal-length
  * inputs (every real embedding column) take the kernel branch.
  *
  * Only the double-product spelling is rewritten: `(x, y) -> x * y` on
  * float arrays multiplies at FLOAT precision before widening, which
  * is NOT the kernel's arithmetic — that shape is left alone.
  */
object HofDotProductRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // On an equal-length pair with a NULL ELEMENT the HOF form
  // propagates NULL, but the plain kernel reads a NULL slot as 0.0 —
  // a silently wrong number. When either type admits null elements
  // (parquet sources always say so), use the null-aware kernel, which
  // keeps the tight codegen loop but aborts to NULL on a null slot.
  private def elementsNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  /** double(x) * double(y) over exactly the two lambda variables. */
  private def isDoubleProduct(f: Expression,
      args: Seq[NamedExpression]): Boolean = f match {
    case Multiply(Cast(x: NamedLambdaVariable, DoubleType, _, _),
        Cast(y: NamedLambdaVariable, DoubleType, _, _), _) =>
      Seq(x.exprId, y.exprId) == args.map(_.exprId) ||
        Seq(y.exprId, x.exprId) == args.map(_.exprId)
    case _ => false
  }

  /** acc + v (any argument order) over the two lambda variables. */
  private def isSum(f: Expression, args: Seq[NamedExpression]): Boolean =
    f match {
      case Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _) =>
        Set(x.exprId, y.exprId) == args.map(_.exprId).toSet
      case _ => false
    }

  private def isIdentity(f: LambdaFunction): Boolean = f.function match {
    case v: NamedLambdaVariable =>
      f.arguments.headOption.exists(_.exprId == v.exprId)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(product, prodArgs, _)),
            Literal(0.0, DoubleType),
            LambdaFunction(merge, mergeArgs, _),
            finish: LambdaFunction)
          // deterministic: the rewrite duplicates a and b into the
          // guard and the kernel — two evaluations must agree
          if isFloatArray(a) && isFloatArray(b) &&
            a.deterministic && b.deterministic &&
            isDoubleProduct(product, prodArgs) &&
            isSum(merge, mergeArgs) && isIdentity(finish) =>
        If(
          EqualTo(Size(a, legacySizeOfNull = false),
            Size(b, legacySizeOfNull = false)),
          if (elementsNullable(a) || elementsNullable(b))
            DotProductFloatNullAware(a, b)
          else DotProductFloat(a, b),
          Literal(null, DoubleType))
    }
}
