package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Compiled kernel for the multi-plane signature: all plane projections
  * in one tight loop over the vector. Exists because inlining N
  * per-plane codegen'd dot products into one generated projection
  * exceeds HotSpot's HugeMethodLimit — the giant method never JITs and
  * runs interpreted, an order of magnitude slower.
  */
object HyperplaneSigUtil {
  def sig(a: ArrayData, weights: Array[Array[Float]]): Int = {
    val planes = weights.length
    var out = 0
    var p = 0
    while (p < planes) {
      val w = weights(p)
      val n = math.min(a.numElements(), w.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        s += a.getFloat(i).toDouble * w(i).toDouble
        i += 1
      }
      if (s >= 0) out |= (1 << p)
      p += 1
    }
    out
  }
}

/** Random-hyperplane LSH bit signature over an `array<float>` column —
  * the plane weight matrix travels as an expression parameter and the
  * generated code calls the static kernel via a reference object.
  */
case class HyperplaneSigExpr(child: Expression, weights: Array[Array[Float]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hyperplane_sig"

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneSigUtil.sig(input.asInstanceOf[ArrayData], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planeWeights", weights, "float[][]")
    defineCodeGen(ctx, ev, c => s"graft.plans.HyperplaneSigUtil.sig($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigExpr =
    copy(child = newChild)
}
