package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel so generated code stays one call site (the same
  * pattern as [[HyperplaneSigUtil]]).
  */
object BpeUtil {
  def count(s: UTF8String): Long =
    graft.functions.BpeTokenizer.countTokens(s.toString)
}

/** BPE token count of a string column under the frozen
  * [[graft.functions.BpeTokenizer]] merge table — codegen'd, so the
  * count stays inside whole-stage codegen like the other text
  * metrics.
  */
case class BpeCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"

  override protected def nullSafeEval(input: Any): Any =
    BpeUtil.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.BpeUtil.count($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeCountExpr =
    copy(child = newChild)
}
