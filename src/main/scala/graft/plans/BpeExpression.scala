package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel so generated code stays one call site (the same
  * pattern as [[HyperplaneSigUtil]]).
  */
object BpeUtil {
  def count(s: UTF8String): Long =
    graft.functions.BpeTokenizer.countTokens(s.toString)

  /** One non-overlapping left-to-right BPE merge pass over a symbol
    * array — [[graft.functions.BpeTokenizer.mergePass]]'s skip-after-
    * merge scan, directly on `ArrayData`/`UTF8String` (no
    * Seq[String] encode/decode round trip — the cost that made the
    * interpreted UDF form the last per-row UDF in the engine: it paid
    * a full collection deserialization per word-type per round).
    */
  def mergePass(arr: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    var k = 0
    while (i < n) {
      val x = arr.getUTF8String(i)
      if (i + 1 < n && x != null && x.equals(a) &&
          a != null && b != null && b.equals(arr.getUTF8String(i + 1))) {
        out(k) = UTF8String.concat(x, arr.getUTF8String(i + 1))
        k += 1
        i += 2 // skip-after-merge: the merged token never re-merges
      } else {
        out(k) = x
        k += 1
        i += 1
      }
    }
    if (k == n) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(
      out.asInstanceOf[Array[AnyRef]], k))
  }
}

/** Codegen'd BPE merge pass: `graft_bpe_merge(syms, a, b)` rewrites a
  * symbol array by the (a, b) → ab merge, left to right, non-
  * overlapping — the per-round corpus transform of
  * [[graft.operators.TokenizerTrain.bpeTrain]]. Value-identical to
  * `BpeTokenizer.mergePass` (spec-pinned); stays inside whole-stage
  * codegen where the Scala UDF it replaces forced an interpreted
  * Seq[String] round trip per word-type per round.
  */
case class BpeMergePassExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_bpe_merge"

  override protected def nullSafeEval(syms: Any, a: Any, b: Any): Any =
    BpeUtil.mergePass(syms.asInstanceOf[ArrayData],
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, a, b) => s"graft.plans.BpeUtil.mergePass($s, $a, $b)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BpeMergePassExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
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
