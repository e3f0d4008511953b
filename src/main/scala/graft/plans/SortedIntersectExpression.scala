package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Merge-scan intersection of two SORTED, DISTINCT, null-free
  * `array<long>` columns — the adjacency-list shape
  * [[graft.operators.Graph.triangleCounts]] produces
  * (`sort_array(collect_list(...))` over a distinct edge set).
  *
  * Why it exists: the builtin `array_intersect` allocates and fills a
  * hash set PER ROW (`SQLOpenHashSet.<init>` + `contains` dominated
  * the triangle close's profile); on pre-sorted inputs a two-pointer
  * merge does the same set intersection with zero allocation beyond
  * the result and no hashing. Value contract: with both inputs sorted
  * ascending and duplicate-free, the output equals
  * `array_intersect(a, b)` exactly (same elements, same order) —
  * spec-pinned. Callers that cannot guarantee the precondition must
  * keep the builtin.
  */
object SortedIntersectUtil {
  def intersect(a: ArrayData, b: ArrayData): ArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    val out = new Array[Long](math.min(na, nb))
    var i = 0
    var j = 0
    var k = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { out(k) = x; k += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }
}

/** `graft_sorted_intersect(a, b)` → `array<long>`. Codegen emits a
  * static call, so the expression stays inside whole-stage codegen.
  */
case class SortedIntersectExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sorted_intersect"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def isLongArray(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<bigint>, array<bigint>)")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectUtil.intersect(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.SortedIntersectUtil.intersect($a, $b)")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): SortedIntersectExpr = copy(left = l, right = r)
}

object SortedIntersectFunctions {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_sorted_intersect"),
    new ExpressionInfo(classOf[SortedIntersectExpr].getName, "graft_sorted_intersect"),
    (children: Seq[Expression]) =>
      SortedIntersectExpr(children(0), children(1)))
}

/** The STRING-set sibling: `graft_sorted_common_count(a, b)` → INT
  * count of common elements of two SORTED, DISTINCT, null-free
  * `array<string>` columns — the exact-Jaccard verify shape of
  * [[graft.operators.Dedup.ngramNearDups]] (|A∩B| by two-pointer
  * merge; |A∪B| = |A|+|B|−|A∩B| downstream). The builtin
  * `array_intersect`+`array_union` pair allocates and fills TWO hash
  * sets of hundreds of strings per pair row (measured 0.37 ms/pair —
  * 18 s for 48k verifies at sf0.1); the merge scan compares
  * UTF8Strings in place with zero allocation. Comparator is
  * UTF8String's binary order — exactly `sort_array`'s order on
  * StringType, so inputs prepared with
  * `sort_array(array_distinct(...))` satisfy the precondition, and
  * the count equals `size(array_intersect(a, b))` EXACTLY (no
  * hashing, no collision risk — the value-level oracle survives).
  */
object SortedCommonCountUtil {
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var k = 0
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { k += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    k
  }
}

case class SortedCommonCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_sorted_common_count"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def isStrArray(t: DataType) = t match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) => true
      case _ => false
    }
    if (isStrArray(left.dataType) && isStrArray(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<string>, array<string>)")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedCommonCountUtil.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.SortedCommonCountUtil.count($a, $b)")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): SortedCommonCountExpr = copy(left = l, right = r)
}

object SortedCommonCountFunctions {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_sorted_common_count"),
    new ExpressionInfo(classOf[SortedCommonCountExpr].getName,
      "graft_sorted_common_count"),
    (children: Seq[Expression]) =>
      SortedCommonCountExpr(children(0), children(1)))
}
