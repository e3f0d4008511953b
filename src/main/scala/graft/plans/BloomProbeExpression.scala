package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a LONG key against a pre-built Bloom filter —
  * the fact-side half of a semi-join reduction.
  *
  * The filter travels as a codegen reference object (the same pattern
  * as [[HyperplaneSigExpr]]): one deserialized `BloomFilter` per
  * executor, probed inline inside the whole-stage-codegen'd scan
  * stage, so the prune happens before the fact row ever reaches an
  * Exchange. False positives only ever ADMIT rows (the exact join
  * afterwards removes them); a `mightContainLong = false` is
  * definitive, which is what makes the prune semantics-preserving.
  */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}
