package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Aggregation buffer: flattened d×d cell sums. */
case class GramBuffer(cells: Array[Double])

/** Corpus Gram matrix (Σ xᵢxⱼ over rows) as a typed [[Aggregator]].
  *
  * The naive formulation (flatten each row's d² outer product, explode,
  * groupBy cell) allocates and hashes d² rows per vector before the
  * map-side combine catches them. This aggregator updates one
  * d²-double buffer in place per partition: the exchange carries ONE
  * buffer per partition (d² doubles — 32 KB at d=64) regardless of
  * corpus size, and the inner loop is a primitive multiply-accumulate.
  */
class GramAggregator(dim: Int)
    extends Aggregator[Seq[Double], GramBuffer, Seq[Double]] {

  override def zero: GramBuffer = GramBuffer(new Array[Double](dim * dim))

  override def reduce(b: GramBuffer, a: Seq[Double]): GramBuffer = {
    if (a == null) return b
    val x = a.toArray
    val n = math.min(dim, x.length)
    var i = 0
    while (i < n) {
      val xi = x(i)
      val row = i * dim
      var j = 0
      while (j < n) { b.cells(row + j) += xi * x(j); j += 1 }
      i += 1
    }
    b
  }

  override def merge(x: GramBuffer, y: GramBuffer): GramBuffer = {
    var i = 0
    val d2 = dim * dim
    while (i < d2) { x.cells(i) += y.cells(i); i += 1 }
    x
  }

  override def finish(r: GramBuffer): Seq[Double] = r.cells.toSeq

  override def bufferEncoder: Encoder[GramBuffer] = Encoders.product[GramBuffer]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
