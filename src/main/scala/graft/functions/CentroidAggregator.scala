package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Aggregation buffer: elementwise sums + row count. */
case class CentroidBuffer(sums: Array[Double], n: Long)

/** Per-group mean embedding (class centroid) as a typed [[Aggregator]].
  *
  * The naive formulation (posexplode to (row, dim) pairs, groupBy
  * (label, dim)) multiplies shuffle volume by the dimensionality. This
  * aggregator keeps one dim-wide double buffer per group: partial
  * aggregation sums map-side, the shuffle carries a single buffer per
  * (partition, group), and `finish` divides once — the shuffle is
  * groups × dim doubles regardless of corpus size.
  */
class CentroidAggregator(dim: Int)
    extends Aggregator[Seq[Float], CentroidBuffer, Seq[Double]] {

  override def zero: CentroidBuffer = CentroidBuffer(new Array[Double](dim), 0L)

  override def reduce(b: CentroidBuffer, a: Seq[Float]): CentroidBuffer = {
    if (a == null) return b // NULL embeddings don't contribute
    var i = 0
    val n = math.min(dim, a.length)
    while (i < n) { b.sums(i) += a(i).toDouble; i += 1 }
    CentroidBuffer(b.sums, b.n + 1)
  }

  override def merge(x: CentroidBuffer, y: CentroidBuffer): CentroidBuffer = {
    var i = 0
    while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
    CentroidBuffer(x.sums, x.n + y.n)
  }

  // A group with no (non-NULL) embeddings has no centroid: return NULL
  // rather than fabricating the zero vector — a zero "centroid" would
  // silently attract nothing-alike vectors in downstream assignment.
  override def finish(r: CentroidBuffer): Seq[Double] =
    if (r.n == 0) null else r.sums.map(_ / r.n).toSeq

  override def bufferEncoder: Encoder[CentroidBuffer] = Encoders.product[CentroidBuffer]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
