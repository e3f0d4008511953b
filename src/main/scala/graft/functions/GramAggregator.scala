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

/** Buffer for [[MomentsAggregator]]: row count + Σx + flattened Σxxᵀ.
  * `s` is sized d and `ss` sized d² once the first vector fixes d;
  * both start empty (the abelian identity) so an empty slice folds to
  * (0, [], []).
  */
case class MomentsBuffer(n: Long, s: Array[Double], ss: Array[Double])

/** The complete raw-moment state (n, Σx, Σxxᵀ) in ONE corpus pass.
  *
  * [[GramStore.momentRows]] previously ran three jobs per mutation — a
  * `limit(1)` driver probe for the dimension, the count/Gram aggregate,
  * and a posexplode pass for Σx — contradicting its own "single
  * corpus-sized pass" contract. This aggregator folds all three into
  * one buffer: d is DISCOVERED from the first vector a partition sees
  * (buffers lazily grow to the longest vector observed, so merge is
  * total even on ragged input), Σx rides the same loop that builds the
  * outer-product cells, and the exchange still carries one
  * (d + d² + 1)-double buffer per partition regardless of corpus size.
  */
class MomentsAggregator
    extends Aggregator[Seq[Double], MomentsBuffer, MomentsResult] {

  private def grown(b: MomentsBuffer, d: Int): MomentsBuffer =
    if (b.s.length >= d) b
    else {
      val s = new Array[Double](d)
      System.arraycopy(b.s, 0, s, 0, b.s.length)
      val ss = new Array[Double](d * d)
      val od = b.s.length
      var i = 0
      while (i < od) {
        System.arraycopy(b.ss, i * od, ss, i * d, od)
        i += 1
      }
      MomentsBuffer(b.n, s, ss)
    }

  override def zero: MomentsBuffer =
    MomentsBuffer(0L, Array.empty[Double], Array.empty[Double])

  override def reduce(b0: MomentsBuffer, a: Seq[Double]): MomentsBuffer = {
    if (a == null) return b0
    val x = a.toArray
    val b = grown(b0, x.length)
    val d = b.s.length
    var i = 0
    while (i < x.length) {
      val xi = x(i)
      b.s(i) += xi
      val row = i * d
      var j = 0
      while (j < x.length) { b.ss(row + j) += xi * x(j); j += 1 }
      i += 1
    }
    MomentsBuffer(b.n + 1L, b.s, b.ss)
  }

  override def merge(x0: MomentsBuffer, y0: MomentsBuffer): MomentsBuffer = {
    val d = math.max(x0.s.length, y0.s.length)
    val x = grown(x0, d); val y = grown(y0, d)
    var i = 0
    while (i < d) { x.s(i) += y.s(i); i += 1 }
    i = 0
    val d2 = d * d
    while (i < d2) { x.ss(i) += y.ss(i); i += 1 }
    MomentsBuffer(x.n + y.n, x.s, x.ss)
  }

  override def finish(r: MomentsBuffer): MomentsResult =
    MomentsResult(r.n, r.s.toSeq, r.ss.toSeq)

  override def bufferEncoder: Encoder[MomentsBuffer] =
    Encoders.product[MomentsBuffer]
  override def outputEncoder: Encoder[MomentsResult] =
    Encoders.product[MomentsResult]
}

/** Finished moment state: struct(n, s, ss) — one row per aggregate. */
case class MomentsResult(n: Long, s: Seq[Double], ss: Seq[Double])
