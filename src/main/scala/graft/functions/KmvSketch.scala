package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Aggregation buffer: the `n` smallest DISTINCT hash values seen so
  * far, sorted ascending in `hs(0 until n)` (capacity k, fixed).
  */
case class KmvBuffer(hs: Array[Long], n: Int)

/** Finished sketch: how many distinct hashes were kept, the k-th
  * minimum (the largest kept value), and the distinct-count estimate.
  */
case class KmvResult(n_kept: Long, kth_hash: Long, est_distinct: Double)

/** K-minimum-values distinct-count sketch as a typed [[Aggregator]]
  * (Bar-Yossef et al. '02; Beyer et al. '07 "distinct sampling").
  *
  * The exact alternative (`count(DISTINCT x)`) shuffles every distinct
  * value — at 100 TB that exchange is corpus-sized. KMV keeps a
  * BOUNDED state of the k smallest distinct 32-bit hashes: partial
  * aggregation runs map-side, the shuffle carries ≤ k longs per
  * (partition, group), and merging two sketches is a k-bounded sorted
  * merge — the estimator is fully distributive. With hashes uniform on
  * [0, 2^32), the k-th minimum `h_(k)` estimates distinct count as
  * `(k-1) · 2^32 / h_(k)` (expected relative error ~ 1/sqrt(k-2)).
  *
  * Hash-exactness: callers feed [[TextFunctions.md5Hash32]] values, so
  * a DuckDB oracle replays the identical sketch with
  * `row_number() OVER (ORDER BY h) <= k` over distinct hashes — the
  * estimate is deterministic integer arithmetic, not a property check
  * (unlike the by-design-approximate q_sketch_stats KLL brackets).
  *
  * Reference context: the reference's Snowflake views count exact
  * distincts at warehouse scale (aggregated_views.py); this is the
  * engine-side sketch that answers the same question at corpus scale
  * without the corpus-sized exchange.
  */
class KmvAggregator(k: Int) extends Aggregator[Long, KmvBuffer, KmvResult] {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def zero: KmvBuffer = KmvBuffer(new Array[Long](k), 0)

  override def reduce(b: KmvBuffer, h: Long): KmvBuffer = {
    val idx = java.util.Arrays.binarySearch(b.hs, 0, b.n, h)
    if (idx >= 0) b // already kept: the sketch is over DISTINCT hashes
    else {
      val ins = -idx - 1
      if (b.n < k) {
        System.arraycopy(b.hs, ins, b.hs, ins + 1, b.n - ins)
        b.hs(ins) = h
        KmvBuffer(b.hs, b.n + 1)
      } else if (ins < k) { // h beats the current k-th minimum
        System.arraycopy(b.hs, ins, b.hs, ins + 1, k - ins - 1)
        b.hs(ins) = h
        b
      } else b
    }
  }

  override def merge(x: KmvBuffer, y: KmvBuffer): KmvBuffer = {
    if (y.n == 0) return x
    if (x.n == 0) return y
    val out = new Array[Long](k)
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < x.n || j < y.n)) {
      val takeX = j >= y.n || (i < x.n && x.hs(i) <= y.hs(j))
      val v = if (takeX) x.hs(i) else y.hs(j)
      if (takeX) i += 1 else j += 1
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    KmvBuffer(out, n)
  }

  override def finish(b: KmvBuffer): KmvResult =
    if (b.n == 0) null
    else {
      val kth = b.hs(b.n - 1)
      // kth == 0 in a full sketch cannot happen with distinct
      // non-negative hashes (the LARGEST of k distinct values ≥ k-1),
      // but guard anyway: JVM x/0.0 = Infinity while SQL engines yield
      // NULL — fall back to the kept count, mirrored in the oracle.
      val est =
        if (b.n < k) b.n.toDouble // sketch not full: count is EXACT
        else if (kth == 0L) b.n.toDouble
        else (k - 1).toDouble * 4294967296.0 / kth.toDouble
      KmvResult(b.n.toLong, kth, est)
    }

  override def bufferEncoder: Encoder[KmvBuffer] = Encoders.product[KmvBuffer]
  override def outputEncoder: Encoder[KmvResult] = Encoders.product[KmvResult]
}

/** The same bounded k-min state, finished as the kept hash SET (sorted
  * ascending) instead of the scalar estimate — the form sketch ALGEBRA
  * needs: two sets union-merge to the union's sketch, and membership
  * of the merged k-minima in both input sets estimates Jaccard /
  * intersection ([[graft.operators.Sketches.kmvOverlap]]). Same
  * exchange bound: ≤ k longs per (partition, group).
  */
class KmvHashesAggregator(k: Int)
    extends Aggregator[Long, KmvBuffer, Seq[Long]] {
  private val inner = new KmvAggregator(k)
  override def zero: KmvBuffer = inner.zero
  override def reduce(b: KmvBuffer, h: Long): KmvBuffer = inner.reduce(b, h)
  override def merge(x: KmvBuffer, y: KmvBuffer): KmvBuffer = inner.merge(x, y)
  override def finish(b: KmvBuffer): Seq[Long] =
    if (b.n == 0) null else b.hs.take(b.n).toSeq
  override def bufferEncoder: Encoder[KmvBuffer] = Encoders.product[KmvBuffer]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
