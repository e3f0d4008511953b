package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** SpaceSaving heavy-hitters sketch (Metwally, Agrawal, El Abbadi,
  * "Efficient Computation of Frequent and Top-k Elements in Data
  * Streams", ICDT 2005) — "which token/URL/boilerplate line dominates
  * this corpus" without a full groupBy.
  *
  * Why a sketch when [[graft.operators.CorpusStats]] counts exactly:
  * the exact form shuffles every distinct token; at 100 TB with
  * web-scale vocabularies (URLs, hashes, near-unique lines) the
  * distinct domain itself is the problem. SpaceSaving holds exactly
  * `k` counters per partition, so the full job moves `k × partitions`
  * rows to the driver and nothing else — no shuffle at all.
  *
  * Per-counter guarantee, preserved through merges: for every emitted
  * token, `est - err <= true <= est` (counts only ever OVER-estimate,
  * and the overshoot is tracked per counter). On a miss with all `k`
  * counters busy, the minimum counter is evicted and the newcomer
  * inherits `min+1` with `err = min`; merging sums counts/errors for
  * shared tokens and charges the other side's minimum to absent ones
  * (its true count there cannot exceed that minimum), then keeps the
  * top `k` on a deterministic (count desc, token) order. The classic
  * recall guarantee rides along: any token with true count > N/k
  * survives every eviction and truncation.
  *
  * Executed as `treeAggregate` — partition-local mutable sketches,
  * log-depth merge, one tiny object to the driver. This is the
  * explicitly-bounded driver pattern (cf. the union-find threshold in
  * Dedup): 1000 executors × k=1000 counters is a few MB.
  */
object HeavyHitters {

  /** One counter: overestimated count plus its maximum error. */
  final case class Counter(var count: Long, var err: Long)

  final class Summary(val k: Int) extends Serializable {
    val counters: mutable.HashMap[String, Counter] = mutable.HashMap.empty

    // count -> tokens at that count. Eviction on the saturated miss
    // path (the ENTIRE tail of a web-scale vocabulary) reads the first
    // bucket instead of an O(k) minBy scan — counts move by +1 only,
    // so maintenance is an adjacent-bucket move. Rebuilt lazily after
    // deserialization/merge (@transient), O(k log k) once.
    @transient private var buckets: java.util.TreeMap[Long, mutable.HashSet[String]] = _

    private def rebuildBuckets(): Unit = {
      buckets = new java.util.TreeMap[Long, mutable.HashSet[String]]
      counters.foreach { case (t, c) => bucketAdd(t, c.count) }
    }

    private def bucketAdd(token: String, count: Long): Unit =
      buckets.computeIfAbsent(count, _ => mutable.HashSet.empty) += token

    private def bucketRemove(token: String, count: Long): Unit = {
      val s = buckets.get(count)
      s -= token
      if (s.isEmpty) buckets.remove(count)
    }

    def add(token: String): this.type = {
      if (buckets == null) rebuildBuckets()
      counters.get(token) match {
        case Some(c) =>
          bucketRemove(token, c.count)
          c.count += 1
          bucketAdd(token, c.count)
        case None if counters.size < k =>
          counters.update(token, Counter(1L, 0L))
          bucketAdd(token, 1L)
        case None =>
          val minBucket = buckets.firstEntry()
          val min = minBucket.getKey
          val evicted = minBucket.getValue.head
          counters.remove(evicted)
          bucketRemove(evicted, min)
          counters.update(token, Counter(min + 1, min))
          bucketAdd(token, min + 1)
      }
      this
    }

    def mergeWith(other: Summary): this.type = {
      // a token absent from a full summary may still have occurred up
      // to that summary's minimum count times — charge it to keep the
      // over-estimate invariant
      val thisMin = if (counters.size < k) 0L
        else counters.valuesIterator.map(_.count).min
      val otherMin = if (other.counters.size < other.k) 0L
        else other.counters.valuesIterator.map(_.count).min
      val tokens = counters.keySet ++ other.counters.keySet
      val merged = tokens.iterator.map { t =>
        val a = counters.get(t)
        val b = other.counters.get(t)
        val count = a.map(_.count).getOrElse(thisMin) +
          b.map(_.count).getOrElse(otherMin)
        val err = a.map(_.err).getOrElse(thisMin) +
          b.map(_.err).getOrElse(otherMin)
        (t, Counter(count, err))
      }.toSeq
      // deterministic truncation back to k
      val kept = merged.sortBy { case (t, c) => (-c.count, t) }.take(k)
      counters.clear()
      kept.foreach { case (t, c) => counters.update(t, c) }
      buckets = null // rebuilt lazily on the next add
      this
    }
  }

  /** Merged corpus-wide summary of a token stream. */
  def spaceSaving(tokens: Dataset[String], k: Int): Seq[(String, Long, Long)] =
    tokens.rdd
      .treeAggregate(new Summary(k))((s, t) => s.add(t), (a, b) => a.mergeWith(b))
      .counters.iterator.map { case (t, c) => (t, c.count, c.err) }
      .toSeq.sortBy { case (t, c, _) => (-c, t) }

  /** Heavy-hitter tokens of a text column: token, over-estimated
    * count, and its error bound (`est_count - err_bound <= true count
    * <= est_count`, exact per row).
    */
  def topTokens(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = TextFunctions.explodedTokens(docs, textCol)
      .select(col("token")).as[String]
    spaceSaving(toks, k)
      .toDF("token", "est_count", "err_bound")
      .orderBy(col("est_count").desc, col("token"))
  }
}
