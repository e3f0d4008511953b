package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpecBase {

  test("KMV buffer keeps the k smallest distinct hashes, in order") {
    val agg = new KmvAggregator(4)
    var b = agg.zero
    Seq(50L, 10L, 30L, 10L, 40L, 20L, 5L, 50L).foreach(h => b = agg.reduce(b, h))
    assert(b.n == 4)
    assert(b.hs.take(4).toSeq == Seq(5L, 10L, 20L, 30L))
  }

  test("merge equals feeding both streams into one sketch") {
    val agg = new KmvAggregator(8)
    val xs = (1 to 40).map(i => (i * 7919L) % 1000)
    val (l, r) = xs.splitAt(17)
    var a = agg.zero; l.foreach(h => a = agg.reduce(a, h))
    var b = agg.zero; r.foreach(h => b = agg.reduce(b, h))
    var all = agg.zero; xs.foreach(h => all = agg.reduce(all, h))
    val m = agg.merge(a, b)
    assert(m.hs.take(m.n).toSeq == all.hs.take(all.n).toSeq)
  }

  test("under-full sketch reports the exact distinct count") {
    val agg = new KmvAggregator(64)
    var b = agg.zero
    Seq(3L, 1L, 2L, 3L, 1L).foreach(h => b = agg.reduce(b, h))
    val r = agg.finish(b)
    assert(r.n_kept == 3 && r.kth_hash == 3L && r.est_distinct == 3.0)
  }

  test("full sketch estimates within the 1/sqrt(k) error band") {
    val k = 64
    val agg = new KmvAggregator(k)
    // deterministic pseudo-uniform 32-bit hashes: 5000 distinct values
    val n = 5000
    var b = agg.zero
    (1 to n).foreach { i =>
      val h = (i * 2654435761L) % 4294967296L
      b = agg.reduce(b, h)
    }
    val r = agg.finish(b)
    assert(r.n_kept == k)
    val relErr = math.abs(r.est_distinct - n) / n
    assert(relErr < 3.0 / math.sqrt(k - 2), s"est ${r.est_distinct} vs $n")
  }

  test("kmvDistinct matches exact distinct via a groupBy over testdata") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val out = graft.operators.CorpusStats.kmvDistinct(docs, k = 64).collect()
    assert(out.nonEmpty)
    out.foreach { row =>
      val kept = row.getAs[Long]("n_kept")
      val exact = row.getAs[Long]("n_distinct_exact")
      val est = row.getAs[Double]("est_distinct")
      if (kept < 64) assert(est == exact.toDouble) // under-full ⇒ exact
      else assert(math.abs(est - exact) / exact < 0.5)
      assert(kept <= 64)
    }
  }

  test("duplicate documents do not move the estimate") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val doubled = docs.unionAll(docs)
    val once = graft.operators.CorpusStats.kmvDistinct(docs, k = 64)
      .select("lang", "kth_hash", "est_distinct").collect().toSet
    val twice = graft.operators.CorpusStats.kmvDistinct(doubled, k = 64)
      .select("lang", "kth_hash", "est_distinct").collect().toSet
    assert(once == twice)
  }
}
