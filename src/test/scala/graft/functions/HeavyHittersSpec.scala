package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpecBase {
  import spark.implicits._

  test("k >= vocabulary: counts are exact with zero error") {
    val docs = Seq("a b a", "b c b").toDF("text")
    val out = HeavyHitters.topTokens(docs, "text", k = 8)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("b", 3L, 0L), ("a", 2L, 0L), ("c", 1L, 0L)))
  }

  test("k < vocabulary: bracket est-err <= true <= est, exactly k rows") {
    // skewed stream: token t0 dominates, long tail of near-uniques
    val words = (Seq.fill(200)("t0") ++ (1 to 300).map(i => s"u$i")).mkString(" ")
    val docs = Seq(words).toDF("text").repartition(4)
    val k = 8
    val out = HeavyHitters.topTokens(docs, "text", k).collect()
    assert(out.length == k)
    val trueCounts = Map("t0" -> 200L).withDefaultValue(1L)
    out.foreach { r =>
      val (tok, est, err) = (r.getString(0), r.getLong(1), r.getLong(2))
      val t = trueCounts(tok)
      assert(est >= t, s"$tok under-estimated: $est < $t")
      assert(est - err <= t, s"$tok bracket broken: $est-$err > $t")
    }
    // the heavy token (true=200 > N/k=500/8) must survive
    assert(out.exists(_.getString(0) == "t0"))
  }

  test("merging partitioned streams preserves the invariants") {
    // vocabulary of 30 > k=8, spread over 8 partitions so treeAggregate
    // exercises the Summary.mergeWith path
    val docs = (1 to 400)
      .map(i => s"w${i % 30} w${i % 7} common")
      .toDF("text").repartition(8)
    val out = HeavyHitters.topTokens(docs, "text", k = 8).collect()
    assert(out.length == 8)
    // 'common' occurs 400 times of 1200 tokens -> guaranteed present
    val c = out.find(_.getString(0) == "common")
    assert(c.isDefined, "guaranteed heavy hitter evicted")
    assert(c.get.getLong(1) >= 400L)
    assert(c.get.getLong(1) - c.get.getLong(2) <= 400L)
  }
}
