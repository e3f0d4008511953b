package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Laws of the hot-band frequency cap on the MinHash banded pass
  * (Dedup.minhashNearDupPairs(maxBandFreq = ...)) — the standard-LSH
  * guard against corpus-frequent shingle sets (boilerplate headers
  * shared by many DISTINCT documents) whose band candidate lists grow
  * as C(n,2) and which exact-collapse cannot absorb.
  */
class HotBandCapSpec extends SparkSpecBase {
  import spark.implicits._

  // boilerplate-heavy synthetic corpus: 200 DISTINCT docs sharing a
  // 30-word header (the header's shingle minima dominate most bands →
  // hot band tuples shared corpus-wide), each with a short unique
  // tail; plus one genuine near-dup pair (9001, 9002) whose LONG
  // shared tail gives them band collisions of their own that no other
  // doc shares (non-hot → must survive the cap)
  private val boiler = (1 to 30).map(i => s"boiler$i").mkString(" ")
  private val sharedTail = (1 to 30).map(i => s"tail$i").mkString(" ")
  private lazy val docs = (
    (1 to 200).map(i => (i.toLong, s"$boiler unique${i}a unique${i}b")) ++
    Seq(
      (9001L, s"$boiler $sharedTail endA"),
      (9002L, s"$boiler $sharedTail endB"))
  ).toDF("doc_id", "text")

  private lazy val uncapped =
    Dedup.minhashNearDupPairs(docs).localCheckpoint()
  private lazy val capped =
    Dedup.minhashNearDupPairs(docs, maxBandFreq = Some(16L))
      .localCheckpoint()

  test("boilerplate blows the uncapped candidate list up quadratically; the cap bounds it") {
    val nUn = uncapped.count()
    val nCap = capped.count()
    // 200 boilerplate docs share hot bands → ~C(200,2) candidates
    assert(nUn > 5000L, s"expected a quadratic blowup, saw $nUn")
    // capped: every surviving band has ≤ 16 members → ≤ C(16,2) pairs
    // per band × 8 bands worst case, plus the genuine pair's bands
    assert(nCap < 1000L, s"cap did not bound candidates: $nCap")
  }

  test("the genuine near-dup pair survives the cap through its content bands") {
    val hit = capped
      .filter(col("id_a") === 9001L && col("id_b") === 9002L)
      .collect()
    assert(hit.length == 1, capped.collect().mkString(","))
    assert(hit.head.getAs[Double]("jaccard") >= 0.9)
  }

  test("only boilerplate-mediated pairs are lost: capped ⊆ uncapped, same verdicts") {
    // the cap must never CREATE a pair or change a surviving pair's
    // exact-Jaccard verdict
    val extra = capped.join(uncapped, Seq("id_a", "id_b", "jaccard"),
      "left_anti").count()
    assert(extra == 0L)
  }

  test("plan shape: frequency aggregate below the self-join, hot set broadcast anti-joined") {
    val p = Dedup.minhashNearDupPairs(docs, maxBandFreq = Some(16L))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the hot-band set anti-joins as a broadcast — never a corpus
    // shuffle on the text, and the aggregate feeds the join build side
    assert(p.contains("LeftAnti"), p)
    assert(p.split("\n").exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftAnti")), p)
  }

  test("the cap law tracks the count probe") {
    assert(Dedup.bandCapFromCount(1000L) == 128L)
    assert(Dedup.bandCapFromCount(1000000L) == 976L)
    assert(Dedup.bandCapFromCount(1000000000L) == 976562L)
  }
}
