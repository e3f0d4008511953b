package graft.streaming

import graft.SparkSpecBase
import graft.operators.Dedup
import graft.sources.{MinhashIndexStore, Tables}
import org.apache.spark.sql.functions._

/** Streaming incremental near-dup ([[StreamReplay.replayNearDupDrops]]):
  * the per-drop rollups the stream emits must equal the batch
  * incremental queries run drop-by-drop against the growing index —
  * drop 1 vs base, drop 2 vs base ∪ drop 1.
  */
class StreamNearDupSpec extends SparkSpecBase {
  import spark.implicits._

  test("streamed drops equal the drop-by-drop batch incremental rollups") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val base = docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5)
    val drop1 = docs.filter(col("doc_id") % 10 === 5)
    val drop2 = docs.filter(col("doc_id") % 10 === 0)

    val got = StreamReplay.replayNearDupDrops(spark, sfDir)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Boolean)].collect().toSeq

    val want1 = Dedup.minhashNearDupsDelta(drop1, base,
      MinhashIndexStore.bandRows(base))
    val want2 = Dedup.minhashNearDupsDelta(drop2, base.unionByName(drop1),
      MinhashIndexStore.bandRows(base.unionByName(drop1)))
    val want = want1.unionByName(want2).orderBy("doc_id")
      .as[(Long, Long, Double, Boolean)].collect().toSeq

    assert(got.nonEmpty)
    assert(got == want)
    // both drops must be represented, and at least one doc must have
    // found a candidate through the stored index for the gate to prove
    // the composition
    assert(got.exists(_._1 % 10 == 0) && got.exists(_._1 % 10 == 5))
    assert(got.exists(_._2 > 0), got.take(20))
  }

  test("replay runs are isolated: a second run sees the pristine base index") {
    // the staged base index is shared per JVM but each run appends
    // into its OWN copy — without that isolation the second run's
    // drops would near-dup against the first run's appended drops and
    // over-count candidates
    val a = StreamReplay.replayNearDupDrops(spark, sfDir)
      .orderBy("doc_id").as[(Long, Long, Double, Boolean)].collect().toSeq
    val b = StreamReplay.replayNearDupDrops(spark, sfDir)
      .orderBy("doc_id").as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(a.nonEmpty)
    assert(a == b)
  }
}
