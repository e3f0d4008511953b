package graft.streaming

import graft.SparkSpecBase
import graft.operators.Multimodal
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The streamed frame-signature ingest
  * ([[StreamReplay.replayMmPhashDrops]]) — the multimodal twin of the
  * `stream_neardup` law: the union of per-batch pair sets must equal
  * the BATCH all-pairs ground truth restricted to pairs touching any
  * drop, each pair must land exactly once, and a cross-drop pair must
  * land on the LATER drop's batch (the earlier drop is already in the
  * stored bands when the later one signs).
  */
class StreamMmPhashSpec extends SparkSpecBase {
  import spark.implicits._

  private type Pair = (Long, Long, Int)

  private lazy val run: (String, org.apache.spark.sql.DataFrame) =
    StreamReplay.replayMmPhashDropsWithSink(spark, sfDir)

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[Pair] =
    df.select(col("doc_a"), col("doc_b"), col("frame_idx"))
      .as[(Long, Long, Int)].collect().toSet

  private def batchPairs(id: Int): Set[Pair] =
    pairsOf(spark.read.parquet(s"${run._1}/batch_$id"))

  test("union of per-batch pairs equals the batch ground truth over the drops") {
    val docs = Tables.documents(spark, sfDir)
    val want = pairsOf(
      Multimodal.nearDupFrames(Multimodal.asMedia(docs))
        .filter(col("doc_a") % 10 === 0 || col("doc_b") % 10 === 0 ||
          col("doc_a") % 10 === 5 || col("doc_b") % 10 === 5))
    assert(pairsOf(run._2) == want)
    assert(want.nonEmpty, "gate data must exercise the streamed pairs")
  }

  test("each pair lands exactly once; cross-drop pairs on the LATER drop's batch") {
    val b0 = batchPairs(0) // the doc_id % 10 == 5 drop
    val b1 = batchPairs(1) // the doc_id % 10 == 0 drop
    assert((b0 & b1).isEmpty, "a pair must never land twice")
    // every batch-0 pair touches drop 0 (res 5) but NOT drop 1 (res 0):
    // drop 1 was not yet staged, so its pairs cannot have landed early
    b0.foreach { case (a, b, _) =>
      assert(a % 10 == 5 || b % 10 == 5)
      assert(a % 10 != 0 && b % 10 != 0,
        s"pair ($a,$b) touches the later drop but landed on batch 0")
    }
    // every batch-1 pair touches drop 1; cross-drop (5↔0) pairs are
    // exactly here — the arrival-order law
    b1.foreach { case (a, b, _) =>
      assert(a % 10 == 0 || b % 10 == 0)
    }
  }

  test("a redelivered batch re-lands its band layer exactly (keyed Overwrite)") {
    import graft.sources.FrameSigIndexStore
    val docs = Tables.documents(spark, sfDir)
    val base = Multimodal.asMedia(docs.filter(col("doc_id") % 10 =!= 0))
    val drop = Multimodal.asMedia(docs.filter(col("doc_id") % 10 === 0))
    val p = java.nio.file.Files
      .createTempDirectory("graft_mmphash_redeliver").toString + "/fs"
    FrameSigIndexStore.buildKeyed(base, p)
    FrameSigIndexStore.appendBatch(drop, p, 0L)
    val once = FrameSigIndexStore.bandsTable(spark, p)
      .orderBy("doc_id", "frame_idx", "band").collect().toSeq
    // the at-least-once redelivery: same batch id, same rows — the
    // keyed Overwrite must leave the store indistinguishable
    FrameSigIndexStore.appendBatch(drop, p, 0L)
    val twice = FrameSigIndexStore.bandsTable(spark, p)
      .orderBy("doc_id", "frame_idx", "band").collect().toSeq
    assert(twice == once)
  }
}
