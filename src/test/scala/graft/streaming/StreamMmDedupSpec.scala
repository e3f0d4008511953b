package graft.streaming

import graft.SparkSpecBase
import graft.operators.Multimodal
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Streaming multimodal ingest ([[StreamReplay.replayMmDedupRedelivered]]):
  * the media catalog delivered TWICE through the state store must land
  * on exactly the batch asset-dedup summary — the double delivery is
  * invisible, and the payload bytes never enter the stream state (the
  * hash-at-the-edge projection).
  */
class StreamMmDedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("double-delivered assets land on the batch dedup summary") {
    val got = StreamReplay.replayMmDedupRedelivered(spark, sfDir)
      .orderBy("content_md5")
      .as[(String, Long, Long, Long)].collect().toSeq
    val want = Multimodal.dedupAssets(
        Multimodal.asMedia(Tables.documents(spark, sfDir)))
      .orderBy("content_md5")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    assert(got == want)
    // the exactly-once gate BITES here: every asset was delivered
    // twice, so without the state-store dedup the copy counts would
    // double — their sum must equal the catalog size, not 2x it
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(got.map(_._3).sum == nDocs, s"copy-count sum vs $nDocs docs")
  }
}
