package graft.streaming

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The streamed late-data load ([[StreamReplay.replayLateEventDrops]])
  * must land the IDENTICAL warehouse as the batch two-load gate: the
  * on-time and late drops replayed through a real file stream, every
  * micro-batch running the daily chain, summary-for-summary equal.
  */
class StreamLateEventsSpec extends SparkSpecBase {

  test("streamed late load == batch two-load warehouse, summary for summary") {
    val streamed = StreamReplay.replayLateEventDrops(spark, sfDir)
      .orderBy("tbl").collect().toSeq
    // the batch twin over the same split law
    val ev = Tables.events(spark, sfDir)
    val part = Tables.part(spark, sfDir)
    val wh = java.nio.file.Files.createTempDirectory("graft_late_batch")
      .toString + "/wh"
    graft.Pipeline.runDailyLoad(spark, ev.filter(col("event_id") % 5 =!= 0),
      part, wh)
    graft.Pipeline.runDailyLoad(spark, ev.filter(col("event_id") % 5 === 0),
      part, wh)
    val batch = graft.Pipeline.warehouseSummary(spark, wh)
      .orderBy("tbl").collect().toSeq
    assert(streamed == batch)
    assert(streamed.size == 10)
  }
}
