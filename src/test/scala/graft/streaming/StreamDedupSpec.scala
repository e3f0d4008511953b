package graft.streaming

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class StreamDedupSpec extends SparkSpecBase {

  test("redelivered file stream collapses to exactly the batch table") {
    val streamed = StreamReplay
      .replayRedelivered(spark, sfDir, Seq("event_id"))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val batch = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    // exactly one copy: no row of the second delivery survives dedup
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("three deliveries still collapse to one copy") {
    val streamed = StreamReplay
      .replayRedelivered(spark, sfDir, Seq("event_id"), copies = 3)
    assert(streamed.count() === Tables.events(spark, sfDir).count())
  }
}
