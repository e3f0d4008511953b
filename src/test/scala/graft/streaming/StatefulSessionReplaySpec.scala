package graft.streaming

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class StatefulSessionReplaySpec extends SparkSpecBase {

  test("stateful file replay equals batch islands sessionization, micro-exact") {
    val streamed = StreamReplay.replaySessionizeStateful(spark, sfDir)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
    val ev = Tables.events(spark, sfDir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val batch = ev
      .withColumn("pts", lag(col("ts"), 1).over(w))
      .withColumn("brk", when(col("pts").isNull ||
        unix_micros(col("ts")) - unix_micros(col("pts")) > 30L * 60 * 1000000,
        1).otherwise(0))
      .withColumn("sid", sum(col("brk")).over(w))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .drop("sid")
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
    assert(streamed.count() === batch.count())
    // micro-exact bounds: the state folds in MICROS (a millis fold
    // silently truncated session bounds — regression pinned here)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("kill-and-resume replay equals the single-run fold exactly-once") {
    // run 1 folds only the first half of the span, run 2 resumes the
    // same checkpoint: sessions straddling the cut close correctly
    // only if the custom state survived the restart
    val resumed = StreamReplay.replaySessionizeStatefulRestart(spark, sfDir)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
    val single = StreamReplay.replaySessionizeStateful(spark, sfDir)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
    assert(resumed.count() === single.count())
    assert(resumed.exceptAll(single).count() === 0)
    assert(single.exceptAll(resumed).count() === 0)
  }
}
