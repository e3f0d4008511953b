package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Watermark drop-accounting gate
  * ([[StreamReplay.replayWatermarkAudit]]): the Append-mode hourly
  * aggregation under a 1-hour watermark must equal the batch
  * aggregation over exactly the rows the law keeps — on-time rows
  * always, stragglers iff their window's END is still ahead of
  * `max(on-time ts) − 1 h` — and the loss must visibly bite.
  */
class StreamWatermarkSpec extends SparkSpecBase {

  test("sink equals the keep-law aggregation, and late loss bites") {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val got = StreamReplay.replayWatermarkAudit(spark, sfDir)
      .select(col("window_start"), col("n_events"))
    val wm1 = ev.filter(col("event_id") % 3 =!= 0)
      .agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val keepLaw = ev.filter(
      col("event_id") % 3 =!= 0 ||
        window(col("ts"), "1 hour").getField("end") >
          (lit(wm1) - expr("INTERVAL 1 HOUR")))
    val want = keepLaw
      .groupBy(window(col("ts"), "1 hour").getField("start")
        .as("window_start"))
      .agg(count(lit(1)).as("n_events_w"))
    val mismatches = got.join(want, Seq("window_start"), "full")
      .filter(coalesce(col("n_events"), lit(-1)) =!=
        coalesce(col("n_events_w"), lit(-1)))
      .count()
    assert(mismatches == 0)
    // the loss is real: stragglers into finalized hours are GONE
    val kept = got.agg(sum(col("n_events"))).collect()(0).getLong(0)
    val total = ev.count()
    val onTime = ev.filter(col("event_id") % 3 =!= 0).count()
    assert(kept < total, s"watermark dropped nothing (kept=$kept)")
    assert(kept >= onTime, "on-time rows must never be dropped")
  }
}
