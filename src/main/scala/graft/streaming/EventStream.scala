package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface: the reference's daily-batch event loads
  * (reference: astro-sdk-tutorial/dags/etl_s3_snowflake_raw_event_ingest
  * .py — `@daily` schedule, delta appends) re-expressed as a continuous
  * pipeline. The same transforms run on `readStream` inputs:
  * watermarked tumbling-window aggregation and session windows. Batch
  * twins live in [[graft.operators.Relational]] so semantics are
  * verified against the SQL oracle; these entry points add the
  * watermarking/output-mode wiring.
  */
object EventStream {

  /** Watermarked tumbling 1-hour counts per event_type. Append-safe. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n_events"))

  /** Watermarked per-user session windows (30-minute gap). State is
    * keyed by (user, session) and evicted by the watermark — bounded
    * memory at any scale.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
