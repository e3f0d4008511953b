package graft.streaming

import graft.sources.Sinks
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming maintenance of warehouse dims — the continuous version of
  * the reference's daily dim loads.
  *
  * Two pieces a streamed ingest needs that the batch operators don't
  * cover:
  *
  *  - [[dedupStream]]: at-least-once sources re-deliver rows;
  *    `dropDuplicatesWithinWatermark` keys the seen-set by the dedup
  *    columns and EVICTS it by the watermark, so state stays bounded
  *    by the disorder window instead of growing with the key universe
  *    (a plain streaming `dropDuplicates` never forgets — a leak at
  *    100 TB ingest rates).
  *  - [[scd2Sink]]: `foreachBatch` turns each micro-batch of dim
  *    deltas into one [[graft.operators.Scd2]] load against the
  *    stored history. foreachBatch is at-least-once — on failure the
  *    same batch replays — and the merge is IDEMPOTENT for a replayed
  *    (batch, load date) pair: unchanged rows are skipped and a
  *    re-delivered change finds its old version already closed, so
  *    the at-least-once channel still yields an exactly-once history.
  */
object DimFeed {

  /** Bounded-state streaming dedup on `keys` within the watermark's
    * disorder window.
    */
  def dedupStream(events: DataFrame, keys: Seq[String], tsCol: String = "ts",
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** SCD2 history maintenance over a dim-delta stream. `loadDateFor`
    * maps a batch id to that load's effective date (must be stable
    * across a replay of the same batch — derive it from batch
    * contents or a batch-id keyed calendar, never wall clock).
    * Micro-batches must carry unique keys (enforced in-plan by the
    * merge). Start with `.option("checkpointLocation", ...)`.
    */
  def scd2Sink(deltas: DataFrame, path: String, keys: Seq[String],
      tracked: Seq[String], loadDateFor: Long => String): DataStreamWriter[Row] =
    deltas.writeStream.foreachBatch { (batch: Dataset[Row], id: Long) =>
      if (!batch.isEmpty) {
        Sinks.mergeDimScd2(batch.sparkSession, path, batch, keys, tracked,
          lit(loadDateFor(id)))
        ()
      }
    }
}
