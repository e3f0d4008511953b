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
    *
    * Batch composition is trigger-timing dependent, so one micro-batch
    * can legally carry SEVERAL changes to the same key (a backlog
    * drained after downtime); the sink collapses each key to its last
    * change by `latestBy` (remaining columns break ties, so a replayed
    * batch collapses identically) BEFORE merging — without this, the
    * merge's duplicate-key guard would kill the query and the
    * checkpoint would replay the same poisonous batch forever.
    * `latestBy` is consumed by the collapse and does not enter the
    * history. Deltas that outgrow a broadcast (backfills) set
    * `broadcastDelta = false`. Start with
    * `.option("checkpointLocation", ...)`.
    */
  /** File-replay of snapshot loads through [[scd2Sink]]: stages each
    * load as ONE parquet file (mtime-ordered), streams them with
    * `maxFilesPerTrigger = 1` so every load arrives as its own
    * micro-batch, and returns the on-disk history the sink maintained.
    * The gate compares this history to the BATCH [[graft.operators
    * .Scd2]] oracle over the same loads and dates — the streaming
    * sink must produce the identical history, or the wiring
    * (per-batch collapse, load-date mapping, merge idempotency) is
    * wrong. `workDir` is recreated from scratch on every call: the
    * replay always runs from an empty history and a fresh checkpoint.
    */
  def replayScd2(spark: org.apache.spark.sql.SparkSession,
      loads: Seq[(DataFrame, String)], keys: Seq[String],
      tracked: Seq[String], workDir: String): DataFrame = {
    require(loads.nonEmpty, "replayScd2 needs at least one load")
    val root = new org.apache.hadoop.fs.Path(workDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) fs.delete(root, true)
    val stage = s"$workDir/stage"
    fs.mkdirs(new org.apache.hadoop.fs.Path(stage))
    loads.zipWithIndex.foreach { case ((df, _), i) =>
      val tmp = s"$workDir/tmp_$i"
      // __load_seq doubles as the sink's latestBy collapse column; a
      // uniform value per staged file, dropped before the merge
      df.withColumn("__load_seq", lit(i.toLong))
        .coalesce(1).write.parquet(tmp)
      val single = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no parquet part file staged in $tmp"))
      val dst = new java.io.File(s"$stage/load_$i.parquet")
      java.nio.file.Files.move(single.toPath, dst.toPath)
      // the file source orders batches by modification time — pin
      // strictly increasing mtimes so load i is micro-batch i
      dst.setLastModified(1700000000000L + i * 60000L)
      ()
    }
    val dates = loads.map(_._2)
    val schema = spark.read.parquet(s"$stage/load_0.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
    val hist = s"$workDir/history"
    val q = scd2Sink(src, hist, keys, tracked,
        (id: Long) => dates(id.toInt), latestBy = "__load_seq")
      .option("checkpointLocation", s"$workDir/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    spark.read.parquet(hist)
  }

  def scd2Sink(deltas: DataFrame, path: String, keys: Seq[String],
      tracked: Seq[String], loadDateFor: Long => String,
      latestBy: String = "ts",
      broadcastDelta: Boolean = true): DataStreamWriter[Row] =
    deltas.writeStream.foreachBatch { (batch: Dataset[Row], id: Long) =>
      if (!batch.isEmpty) {
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions.{col, row_number}
        val tieBreak = batch.columns
          .filterNot(c => keys.contains(c) || c == latestBy)
          .map(col(_).desc)
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy((col(latestBy).desc +: tieBreak.toSeq): _*)
        val latest = batch.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn", latestBy)
        // pinResult = false: the returned handle is dropped here, so
        // localCheckpointing a growing history every batch buys nothing
        Sinks.mergeDimScd2(batch.sparkSession, path, latest, keys, tracked,
          lit(loadDateFor(id)), broadcastDelta = broadcastDelta,
          pinResult = false)
        ()
      }
    }
}
