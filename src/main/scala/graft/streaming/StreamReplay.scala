package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Batch-equivalence replay: run the SAME transform the batch gate
  * queries use, but fed by a REAL file stream (`readStream` over the
  * events parquet, `Trigger.AvailableNow`), into an in-memory sink —
  * then hand the completed result to the verify gate, where the
  * DuckDB oracle for the batch query checks it value-for-value.
  *
  * This is the streaming surface's correctness story: same engine,
  * same data, same transform ⇒ the continuous path must produce the
  * exact batch answer. A divergence (wrong watermark wiring, a
  * non-streamable expression silently changing semantics, an output
  * mode dropping rows) fails the gate non-zero like any other query.
  *
  * Scale shape: nothing here is gate-only scaffolding — readStream +
  * AvailableNow is precisely the production backfill pattern ("replay
  * the lake through the streaming topology"), and complete-mode
  * results at gate SF stand in for what a real deployment would write
  * through a parquet/Kafka sink in append mode.
  */
object StreamReplay {

  private val runId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Replay `dir`'s events table as a file stream through `transform`
    * and return the completed output. The stream frame gets the same
    * TIMESTAMP(NANOS) → µs conversion as [[graft.sources.Tables
    * .events]] plus a watermark (required scaffolding for streaming
    * aggregation state eviction; with one AvailableNow pass nothing
    * is ever late, so it cannot change the answer — which is exactly
    * what the equivalence check proves). Pass `watermark = null` for
    * transforms that watermark their own branches (e.g. a
    * stream-stream join watermarks each renamed side — re-defining the
    * source watermark on top of those is disallowed by the engine).
    */
  def replayEvents(spark: SparkSession, dir: String,
      transform: DataFrame => DataFrame,
      watermark: String = "2 hours",
      mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    val prevNanos = spark.conf.getOption(nanosKey)
    spark.conf.set(nanosKey, "true")
    try replayEventsWithNanos(spark, dir, transform, watermark, mode)
    finally prevNanos match {
      // restore the legacy-read conf — leaking it would change how
      // every LATER batch query in the session reads nanos timestamps
      case Some(v) => spark.conf.set(nanosKey, v)
      case None => spark.conf.unset(nanosKey)
    }
  }

  /** The same ts normalization as [[graft.sources.Tables.events]],
    * applied to a STREAM frame: nanos-as-LONG → µs timestamp, NTZ →
    * TIMESTAMP (UTC-pinned session, pure reinterpretation — and
    * watermarks require TimestampType).
    */
  private def normalizeTs(batchSchema: org.apache.spark.sql.types.StructType,
      raw: DataFrame): DataFrame =
    batchSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }

  private def replayEventsWithNanos(spark: SparkSession, dir: String,
      transform: DataFrame => DataFrame,
      watermark: String,
      mode: OutputMode): DataFrame = {
    val path = s"$dir/events.parquet"
    val batchSchema = spark.read.parquet(path).schema
    // the testdata table is one bare file; a brace glob makes the file
    // stream source resolve basePath to the parent DIRECTORY (it
    // rejects a file basePath) while still matching only this table
    val raw = spark.readStream.schema(batchSchema)
      .parquet(s"$dir/{events.parquet}")
    val events = normalizeTs(batchSchema, raw)
    val out = transform(
      if (watermark == null) events else events.withWatermark("ts", watermark))
    val name = s"graft_replay_${runId.incrementAndGet()}"
    // Stateful-operator cost in a replay is dominated by per-partition
    // state-store instances (commit + snapshot per micro-batch per
    // partition, ×2 sides for a stream-stream join), not by data volume
    // at gate SF — scope the stream's shuffle partitions down for the
    // replay and restore the session conf after. A real deployment
    // sizes this per-topology to its key cardinality.
    val partsKey = "spark.sql.shuffle.partitions"
    val prev = spark.conf.getOption(partsKey)
    spark.conf.set(partsKey, "8")
    try {
      val q = out.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(partsKey, v)
      case None => spark.conf.unset(partsKey)
    }
    spark.table(name)
  }

  /** File-replay gate for the CUSTOM-STATE sessionizer
    * ([[EventStream.sessionizeStateful]], `flatMapGroupsWithState` with
    * an event-time timeout): the events table staged as ONE file (one
    * micro-batch — in-batch processing sorts each user's slice, so the
    * fold equals the global time order at any SF), followed by two
    * one-row far-future SENTINEL files. Sentinel one advances the
    * watermark past every open session's `last + gap`; sentinel two
    * provides the trigger on which the timeouts actually fire —
    * without them, AvailableNow would end with every corpus-final
    * session still open and the gate would silently under-count. The
    * sentinel user's rows are filtered from the result. This is the
    * flush discipline any bounded replay through timeout-based custom
    * state needs; a live deployment never stops, so only the replay
    * shape requires it.
    */
  def replaySessionizeStateful(spark: SparkSession, dir: String,
      gapMs: Long = 30L * 60 * 1000): DataFrame = {
    import spark.implicits._
    val stage = java.nio.file.Files.createTempDirectory("graft_sessstate")
    def stageOne(df: DataFrame, idx: Int): Unit = {
      val tmp = s"$stage/tmp_$idx"
      df.coalesce(1).write.parquet(tmp)
      val single = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no parquet part file staged in $tmp"))
      val dst = new java.io.File(s"$stage/load_$idx.parquet")
      java.nio.file.Files.move(single.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + idx * 60000L)
      ()
    }
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("ts"), col("event_type"), col("user_id"))
    stageOne(ev, 0)
    val sentinel = Seq(
      (java.sql.Timestamp.valueOf("2099-01-01 00:00:00"), "flush", -1L))
      .toDF("ts", "event_type", "user_id")
    stageOne(sentinel, 1)
    stageOne(sentinel.withColumn("ts",
      col("ts") + org.apache.spark.sql.functions.expr("INTERVAL 1 MINUTE")), 2)
    val schema = spark.read.parquet(s"$stage/load_0.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)
    val out = EventStream.sessionizeStateful(src.as[SEvent], gapMs).toDF()
    val name = s"graft_replay_${runId.incrementAndGet()}"
    val partsKey = "spark.sql.shuffle.partitions"
    val prev = spark.conf.getOption(partsKey)
    spark.conf.set(partsKey, "8")
    try {
      val q = out.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(partsKey, v)
      case None => spark.conf.unset(partsKey)
    }
    spark.table(name).filter(col("user_id") =!= -1L)
  }

  /** Exactly-once ingest over an at-least-once delivery channel: stage
    * `copies` IDENTICAL deliveries of the events table as mtime-ordered
    * files, stream them one micro-batch each (`maxFilesPerTrigger = 1`)
    * through `dropDuplicatesWithinWatermark(keys)` in APPEND mode.
    * Every row of delivery 2..n finds its key already in the dedup
    * state and is suppressed, so the sink holds exactly one copy of the
    * table — the redelivery/backfill-overlap case every production
    * file-drop ingest hits, gated against the plain batch table.
    *
    * The watermark delay must cover the redelivery horizon — here the
    * full table span, so no state evicts mid-replay and the equivalence
    * is exact. Production sizes it to the channel's actual redelivery
    * window; state is then bounded by keys-per-window, not corpus size
    * (that bounded-state trade is the point of
    * `dropDuplicatesWithinWatermark` over plain `dropDuplicates`).
    */
  def replayRedelivered(spark: SparkSession, dir: String,
      keys: Seq[String], watermark: String = "35 days",
      copies: Int = 2): DataFrame = {
    require(copies >= 2, "a redelivery replay needs at least 2 deliveries")
    val stage = java.nio.file.Files.createTempDirectory("graft_redeliver")
    val src = java.nio.file.Paths.get(s"$dir/events.parquet")
    // the table may be one bare file (driver testdata) or a
    // Spark-written directory of part files (scale replicas) — stage
    // every data file of each delivery, mtime-ordered so all of
    // delivery i's batches precede delivery i+1's (each file is its
    // own micro-batch; exactly-once must hold at ANY batch granularity)
    val srcFiles: Seq[java.nio.file.Path] =
      if (java.nio.file.Files.isDirectory(src)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(src).iterator().asScala
          .filter(p => p.getFileName.toString.endsWith(".parquet") &&
            !p.getFileName.toString.startsWith("_") &&
            !p.getFileName.toString.startsWith("."))
          .toSeq.sortBy(_.getFileName.toString)
      } else Seq(src)
    (0 until copies).foreach { i =>
      srcFiles.zipWithIndex.foreach { case (f, j) =>
        val dst = stage.resolve(f"delivery_${i}%03d_$j%05d.parquet")
        java.nio.file.Files.copy(f, dst)
        dst.toFile.setLastModified(1700000000000L + (i.toLong * srcFiles.size + j) * 60000L)
        ()
      }
    }
    val batchSchema = spark.read.parquet(stage.toString).schema
    val raw = spark.readStream.schema(batchSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)
    val events = normalizeTs(batchSchema, raw)
    val out = events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)
    val name = s"graft_replay_${runId.incrementAndGet()}"
    val partsKey = "spark.sql.shuffle.partitions"
    val prev = spark.conf.getOption(partsKey)
    spark.conf.set(partsKey, "8")
    try {
      val q = out.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(partsKey, v)
      case None => spark.conf.unset(partsKey)
    }
    spark.table(name)
  }
}
