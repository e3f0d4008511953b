package graft.streaming

import graft.operators.IncrementalAgg
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Incremental aggregate maintenance as a STREAM: each micro-batch
  * folds into the stored mergeable-state table
  * ([[graft.operators.IncrementalAgg]]) — the continuous form of the
  * reference's full view rebuild, maintained at delta cost.
  *
  * Unlike the SCD2 sink (whose merge is naturally idempotent — a
  * re-delivered change finds its version already closed), an aggregate
  * FOLD double-counts on replay. Exactly-once therefore needs a batch
  * marker, and the marker must move ATOMICALLY with the data: it is
  * written as `_applied_batch` INSIDE the staging directory before the
  * staging→live rename, so the table and "which batch produced it"
  * swap as one unit (underscore-prefixed files are invisible to
  * parquet directory reads). A crash anywhere leaves either the old
  * table+marker or the new table+marker — never a folded table that
  * would accept the same batch again. This is the transactional
  * foreachBatch pattern every at-least-once channel needs at 100 TB,
  * where "just re-run the day" is not an option.
  */
object IncrFeed {

  private def hfs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p, p.getFileSystem(spark.sparkContext.hadoopConfiguration))
  }

  /** Last batch id folded into `table`, or -1 for a fresh table. */
  private[streaming] def appliedBatch(spark: SparkSession, table: String): Long = {
    val (p, fs) = hfs(spark, s"$table/_applied_batch")
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8"))
        .readLine().trim.toLong
      finally in.close()
    }
  }

  /** One exactly-once fold step: apply `batch` as batch `id` unless the
    * table's atomic marker says it (or a later batch) already landed —
    * a REPLAYED batch is a no-op, never a double count.
    */
  def applyBatch(batch: DataFrame, id: Long, path: String,
      keys: Seq[String], spec: IncrementalAgg.Spec): Unit = {
    val spark = batch.sparkSession
    val table = s"$path/data"
    val (tablePath, fs) = hfs(spark, table)
    if (id > appliedBatch(spark, table)) {
      val partial = IncrementalAgg.partial(batch, keys, spec)
      val merged =
        if (fs.exists(tablePath))
          IncrementalAgg.fold(spark.read.parquet(table), partial, keys, spec)
        else partial
      val staging = s"$table.staging"
      // the staging write is the action that drains the read of the
      // LIVE table — it completes before the swap renames anything
      merged.write.mode("overwrite").parquet(staging)
      val out = fs.create(
        new org.apache.hadoop.fs.Path(s"$staging/_applied_batch"), true)
      try out.write(id.toString.getBytes("UTF-8")) finally out.close()
      graft.sources.Sinks.swapInto(spark, staging, table)
    }
  }

  /** foreachBatch sink maintaining `path`/data as the folded aggregate
    * state of every batch seen exactly once.
    */
  def incrAggSink(deltas: DataFrame, path: String, keys: Seq[String],
      spec: IncrementalAgg.Spec): DataStreamWriter[Row] =
    deltas.writeStream.foreachBatch { (batch: Dataset[Row], id: Long) =>
      applyBatch(batch.toDF(), id, path, keys, spec)
    }

  /** File-replay of drops through [[incrAggSink]]: stages each drop as
    * ONE parquet file (mtime-ordered), streams them one micro-batch
    * each, returns the maintained table. `workDir` is recreated from
    * scratch — the replay always starts from an empty table and a
    * fresh checkpoint. The gate compares the result to the ONE-SHOT
    * aggregate over all drops (the same oracle as the batch fold).
    */
  def replayIncrAgg(spark: SparkSession, drops: Seq[DataFrame],
      keys: Seq[String], spec: IncrementalAgg.Spec,
      workDir: String): DataFrame = {
    require(drops.nonEmpty, "replayIncrAgg needs at least one drop")
    val (root, fs) = hfs(spark, workDir)
    if (fs.exists(root)) fs.delete(root, true)
    val stage = s"$workDir/stage"
    fs.mkdirs(new org.apache.hadoop.fs.Path(stage))
    drops.zipWithIndex.foreach { case (df, i) =>
      val tmp = s"$workDir/tmp_$i"
      df.coalesce(1).write.parquet(tmp)
      val single = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no parquet part file staged in $tmp"))
      val dst = new java.io.File(s"$stage/load_$i.parquet")
      java.nio.file.Files.move(single.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + i * 60000L)
      ()
    }
    val schema = spark.read.parquet(s"$stage/load_0.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
    val partsKey = "spark.sql.shuffle.partitions"
    val prev = spark.conf.getOption(partsKey)
    spark.conf.set(partsKey, "8")
    try {
      val q = incrAggSink(src, s"$workDir/table", keys, spec)
        .option("checkpointLocation", s"$workDir/chk")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(partsKey, v)
      case None => spark.conf.unset(partsKey)
    }
    spark.read.parquet(s"$workDir/table/data")
  }
}
