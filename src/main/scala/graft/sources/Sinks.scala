package graft.sources

import graft.operators.MergeInto
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Warehouse-side writers — the load half of the reference's ETL.
  *
  * The reference lands every table in Snowflake with daily MERGE loads
  * (reference: astro-sdk-tutorial/dags/etl_s3_snowflake_f_events.py:
  * 87-96). On immutable storage the equivalents are:
  *  - append-only date-partitioned parquet for facts (partition pruning
  *    turns daily/backfill reads into file skips),
  *  - read-merge-overwrite for SCD-1 dims (the dim is ≪ the fact, so
  *    rewriting it per load is the cheap, atomic-enough option — a table
  *    format's row-level MERGE slots in here unchanged at 100 TB),
  *  - bucketed tables for repeated co-located joins on a hot key
  *    (both sides pre-hashed: the join plans with zero Exchange).
  */
object Sinks {

  /** Date-partitioned append — the fact-table landing pattern. */
  def appendPartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Append).partitionBy(partitionCol).parquet(path)

  /** Merge modes mirroring the reference's `if_conflicts` choices. */
  sealed trait MergeMode
  /** SCD-1: matched rows take the delta's values. */
  case object Update extends MergeMode
  /** Insert-if-absent: matched rows keep the stored values. */
  case object Ignore extends MergeMode

  /** Table refresh: merge the delta into the stored table and swap.
    * Returns the merged frame that was persisted.
    */
  def mergeDim(spark: SparkSession, path: String, delta: DataFrame,
      keys: Seq[String], updateCols: Seq[String],
      mode: MergeMode = Update): DataFrame = {
    val exists = try {
      spark.read.parquet(path).take(1).nonEmpty || true
    } catch { case _: Throwable => false }
    val merged = if (exists) mode match {
      case Update => MergeInto.upsert(spark.read.parquet(path), delta, keys,
        updateCols, broadcastDelta = true)
      case Ignore => MergeInto.insertIfAbsent(spark.read.parquet(path), delta, keys)
    } else delta
    // stage-then-swap: never collect to the driver, never overwrite the
    // input while reading it — distributed write to a staging dir, then
    // a filesystem rename (atomic on HDFS; fine for object stores too)
    val staging = new org.apache.hadoop.fs.Path(path + ".staging")
    val target = new org.apache.hadoop.fs.Path(path)
    merged.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(target)) fs.delete(target, true)
    fs.rename(staging, target)
    spark.read.parquet(path)
  }

  /** Small-file compaction: rewrite a table directory into
    * ceil(rows / rowsPerFile) files via stage-then-swap. Daily MERGE
    * loads fragment tables; compaction keeps scan task counts sane.
    */
  def compact(spark: SparkSession, path: String, rowsPerFile: Long): Long = {
    val df = spark.read.parquet(path)
    val rows = df.count()
    val files = math.max(1L, (rows + rowsPerFile - 1) / rowsPerFile).toInt
    val staging = new org.apache.hadoop.fs.Path(path + ".compacting")
    val target = new org.apache.hadoop.fs.Path(path)
    df.repartition(files).write.mode(SaveMode.Overwrite).parquet(staging.toString)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(target, true)
    fs.rename(staging, target)
    rows
  }

  /** Bucketed table write: pre-hash both join sides on the hot key so
    * later joins need no Exchange at all.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
}
