package graft.sources

import graft.operators.MergeInto
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Warehouse-side writers — the load half of the reference's ETL.
  *
  * The reference lands every table in Snowflake with daily MERGE loads
  * (reference: astro-sdk-tutorial/dags/etl_s3_snowflake_f_events.py:
  * 87-96). On immutable storage the equivalents are:
  *  - date-partitioned parquet for facts, loaded by the
  *    PARTITION-SCOPED merge ([[mergeFactByDate]] — only the drop's
  *    dates are read or rewritten; partition pruning also turns
  *    daily/backfill reads into file skips),
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

  /** Stage-then-swap with a backup window: the previous table version
    * survives as `.backup` until the new one is in place, so a crash
    * mid-swap never leaves the path empty; rename failures raise
    * instead of being silently ignored.
    */
  /** If a previous swap crashed between its two renames, the table is
    * missing and the backup holds the only copy — restore it before
    * anything reads, writes, or deletes.
    */
  private def recoverIfNeeded(fs: org.apache.hadoop.fs.FileSystem,
      target: org.apache.hadoop.fs.Path): Unit = {
    val backup = new org.apache.hadoop.fs.Path(target.toString + ".backup")
    if (!fs.exists(target) && fs.exists(backup))
      require(fs.rename(backup, target), s"could not recover $target from backup")
  }

  private[graft] def swapInto(spark: SparkSession, stagingPath: String, path: String): Unit = {
    val staging = new org.apache.hadoop.fs.Path(stagingPath)
    val target = new org.apache.hadoop.fs.Path(path)
    val backup = new org.apache.hadoop.fs.Path(path + ".backup")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverIfNeeded(fs, target)
    if (fs.exists(backup)) fs.delete(backup, true)
    val hadTarget = fs.exists(target)
    if (hadTarget)
      require(fs.rename(target, backup), s"could not back up $path")
    if (!fs.rename(staging, target)) {
      if (hadTarget) fs.rename(backup, target)
      throw new java.io.IOException(s"could not swap $stagingPath into $path")
    }
    if (hadTarget) fs.delete(backup, true)
  }

  private def tableExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverIfNeeded(fs, p)
    fs.exists(p)
  }

  /** Table refresh: merge the delta into the stored table and swap.
    * Returns the merged frame that was persisted. Existence is a
    * filesystem check, NOT a read attempt — a transient read failure
    * must surface, never silently replace the table with the delta.
    *
    * With `pinResult` (the default) the returned frame is
    * `localCheckpoint`ed, NOT a lazy re-read of the path: a lazy handle
    * snapshots the file listing at creation, so the next merge/compact
    * swap would silently invalidate it (FILE_NOT_EXIST on first
    * action). The pin costs block-manager space until the handle is
    * GC'd — cheap for dims, a non-starter for fact-sized tables: pass
    * `pinResult = false` there and treat the returned lazy read as
    * valid only until the next load's swap.
    */
  def mergeDim(spark: SparkSession, path: String, delta: DataFrame,
      keys: Seq[String], updateCols: Seq[String],
      mode: MergeMode = Update,
      broadcastDelta: Boolean = true,
      pinResult: Boolean = true): DataFrame = {
    val merged = if (tableExists(spark, path)) mode match {
      case Update => MergeInto.upsert(spark.read.parquet(path), delta, keys,
        updateCols, broadcastDelta = broadcastDelta)
      case Ignore => MergeInto.insertIfAbsent(spark.read.parquet(path), delta, keys)
    } else delta
    persistAndSwap(spark, merged, path, pinResult)
  }

  /** Shared persist policy for the merge writers: stage, swap, and
    * return either the block-manager-pinned merged frame (survives
    * later swaps — for dims) or a lazy read of the live table (valid
    * only until the next swap — for fact-sized results).
    */
  private def persistAndSwap(spark: SparkSession, merged: DataFrame,
      path: String, pinResult: Boolean): DataFrame =
    if (pinResult) {
      val pinned = merged.localCheckpoint()
      pinned.write.mode(SaveMode.Overwrite).parquet(path + ".staging")
      swapInto(spark, path + ".staging", path)
      pinned
    } else {
      merged.write.mode(SaveMode.Overwrite).parquet(path + ".staging")
      swapInto(spark, path + ".staging", path)
      spark.read.parquet(path)
    }

  /** Partition-scoped fact MERGE — the 100 TB load path: rewrite ONLY
    * the date partitions the delta touches, leaving every other date's
    * files unread and unmoved.
    *
    * The reference reloads its fact daily with a full-table MERGE
    * (etl_s3_snowflake_f_events.py:87-96 — Snowflake hides the rewrite
    * cost); on immutable parquet the equivalent full-table
    * stage-and-swap rewrites the WHOLE warehouse per load, which at
    * 100 TB is the one genuine scale-killer. Its daily semantics make
    * the partition-scoped form exact: an event's time — hence its date
    * — is immutable, so a drop (on-time or late) can only create or
    * update rows WITHIN its own event dates. Mechanics per load:
    *
    *  1. the delta's touched date set (a distinct-collect bounded by
    *     the drop's calendar span — single-digit rows for a daily
    *     feed, never data-sized),
    *  2. a pruned read of the stored fact: `date ∈ touched` is a
    *     PARTITION filter, so untouched dates are eliminated in the
    *     file manifest and never scanned,
    *  3. [[graft.operators.MergeInto.upsert]] of the drop into that
    *     slice (shuffle merge — both sides are drop/day-sized),
    *  4. stage-and-swap of ONLY the touched `date=...` directories,
    *     each through a crash-safe backup parked OUTSIDE the table
    *     root (`<path>.pbackup/` — a backup inside the root would be
    *     picked up by partition discovery during the crash window).
    *
    * PRECONDITION (holds for the fact by construction): the merge key
    * determines the partition date — a key's stored row lives in the
    * same date partition its re-delivery routes to. A key that MOVED
    * dates would leave its old row in an untouched partition; that
    * cannot happen when the date derives from an immutable event time.
    * NULL dates are rejected in-plan (they would silently land in a
    * default partition).
    *
    * Returns a lazy read of the live table (the fact-sized
    * `pinResult = false` contract — valid until the next load's swap).
    */
  def mergeFactByDate(spark: SparkSession, path: String, delta: DataFrame,
      keys: Seq[String], updateCols: Seq[String],
      dateCol: String = "event_date"): DataFrame = {
    import org.apache.spark.sql.functions.{lit, raise_error, when}
    recoverPartitionSwaps(spark, path)
    val d = delta.filter(
      when(col(dateCol).isNull,
        raise_error(lit(s"mergeFactByDate: NULL $dateCol in delta — " +
          "rows would land in a default partition"))).otherwise(lit(true)))
    if (!tableExists(spark, path)) {
      val nDates = d.select(col(dateCol)).distinct().count()
      clusterByDate(d, dateCol, nDates)
        .write.partitionBy(dateCol).parquet(path + ".staging")
      swapInto(spark, path + ".staging", path)
    } else {
      val (merged, touched) = factMergeFrames(spark, path, d, keys,
        updateCols, dateCol)
      val staging = path + ".staging_parts"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(staging), true)
      clusterByDate(merged, dateCol, touched.size.toLong)
        .write.mode(SaveMode.Overwrite).partitionBy(dateCol)
        .parquet(staging)
      touched.foreach { v =>
        val dirName = s"$dateCol=$v"
        swapPartition(spark, s"$staging/$dirName", path, dirName)
      }
      fs.delete(new org.apache.hadoop.fs.Path(staging), true)
      // all swaps landed → the backup root is empty scaffolding
      val backupRoot = new org.apache.hadoop.fs.Path(path + ".pbackup")
      if (fs.exists(backupRoot) && fs.listStatus(backupRoot).isEmpty)
        fs.delete(backupRoot, true)
    }
    spark.read.parquet(path)
  }

  /** Cluster rows by their date partition (plus a hash salt that
    * spreads each date over the session's parallelism) before a
    * `partitionBy(dateCol)` write. Without this every write task holds
    * rows of EVERY date and opens a file per (task × date) — the merge
    * measured 6 files per date per load at bench scale (180 tiny files
    * after one load; guide §6's small-files trap), and every later
    * merge, swap and scan paid the per-file overhead. One extra
    * shuffle of the DROP (never the warehouse) bounds the layout at
    * `salt` files per date while keeping ~`spark.sql.shuffle.partitions`
    * write tasks in flight; at 100 TB the salt is what lets a single
    * hot date still write in parallel with sane file sizes.
    */
  private def clusterByDate(df: DataFrame, dateCol: String,
      nDates: Long): DataFrame = {
    val parallelism = df.sparkSession.sessionState.conf.numShufflePartitions
    // files-per-date scales with the session's parallelism over the
    // drop's date span: a month-span gate drop (≈30 dates, 32 slots)
    // gets 1 file per date; a single-date daily feed on a 200-core
    // cluster still writes 200-way parallel. The salt is deterministic
    // (hash of the row, never rand()), so task retries re-land
    // identical rows (SPARK-38388).
    val filesPerDate = math.max(1L, parallelism / math.max(1L, nDates))
    val salt = org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.xxhash64(df.columns.map(col).toIndexedSeq: _*),
      org.apache.spark.sql.functions.lit(filesPerDate))
    df.repartition(parallelism, col(dateCol), salt)
  }

  /** The pruned-merge plan [[mergeFactByDate]] executes, exposed for
    * the plan audit: (merged frame over ONLY the touched partitions,
    * touched date values). The fact scan inside `merged` must carry
    * `dateCol IN touched` as a partition filter — the audit asserts
    * untouched partitions are pruned from the file manifest.
    */
  private[graft] def factMergeFrames(spark: SparkSession, path: String,
      delta: DataFrame, keys: Seq[String], updateCols: Seq[String],
      dateCol: String): (DataFrame, Seq[Any]) = {
    val touched = delta.select(col(dateCol)).distinct()
      .collect().map(_.get(0)).toSeq
    val storedTouched = spark.read.parquet(path)
      .filter(col(dateCol).isin(touched: _*))
    (MergeInto.upsert(storedTouched, delta, keys, updateCols,
      broadcastDelta = false), touched)
  }

  /** Crash-safe swap of ONE partition directory, with the backup
    * parked under `<tablePath>.pbackup/` — outside the table root, so
    * a reader during the crash window never sees a `date=X.backup`
    * pseudo-partition. Rename failures raise, mirroring [[swapInto]].
    */
  private def swapPartition(spark: SparkSession, stagingDir: String,
      tablePath: String, dirName: String): Unit = {
    val target = new org.apache.hadoop.fs.Path(s"$tablePath/$dirName")
    val backupRoot = new org.apache.hadoop.fs.Path(tablePath + ".pbackup")
    val backup = new org.apache.hadoop.fs.Path(backupRoot, dirName)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(backupRoot)
    if (fs.exists(backup)) fs.delete(backup, true)
    val had = fs.exists(target)
    if (had)
      require(fs.rename(target, backup), s"could not back up $target")
    if (!fs.rename(new org.apache.hadoop.fs.Path(stagingDir), target)) {
      if (had) fs.rename(backup, target)
      throw new java.io.IOException(
        s"could not swap $stagingDir into $target")
    }
    if (had) fs.delete(backup, true)
  }

  /** If a previous partition swap crashed between its renames, the
    * backup under `<path>.pbackup/` holds the only copy of that
    * partition — restore any such directory (or drop the backup when
    * the partition made it into place) before anything reads or
    * merges. The per-partition analogue of [[recoverIfNeeded]].
    */
  private def recoverPartitionSwaps(spark: SparkSession, path: String): Unit = {
    val backupRoot = new org.apache.hadoop.fs.Path(path + ".pbackup")
    val fs = backupRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(backupRoot)) return
    fs.listStatus(backupRoot).foreach { st =>
      val target = new org.apache.hadoop.fs.Path(path, st.getPath.getName)
      if (!fs.exists(target))
        require(fs.rename(st.getPath, target),
          s"could not recover $target from partition backup")
      else fs.delete(st.getPath, true)
    }
    fs.delete(backupRoot, true)
  }

  /** Key-dim refresh with STABLE dense surrogate keys across loads:
    * only genuinely new natural keys get ids, continuing after the
    * stored maximum — re-delivered keys keep their original surrogate.
    * (The reference renumbers each drop locally, which collides across
    * incremental loads; this is the append-stable correction.)
    */
  def mergeDimSurrogate(spark: SparkSession, path: String, deltaKeys: DataFrame,
      keyCol: String, guidCol: String, pinResult: Boolean = true): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, max}
    val fresh = deltaKeys.select(col(keyCol)).distinct()
    val merged = if (tableExists(spark, path)) {
      val stored = spark.read.parquet(path)
      // null-safe anti join: a plain equi-anti never matches NULL, so a
      // NULL natural key would be re-inserted with a fresh surrogate on
      // every incremental load
      val newKeys = fresh.alias("f")
        .join(stored.select(col(keyCol)).alias("st"),
          col(s"f.$keyCol") <=> col(s"st.$keyCol"), "left_anti")
        .select(col(s"f.$keyCol"))
      // coalesce: an existing-but-empty dim has max(guid) = NULL.
      // The offset rides the plan as a broadcast 1-row aggregate
      // (crossJoin(broadcast(<1-row agg>)) — the repo's scalar-join
      // convention) instead of a driver head() action: one fewer job
      // per dim merge, and the stored table is only read inside the
      // one plan.
      val offset = org.apache.spark.sql.functions.broadcast(stored
        .agg(org.apache.spark.sql.functions.coalesce(max(col(guidCol)), lit(0L))
          .as("__guid_offset")))
      stored.unionByName(
        graft.operators.SurrogateKey.withDenseId(newKeys, Seq(keyCol), guidCol)
          .crossJoin(offset)
          .withColumn(guidCol, col(guidCol) + col("__guid_offset"))
          .drop("__guid_offset"))
    } else graft.operators.SurrogateKey.withDenseId(fresh, Seq(keyCol), guidCol)
    persistAndSwap(spark, merged, path, pinResult)
  }

  /** SCD2 history refresh: fold one load into the stored history
    * table (or initialize it) and swap. Re-merging the SAME delta with
    * the SAME load date is a no-op — unchanged rows are skipped and a
    * re-delivered change finds its version already closed — which is
    * what makes this safe under at-least-once delivery (streaming
    * foreachBatch replays, backfill re-runs).
    */
  def mergeDimScd2(spark: SparkSession, path: String, delta: DataFrame,
      keys: Seq[String], tracked: Seq[String],
      loadDate: org.apache.spark.sql.Column,
      broadcastDelta: Boolean = true,
      pinResult: Boolean = true): DataFrame = {
    val merged = if (tableExists(spark, path))
      graft.operators.Scd2.merge(spark.read.parquet(path), delta, keys,
        tracked, loadDate, broadcastDelta = broadcastDelta)
    else graft.operators.Scd2.init(delta, keys, loadDate)
    persistAndSwap(spark, merged, path, pinResult)
  }

  /** Small-file compaction: rewrite a table directory into
    * ceil(rows / rowsPerFile) files via stage-then-swap. Daily MERGE
    * loads fragment tables; compaction keeps scan task counts sane.
    */
  def compact(spark: SparkSession, path: String, rowsPerFile: Long): Long = {
    require(tableExists(spark, path), s"no table at $path") // also recovers backups
    val df = spark.read.parquet(path)
    val rows = df.count()
    val files = math.max(1L, (rows + rowsPerFile - 1) / rowsPerFile).toInt
    df.repartition(files).write.mode(SaveMode.Overwrite).parquet(path + ".compacting")
    swapInto(spark, path + ".compacting", path)
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

  /** SCD2 history compaction: rewrite the monotonically growing
    * history PARTITIONED BY (is_current, close year). The current
    * slice — the only part [[graft.operators.Scd2.merge]] ever joins —
    * becomes one partition subtree; closed versions land in the year
    * they were closed. The payoff is on the as-of READ path
    * ([[graft.operators.Scd2.asOfPruned]]): a version closed before a
    * fact window's lower bound cannot own any fact in the window, and
    * because the close year is a partition column those versions are
    * eliminated in the file manifest — the scan itself shrinks, which
    * is what keeps a years-old history readable instead of paying the
    * full accumulated-version scan on every query.
    */
  def compactScd2(history: DataFrame, path: String): Unit =
    history
      .withColumn(graft.operators.Scd2.CloseYearCol,
        org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.year(
            col(graft.operators.Scd2.ToCol)),
          org.apache.spark.sql.functions.lit(9999)))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(graft.operators.Scd2.CurrentCol,
        graft.operators.Scd2.CloseYearCol)
      .parquet(path)

  /** Read a [[compactScd2]] layout (partition columns come back typed
    * from directory values).
    */
  def readScd2(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .withColumn(graft.operators.Scd2.CurrentCol,
        col(graft.operators.Scd2.CurrentCol).cast("boolean"))
      .withColumn(graft.operators.Scd2.CloseYearCol,
        col(graft.operators.Scd2.CloseYearCol).cast("int"))
}
