package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The deletion-vector tombstone layout shared by the retractable
  * index stores ([[MinhashIndexStore]], [[FrameSigIndexStore]],
  * [[EmbLshIndexStore]], [[IvfIndexStore]]) — the read/derive side in
  * ONE place so the serve mask and the compaction paths can never
  * drift apart on layer semantics (the r14 review finding: the
  * framesig keyed compact re-implemented the tombstone read inline).
  *
  * Layout under a store `path`:
  *
  *  - `tombstones/` — append-only retracted-id list ([[exists]]/
  *    [[all]]). Every `delete()` appends; a crash mid-append leaves a
  *    partial id list, which only UNDER-masks ids the retraction never
  *    acknowledged — the delete simply retries. Appends are the only
  *    mutation, so no swap choreography is ever needed on this layer.
  *  - `tombstones_expired/` — append-only EXPIRED-id ledger
  *    ([[appendExpired]]): ids whose retracted rows are physically
  *    absent from every live layer AND whose redelivery protection the
  *    caller has released (see the stores' `expireTombstones`). The
  *    serve mask is [[liveMask]] = tombstones ∖ expired, so the
  *    broadcast anti-join every serve pays stays bounded by
  *    OUTSTANDING takedowns instead of growing monotonically across
  *    the store's life. Append-only on purpose: physically shrinking
  *    `tombstones/` in place would need a replace swap with a crash
  *    window in which the mask directory does not exist — a reader in
  *    that window serves retracted rows UNMASKED. With two append-only
  *    ledgers, every crash state under-expires (masks too much), never
  *    under-masks. Both ledgers are O(total takedowns) id lists — at
  *    100 TB a vanishing fraction of any layer they mask.
  *  - `tombstones_purged/` — append-only ledger of ids a compact has
  *    ACTUALLY physically purged ([[appendPurged]]/[[purged]]); the
  *    expiry gate, so pre-emptive (delete-before-ingest) takedowns can
  *    never be released by expiry.
  */
private[sources] object Tombstones {

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(s"$path/tombstones")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def existsExpired(spark: SparkSession, path: String): Boolean = {
    val p = new Path(s"$path/tombstones_expired")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** EVERY id ever retracted — what a physical purge (compact rewrite)
    * folds out, including expired ids (by the expire contract those
    * have no live rows left, so folding them is a no-op; keeping them
    * in the purge set makes a contract violation self-heal instead of
    * resurrecting rows).
    */
  def all(spark: SparkSession, path: String, idCol: String): DataFrame =
    spark.read.parquet(s"$path/tombstones").select(col(idCol)).distinct()

  /** The serve mask: outstanding tombstones minus the expired ledger. */
  def liveMask(spark: SparkSession, path: String, idCol: String): DataFrame = {
    val t = all(spark, path, idCol)
    if (existsExpired(spark, path))
      t.join(spark.read.parquet(s"$path/tombstones_expired")
          .select(col(idCol)).distinct(),
        Seq(idCol), "left_anti")
    else t
  }

  /** Record ids as expired (append-only — see the layout contract). */
  def appendExpired(ids: DataFrame, path: String, idCol: String): Unit =
    ids.select(col(idCol))
      .write.mode(SaveMode.Append).parquet(s"$path/tombstones_expired")

  private def existsPurged(spark: SparkSession, path: String): Boolean = {
    val p = new Path(s"$path/tombstones_purged")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Ids a compact has ACTUALLY physically purged (they had live rows
    * when the rewrite ran). Expiry is gated on membership here: a
    * PRE-EMPTIVE takedown — delete issued before the content was ever
    * appended — has no rows for any compact to purge, so it never
    * enters this ledger and never leaves the serve mask; a later
    * first-time append of that id stays masked (the r15 review
    * finding: the rows-absent test alone expired pre-ingest takedowns
    * and a subsequent first append served unmasked).
    */
  def purged(spark: SparkSession, path: String, idCol: String): DataFrame =
    if (existsPurged(spark, path))
      spark.read.parquet(s"$path/tombstones_purged")
        .select(col(idCol)).distinct()
    else
      all(spark, path, idCol).limit(0)

  /** Record ids as physically purged by a compact rewrite (append-only,
    * written BEFORE the swap lands: if the swap then crashes and rolls
    * back, the over-recorded id still has live rows, and the expire
    * path's rows-absent conjunct refuses to release it — every crash
    * state under-expires, never unmasks).
    */
  def appendPurged(ids: DataFrame, path: String, idCol: String): Unit =
    ids.select(col(idCol))
      .write.mode(SaveMode.Append).parquet(s"$path/tombstones_purged")

  /** Drop both ledgers — the FLAT-store compact epilogue (its rewrite
    * physically purged everything and flat stores need no redelivery
    * guard, so the zero-masking serve contract clears the mask).
    */
  def clear(spark: SparkSession, path: String): Unit = {
    val fs = SwapRecovery.fsOf(spark, path)
    fs.delete(new Path(s"$path/tombstones"), true)
    fs.delete(new Path(s"$path/tombstones_expired"), true)
    fs.delete(new Path(s"$path/tombstones_purged"), true)
    ()
  }
}
