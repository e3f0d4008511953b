package graft.sources

import graft.SparkSpecBase
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Crash-window spec for the compaction rename swap: construct every
  * intermediate on-disk state the swap can strand (kill between any
  * two steps), run [[SwapRecovery.recover]], and assert the index
  * serves EXACTLY what a fresh build over the shrunken corpus serves.
  * The tombstone mask must hold across every state — no crash window
  * may resurrect a retracted document.
  */
class SwapRecoverySpec extends SparkSpecBase {
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_swap_$tag").toString

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val delta = docs.filter(col("doc_id") % 10 === 0)
  private lazy val removed = docs.filter(col("doc_id") % 10 === 5)
    .select(col("doc_id"))

  private def serve(path: String): Seq[(Long, Long, Double, Boolean)] =
    Dedup.minhashNearDupsDelta(delta, docs,
        MinhashIndexStore.bandsTable(spark, path))
      .orderBy("doc_id").as[(Long, Long, Double, Boolean)].collect().toSeq

  private lazy val freshAnswer: Seq[(Long, Long, Double, Boolean)] = {
    val p = freshPath("fresh")
    MinhashIndexStore.build(
      docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5), p)
    serve(p)
  }

  /** A tombstoned index plus the compacted staging dir — the state
    * just before the first rename (every crash state derives from it
    * by applying a prefix of the remaining steps by hand).
    */
  private def stagedIndex(tag: String): (String, org.apache.hadoop.fs.FileSystem) = {
    val p = freshPath(tag)
    MinhashIndexStore.build(docs.filter(col("doc_id") % 10 =!= 0), p)
    MinhashIndexStore.delete(removed, p)
    MinhashIndexStore.bandsTable(spark, p)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("band").parquet(s"$p/bands_compacted")
    (p, SwapRecovery.fsOf(spark, p))
  }

  private def hp(s: String) = new org.apache.hadoop.fs.Path(s)

  test("crash before the swap began: staging dropped, mask still serves") {
    val (p, _) = stagedIndex("s1")
    assert(SwapRecovery.recover(spark, p, "bands") == "dropped_staging")
    assert(serve(p) == freshAnswer)
    assert(!new java.io.File(s"$p/bands_compacted").exists())
  }

  test("crash mid-swap (live renamed away): staging promoted, no resurrection") {
    val (p, fs) = stagedIndex("s2")
    fs.rename(hp(s"$p/bands"), hp(s"$p/bands_old"))
    assert(SwapRecovery.recover(spark, p, "bands") == "promoted_staging")
    assert(serve(p) == freshAnswer)
    // the retracted rows are physically gone after promotion
    assert(spark.read.parquet(s"$p/bands")
      .filter(col("doc_id") % 10 === 5).count() == 0L)
  }

  test("crash before cleanup (both live and old): old dropped") {
    val (p, fs) = stagedIndex("s3")
    fs.rename(hp(s"$p/bands"), hp(s"$p/bands_old"))
    fs.rename(hp(s"$p/bands_compacted"), hp(s"$p/bands"))
    assert(SwapRecovery.recover(spark, p, "bands") == "dropped_old")
    assert(serve(p) == freshAnswer)
    assert(!new java.io.File(s"$p/bands_old").exists())
  }

  test("only <layer>_old on disk is unreachable — recover refuses to guess") {
    // the five-step sequence can never strand this state (once live is
    // renamed aside, staging exists until promoted; after promotion
    // live exists) — restoring _old blind would be safe only while the
    // tombstone mask is guaranteed present, which recover can't verify
    val (p, fs) = stagedIndex("s5")
    fs.rename(hp(s"$p/bands"), hp(s"$p/bands_old"))
    fs.delete(hp(s"$p/bands_compacted"), true)
    intercept[IllegalStateException] {
      SwapRecovery.recover(spark, p, "bands")
    }
  }

  test("compact on an unrecoverable stranded layout aborts before the tombstone delete") {
    // strand all three dirs at once (out-of-band surgery): the
    // entry-recover refuses, compact throws, and the tombstone mask
    // MUST survive — falling through would resurrect retracted rows
    val (p, fs) = stagedIndex("s6")
    fs.mkdirs(hp(s"$p/bands_old"))
    intercept[IllegalStateException] {
      MinhashIndexStore.compact(spark, p)
    }
    assert(new java.io.File(s"$p/tombstones").exists(),
      "tombstones must outlive an aborted compact")
    assert(serve(p) == freshAnswer, "the mask must still serve")
  }

  test("renameOrThrow surfaces a failed rename instead of falling through") {
    // the local FS masks every false-return case (its rename falls
    // back to a parent-creating copy, and renaming onto an existing
    // dir NESTS — the FS-dependent hazards that make the entry-recover
    // + checked-rename pairing necessary), so pin the contract against
    // an FS that reports failure the way HDFS does: a Boolean false
    val refusing = new org.apache.hadoop.fs.RawLocalFileSystem() {
      override def rename(src: org.apache.hadoop.fs.Path,
          dst: org.apache.hadoop.fs.Path): Boolean = false
    }
    refusing.initialize(new java.net.URI("file:///"),
      spark.sparkContext.hadoopConfiguration)
    val err = intercept[IllegalStateException] {
      SwapRecovery.renameOrThrow(refusing, hp("/tmp/a"), hp("/tmp/b"))
    }
    assert(err.getMessage.contains("aborting"))
  }

  test("healthy layout is a no-op; completed compact still serves") {
    val (p, _) = stagedIndex("s4")
    // run the real compact to completion, then recover — nothing to do
    MinhashIndexStore.compact(spark, p)
    assert(SwapRecovery.recover(spark, p, "bands") == "clean")
    assert(serve(p) == freshAnswer)
  }
}
