package graft.sources

import graft.SparkSpecBase
import graft.operators.Multimodal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The multimodal frame-signature index lifecycle
  * ([[FrameSigIndexStore]]): the incremental serve must equal the
  * batch all-pairs operator restricted to the drop, append ≡ rebuild,
  * tombstone delete masks both pair orientations with the mask
  * surviving compaction, and a tamper test proving the STORED bytes
  * (not a recompute) drive the answer.
  */
class FrameSigIndexStoreSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val base = Multimodal.asMedia(docs.filter(col("doc_id") % 10 =!= 0))
  private lazy val drop = Multimodal.asMedia(docs.filter(col("doc_id") % 10 === 0))

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_fsig_$tag").toString

  private def pairs(df: DataFrame): Set[(Long, Long, Int, Int)] =
    df.select(col("doc_a"), col("doc_b"), col("frame_idx"), col("hamming"))
      .as[(Long, Long, Int, Int)].collect().toSet

  private lazy val batchAll: Set[(Long, Long, Int, Int)] =
    pairs(Multimodal.nearDupFrames(Multimodal.asMedia(docs)))

  test("delta serve equals the batch all-pairs operator restricted to the drop") {
    val p = freshPath("serve")
    FrameSigIndexStore.build(base, p)
    val served = pairs(FrameSigIndexStore.deltaPairs(drop,
      FrameSigIndexStore.bandsTable(spark, p)))
    val expected = batchAll.filter(t => t._1 % 10 == 0 || t._2 % 10 == 0)
    assert(served == expected)
    assert(served.nonEmpty, "gate data must exercise the cross and drop paths")
  }

  test("append ≡ rebuild: the rolled index serves the full batch answer") {
    val p = freshPath("roll")
    FrameSigIndexStore.build(base, p)
    FrameSigIndexStore.append(drop, p)
    // after the roll, a fresh probe (drop 2 = % 10 == 5 docs re-used as
    // a probe set) must see exactly what a rebuilt-over-union index sees
    val probe = Multimodal.asMedia(docs.filter(col("doc_id") % 10 === 5))
    val rolledBands = FrameSigIndexStore.bandsTable(spark, p)
      // the probe docs are already IN the rolled index (they were part
      // of base) — mask them out so the serve contract (drop disjoint
      // from index) holds for this probe replay
      .join(probe.toDF().select(col("doc_id")), Seq("doc_id"), "left_anti")
    val fresh = freshPath("roll_fresh")
    FrameSigIndexStore.build(
      Multimodal.asMedia(docs.filter(col("doc_id") % 10 =!= 5)), fresh)
    val servedRolled = pairs(FrameSigIndexStore.deltaPairs(probe, rolledBands))
    val servedFresh = pairs(FrameSigIndexStore.deltaPairs(probe,
      FrameSigIndexStore.bandsTable(spark, fresh)))
    assert(servedRolled == servedFresh)
  }

  test("tombstone delete masks retracted assets; compact purges, mask holds") {
    val p = freshPath("del")
    FrameSigIndexStore.build(base, p)
    val unmasked = pairs(FrameSigIndexStore.deltaPairs(drop,
      FrameSigIndexStore.bandsTable(spark, p)))
    assert(unmasked.nonEmpty)
    // retract stored-side PARTNERS of served pairs, so the mask is
    // provably non-vacuous: the masked answer must differ
    val removed: Set[Long] = unmasked.toSeq
      .flatMap(t => Seq(t._1, t._2)).filter(_ % 10 != 0).take(2).toSet
    assert(removed.nonEmpty)
    FrameSigIndexStore.delete(removed.toSeq.toDF("doc_id"), p)
    val servedMasked = pairs(FrameSigIndexStore.deltaPairs(drop,
      FrameSigIndexStore.bandsTable(spark, p)))
    val expected = unmasked.filter(t =>
      !removed.contains(t._1) && !removed.contains(t._2))
    assert(servedMasked == expected)
    assert(servedMasked != unmasked, "the mask must bite on gate data")
    // physical purge: compacted files no longer hold the retracted rows
    FrameSigIndexStore.compact(spark, p)
    assert(spark.read.parquet(s"$p/bands")
      .filter(col("doc_id").isin(removed.toSeq: _*)).count() == 0L)
    assert(!new java.io.File(s"$p/tombstones").exists())
    assert(pairs(FrameSigIndexStore.deltaPairs(drop,
      FrameSigIndexStore.bandsTable(spark, p))) == expected)
  }

  test("tamper: corrupting a stored signature changes the served answer") {
    val p = freshPath("tamper")
    FrameSigIndexStore.build(base, p)
    val before = pairs(FrameSigIndexStore.deltaPairs(drop,
      FrameSigIndexStore.bandsTable(spark, p)))
    // flip every stored signature's low bits in one band partition —
    // if the serve recomputed signatures from media instead of reading
    // the store, this could not move the answer
    val bands = spark.read.parquet(s"$p/bands")
      .withColumn("band", col("band").cast("int"))
    val tampered = bands.withColumn("sig_lo",
        when(col("band") === 0, col("sig_lo").bitwiseXOR(lit(0xffL)))
          .otherwise(col("sig_lo")))
      .withColumn("bv",
        when(col("band") === 0, col("sig_lo").bitwiseAND(lit(0xffffL)))
          .otherwise(col("bv")))
    val after = pairs(FrameSigIndexStore.deltaPairs(drop, tampered))
    assert(after != before, "the stored signatures must drive the serve")
  }
}
