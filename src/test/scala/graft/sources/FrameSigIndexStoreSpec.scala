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

  // ---------------- rep-grain layout (bands + sizes + sizes_deltas)

  /** Synthetic replica corpus: every %10==1 doc twice, every %20==1 doc
    * a third time — twin groups of size 2 and 3 with content-keyed reps
    * at the ORIGINAL ids (min doc_id wins the election).
    */
  private lazy val twinned = {
    val b = Multimodal.asMedia(docs.filter(col("doc_id") % 10 === 1)).toDF()
    b.unionByName(b.withColumn("doc_id", col("doc_id") + 1000000000L))
      .unionByName(b.filter(col("doc_id") % 20 === 1)
        .withColumn("doc_id", col("doc_id") + 2000000000L))
      .as[graft.operators.MMRecord]
  }
  private lazy val repProbe =
    Multimodal.asMedia(docs.filter(col("doc_id") % 10 === 6))

  private def repRows(df: DataFrame): Seq[(Long, Long, Int, Int, Long, Long)] =
    df.select(col("rep_a"), col("rep_b"), col("frame_idx"), col("hamming"),
        col("n_a"), col("n_b"))
      .as[(Long, Long, Int, Int, Long, Long)].collect().toSeq.sorted

  private def sizesOf(p: String): Map[Long, Long] =
    FrameSigIndexStore.sizesTable(spark, p)
      .as[(Long, Long)].collect().toMap

  test("rep-grain compact rewrites the sizes layer; expiry cannot resurrect a size row") {
    // r16 ADVICE: compact rewrote only bands/, so a tombstoned rep's
    // size row was never physically purged, and after compact + expire
    // shrank the mask the stale row RESURRECTED in sizesTable —
    // contradicting the rep-takedown boundary ("masks its band rows
    // AND its size row") and compact's physical-retention guarantee.
    val p = freshPath("rep_compact")
    FrameSigIndexStore.buildRepKeyed(twinned, p)
    val victim = sizesOf(p).keys.min
    FrameSigIndexStore.delete(Seq(victim).toDF("doc_id"), p)
    assert(!sizesOf(p).contains(victim), "tombstone must mask the size row")
    FrameSigIndexStore.compact(spark, p)
    assert(spark.read.parquet(s"$p/sizes")
      .filter(col("doc_id") === victim).count() == 0L,
      "compact must physically purge the size row with the band rows")
    assert(spark.read.parquet(s"$p/bands")
      .filter(col("doc_id") === victim).count() == 0L)
    FrameSigIndexStore.expireTombstones(spark, p)
    assert(Tombstones.liveMask(spark, p, "doc_id").count() == 0L,
      "the purged takedown must expire (rows absent from BOTH layers)")
    assert(!sizesOf(p).contains(victim),
      "the expired mask must not resurrect the size row")
  }

  test("deltaReps fails loudly on a stored rep with band rows but no size row") {
    // r16 ADVICE: the inner size join silently DROPPED candidate pairs
    // in the torn-layer window; the serve must fail instead (sizes are
    // written before bands, so this state means out-of-band damage).
    val p = freshPath("rep_torn")
    FrameSigIndexStore.buildRepKeyed(base, p)
    // find a stored rep that actually partners with the drop, then
    // tear ITS size row out of the layer
    val served = repRows(FrameSigIndexStore.deltaReps(drop,
      FrameSigIndexStore.bandsTable(spark, p),
      FrameSigIndexStore.sizesTable(spark, p)))
    val probeIds = drop.toDF().select(col("doc_id"))
      .as[Long].collect().toSet
    val storedPartner = served.flatMap(t => Seq(t._1, t._2))
      .filterNot(probeIds.contains).headOption
      .getOrElse(fail("gate data must produce a cross candidate"))
    val torn = spark.read.parquet(s"$p/sizes")
      .filter(col("doc_id") =!= storedPartner)
      .drop("batch")
    val ex = intercept[Exception] {
      FrameSigIndexStore.deltaReps(drop,
        FrameSigIndexStore.bandsTable(spark, p),
        torn.select(col("doc_id"), col("n_copies"))).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("no size row"))),
      s"expected the loud torn-layer failure, got: $ex")
  }

  test("post-fold redelivery recomputes the ORIGINAL rep delta via the excluding tables") {
    // r16 ADVICE: if a micro-batch's appendRepBatch fold lands but the
    // checkpoint commit does not, the redelivered batch recomputes its
    // delta against an index containing its own reps — each
    // drop-internal pair re-emits ~3× (stored×drop in both
    // orientations + the internal join) and the overwritten sink batch
    // is no longer value-identical. Excluding the batch's own layer
    // restores recompute identity.
    val p = freshPath("rep_redeliver")
    FrameSigIndexStore.buildRepKeyed(twinned, p)
    val original = repRows(FrameSigIndexStore.deltaReps(repProbe,
      FrameSigIndexStore.bandsTable(spark, p),
      FrameSigIndexStore.sizesTable(spark, p)))
    assert(original.nonEmpty)
    // the fold lands; the commit "crashes"; the batch is redelivered
    FrameSigIndexStore.appendRepBatch(repProbe, p, 3L)
    val redelivered = repRows(FrameSigIndexStore.deltaReps(repProbe,
      FrameSigIndexStore.bandsTableExcluding(spark, p, 3L),
      FrameSigIndexStore.sizesTableExcluding(spark, p, 3L)))
    assert(redelivered == original,
      "the redelivered recompute must be value-identical to the original")
    // and the exclusion is LOAD-BEARING: the naive recompute against
    // the full store is NOT value-identical (the bug this fix closes)
    val naive = repRows(FrameSigIndexStore.deltaReps(repProbe,
      FrameSigIndexStore.bandsTable(spark, p),
      FrameSigIndexStore.sizesTable(spark, p)))
    assert(naive != original,
      "gate data must make the unexcluded recompute observably wrong")
    // first delivery is unaffected: the exclusion of a batch id that
    // has no layer yet is a no-op
    val firstDelivery = repRows(FrameSigIndexStore.deltaReps(
      Multimodal.asMedia(docs.filter(col("doc_id") % 10 === 7)),
      FrameSigIndexStore.bandsTableExcluding(spark, p, 9L),
      FrameSigIndexStore.sizesTableExcluding(spark, p, 9L)))
    val firstDeliveryFull = repRows(FrameSigIndexStore.deltaReps(
      Multimodal.asMedia(docs.filter(col("doc_id") % 10 === 7)),
      FrameSigIndexStore.bandsTable(spark, p),
      FrameSigIndexStore.sizesTable(spark, p)))
    assert(firstDelivery == firstDeliveryFull)
    // the exclusion is a PARTITION filter, not a scan-then-drop: the
    // excluded layer's files must leave the plan at listing time (the
    // scaladoc's 100 TB claim — a redelivered batch must not re-read
    // the whole stored index to skip its own layer)
    val excl = FrameSigIndexStore.bandsTableExcluding(spark, p, 3L)
    excl.collect()
    val scan = excl.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("Scan parquet"))
      .getOrElse(fail("expected a parquet scan leaf"))
    assert(scan.contains("PartitionFilters") && scan.contains("batch"),
      s"the batch exclusion must land in PartitionFilters, plan leaf: " +
        scan.take(400))
  }

  test("member-grain takedown: the n_copies decrement law applies exactly or fails loudly") {
    val p = freshPath("rep_member")
    FrameSigIndexStore.buildRepKeyed(twinned, p)
    val sizes0 = sizesOf(p)
    val r3 = sizes0.collectFirst { case (id, 3L) => id }
      .getOrElse(fail("twin layout must produce a group of 3"))
    val r2 = sizes0.collectFirst { case (id, 2L) => id }
      .getOrElse(fail("twin layout must produce a group of 2"))
    // EXACT: one copy leaves the group of 3 → the store serves exactly
    // like a store built over the corpus minus that member
    FrameSigIndexStore.deleteMembers(Seq(r3).toDF("doc_id"), p, 1L)
    assert(sizesOf(p)(r3) == 2L)
    val fresh = freshPath("rep_member_fresh")
    FrameSigIndexStore.buildRepKeyed(
      twinned.filter(col("doc_id") =!= r3 + 2000000000L), fresh)
    def serve(path: String) = repRows(FrameSigIndexStore.deltaReps(repProbe,
      FrameSigIndexStore.bandsTable(spark, path),
      FrameSigIndexStore.sizesTable(spark, path)))
    assert(serve(p) == serve(fresh),
      "decremented store must serve exactly like the corpus minus one member")
    // RETRY: the same takedown re-lands its own layer (validation
    // excludes it), leaving the state unchanged
    FrameSigIndexStore.deleteMembers(Seq(r3).toDF("doc_id"), p, 1L)
    assert(sizesOf(p)(r3) == 2L)
    // FAILS LOUDLY: a raw member id is not a stored rep
    val exMember = intercept[IllegalArgumentException] {
      FrameSigIndexStore.deleteMembers(
        Seq(r3 + 1000000000L).toDF("doc_id"), p, 2L)
    }
    assert(exMember.getMessage.contains("not a live stored rep"))
    // FAILS LOUDLY: over-decrement past the remaining copies
    val exOver = intercept[IllegalArgumentException] {
      FrameSigIndexStore.deleteMembers(
        Seq(r2, r2, r2).toDF("doc_id"), p, 2L)
    }
    assert(exOver.getMessage.contains("remain"))
    assert(sizesOf(p)(r2) == 2L, "a rejected takedown must write NOTHING")
    // EXHAUSTION: removing the last copies tombstones the whole group —
    // bands AND sizes leave the serve
    FrameSigIndexStore.deleteMembers(Seq(r2, r2).toDF("doc_id"), p, 3L)
    assert(!sizesOf(p).contains(r2))
    assert(FrameSigIndexStore.bandsTable(spark, p)
      .filter(col("doc_id") === r2).count() == 0L,
      "an exhausted group's band rows must leave the serve")
    // and the whole lifecycle compacts: delta rows + size row + band
    // rows physically purge together
    FrameSigIndexStore.compact(spark, p)
    Seq("bands", "sizes", "sizes_deltas").foreach { layer =>
      assert(spark.read.parquet(s"$p/$layer")
        .filter(col("doc_id") === r2).count() == 0L,
        s"$layer must physically purge the exhausted group")
    }
    assert(sizesOf(p)(r3) == 2L,
      "compact must preserve surviving deltas' folded sizes")
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
