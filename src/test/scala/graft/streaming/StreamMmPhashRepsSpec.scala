package graft.streaming

import graft.SparkSpecBase
import graft.operators.Multimodal
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The REP-GRAIN streamed frame-sig ingest
  * ([[StreamReplay.replayMmPhashRepDrops]]) — the bounded serving form
  * of `stream_mm_phash`. The contract under test: expanding every
  * sink row by the carried group sizes' membership (cross rows →
  * group(rep_a) × group(rep_b), self rows → within-group pairs)
  * reconstructs EXACTLY the pair-grain streamed answer (each member
  * pair once, at the same hamming), while the sink itself stays at
  * distinct-asset grain and obeys the same arrival-order law.
  */
class StreamMmPhashRepsSpec extends SparkSpecBase {
  import spark.implicits._

  private type Pair = (Long, Long, Int, Int) // doc_a, doc_b, frame, ham
  private type RepRow = (Long, Long, Int, Int, Long, Long)

  private lazy val run: (String, org.apache.spark.sql.DataFrame) =
    StreamReplay.replayMmPhashRepDropsWithSink(spark, sfDir)

  private def repRowsOf(df: org.apache.spark.sql.DataFrame): Seq[RepRow] =
    df.select(col("rep_a"), col("rep_b"), col("frame_idx"),
        col("hamming"), col("n_a"), col("n_b"))
      .as[RepRow].collect().toSeq

  // per-CLASS twin groups (base / drop0 / drop1 — disjoint residue id
  // spaces), keyed by content; media bytes are UTF-8 of the text
  private lazy val members: Map[Long, Seq[Long]] = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    def cls(id: Long): Int =
      if (id % 10 == 5) 1 else if (id % 10 == 0) 2 else 0
    docs.groupBy(d => (cls(d._1), d._2)).map { case (_, ds) =>
      val ids = ds.map(_._1).sorted.toSeq
      ids.min -> ids
    }
  }

  test("expanding the rep sink by membership reconstructs the pair-grain stream exactly") {
    val rows = repRowsOf(run._2)
    assert(rows.nonEmpty)
    val expanded = rows.flatMap { case (ra, rb, f, h, na, nb) =>
      val ga = members(ra)
      assert(na == ga.size.toLong, s"carried n_a mismatch for rep $ra")
      if (ra == rb) {
        assert(h == 0, "self rows must carry hamming 0")
        for (i <- ga.indices; j <- (i + 1) until ga.size)
          yield (ga(i), ga(j), f, h)
      } else {
        val gb = members(rb)
        assert(nb == gb.size.toLong, s"carried n_b mismatch for rep $rb")
        for (a <- ga; b <- gb)
          yield (math.min(a, b), math.max(a, b), f, h)
      }
    }
    // exactly once each — the expansion law is a bijection
    assert(expanded.size == expanded.toSet.size,
      "expansion produced a duplicate member pair")
    val want = Multimodal.nearDupFrames(
        Multimodal.asMedia(Tables.documents(spark, sfDir)))
      .filter(col("doc_a") % 10 === 0 || col("doc_b") % 10 === 0 ||
        col("doc_a") % 10 === 5 || col("doc_b") % 10 === 5)
      .select(col("doc_a"), col("doc_b"), col("frame_idx"), col("hamming"))
      .as[Pair].collect().toSet
    assert(expanded.toSet == want)
  }

  test("sink stays rep-grain: unique rep-pair rows, reps are group minima") {
    val rows = repRowsOf(run._2)
    val keys = rows.map(r => (r._1, r._2, r._3))
    assert(keys.size == keys.toSet.size, "sink must be rep-grain unique")
    rows.foreach { case (ra, rb, _, _, _, _) =>
      assert(members.contains(ra), s"$ra is not an elected rep")
      assert(members.contains(rb), s"$rb is not an elected rep")
      assert(ra <= rb)
    }
    // gate data has NO byte twins (all groups are singletons — the
    // replica density lives in the scale benches), so the collapse is
    // identity here; the twin arithmetic is pinned on the
    // replica-heavy corpus below
  }

  test("replica-heavy drop: deltaReps expands to deltaPairs exactly; store stays bounded") {
    import graft.sources.FrameSigIndexStore
    // byte-twin groups on BOTH sides: base content twinned in the
    // corpus AND re-twinned in the drop (cross-group hamming-0), plus
    // drop-internal twins — the density the gate data lacks
    val docs = Tables.documents(spark, sfDir)
    val baseDocs = docs.filter(col("doc_id") < 20)
      .unionByName(docs.filter(col("doc_id") < 15)
        .withColumn("doc_id", col("doc_id") + 1000L))
    val dropDocs = docs
      .filter(col("doc_id") >= 20 && col("doc_id") < 30)
      .unionByName(docs.filter(col("doc_id") < 10)
        .withColumn("doc_id", col("doc_id") + 2000L))
      .unionByName(docs.filter(col("doc_id") >= 20 && col("doc_id") < 25)
        .withColumn("doc_id", col("doc_id") + 3000L))
    val base = Multimodal.asMedia(baseDocs)
    val drop = Multimodal.asMedia(dropDocs)
    val repP = java.nio.file.Files
      .createTempDirectory("graft_mmphrep_dense").toString + "/fs"
    val rawP = java.nio.file.Files
      .createTempDirectory("graft_mmphrep_dense_raw").toString + "/fs"
    FrameSigIndexStore.buildRepKeyed(base, repP)
    FrameSigIndexStore.buildKeyed(base, rawP)
    // the rep store is strictly smaller than the raw store here
    assert(FrameSigIndexStore.bandsTable(spark, repP).count() <
      FrameSigIndexStore.bandsTable(spark, rawP).count())
    val reps = FrameSigIndexStore.deltaReps(drop,
        FrameSigIndexStore.bandsTable(spark, repP),
        FrameSigIndexStore.sizesTable(spark, repP))
      .as[RepRow].collect().toSeq
    assert(reps.exists(r => r._5 > 1L || r._6 > 1L), "twin sizes must appear")
    assert(reps.exists(r => r._1 == r._2), "self rows must appear")
    assert(reps.exists(r => r._1 != r._2 && r._4 == 0),
      "cross-side twin groups must meet at hamming 0")
    // membership maps: base groups and drop groups independently
    def groupsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.select(col("doc_id"), col("text")).as[(Long, String)].collect()
        .groupBy(_._2).map { case (_, ds) =>
          val ids = ds.map(_._1).sorted.toSeq; ids.min -> ids
        }
    val g = groupsOf(baseDocs) ++ groupsOf(dropDocs)
      // base and drop elect independently; a shared min can't collide
      // because the id spaces are disjoint by construction
    val expanded = reps.flatMap { case (ra, rb, f, h, na, nb) =>
      val ga = g(ra)
      assert(na == ga.size.toLong)
      if (ra == rb) {
        for (i <- ga.indices; j <- (i + 1) until ga.size)
          yield (ga(i), ga(j), f, h)
      } else {
        val gb = g(rb)
        assert(nb == gb.size.toLong)
        for (a <- ga; b <- gb)
          yield (math.min(a, b), math.max(a, b), f, h)
      }
    }
    assert(expanded.size == expanded.toSet.size)
    val pairGrain = FrameSigIndexStore.deltaPairs(drop,
        FrameSigIndexStore.bandsTable(spark, rawP))
      .as[Pair].collect().toSet
    assert(expanded.toSet == pairGrain)
    // the serving form is BOUNDED: strictly fewer rows than it expands to
    assert(reps.size < pairGrain.size)
  }

  test("arrival-order law at rep grain: cross-drop rep pairs land on the later batch") {
    def batch(id: Int): Seq[RepRow] =
      repRowsOf(spark.read.parquet(s"${run._1}/batch_$id"))
    val b0 = batch(0) // the %10==5 drop
    val b1 = batch(1) // the %10==0 drop
    val k0 = b0.map(r => (r._1, r._2, r._3)).toSet
    val k1 = b1.map(r => (r._1, r._2, r._3)).toSet
    assert((k0 & k1).isEmpty, "a rep pair must never land twice")
    b0.foreach { case (a, b, _, _, _, _) =>
      assert(a % 10 == 5 || b % 10 == 5)
      assert(a % 10 != 0 && b % 10 != 0,
        s"rep pair ($a,$b) touches the later drop but landed on batch 0")
    }
    b1.foreach { case (a, b, _, _, _, _) =>
      assert(a % 10 == 0 || b % 10 == 0)
    }
  }

  test("redelivered rep batch re-lands both layers exactly (keyed Overwrite)") {
    import graft.sources.FrameSigIndexStore
    val docs = Tables.documents(spark, sfDir)
    val base = Multimodal.asMedia(docs.filter(col("doc_id") % 10 =!= 0))
    val drop = Multimodal.asMedia(docs.filter(col("doc_id") % 10 === 0))
    val p = java.nio.file.Files
      .createTempDirectory("graft_mmphrep_redeliver").toString + "/fs"
    FrameSigIndexStore.buildRepKeyed(base, p)
    FrameSigIndexStore.appendRepBatch(drop, p, 0L)
    def state() = (
      FrameSigIndexStore.bandsTable(spark, p)
        .orderBy("doc_id", "frame_idx", "band").collect().toSeq,
      FrameSigIndexStore.sizesTable(spark, p)
        .orderBy("doc_id").collect().toSeq)
    val once = state()
    FrameSigIndexStore.appendRepBatch(drop, p, 0L)
    assert(state() == once)
  }
}
