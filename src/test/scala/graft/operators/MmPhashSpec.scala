package graft.operators

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class MmPhashSpec extends SparkSpecBase {

  private def media = Multimodal.asMedia(Tables.documents(spark, sfDir))

  test("banded candidate join equals the all-pairs ground truth") {
    val banded = Multimodal.nearDupFrames(media)
    val sigs = Multimodal.frameSignatures(Multimodal.frameSample(media))
    val a = sigs.alias("a")
    val b = sigs.alias("b")
    val brute = a.join(b,
        col("a.doc_id") < col("b.doc_id") &&
          col("a.frame_idx") === col("b.frame_idx"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.frame_idx").as("frame_idx"),
        (bit_count(col("a.sig_lo").bitwiseXOR(col("b.sig_lo"))) +
          bit_count(col("a.sig_hi").bitwiseXOR(col("b.sig_hi"))))
          .cast("int").as("hamming"))
      .filter(col("hamming") <= 3)
    assert(banded.count() > 0, "corpus should contain near-dup frames")
    assert(banded.exceptAll(brute).count() === 0)
    assert(brute.exceptAll(banded).count() === 0)
  }

  test("identical frame bytes hash to Hamming zero") {
    // two docs sharing their full first frame must pair at distance 0
    import spark.implicits._
    val docs = Seq(
      (1L, "a" * 100 + "xyz " * 60, "en", "s", 0L),
      (2L, ("a" * 100 + "xyz " * 60).take(256) + " completely different tail content here", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = Multimodal.nearDupFrames(Multimodal.asMedia(docs))
      .filter(col("frame_idx") === 0).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L && r.getInt(3) == 0))
  }

  test("radius above the banding guarantee is rejected") {
    intercept[IllegalArgumentException] {
      Multimodal.nearDupFrames(media, maxHamming = 4)
    }
  }

  test("distinct-asset collapse is value-identical to all-pairs on a replica-heavy corpus") {
    // byte-twin groups of size 1..4: the collapsed form must reproduce
    // the raw all-pairs answer — within-group pairs at Hamming 0 for
    // every frame, cross pairs at the rep pair's verdict — row for row
    val base = Tables.documents(spark, sfDir).filter(col("doc_id") < 20)
    val corpus = base
      .unionByName(base.filter(col("doc_id") < 15)
        .withColumn("doc_id", col("doc_id") + 1000L))
      .unionByName(base.filter(col("doc_id") < 10)
        .withColumn("doc_id", col("doc_id") + 2000L))
      .unionByName(base.filter(col("doc_id") < 5)
        .withColumn("doc_id", col("doc_id") + 3000L))
    val m = Multimodal.asMedia(corpus)
    val sigs = Multimodal.frameSignatures(Multimodal.frameSample(m))
    val a = sigs.alias("a")
    val b = sigs.alias("b")
    val brute = a.join(b,
        col("a.doc_id") < col("b.doc_id") &&
          col("a.frame_idx") === col("b.frame_idx"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.frame_idx").as("frame_idx"),
        (bit_count(col("a.sig_lo").bitwiseXOR(col("b.sig_lo"))) +
          bit_count(col("a.sig_hi").bitwiseXOR(col("b.sig_hi"))))
          .cast("int").as("hamming"))
      .filter(col("hamming") <= 3)
    val collapsed = Multimodal.nearDupFrames(m)
    import spark.implicits._
    val bs = brute.as[(Long, Long, Int, Int)].collect().toSet
    val cs = collapsed.as[(Long, Long, Int, Int)].collect().toSet
    assert(cs == bs)
    // the replica corpus must actually exercise the within-group path
    assert(bs.exists { case (x, y, _, h) => h == 0 && y - x >= 1000 })
  }

  test("rep-grain serving form expands exactly to the pair-grain answer") {
    // the bounded mm_phash_reps law: cross rows expand to n_a·n_b
    // member pairs at the carried hamming, self rows (rep_a = rep_b,
    // hamming 0) to the n·(n−1)/2 within-group pairs — replayed here
    // on the replica-heavy corpus and compared row-for-row against
    // nearDupFrames
    import spark.implicits._
    val base = Tables.documents(spark, sfDir).filter(col("doc_id") < 20)
    val corpus = base
      .unionByName(base.filter(col("doc_id") < 15)
        .withColumn("doc_id", col("doc_id") + 1000L))
      .unionByName(base.filter(col("doc_id") < 10)
        .withColumn("doc_id", col("doc_id") + 2000L))
    val m = Multimodal.asMedia(corpus)
    val reps = Multimodal.nearDupFrameReps(m)
    // independent member→rep map for the expansion (content grouping)
    val members = m.toDF().select(col("doc_id"),
      md5(col("content")).as("kh"),
      octet_length(col("content")).as("klen"))
    val grp = members.groupBy("kh", "klen").agg(min("doc_id").as("rep"))
    val dm = members.join(grp, Seq("kh", "klen"))
      .select(col("rep"), col("doc_id"))
    val crossExp = reps.filter(col("rep_a") =!= col("rep_b"))
      .join(dm.select(col("rep").as("rep_a"), col("doc_id").as("da")), "rep_a")
      .join(dm.select(col("rep").as("rep_b"), col("doc_id").as("db")), "rep_b")
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"),
        col("frame_idx"), col("hamming"))
    val selfExp = reps.filter(col("rep_a") === col("rep_b"))
      .join(dm.alias("x"), col("rep_a") === col("x.rep"))
      .join(dm.alias("y"),
        col("rep_a") === col("y.rep") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("frame_idx"), col("hamming"))
    val expanded = crossExp.unionByName(selfExp)
      .as[(Long, Long, Int, Int)].collect().toSet
    val pairGrain = Multimodal.nearDupFrames(m)
      .as[(Long, Long, Int, Int)].collect().toSet
    assert(expanded == pairGrain)
    // the serving form must be BOUNDED on this corpus: strictly fewer
    // rows than the pair-grain answer it reconstructs, and the
    // within-group connectivity must actually be exercised
    val repRows = reps.collect()
    assert(repRows.length < pairGrain.size)
    assert(repRows.exists(r => r.getLong(0) == r.getLong(1)))
    // group sizes carried on the row are the true twin-group sizes
    val sizes = dm.groupBy("rep").count().as[(Long, Long)].collect().toMap
    assert(repRows.forall(r =>
      r.getAs[Long]("n_a") == sizes(r.getLong(0)) &&
        r.getAs[Long]("n_b") == sizes(r.getLong(1))))
  }

  test("sceneSegments: identical frames group, a hard cut opens a scene") {
    import spark.implicits._
    // frames are 256-byte windows: two identical ramp frames (Hamming
    // 0 → one scene), then an alternating-block frame whose signature
    // is 32 bits away (> 24 → a new scene)
    val ramp = Array.tabulate(256)(i => i.toByte)
    val alt = Array.tabulate(256) { i =>
      if ((i / 4) % 2 == 0) 0x00.toByte else 0xff.toByte
    }
    val content = ramp ++ ramp ++ alt
    val media = Seq(MMRecord(7L, content, "video", 0, 0)).toDS()
    val out = Multimodal.sceneSegments(media).orderBy("scene_idx")
      .select("doc_id", "scene_idx", "start_frame", "end_frame", "n_frames")
      .as[(Long, Long, Int, Int, Long)].collect().toSeq
    assert(out == Seq((7L, 0L, 0, 1, 2L), (7L, 1L, 2, 2, 1L)))
    // the cut distance is recorded on the scene it opened
    val cuts = Multimodal.sceneSegments(media).orderBy("scene_idx")
      .select("cut_dist").collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(cuts.head.isEmpty) // first scene has no opening cut
    assert(cuts(1).exists(_ > 24))
  }
}
