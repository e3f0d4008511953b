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
}
