package graft.operators

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("featurize is deterministic and drops the binary payload") {
    val docs = Tables.documents(spark, sfDir)
    val f1 = Multimodal.featurize(Multimodal.asMedia(docs)).orderBy("doc_id")
    val f2 = Multimodal.featurize(Multimodal.asMedia(docs)).orderBy("doc_id")
    assert(f1.columns.toSet == Set("doc_id", "media_type", "byte_len",
      "content_hash", "head_sig", "width", "height"))
    assert(f1.collect().toSeq == f2.collect().toSeq)
    assert(f1.count() == docs.count())
  }

  test("frameSample: bounded strided windows, exact edge behavior") {
    // lengths straddling the stride boundaries: 0, <s, =s, s+1, 2s, >max
    val docs = Seq(
      (0L, ""), (1L, "x" * 255), (2L, "x" * 256), (3L, "x" * 257),
      (4L, "x" * 512), (5L, "x" * 5000)
    ).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("bigint"))
    val frames = Multimodal.frameSample(Multimodal.asMedia(docs))
      .collect().groupBy(_.doc_id)
    def spec(id: Long) = frames(id).sortBy(_.frame_idx)
      .map(f => (f.frame_idx, f.frame_off, f.frame_len, f.frame_bytes.length.toLong))
    assert(spec(0L).toSeq == Seq((0, 0L, 0L, 0L)))      // empty asset: one empty frame
    assert(spec(1L).toSeq == Seq((0, 0L, 255L, 255L)))
    assert(spec(2L).toSeq == Seq((0, 0L, 256L, 256L)))  // exact stride: ONE frame
    assert(spec(3L).toSeq == Seq((0, 0L, 256L, 256L), (1, 256L, 1L, 1L)))
    assert(spec(4L).toSeq == Seq((0, 0L, 256L, 256L), (1, 256L, 256L, 256L)))
    assert(spec(5L).length == 4)                        // maxFrames cap
    assert(spec(5L).forall(_._3 == 256L))
  }

  test("identical asset bytes collapse to one canonical row, distinct bytes stay apart") {
    val docs = Seq(
      (5L, "same bytes"), (3L, "same bytes"), (9L, "same bytes"),
      (7L, "other bytes")
    ).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("bigint"))
    val out = Multimodal.dedupAssets(Multimodal.asMedia(docs))
      .orderBy("n_copies").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_copies") == 1L)
    assert(out(0).getAs[Long]("canonical_id") == 7L)
    assert(out(1).getAs[Long]("n_copies") == 3L)
    assert(out(1).getAs[Long]("canonical_id") == 3L) // min doc_id wins
    assert(out(1).getAs[Long]("byte_len") == "same bytes".length.toLong)
  }

  test("byte_len equals utf-8 length of the source text") {
    val docs = Seq((1L, "abc", 3L), (2L, "héllo", 6L))
      .toDF("doc_id", "text", "expected")
      .withColumn("n_chars", length(col("text")).cast("bigint"))
    val feats = Multimodal.featurize(Multimodal.asMedia(docs))
    val got = feats.select("doc_id", "byte_len").as[(Long, Long)].collect().toMap
    assert(got(1L) == 3L)
    assert(got(2L) == 6L) // é is 2 bytes in UTF-8
  }
}
