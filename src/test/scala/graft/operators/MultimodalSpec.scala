package graft.operators

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("decodeAssets is deterministic and drops the binary payload") {
    val docs = Tables.documents(spark, sfDir)
    val f1 = Multimodal.decodeAssets(Multimodal.asMediaAssets(docs)).orderBy("doc_id")
    val f2 = Multimodal.decodeAssets(Multimodal.asMediaAssets(docs)).orderBy("doc_id")
    assert(f1.columns.toSet == Set("doc_id", "format", "width", "height",
      "channels", "byte_len"))
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

  test("decodeHeader: well-formed PNG/JPEG/GIF headers parse exactly") {
    val docs = Seq(
      (0L, "png doc", 7L),   // doc_id%4==0 -> PNG, colorType 0 (grey, 1ch)
      (4L, "png2", 4L),      // PNG, (4/4)%4==1 -> colorType 2 (rgb, 3ch)
      (1L, "jpeg doc", 8L),  // JPEG, 3 components
      (2L, "gif doc", 7L)    // GIF, 3 channels
    ).toDF("doc_id", "text", "n_chars")
    val out = Multimodal.decodeAssets(Multimodal.asMediaAssets(docs))
      .collect().map(d => d.doc_id -> d).toMap
    assert(out(0L).format.contains("png"))
    assert(out(0L).width.contains(8) && out(0L).height.contains(8))
    assert(out(0L).channels.contains(1))
    assert(out(4L).channels.contains(3))
    assert(out(1L).format.contains("jpeg"))
    assert(out(1L).width.contains(9) && out(1L).height.contains(9))
    assert(out(1L).channels.contains(3))
    assert(out(2L).format.contains("gif"))
    assert(out(2L).width.contains(8) && out(2L).height.contains(8))
    assert(out(2L).channels.contains(3))
    // byte_len = header + utf-8 payload
    assert(out(0L).byte_len == 33L + 7L)
    assert(out(1L).byte_len == 39L + 8L)
    assert(out(2L).byte_len == 13L + 7L)
  }

  test("decodeHeader: malformed and truncated containers yield None, not a crash") {
    import Multimodal.decodeHeader
    assert(decodeHeader(Array.empty[Byte]).isEmpty)
    assert(decodeHeader("plain text".getBytes("UTF-8")).isEmpty)
    // PNG magic but truncated before the IHDR body
    val pngMagic = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    assert(decodeHeader(pngMagic).isEmpty)
    assert(decodeHeader(pngMagic ++ Array[Byte](0, 0, 0, 13)).isEmpty)
    // full-length PNG but wrong chunk type / bad color type / zero dim
    def png(ct: Int, w: Int = 5, h: Int = 5, tag: String = "IHDR") = {
      val b = new Array[Byte](33)
      System.arraycopy(pngMagic, 0, b, 0, 8)
      b(11) = 13
      tag.getBytes.copyToArray(b, 12)
      b(16) = (w >>> 24).toByte; b(17) = (w >>> 16).toByte
      b(18) = (w >>> 8).toByte; b(19) = w.toByte
      b(20) = (h >>> 24).toByte; b(21) = (h >>> 16).toByte
      b(22) = (h >>> 8).toByte; b(23) = h.toByte
      b(24) = 8; b(25) = ct.toByte
      b
    }
    assert(decodeHeader(png(2)).contains(("png", 5, 5, 3)))
    assert(decodeHeader(png(2, tag = "IDAT")).isEmpty)
    assert(decodeHeader(png(5)).isEmpty)      // invalid color type
    assert(decodeHeader(png(2, w = 0)).isEmpty)
    // JPEG: SOI then EOI with no SOF; SOI then garbage
    assert(decodeHeader(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)).isEmpty)
    assert(decodeHeader(Array(0xff, 0xd8, 0x00, 0x00).map(_.toByte)).isEmpty)
    // GIF magic but truncated logical screen
    assert(decodeHeader("GIF89a".getBytes("UTF-8")).isEmpty)
  }

  test("decodeHeader: JPEG marker scan skips DHT/DQT segments before SOF") {
    // SOI, DQT (4-byte payload), SOF0 9x7 1-component
    val b = Array[Int](
      0xff, 0xd8,
      0xff, 0xdb, 0x00, 0x06, 1, 2, 3, 4,      // DQT, length 6
      0xff, 0x00+0xc0, 0x00, 0x0b, 8, 0, 7, 0, 9, 1, 1, 0x11, 0
    ).map(_.toByte)
    assert(Multimodal.decodeHeader(b).contains(("jpeg", 9, 7, 1)))
  }

  test("synth corpus: every malformed-branch row decodes NULL, others non-NULL") {
    val docs = Tables.documents(spark, sfDir)
    val out = Multimodal.decodeAssets(Multimodal.asMediaAssets(docs))
    val bad = out.filter(d => d.doc_id % 4 == 3)
    assert(bad.collect().forall(d => d.format.isEmpty && d.width.isEmpty))
    val good = out.filter(d => d.doc_id % 4 != 3)
    assert(good.collect().forall(d => d.format.nonEmpty && d.width.exists(_ > 0)))
  }

  test("decoded byte_len covers header plus utf-8 payload length") {
    // doc_id 1 -> JPEG branch (39-byte synth header: SOI + APP0 + SOF0),
    // doc_id 2 -> GIF branch (13-byte header); payload is the UTF-8 text
    val docs = Seq((1L, "abc", 39L + 3L), (2L, "héllo", 13L + 6L))
      .toDF("doc_id", "text", "expected")
      .withColumn("n_chars", length(col("text")).cast("bigint"))
    val feats = Multimodal.decodeAssets(Multimodal.asMediaAssets(docs))
    val got = feats.select("doc_id", "byte_len").as[(Long, Long)].collect().toMap
    assert(got(1L) == 42L)
    assert(got(2L) == 19L) // é is 2 bytes in UTF-8
  }
}
