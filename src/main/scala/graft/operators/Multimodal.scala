package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One multimodal record: opaque media bytes + typed metadata. */
case class MMRecord(doc_id: Long, content: Array[Byte], media_type: String,
    width: Int, height: Int)

/** Extracted per-asset features. */
case class MMFeature(doc_id: Long, media_type: String, byte_len: Long,
    content_hash: Long, head_sig: Long, width: Int, height: Int)

/** One sampled frame: byte window `[frame_off, frame_off+frame_len)`
  * of the source asset.
  */
case class MMFrame(doc_id: Long, frame_idx: Int, frame_off: Long,
    frame_len: Long, frame_bytes: Array[Byte])

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in batched
  * per-partition passes.
  *
  * The decode itself is STUBBED (no image/audio libs in this container):
  * [[decodeStub]] produces deterministic fake features (FNV-1a content
  * hash, head bytes, length) standing in for a real decoder. Everything
  * around it — binary schema, typed `Dataset[MMRecord]`, `mapPartitions`
  * batching (one decoder init per partition, the shape a JNI/FFmpeg/JPEG
  * decoder needs), partition sizing — is real and is what matters at
  * 100 TB: media rows are large, so `spark.sql.files.maxPartitionBytes`
  * bounds decode-batch memory, and features detach from bytes early so
  * downstream stages never shuffle the binary payload.
  */
object Multimodal {

  /** Synthesize a binary media column from the documents table (the
    * testdata has no real media; bytes = UTF-8 of the text, metadata
    * derived from n_chars — deterministic).
    */
  def asMedia(docs: DataFrame): Dataset[MMRecord] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("content"),
      lit("image/fake").as("media_type"),
      (col("n_chars") % 640 + 1).cast("int").as("width"),
      (col("n_chars") % 480 + 1).cast("int").as("height"))
      .as[MMRecord]
  }

  /** STUB decoder: deterministic features from the raw bytes. A real
    * implementation would decode pixels/samples here; the contract
    * (bytes in, fixed-width features out, batched per partition) is
    * identical.
    */
  private def decodeStub(r: MMRecord): MMFeature = {
    var h = -3750763034362895579L // FNV-1a 64 offset basis
    var i = 0
    while (i < r.content.length) {
      h = (h ^ (r.content(i) & 0xffL)) * 1099511628211L
      i += 1
    }
    val head = if (r.content.length >= 8) {
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (r.content(j) & 0xffL); j += 1 }
      v
    } else r.content.length.toLong
    MMFeature(r.doc_id, r.media_type, r.content.length.toLong, h, head,
      r.width, r.height)
  }

  /** Batched feature extraction: one pass per partition (decoder init
    * amortized), bytes dropped from the output schema.
    */
  def featurize(media: Dataset[MMRecord]): Dataset[MMFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (JNI handle, etc.)
      it.map(decodeStub)
    }
  }

  /** Frame sampling: up to `maxFrames` evenly-strided byte windows per
    * asset (a real video decoder would seek keyframes here — the
    * contract is identical: one asset row in, bounded frame rows out,
    * one decoder pass per partition). Every asset yields at least one
    * frame; the last frame may be short. The ×maxFrames row blowup
    * happens AFTER partition-bytes bounding, so a 100 TB corpus fans
    * out without any executor holding more than one asset's bytes.
    */
  def frameSample(media: Dataset[MMRecord], maxFrames: Int = 4,
      stride: Long = 256L): Dataset[MMFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val len = r.content.length.toLong
      val n = math.min(maxFrames.toLong, math.max(1L, (len + stride - 1) / stride))
      (0L until n).map { i =>
        val off = i * stride
        val flen = math.min(stride, len - off)
        MMFrame(r.doc_id, i.toInt, off, flen,
          java.util.Arrays.copyOfRange(r.content, off.toInt, (off + flen).toInt))
      }
    }
  }

  /** Exact binary-asset dedup: identical media bytes collapse to one
    * canonical asset. The group key is `(md5(content), octet_length)`
    * — constant-width (48 bytes), so the media payload itself NEVER
    * enters an exchange key (the same discipline as the hash-keyed
    * text dedup, Dedup.scala); md5 collisions at differing content are
    * cryptographically negligible and additionally length-guarded.
    * Emits one row per distinct content with its copy count and the
    * minimum doc_id as the deterministic canonical.
    */
  def dedupAssets(media: Dataset[MMRecord]): DataFrame =
    media.toDF()
      .select(md5(col("content")).as("content_md5"),
        octet_length(col("content")).cast("long").as("byte_len"),
        col("doc_id"))
      .groupBy(col("content_md5"), col("byte_len"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("canonical_id"))
}
