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
