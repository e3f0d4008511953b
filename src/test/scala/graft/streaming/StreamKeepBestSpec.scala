package graft.streaming

import graft.SparkSpecBase
import graft.operators.{CorpusStats, Dedup}
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streamed keep-best canonicalization maintenance
  * ([[StreamReplay.replayKeepBestDrops]]): every per-batch snapshot
  * must equal the BATCH operator over the prefix corpus (the law is
  * arrival-order-free at every cut, not just at the end), and the
  * maintained table must retract a previously-kept document when its
  * cluster's winner changes.
  */
class StreamKeepBestSpec extends SparkSpecBase {
  import spark.implicits._

  private def keepBest(docs: DataFrame): Set[Long] = {
    val slim = docs.select(col("doc_id"), col("text"))
    val quality = slim.select(col("doc_id"),
      CorpusStats.qualityScore(col("text")).as("quality_score"))
    Dedup.minhashKeepBest(slim, quality)
      .select("doc_id").as[Long].collect().toSet
  }

  private lazy val run: (String, DataFrame) =
    StreamReplay.replayKeepBestDropsWithWork(spark, sfDir)

  private def snapshot(batch: Long): Set[Long] =
    spark.read.parquet(s"${run._1}/survivors/batch_$batch")
      .select("doc_id").as[Long].collect().toSet

  test("final canonical table equals the batch keep-best over the full corpus") {
    val docs = Tables.documents(spark, sfDir)
    assert(run._2.select("doc_id").as[Long].collect().toSet == keepBest(docs))
  }

  test("every micro-batch snapshot equals the batch operator over its prefix corpus") {
    val docs = Tables.documents(spark, sfDir)
    val afterDrop0 = docs.filter(col("doc_id") % 10 =!= 0)
    assert(snapshot(0L) == keepBest(afterDrop0))
    assert(snapshot(1L) == keepBest(docs))
  }

  test("a later, better mirror retroactively retracts an earlier survivor") {
    val retracted = snapshot(0L) -- snapshot(1L)
    assert(retracted.nonEmpty,
      "gate data must exercise the retroactive retraction path")
    // every retracted doc lost to a NEW arrival: drop 1 is the
    // doc_id % 10 == 0 slice, and the replacement winner must beat it
    // under the (quality DESC, id ASC) law within its own cluster —
    // spot-check via the batch operator's drop reason: the retracted
    // doc is absent from the full-corpus keep-best too (retraction
    // converged to the batch law, not past it)
    val finalKeep = keepBest(Tables.documents(spark, sfDir))
    retracted.foreach(id => assert(!finalKeep.contains(id), s"doc $id"))
  }
}
