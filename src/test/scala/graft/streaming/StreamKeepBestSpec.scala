package graft.streaming

import graft.SparkSpecBase
import graft.operators.{CorpusStats, Dedup}
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streamed keep-best canonicalization maintenance
  * ([[StreamReplay.replayKeepBestDrops]]): every per-batch snapshot —
  * now a FOLD of the upsert/retract delta layers, not a materialized
  * table — must equal the BATCH operator over the prefix corpus (the
  * law is arrival-order-free at every cut, not just at the end), the
  * maintained table must retract a previously-kept document when its
  * cluster's winner changes, and the per-batch work counters must show
  * the maintenance is BLAST-RADIUS-shaped (region ≪ prefix), which is
  * the whole point of the delta design.
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
    StreamReplay.keepBestSnapshot(spark, run._1, batch)
      .select("doc_id").as[Long].collect().toSet

  test("final canonical fold equals the batch keep-best over the full corpus") {
    val docs = Tables.documents(spark, sfDir)
    assert(run._2.select("doc_id").as[Long].collect().toSet == keepBest(docs))
  }

  test("every micro-batch delta fold equals the batch operator over its prefix corpus") {
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

  test("per-batch maintenance work is blast-radius-shaped, not prefix-shaped") {
    val m = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"${run._1}/metrics")
      .orderBy("batch").collect()
    assert(m.length == 2)
    m.foreach { r =>
      val batchDocs = r.getAs[Long]("batch_docs")
      val region = r.getAs[Long]("region_nodes")
      val upserts = r.getAs[Long]("n_upserts")
      val retracts = r.getAs[Long]("n_retracts")
      val prefix = r.getAs[Long]("prefix_docs")
      // the per-batch footprint (re-solved region + emitted deltas) is
      // bounded by the drop and its duplicate blast radius — strictly
      // below the prefix corpus the old design re-ranked and rewrote
      val footprint = region.max(upserts).max(retracts)
      assert(footprint < prefix / 2,
        s"batch ${r.getAs[Long]("batch")}: footprint $footprint vs prefix " +
          s"$prefix — maintenance re-ranked too much")
      // the emitted deltas track the drop size, not the corpus: every
      // upsert is a drop doc or a touched-cluster winner, every
      // retract a touched-cluster loser or a drop twin
      assert(upserts <= batchDocs + region,
        s"upserts $upserts exceed drop + region")
      assert(retracts <= batchDocs + region,
        s"retracts $retracts exceed drop + region")
    }
  }

  test("the fold is drop-PARTITION-free: a 4-drop run of the same corpus lands on the batch answer") {
    // numDrops=4 delivers the IDENTICAL drop set (residues {0,5} mod 10
    // == {0,5,10,15} mod 20) in twice as many, half-sized batches —
    // different blast radii, different layer stacks, same monotone
    // fold: the final canonical table must still equal the batch
    // operator (partition/arrival freedom through the real machinery,
    // not a simulation)
    val (_, final4) = StreamReplay.replayKeepBestN(spark, sfDir, 4)
    assert(final4.select("doc_id").as[Long].collect().toSet ==
      keepBest(Tables.documents(spark, sfDir)))
  }

  test("delta layers stay silent for untouched components (no corpus-grain rewrite)") {
    // batch 1's upsert layer must NOT re-emit the prefix corpus: the
    // base layer holds ~80% of docs, and a prefix-shaped write here is
    // exactly the regression this design removes
    val up1 = spark.read.parquet(s"${run._1}/canon_upserts/batch_1").count()
    val base = spark.read.parquet(s"${run._1}/canon_upserts/base").count()
    assert(up1 < base,
      s"batch-1 upsert layer ($up1 rows) is corpus-shaped (base $base)")
  }
}
