package graft

import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The chained corpus-curation run ([[CorpusPipeline]]): stage
  * containment, the keep-lowest near-dup contract, prefix-sum packing
  * integrity, and re-run determinism.
  */
class CorpusPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec").toString
    CorpusPipeline.runCuration(spark, sfDir, dir)
    dir
  }

  private def read(t: String) = spark.read.parquet(s"$wh/$t")

  test("stages are containment-ordered: clean ⊆ canonical ⊆ quality-kept") {
    val kept = read("corpus_quality").filter(col("keep"))
      .select("doc_id").as[Long].collect().toSet
    val canon = read("corpus_canonical").select("doc_id").as[Long].collect().toSet
    val clean = read("corpus_clean").select("doc_id").as[Long].collect().toSet
    assert(clean.nonEmpty)
    assert(clean.subsetOf(canon))
    assert(canon.subsetOf(kept))
    assert(canon.size < kept.size || clean.size < canon.size,
      "the gate data must exercise at least one dedup stage")
  }

  test("no near-dup pair with a lower-id partner survives in clean") {
    val clean = read("corpus_clean")
    val offending = Dedup.minhashNearDupPairs(clean)
      .filter(col("jaccard") >= 0.5).count()
    assert(offending == 0L)
  }

  test("pack manifest is a contiguous prefix sum over the train split") {
    val rows = read("corpus_pack").orderBy("doc_id")
      .select(col("doc_id"), col("n_tokens"), col("pack_start"))
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    var expect = 0L
    rows.foreach { case (id, n, start) =>
      assert(start == expect, s"doc $id")
      expect += n
    }
    // train-only: every packed doc is in the train split
    val train = read("corpus_split").filter(col("split") === "train")
      .select("doc_id").as[Long].collect().toSet
    assert(rows.map(_._1).toSet == train)
  }

  test("a re-run lands on the identical summary (deterministic chain)") {
    val first = CorpusPipeline.curationSummary(spark, wh)
      .orderBy("stage").collect().toSeq
    val dir2 = java.nio.file.Files.createTempDirectory("graft_corpus_spec2").toString
    CorpusPipeline.runCuration(spark, sfDir, dir2)
    val second = CorpusPipeline.curationSummary(spark, dir2)
      .orderBy("stage").collect().toSeq
    assert(first.nonEmpty)
    assert(first == second)
  }

  test("near-dup removal consumed the CANONICAL table, not the raw corpus") {
    // a doc dropped by the quality gate must never influence the
    // near-dup stage: rebuild the drop set from the staged canonical
    // table and check it matches what corpus_clean excluded
    val canon = read("corpus_canonical")
    val wantDropped = Dedup.minhashNearDupPairs(canon)
      .filter(col("jaccard") >= 0.5)
      .select(col("id_b")).distinct().as[Long].collect().toSet
    val canonIds = canon.select("doc_id").as[Long].collect().toSet
    val cleanIds = read("corpus_clean").select("doc_id").as[Long].collect().toSet
    assert(canonIds -- cleanIds == wantDropped)
  }

  test("raw documents parity: quality flags cover every document") {
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(read("corpus_quality").count() == nDocs)
  }
}
