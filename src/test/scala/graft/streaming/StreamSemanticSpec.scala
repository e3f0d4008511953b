package graft.streaming

import graft.SparkSpecBase
import graft.operators.Dedup
import graft.sources.{IvfIndexStore, StorePaths, Tables}
import org.apache.spark.sql.functions._

/** Streaming semantic near-dup ingest
  * ([[StreamReplay.replaySemanticDrops]]): the union of per-batch
  * sinks must equal the batch [[Dedup.semanticNearDupsDelta]] over the
  * combined drop set against the corpus-trained frozen cells (the
  * arrival-order law: a cross-drop pair lands once, on the later
  * drop's batch), and replay runs must be isolated.
  */
class StreamSemanticSpec extends SparkSpecBase {
  import spark.implicits._

  private def batchAnswer(): Seq[(Long, Long, Double)] = {
    val emb = Tables.embeddings(spark, sfDir)
    val corpus = emb.filter(col("vec_id") % 10 =!= 0 && col("vec_id") % 10 =!= 5)
    val drops = emb.filter(col("vec_id") % 10 === 0 || col("vec_id") % 10 === 5)
    val path = StorePaths.keyedTmp("ivfsemspec",
      java.util.UUID.randomUUID().toString)
    StorePaths.wipe(spark, path)
    IvfIndexStore.buildKeyed(corpus, path)
    Dedup.semanticNearDupsDelta(emb,
      IvfIndexStore.cellsTable(spark, path)
        .select(col("vec_id"), col("cell")),
      IvfIndexStore.assignCells(spark, drops, path))
      .orderBy("a_id", "b_id")
      .as[(Long, Long, Double)].collect().toSeq
  }

  test("streamed per-batch sinks union to the batch delta over both drops") {
    val got = StreamReplay.replaySemanticDrops(spark, sfDir)
      .orderBy("a_id", "b_id")
      .as[(Long, Long, Double)].collect().toSeq
    val want = batchAnswer()
    assert(got.nonEmpty)
    assert(got == want)
    // the composition must be exercised: at least one cross pair with
    // a stored (non-drop) member, and at least one drop-touching pair
    // per residue
    def isDrop(id: Long) = id % 10 == 0 || id % 10 == 5
    assert(got.exists(p => !isDrop(p._1) || !isDrop(p._2)), got.take(10))
    assert(got.exists(p => p._1 % 10 == 5 || p._2 % 10 == 5))
    assert(got.exists(p => p._1 % 10 == 0 || p._2 % 10 == 0))
  }

  test("replay runs are isolated: a second run folds into its own index copy") {
    val a = StreamReplay.replaySemanticDrops(spark, sfDir)
      .orderBy("a_id", "b_id").as[(Long, Long, Double)].collect().toSeq
    val b = StreamReplay.replaySemanticDrops(spark, sfDir)
      .orderBy("a_id", "b_id").as[(Long, Long, Double)].collect().toSeq
    assert(a.nonEmpty)
    assert(a == b)
  }
}
