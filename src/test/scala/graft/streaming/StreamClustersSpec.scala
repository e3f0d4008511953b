package graft.streaming

import graft.SparkSpecBase
import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Streaming cluster maintenance ([[StreamReplay.replayClusterDrops]]):
  * two non-empty edge drops fold incrementally into the stored
  * labeling and the final table equals the batch re-solve.
  */
class StreamClustersSpec extends SparkSpecBase {
  import spark.implicits._

  // sf0.01: at sf0.001 the %20-split first drop is empty and the test
  // would exercise only one incremental fold
  private val dir = "/root/testdata/sf0.01"

  test("streamed incremental labels equal the batch components") {
    val emb = Tables.embeddings(spark, dir)
    val pairs = Dedup.embeddingNearDups(emb)
      .select(col("probe_id").as("src"), col("cand_id").as("dst"))
    val isDelta = col("dst") % 7 === 0
    val isDrop1 = col("dst") % 14 === 0
    // the gate split must actually exercise a non-empty BASE labeling
    // and TWO incremental folds
    assert(pairs.filter(!isDelta).count() > 0)
    assert(pairs.filter(isDelta && isDrop1).count() > 0)
    assert(pairs.filter(isDelta && !isDrop1).count() > 0)

    val got = StreamReplay.replayClusterDrops(spark, dir)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val batch = Dedup.connectedComponents(pairs, "src", "dst")
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    assert(got == batch)
  }

  test("streamed retraction labels equal the batch re-solve over the shrunken graph") {
    val emb = Tables.embeddings(spark, dir)
    val pairs = Dedup.embeddingNearDups(emb)
      .select(col("probe_id").as("src"), col("cand_id").as("dst"))
    // both takedown drops must actually retract labeled nodes, and the
    // removal must be observable (labels shrink)
    val nodes = pairs.select(col("src").as("node"))
      .unionByName(pairs.select(col("dst").as("node"))).distinct()
    assert(nodes.filter(col("node") % 20 === 4).count() > 0)
    assert(nodes.filter(col("node") % 20 === 14).count() > 0)

    val got = StreamReplay.replayRetractionDrops(spark, dir)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val surviving = pairs
      .filter(col("src") % 10 =!= 4 && col("dst") % 10 =!= 4)
    val batch = Dedup.connectedComponents(surviving, "src", "dst")
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    assert(got == batch)
    // observable retraction: fewer labeled nodes than the full graph
    assert(got.size <
      Dedup.connectedComponents(pairs, "src", "dst").count())
    // replay isolation: a second run starts from the pristine base
    val again = StreamReplay.replayRetractionDrops(spark, dir)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(again == got)
  }
}
