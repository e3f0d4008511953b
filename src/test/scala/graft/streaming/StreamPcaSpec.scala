package graft.streaming

import graft.SparkSpecBase
import graft.operators.Pca
import graft.sources.{GramStore, Tables}

/** Streaming PCA maintenance ([[StreamReplay.replayPcaDrops]]): three
  * embedding drops fold their raw moments into the persisted GramStore
  * one micro-batch at a time; the served component must equal the one
  * a single fresh moment scan over the whole corpus serves (abelian
  * moments ⇒ fold ≡ rebuild, drop-order-free).
  */
class StreamPcaSpec extends SparkSpecBase {
  import spark.implicits._

  private def batchServed = {
    val emb = Tables.embeddings(spark, sfDir)
    val path = java.nio.file.Files
      .createTempDirectory("graft_pca_batch").toString + "/gram"
    GramStore.build(emb, path)
    val (n, s, ss) = GramStore.moments(spark, path)
    Pca.fromMoments(emb, n, s, ss)
  }

  test("streamed moment folds land on the fresh-scan component") {
    val got = StreamReplay.replayPcaDrops(spark, sfDir)
      .orderBy("vec_id")
      .as[(Long, Int, Double, Double)].collect().toSeq
    val want = batchServed.orderBy("vec_id")
      .as[(Long, Int, Double, Double)].collect().toSeq
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("replay runs are isolated: each run folds into its own store") {
    val a = StreamReplay.replayPcaDrops(spark, sfDir)
      .orderBy("vec_id").as[(Long, Int, Double, Double)].collect().toSeq
    val b = StreamReplay.replayPcaDrops(spark, sfDir)
      .orderBy("vec_id").as[(Long, Int, Double, Double)].collect().toSeq
    // a shared store would double every moment on the second run
    assert(a == b)
  }

  test("streamed retraction serves the survivors' component, and bites") {
    val emb = Tables.embeddings(spark, sfDir)
    def fresh(corpus: org.apache.spark.sql.DataFrame,
        scoreOver: org.apache.spark.sql.DataFrame) = {
      val path = java.nio.file.Files
        .createTempDirectory("graft_pca_surv").toString + "/gram"
      GramStore.build(corpus, path)
      val (n, s, ss) = GramStore.moments(spark, path)
      Pca.fromMoments(scoreOver, n, s, ss).orderBy("vec_id")
        .as[(Long, Int, Double, Double)].collect().toSeq
    }
    val survivors = emb.filter("vec_id % 7 <> 3")
    val got = StreamReplay.replayPcaRetractions(spark, sfDir)
      .orderBy("vec_id").as[(Long, Int, Double, Double)].collect().toSeq
    assert(got == fresh(survivors, survivors))
    assert(got != fresh(emb, survivors),
      "the streamed takedown must visibly move the served component")
  }
}
