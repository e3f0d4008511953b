package graft.streaming

import graft.SparkSpecBase
import graft.sources.{MixtureStore, Tables}

/** Streaming datasheet maintenance
  * ([[StreamReplay.replayMixtureDrops]]): three doc drops fold their
  * per-slice count deltas into the persisted MixtureStore one
  * micro-batch at a time; the served datasheet must be BIT-IDENTICAL
  * to a single fresh count scan over the whole corpus (integer abelian
  * counts ⇒ fold ≡ rebuild, drop-order-free — exactness, not a
  * rounding-class match).
  */
class StreamMixtureSpec extends SparkSpecBase {

  private def batchServed = {
    val docs = Tables.documents(spark, sfDir)
    val path = java.nio.file.Files
      .createTempDirectory("graft_mix_batch").toString + "/mix"
    MixtureStore.build(docs, path)
    MixtureStore.served(spark, path)
  }

  test("streamed count folds land on the fresh-scan datasheet") {
    val got = StreamReplay.replayMixtureDrops(spark, sfDir)
      .orderBy("lang", "source").collect().toSeq
    val want = batchServed.orderBy("lang", "source").collect().toSeq
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("replay runs are isolated: each run folds into its own store") {
    val a = StreamReplay.replayMixtureDrops(spark, sfDir)
      .orderBy("lang", "source").collect().toSeq
    val b = StreamReplay.replayMixtureDrops(spark, sfDir)
      .orderBy("lang", "source").collect().toSeq
    // a shared store would double every count on the second run
    assert(a == b)
  }

  test("streamed takedown lands bit-exactly on the survivor datasheet, and bites") {
    val docs = Tables.documents(spark, sfDir)
    def fresh(corpus: org.apache.spark.sql.DataFrame) = {
      val path = java.nio.file.Files
        .createTempDirectory("graft_mix_surv").toString + "/mix"
      MixtureStore.build(corpus, path)
      MixtureStore.served(spark, path).orderBy("lang", "source")
        .collect().toSeq
    }
    val got = StreamReplay.replayMixtureRetractions(spark, sfDir)
      .orderBy("lang", "source").collect().toSeq
    assert(got == fresh(docs.filter("doc_id % 7 <> 3")))
    assert(got != fresh(docs), "the streamed takedown must visibly bite")
  }
}
