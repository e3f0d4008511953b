package graft.streaming

import graft.SparkSpecBase
import graft.sources.{SketchStore, Tables}

/** Streaming sketch maintenance ([[StreamReplay.replayKmvDrops]]):
  * three doc drops each sketch ONLY themselves and append their k-min
  * layer one micro-batch at a time; the served distinct-count
  * dashboard must be bit-identical to a sketch built over the whole
  * corpus in one pass (semilattice fold ⇒ append ≡ rebuild,
  * drop-order-free and idempotent).
  */
class StreamKmvSpec extends SparkSpecBase {

  private def batchServed = {
    val docs = Tables.documents(spark, sfDir)
    val path = java.nio.file.Files
      .createTempDirectory("graft_kmv_batch").toString + "/kmv"
    SketchStore.build(docs, path)
    SketchStore.served(spark, path)
  }

  test("streamed sketch folds land on the fresh-scan dashboard") {
    val got = StreamReplay.replayKmvDrops(spark, sfDir)
      .orderBy("lang").collect().toSeq
    val want = batchServed.orderBy("lang").collect().toSeq
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("replay runs are isolated AND the fold is idempotent") {
    val a = StreamReplay.replayKmvDrops(spark, sfDir)
      .orderBy("lang").collect().toSeq
    val b = StreamReplay.replayKmvDrops(spark, sfDir)
      .orderBy("lang").collect().toSeq
    // per-run stores keep the runs independent. (Idempotence: a
    // doubled layer cannot change the k-min SKETCH state — union is
    // idempotent — and the additive n_rows column is protected by the
    // batch-id-KEYED Overwrite layout: a redelivered batch re-lands
    // its own layer instead of double-appending, with no marker-file
    // crash window. See StreamReplay.replayStoreDrops and
    // StreamCrashRecoverySpec.)
    assert(a == b)
  }
}
