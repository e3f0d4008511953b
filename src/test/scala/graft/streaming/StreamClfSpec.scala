package graft.streaming

import graft.SparkSpecBase
import graft.operators.{Classifier, CorpusStats}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Streaming model maintenance ([[StreamReplay.replayClfDrops]]): three
  * doc drops fold their token counts into the persisted NbModelStore
  * one micro-batch at a time; the served model must equal the batch
  * fresh train over the whole corpus (abelian counts ⇒ append ≡
  * rebuild, drop-order-free), and replay runs must be isolated.
  */
class StreamClfSpec extends SparkSpecBase {
  import spark.implicits._

  private def batchModel = {
    val docs = Tables.documents(spark, sfDir)
    val labels = CorpusStats.gopherQuality(docs)
      .select(col("doc_id"), col("keep").as("label"))
    Classifier.nbTrain(docs, labels)
      .crossJoin(broadcast(Classifier.nbPrior(labels)))
  }

  test("streamed count folds land on the batch fresh-train model") {
    val got = StreamReplay.replayClfDrops(spark, sfDir)
      .orderBy("token")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val want = batchModel.orderBy("token")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("replay runs are isolated: each run folds into its own store") {
    val a = StreamReplay.replayClfDrops(spark, sfDir)
      .orderBy("token").as[(String, Long, Long, Long, Long)].collect().toSeq
    val b = StreamReplay.replayClfDrops(spark, sfDir)
      .orderBy("token").as[(String, Long, Long, Long, Long)].collect().toSeq
    // a shared store would double every count on the second run
    assert(a == b)
  }

  test("streamed retraction serves the survivors' fresh-train model, and bites") {
    val docs = Tables.documents(spark, sfDir)
    def fresh(corpus: org.apache.spark.sql.DataFrame) = {
      val labels = CorpusStats.gopherQuality(corpus)
        .select(col("doc_id"), col("keep").as("label"))
      Classifier.nbTrain(corpus, labels)
        .crossJoin(broadcast(Classifier.nbPrior(labels)))
        .orderBy("token")
        .as[(String, Long, Long, Long, Long)].collect().toSeq
    }
    val got = StreamReplay.replayClfRetractions(spark, sfDir)
      .orderBy("token").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == fresh(docs.filter("source <> 'src0'")))
    assert(got != fresh(docs),
      "the streamed takedown must visibly move the served model")
  }
}
