package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class LmScoreSpec extends SparkSpecBase {
  import spark.implicits._

  // corpus: a:3, b:1, c:1 — T=5. vocabSize=2 keeps {a, b} (count desc,
  // token asc breaks the b/c tie), so denom = T + V + 1 = 8 and
  // p(a)=4/8, p(b)=2/8, p(OOV)=1/8.
  private val docs = Seq((1L, "a a b"), (2L, "a c"))
    .toDF("doc_id", "text")

  private def round4(x: Double): Double = math.round(x * 1e4) / 1e4

  test("smoothed per-token probabilities average into the document score") {
    val out = CorpusStats.lmScore(docs, vocabSize = 2)
      .orderBy("doc_id").collect()
    val d1 = out(0)
    assert(d1.getAs[Long]("n_tokens") == 3L)
    assert(d1.getAs[Double]("lm_score") ==
      round4((math.log(0.5) + math.log(0.5) + math.log(0.25)) / 3))
    assert(d1.getAs[Double]("oov_ratio") == 0.0)
  }

  test("out-of-vocabulary tokens take the OOV bucket probability and ratio") {
    val out = CorpusStats.lmScore(docs, vocabSize = 2)
      .orderBy("doc_id").collect()
    val d2 = out(1)
    assert(d2.getAs[Long]("n_tokens") == 2L)
    assert(d2.getAs[Double]("lm_score") ==
      round4((math.log(0.5) + math.log(0.125)) / 2))
    assert(d2.getAs[Double]("oov_ratio") == 0.5)
  }

  test("an all-OOV document scores strictly below an in-vocab one") {
    val corpus = Seq((1L, "x x x x"), (2L, "zz yy")).toDF("doc_id", "text")
    val out = CorpusStats.lmScore(corpus, vocabSize = 1)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Double]("lm_score") > out(1).getAs[Double]("lm_score"))
    assert(out(1).getAs[Double]("oov_ratio") == 1.0)
  }
}
