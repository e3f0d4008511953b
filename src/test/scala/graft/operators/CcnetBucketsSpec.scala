package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Laws of [[CorpusStats.ccnetBuckets]]: per-lang tercile partition of
  * the LM fluency score, strict-> threshold comparisons, and the
  * integer score-mass accounting.
  */
class CcnetBucketsSpec extends SparkSpecBase {
  import spark.implicits._

  // two langs, six docs each, engineered so in-vocab mass (and hence
  // lm_score) varies monotonically within each lang
  private val docs = (0 until 12).map { i =>
    val lang = if (i < 6) "en" else "de"
    val good = "the " * (i % 6)          // vocab tokens raise the score
    val bad = s"zz$i qq$i ww$i"          // per-doc OOV floor
    (i.toLong, (good + bad).trim, lang)
  }.toDF("doc_id", "text", "lang")

  private lazy val out = CorpusStats.ccnetBuckets(docs).collect()
    .map(r => (r.getAs[String]("lang"), r.getAs[String]("bucket")) ->
      ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("score_e4_sum"), r.getAs[Double]("min_score"),
        r.getAs[Double]("max_score"))))
    .toMap

  test("buckets partition each lang's documents") {
    for (lang <- Seq("en", "de")) {
      val n = Seq("head", "middle", "tail")
        .map(b => out.get((lang, b)).map(_._1).getOrElse(0L)).sum
      assert(n == 6L, s"$lang buckets must cover all 6 docs")
    }
  }

  test("bucket score ranges are ordered: tail < middle < head") {
    for (lang <- Seq("en", "de")) {
      val tailMax = out((lang, "tail"))._5
      val midMin = out((lang, "middle"))._4
      val midMax = out((lang, "middle"))._5
      val headMin = out((lang, "head"))._4
      assert(tailMax < midMin, s"$lang: tail/middle overlap")
      assert(midMax < headMin, s"$lang: middle/head overlap")
    }
  }

  test("score mass is the exact integer sum of per-doc 1e4-scaled scores") {
    val perDoc = CorpusStats.lmScore(docs)
      .select(sum(round(col("lm_score") * 10000).cast("long")))
      .collect()(0).getLong(0)
    val bucketed = out.values.map(_._3).sum
    assert(bucketed == perDoc)
  }

  test("token counts roll up exactly") {
    val total = CorpusStats.lmScore(docs)
      .select(sum(col("n_tokens"))).collect()(0).getLong(0)
    assert(out.values.map(_._2).sum == total)
  }

  test("DSIR resampling pulls toward the target slice") {
    // en docs speak "the", de docs speak "das": the importance
    // log-ratio is strongly positive for target-favored tokens and
    // strongly negative otherwise — far beyond the Gumbel noise band,
    // so the top-5 must be all-target with positive scores
    val mix = (0 until 10).map(i => (i.toLong, ("the " * 30).trim, "en")) ++
      (10 until 20).map(i => (i.toLong, (s"das w$i " * 15).trim, "de"))
    val sample = CorpusStats.dsirSample(mix.toDF("doc_id", "text", "lang"),
      targetLang = "en", n = 5)
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("score_e4")))
    assert(sample.length == 5)
    assert(sample.forall(_._1 == "en"), sample.mkString(","))
    assert(sample.forall(_._2 > 0), sample.mkString(","))
  }
}
