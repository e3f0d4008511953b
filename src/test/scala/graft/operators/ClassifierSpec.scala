package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpecBase {
  import spark.implicits._

  // A tiny corpus with a clean signal: "good" docs talk about rivers,
  // "bad" docs about spam. Labels are given directly (any weak-
  // supervision law may produce them — the gated entry uses the Gopher
  // gate).
  private def docs = Seq(
    (1L, "the clear river flows past the quiet village bank"),
    (2L, "a calm river winds through the green valley bank"),
    (3L, "buy cheap pills now spam offer click here now"),
    (4L, "spam spam offer free pills click now cheap deal"),
    (5L, "the river bank village deal") // mixed: river-leaning
  ).toDF("doc_id", "text")

  private def labels = Seq(
    (1L, true), (2L, true), (3L, false), (4L, false), (5L, true)
  ).toDF("doc_id", "label")

  test("nbTrain: bounded vocab, distinct tokens, discriminative signs") {
    val m = Classifier.nbTrain(docs, labels, vocabSize = 8).collect()
    assert(m.length == 8)
    val toks = m.map(_.getString(0))
    assert(toks.distinct.length == toks.length)
    val byTok = m.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // "the" appears 4x in pos docs, 0x in neg → positive llr;
    // "spam" appears only in neg docs → negative llr (when in vocab)
    byTok.get("the").foreach { case (_, _, llr) => assert(llr > 0, byTok) }
    byTok.get("spam").foreach { case (cp, _, llr) =>
      assert(cp == 0L && llr < 0, byTok)
    }
    // class counts are occurrence counts, not doc counts
    byTok.get("now").foreach { case (cp, cn, _) =>
      assert(cp == 0L && cn == 3L, byTok)
    }
  }

  test("nbTrain: vocab cut is (total count DESC, token ASC)") {
    val m2 = Classifier.nbTrain(docs, labels, vocabSize = 2)
      .select("token").as[String].collect().toSet
    // totals: "the" 5; "river" 3, "spam" 3, "now" 3, "bank" 3 — the
    // tie at 3 breaks alphabetically: "bank" wins the second slot
    assert(m2 == Set("the", "bank"), m2)
  }

  test("nbScore: integer score sums, OOV-only doc scores the prior") {
    val model = Classifier.nbTrain(docs, labels, vocabSize = 8)
    val prior = Classifier.nbPrior(labels)
    val oov = Seq((9L, "zzz qqq www")).toDF("doc_id", "text")
    val s = Classifier.nbScore(oov, model, prior).collect().head
    val priorE4 = prior.as[Long].collect().head
    assert(s.getLong(2) == priorE4) // no in-vocab token → prior only
    assert(s.getLong(1) == 3L)
    // prior = round(ln(3/2)*1e4)
    assert(priorE4 == math.round(math.log(3.0 / 2.0) * 10000))
  }

  test("nbScore distills the labels on the training corpus") {
    val model = Classifier.nbTrain(docs, labels, vocabSize = 8)
    val scored = Classifier.nbScore(docs, model, Classifier.nbPrior(labels))
    val agree = scored.join(labels, Seq("doc_id"))
      .filter(col("pred") === col("label")).count()
    // separable toy corpus: the model must beat the constant-majority
    // predictor (3/5) — in fact it classifies all five correctly
    assert(agree == 5L, scored.collect().mkString("\n"))
  }

  test("nbConfusion: cells partition the corpus, shares sum to 1") {
    val model = Classifier.nbTrain(docs, labels, vocabSize = 8)
    val scored = Classifier.nbScore(docs, model, Classifier.nbPrior(labels))
    val conf = Classifier.nbConfusion(scored, labels).collect()
    assert(conf.map(_.getLong(2)).sum == 5L)
    assert(math.abs(conf.map(_.getDouble(3)).sum - 1.0) < 1e-12)
  }

  test("nbRetrainServe: healthy corpus keeps serving the frozen table") {
    // labels that AGREE with the frozen model's own predictions:
    // "spark table" scores 4055+1500+900 > 0 → pos; "slow join slow"
    // scores 4055-2000-1200-2000 < 0 → neg
    val d = Seq((1L, "spark table"), (2L, "slow join slow")).toDF("doc_id", "text")
    val l = Seq((1L, true), (2L, false)).toDF("doc_id", "label")
    val served = Classifier.nbRetrainServe(d, l).collect()
    assert(served.forall(!_.getBoolean(2)), served.mkString("\n")) // no fire
    assert(served.head.getDouble(3) == 1.0)
    val w = served.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w == Classifier.frozenWeights.toMap, w) // bytes of the frozen table
  }

  test("nbRetrainServe: drift fires the trigger and the retrain recovers") {
    // same docs, INVERTED labels — the frozen model now disagrees on
    // every doc (agreement 0.0 < 0.7) → retrain over the current mix
    val d = Seq((1L, "spark table"), (2L, "slow join slow")).toDF("doc_id", "text")
    val l = Seq((1L, false), (2L, true)).toDF("doc_id", "label")
    val served = Classifier.nbRetrainServe(d, l)
    val rows = served.collect()
    assert(rows.forall(_.getBoolean(2)), rows.mkString("\n")) // fired
    assert(rows.head.getDouble(3) == 0.0)
    // the retrained weights must now agree with the drifted labels
    val model = served.select(col("token"), col("llr_e4"))
    val rescored = Classifier.nbScore(d, model, Classifier.nbPrior(l))
      .join(l, Seq("doc_id"))
    assert(rescored.filter(col("pred") === col("label")).count() == 2L)
  }

  test("nbScore plan: model joins as broadcast, no corpus-grain sort") {
    val model = Classifier.nbTrain(docs, labels, vocabSize = 8)
    val scored = Classifier.nbScore(docs, model, Classifier.nbPrior(labels))
    val phys = scored.queryExecution.executedPlan.toString
    // the V-row model and the 1-row prior must both ride broadcast —
    // the corpus side never shuffles for the model lookup
    assert(phys.contains("BroadcastHashJoin") ||
      phys.contains("BroadcastNestedLoopJoin"), phys)
  }
}
