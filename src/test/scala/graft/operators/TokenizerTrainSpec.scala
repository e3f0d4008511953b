package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Distributed BPE training ([[TokenizerTrain.bpeTrain]]): the merge
  * table is a pure function of the corpus — hand-checked rounds,
  * lexicographic tie-breaks, overlap-counting pair weights, the
  * word-type weighting, and early stop when the corpus runs dry.
  */
class TokenizerTrainSpec extends SparkSpecBase {
  import spark.implicits._

  test("hand-checked merges on a tiny corpus, ties break lexicographically") {
    val docs = Seq((1L, "the cat sat"), (2L, "the cat"), (3L, "the"))
      .toDF("doc_id", "text")
    val got = TokenizerTrain.bpeTrain(docs, numMerges = 8)
      .orderBy("rank")
      .as[(Int, String, String, String, Long)].collect().toSeq
    // the×3, cat×2, sat×1: round 1 has (t,h)=3, (h,e)=3, (a,t)=3,
    // (c,a)=2 — ties at 3 break to (a,t); then (h,e); then (t,he);
    // then word-internal finishes; corpus runs dry after 5 merges
    assert(got == Seq(
      (1, "a", "t", "at", 3L),
      (2, "h", "e", "he", 3L),
      (3, "t", "he", "the", 3L),
      (4, "c", "at", "cat", 2L),
      (5, "s", "at", "sat", 1L)))
  }

  test("overlapping positions count: 'aaa' carries (a,a) twice") {
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val got = TokenizerTrain.bpeTrain(docs, numMerges = 2)
      .orderBy("rank")
      .as[(Int, String, String, String, Long)].collect().toSeq
    // round 1: (a,a) at two positions → n=2; merge leaves [aa, a];
    // round 2: (aa, a) once
    assert(got == Seq((1, "a", "a", "aa", 2L), (2, "aa", "a", "aaa", 1L)))
  }

  test("training text is lowercased and restricted to alpha words") {
    val docs = Seq((1L, "The CAT. sat 42 ok")).toDF("doc_id", "text")
    // "cat." and "42" are filtered; "The" lowers to "the"
    val out = TokenizerTrain.bpeTrain(docs, numMerges = 20)
    val syms = out.select(concat(col("pair_a"), col("pair_b")))
      .as[String].collect().toSet
    assert(!syms.exists(_.contains(".")))
    assert(!syms.exists(_.exists(_.isDigit)))
    assert(!syms.exists(_.exists(_.isUpper)))
  }

  // --- the drift loop acted on: TokenizerTrain.bpeRetrainServe ---

  /** Token count of `w` under a LEARNED merge table: apply each merge
    * in rank order with the production mergePass (the same replay the
    * trainer uses between rounds).
    */
  private def tokensUnder(merges: Seq[(String, String)], w: String): Int = {
    var syms = w.map(_.toString).toList
    merges.foreach { case (a, b) =>
      syms = graft.functions.BpeTokenizer.mergePass(syms, a, b)
    }
    syms.length
  }

  private def cpt(docs: org.apache.spark.sql.DataFrame,
      merges: Seq[(String, String)]): Double = {
    val rows = docs.select("text").as[String].collect()
    val chars = rows.map(_.length.toLong).sum
    val toks = rows.map(_.trim.split("\\s+")
      .map(w => tokensUnder(merges, w).toLong).sum).sum
    chars.toDouble / toks
  }

  /** A corpus the FROZEN (English-seed) table fragments: words made of
    * rare-bigram consonants collapse to ~1 char/token under it.
    */
  private lazy val drifted = (1L to 40L)
    .map(i => (i, Seq.fill(12)("zqxjkw").mkString(" "), "xx", s"src${i % 2}"))
    .toDF("doc_id", "text", "lang", "source")

  test("retrain trigger fires on a drifted mix and the served table recovers compression") {
    val served = TokenizerTrain.bpeRetrainServe(drifted, threshold = 3.8)
    assert(served.select("retrained").distinct().as[Boolean].collect()
      .toSeq == Seq(true))
    val trigCpt = served.select("trigger_cpt").distinct()
      .as[Double].head()
    assert(trigCpt < 3.8, s"frozen table must fragment the mix ($trigCpt)")
    // served table == a fresh train over the same mix (the act half)
    val fresh = TokenizerTrain.bpeTrain(drifted, 8)
      .select("rank", "pair_a", "pair_b", "merged")
      .as[(Int, String, String, String)].collect().toSeq
    val got = served.select("rank", "pair_a", "pair_b", "merged")
      .orderBy("rank").as[(Int, String, String, String)].collect().toSeq
    assert(got == fresh.sortBy(_._1))
    // DRIFT RECOVERS: compression under the retrained table beats the
    // frozen table on the very mix that triggered
    val learned = got.map(m => (m._2, m._3))
    val frozenCpt = cpt(drifted, graft.functions.BpeTokenizer.merges)
    val retrainedCpt = cpt(drifted, learned)
    assert(retrainedCpt > frozenCpt * 2,
      s"retrain must recover compression: frozen $frozenCpt, " +
        s"retrained $retrainedCpt")
  }

  test("a healthy corpus skips the rebuild and keeps serving the frozen table") {
    // threshold 0 is unreachable (compression is >= 1 by construction),
    // so ANY corpus reads as healthy — the no-op contract
    val served = TokenizerTrain.bpeRetrainServe(drifted, threshold = 0.0)
    assert(served.select("retrained").distinct().as[Boolean].collect()
      .toSeq == Seq(false))
    val got = served.select("rank", "pair_a", "pair_b", "merged")
      .orderBy("rank").as[(Int, String, String, String)].collect().toSeq
    val frozen = graft.functions.BpeTokenizer.merges.zipWithIndex
      .map { case ((a, b), i) => (i + 1, a, b, a + b) }
    assert(got == frozen)
  }

  test("codegen merge kernel is value-identical to BpeTokenizer.mergePass") {
    import graft.functions.BpeTokenizer
    import org.apache.spark.sql.GraftInternal
    // adversarial shapes: overlap runs ("aaa" merges once then skips),
    // merge at both ends, merged-token adjacency (ab,a,b must not
    // re-merge the fresh ab), no-op rows, empty and 1-symbol arrays
    val cases: Seq[(Seq[String], String, String)] = Seq(
      (Seq("a", "a", "a"), "a", "a"),
      (Seq("a", "a", "a", "a"), "a", "a"),
      (Seq("a", "b", "a", "b"), "a", "b"),
      (Seq("x", "a", "b"), "a", "b"),
      (Seq("a", "b", "x"), "a", "b"),
      (Seq("a", "b"), "a", "b"),
      (Seq("b", "a"), "a", "b"),
      (Seq("a"), "a", "a"),
      (Seq.empty[String], "a", "b"),
      (Seq("q", "r", "s"), "a", "b"),
      (Seq("ab", "a", "b", "ab"), "a", "b"))
    val df = cases.zipWithIndex
      .map { case ((syms, a, b), i) => (i, syms, a, b) }
      .toDF("id", "syms", "a", "b")
    val got = df.select(col("id"),
        GraftInternal.columnOf(graft.plans.BpeMergePassExpr(
          GraftInternal.expressionOf(col("syms")),
          GraftInternal.expressionOf(col("a")),
          GraftInternal.expressionOf(col("b")))).as("merged"))
      .orderBy("id").as[(Int, Seq[String])].collect().toSeq
    val want = cases.zipWithIndex.map { case ((syms, a, b), i) =>
      (i, BpeTokenizer.mergePass(syms.toList, a, b): Seq[String])
    }
    assert(got == want)
  }

  test("word-TYPE weighting: duplicate docs multiply counts, not merges") {
    val one = Seq((1L, "hello world")).toDF("doc_id", "text")
    val ten = (1L to 10L).map(i => (i, "hello world")).toDF("doc_id", "text")
    val a = TokenizerTrain.bpeTrain(one, 4).orderBy("rank")
      .select("rank", "pair_a", "pair_b").as[(Int, String, String)]
      .collect().toSeq
    val b = TokenizerTrain.bpeTrain(ten, 4).orderBy("rank")
      .select("rank", "pair_a", "pair_b").as[(Int, String, String)]
      .collect().toSeq
    assert(a == b) // same merge sequence
    val na = TokenizerTrain.bpeTrain(one, 1).select("n_occurrences")
      .as[Long].head()
    val nb = TokenizerTrain.bpeTrain(ten, 1).select("n_occurrences")
      .as[Long].head()
    assert(nb == 10L * na) // counts scale with occurrences
  }
}
