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
