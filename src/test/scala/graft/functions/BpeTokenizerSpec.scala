package graft.functions

import graft.SparkSpecBase

class BpeTokenizerSpec extends SparkSpecBase {
  import spark.implicits._

  test("merge table is frozen, full-size, and deterministic") {
    assert(BpeTokenizer.merges.size == BpeTokenizer.NumMerges)
    assert(BpeTokenizer.merges == BpeTokenizer.merges.toList)
    // rules only ever merge lowercase-letter symbols (seed is [a-z ])
    assert(BpeTokenizer.merges.forall { case (a, b) =>
      (a + b).forall(c => c >= 'a' && c <= 'z') })
    // no duplicate rules
    assert(BpeTokenizer.merges.distinct.size == BpeTokenizer.merges.size)
  }

  test("mergePass is one left-to-right pass (the aaa case)") {
    assert(BpeTokenizer.mergePass(List("a", "a", "a"), "a", "a") ==
      List("aa", "a"))
    assert(BpeTokenizer.mergePass(List("a", "a", "a", "a"), "a", "a") ==
      List("aa", "aa"))
    assert(BpeTokenizer.mergePass(Nil, "a", "b") == Nil)
  }

  test("encode reassembles the word and compresses seed-frequent words") {
    for (w <- Seq("the", "stream", "query", "window", "xyzzy", "a")) {
      val toks = BpeTokenizer.encode(w)
      assert(toks.mkString == w, s"lossy encode of $w: $toks")
      assert(toks.nonEmpty && toks.size <= w.length)
    }
    // 'the' dominates the seed -> must end as a single token
    assert(BpeTokenizer.encode("the") == List("the"))
    // a word with no seed bigrams stays mostly characters
    assert(BpeTokenizer.encode("qqq").size == 3)
  }

  test("countTokens sums per-word counts over whitespace runs") {
    val n = BpeTokenizer.countTokens("the  stream\tthe")
    assert(n == BpeTokenizer.wordTokenCount("the") * 2 +
      BpeTokenizer.wordTokenCount("stream"))
    assert(BpeTokenizer.countTokens("") == 0L)
    assert(BpeTokenizer.countTokens("   ") == 0L)
  }

  test("bpeTokenCount column matches the direct encoder, NULL-safe") {
    val df = Seq(
      (1L, Some("the quick stream")),
      (2L, Some("")),
      (3L, None: Option[String])
    ).toDF("id", "text")
    val got = df.select($"id",
      TextFunctions.bpeTokenCount($"text").as("n"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got(1L).contains(BpeTokenizer.countTokens("the quick stream")))
    assert(got(2L).contains(0L))
    assert(got(3L).isEmpty)
  }
}
