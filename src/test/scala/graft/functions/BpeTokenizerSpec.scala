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

  test("512-merge table compresses the corpus into the realistic band") {
    assert(BpeTokenizer.NumMerges >= 512)
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").where("text IS NOT NULL").as[String].collect()
    assert(texts.nonEmpty)
    var words = 0L
    var toks = 0L
    texts.foreach { t =>
      val ws = t.trim.split("\\s+").filter(_.nonEmpty)
      words += ws.length
      toks += BpeTokenizer.countTokens(t)
    }
    val ratio = toks.toDouble / words.toDouble
    // a production-shaped table tokenizes common words as ~1 token and
    // rarer ones as a few subwords: 1.1-1.5 tokens/word, NOT ~chars/word
    assert(ratio >= 1.1 && ratio <= 1.5, s"tokens/word ratio $ratio")
  }

  test("whitespace word boundary is the regex \\s class, not isWhitespace") {
    // U+00A0 (no-break space) is NOT regex-\s: it must stay inside the
    // word, exactly as string_split_regex(text, '\s+') keeps it
    val nbsp = "the\u00A0stream"
    assert(BpeTokenizer.countTokens(nbsp) ==
      BpeTokenizer.wordTokenCount(nbsp))
    // the five ASCII \s chars all delimit
    assert(BpeTokenizer.countTokens("a\tb\nc\u000Bd\fe\rf") ==
      Seq("a", "b", "c", "d", "e", "f").map(BpeTokenizer.wordTokenCount).sum)
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

  test("per-slice compression eval equals the per-doc counts aggregated by hand") {
    import org.apache.spark.sql.functions.{col, length, round, sum}
    // the text_bpe_eval law: chars-per-BPE-token per (lang, source)
    // must equal summing the per-doc counts the direct encoder gives
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
    val slices = docs
      .groupBy(col("lang"), col("source"))
      .agg(sum(length(col("text"))).cast("long").as("n_chars"),
        sum(TextFunctions.bpeTokenCount(col("text"))).cast("long")
          .as("bpe_tokens"))
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val byHand = docs.select(col("lang"), col("source"), col("text"))
      .as[(String, String, String)].collect()
      .groupBy(r => (r._1, r._2))
      .map { case (k, rows) =>
        k -> (rows.map(_._3.length.toLong).sum,
          rows.map(r => BpeTokenizer.countTokens(r._3)).sum) }
    assert(slices.nonEmpty && slices == byHand)
  }
}
