package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BigramLmSpec extends SparkSpecBase {

  test("word order matters: same bag, different bigram score") {
    import spark.implicits._
    // corpus dominated by "a b" transitions; doc 3 has the same BAG as
    // doc 1 but scrambled order -> unseen bigrams -> lower score
    val docs = Seq(
      (1L, "a b a b a b"),
      (2L, "a b a b a b"),
      (3L, "a a a b b b"))
      .toDF("doc_id", "text")
    val out = CorpusStats.bigramLmScore(docs, vocabSize = 4)
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(byId(1L) === byId(2L))
    assert(byId(3L) < byId(1L),
      s"scrambled doc should score lower: ${byId(3L)} vs ${byId(1L)}")
    // closed alphabet: everything in-vocab here
    assert(out.forall(_.getDouble(3) === 0.0))
  }

  test("out-of-vocab tokens map to <unk> and are counted") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x x x x x x x"), // dominates the vocab
      (2L, "x rare1 x rare2"))
      .toDF("doc_id", "text")
    val out = CorpusStats.bigramLmScore(docs, vocabSize = 1)
      .orderBy("doc_id").collect()
    assert(out.find(_.getLong(0) == 2L).get.getDouble(3) === 1.0) // every bigram touches unk
    assert(out.find(_.getLong(0) == 1L).get.getDouble(3) === 0.0)
  }

  test("single-token and null docs are excluded; corpus run is deterministic") {
    import spark.implicits._
    val docs = Seq((1L, "lonely"), (2L, null), (3L, "a b")).toDF("doc_id", "text")
    val ids = CorpusStats.bigramLmScore(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(3L))
    val corpus = graft.sources.Tables.documents(spark, sfDir)
    val a = CorpusStats.bigramLmScore(corpus).orderBy("doc_id").collect()
    val b = CorpusStats.bigramLmScore(corpus).orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
  }
}
