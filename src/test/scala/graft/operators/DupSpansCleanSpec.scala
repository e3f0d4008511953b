package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class DupSpansCleanSpec extends SparkSpecBase {

  test("canonical doc keeps the span; every other doc loses it") {
    import spark.implicits._
    val docs = Seq(
      (1L, "p q r s x y z w"), // canonical for "p q r s" (lowest id)
      (2L, "a b c d p q r s"), // loses its copy (positions 4..7)
      (3L, "k l m n o u v t")) // untouched
      .toDF("doc_id", "text")
    val out = CorpusStats.dupSpansClean(docs).orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getString(3))).toSeq === Seq(
      (1L, 8, 0L, "p q r s x y z w"),
      (2L, 8, 4L, "a b c d"),
      (3L, 8, 0L, "k l m n o u v t")))
  }

  test("overlapping duplicated windows remove the union of their cover") {
    import spark.implicits._
    // doc 2 contains "p q r s t" -> two duplicated 4-grams ("p q r s",
    // "q r s t") overlap; the removed positions are their union (5 words)
    val docs = Seq(
      (1L, "p q r s t x y z"),
      (2L, "m n p q r s t o"))
      .toDF("doc_id", "text")
    val out = CorpusStats.dupSpansClean(docs).orderBy("doc_id").collect()
    assert(out(0).getLong(2) === 0L)
    assert(out(1).getLong(2) === 5L)
    assert(out(1).getString(3) === "m n o")
  }

  test("removal counts agree with the dupSpans audit on the corpus") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val clean = CorpusStats.dupSpansClean(docs)
    val audit = CorpusStats.dupSpans(docs)
    val j = clean.join(audit, Seq("doc_id")).collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      val nRemoved = r.getAs[Long]("n_removed")
      val nDup = r.getAs[Long]("n_dup")
      // a doc with no cross-corpus dup shingles loses nothing; a doc
      // that loses words must have had a duplicated shingle
      if (nDup == 0) assert(nRemoved === 0L, r)
      if (nRemoved > 0) assert(nDup > 0, r)
    }
    // the action must remove something on this corpus (near-dups exist)
    assert(j.map(_.getAs[Long]("n_removed")).sum > 0)
  }
}
