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

  test("exact-collapse is value-identical to the raw-grain form, including past the maxShingles cap") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{call_function, posexplode}
    // maxShingles = 5 with 12-word docs makes the cap BITE: a non-rep
    // twin's coverage stops at word maxShingles+n-2 = 8, so its tail
    // words survive — the member-reconstruction law must reproduce that
    val base = Seq(
      (1L, "p q r s x y z w t0 t1 t2 t3"),
      (2L, "a b c d p q r s u0 u1 u2 u3"),
      (3L, "k l m n o u v t"))
      .toDF("doc_id", "text")
    val corpus = base
      .unionByName(base.withColumn("doc_id", col("doc_id") + 100L))
      .unionByName(base.filter(col("doc_id") <= 1)
        .withColumn("doc_id", col("doc_id") + 200L))
    val n = 4
    val cap = 5
    // raw-grain reference: the pre-collapse implementation inline
    val w = graft.functions.TextFunctions.words(col("text"))
    val baseRaw = corpus
      .select(col("doc_id"), w.as("w"),
        call_function("graft_shingle_hash60", w, lit(n), lit(cap)).as("hs"))
    val pos = baseRaw.select(col("doc_id"), size(col("w")).as("nw"),
      posexplode(col("hs")).as(Seq("i", "h")))
    val spread = pos.select(col("doc_id"), col("h")).distinct()
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canon"))
    val removed = pos.join(spread, Seq("h"))
      .filter(col("n_docs") >= 2 && col("doc_id") =!= col("canon"))
      .select(col("doc_id"), explode(sequence(col("i"),
        least(col("i") + lit(n - 1), col("nw") - 1))).as("p"))
      .distinct()
      .groupBy(col("doc_id")).agg(collect_set(col("p")).as("rm"))
    val raw = baseRaw.join(removed, Seq("doc_id"), "left")
      .select(col("doc_id"), col("w"),
        coalesce(col("rm"), array().cast("array<int>")).as("rm"))
      .select(col("doc_id"),
        size(col("w")).as("n_words"),
        filter(col("w"), (_, i) => !array_contains(col("rm"), i)).as("kept"))
      .select(col("doc_id"), col("n_words"),
        (col("n_words") - size(col("kept"))).cast("long").as("n_removed"),
        concat_ws(" ", col("kept")).as("clean_text"))
      .orderBy("doc_id").collect().toSeq
    val collapsed = CorpusStats.dupSpansClean(corpus, n = n, maxShingles = cap)
      .orderBy("doc_id").collect().toSeq
    assert(collapsed == raw)
    // the cap must actually bite on this corpus: some twin keeps a tail
    assert(raw.exists(r => r.getLong(0) > 100L && r.getLong(2) > 0 &&
      r.getString(3).nonEmpty))
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
