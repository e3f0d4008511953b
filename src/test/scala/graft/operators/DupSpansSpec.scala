package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class DupSpansSpec extends SparkSpecBase {

  test("shared spans are flagged, unique docs stay clean") {
    import spark.implicits._
    // A and B share the span "p q r s" (one 4-gram); C shares nothing
    val docs = Seq(
      (1L, "p q r s x y z w"),
      (2L, "a b c d p q r s"),
      (3L, "k l m n o u v t"))
      .toDF("doc_id", "text")
    val out = CorpusStats.dupSpans(docs).orderBy("doc_id").collect()
    // 8 words -> 5 distinct 4-gram shingles per doc
    assert(out.map(_.getLong(1)).toSeq === Seq(5L, 5L, 5L))
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 1L, 0L))
    assert(out.map(_.getDouble(3)).toSeq === Seq(0.2, 0.2, 0.0))
    assert(out.map(_.getLong(4)).toSeq === Seq(2L, 2L, 1L))
  }

  test("within-doc repeats do not count as cross-corpus duplication") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y z w x y z w x y z w"),
      (2L, "totally different words here indeed"))
      .toDF("doc_id", "text")
    val out = CorpusStats.dupSpans(docs).orderBy("doc_id").collect()
    // doc 1's repeated shingles collapse per-doc (DISTINCT grain), and
    // nothing is shared with doc 2
    assert(out.forall(_.getLong(2) == 0L))
    assert(out.forall(_.getLong(4) == 1L))
  }

  test("exact-collapse is value-identical to the raw-grain form on a replica-heavy corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions.call_function
    val base = Seq(
      (1L, "p q r s x y z w"),
      (2L, "a b c d p q r s"),
      (3L, "k l m n o u v t"),
      (4L, "x y z w x y z w x y z w"))
      .toDF("doc_id", "text")
    val corpus = base
      .unionByName(base.filter(col("doc_id") <= 3)
        .withColumn("doc_id", col("doc_id") + 100L))
      .unionByName(base.filter(col("doc_id") <= 1)
        .withColumn("doc_id", col("doc_id") + 200L))
    // raw-grain reference: the pre-collapse implementation inline
    val sh = corpus
      .select(col("doc_id"), explode(call_function("graft_shingle_hash60",
        graft.functions.TextFunctions.words(col("text")),
        lit(4), lit(2000))).as("h"))
      .distinct()
    val spread = sh.groupBy(col("h")).agg(count(lit(1)).as("n_docs"))
    val raw = sh.join(spread, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("n_docs") >= 2, 1).otherwise(0)).cast("long").as("n_dup"),
        round(sum(when(col("n_docs") >= 2, 1).otherwise(0)).cast("double")
          / count(lit(1)), 4).as("dup_frac"),
        max(col("n_docs")).as("max_span_docs"))
      .orderBy("doc_id").collect().toSeq
    val collapsed = CorpusStats.dupSpans(corpus)
      .orderBy("doc_id").collect().toSeq
    assert(collapsed == raw)
  }

  test("corpus run is deterministic and fractions are consistent") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val a = CorpusStats.dupSpans(docs).orderBy("doc_id").collect()
    val b = CorpusStats.dupSpans(docs).orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
    a.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(math.abs(r.getDouble(3) -
        BigDecimal(r.getLong(2).toDouble / r.getLong(1))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }
}
