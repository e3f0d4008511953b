package graft.sources

import graft.SparkSpecBase
import graft.operators.Classifier
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lifecycle spec for the persisted Naive Bayes model store: abelian
  * append/retract deltas must make the served model BIT-IDENTICAL to a
  * fresh train over the corresponding corpus, retraction must visibly
  * bite, compaction must fold the layers without changing the answer,
  * and a tampered store must change the served weights (the gate
  * really reads the bytes).
  */
class NbModelStoreSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_nbm_$tag").toString

  private def docs = Seq(
    (1L, "alpha beta gamma alpha"),
    (2L, "beta beta delta"),
    (3L, "gamma delta epsilon"),
    (4L, "zeta zeta zeta eta"),
    (5L, "alpha eta theta"),
    (6L, "unique snowflake words here")
  ).toDF("doc_id", "text")

  private def labels = Seq(
    (1L, true), (2L, true), (3L, false),
    (4L, false), (5L, true), (6L, false)
  ).toDF("doc_id", "label")

  private def modelRows(df: DataFrame): Seq[(String, Long, Long, Long)] =
    df.orderBy("token").as[(String, Long, Long, Long)].collect().toSeq

  test("append ≡ rebuild: rolled store serves the union's fresh train") {
    val path = freshPath("roll")
    val base = docs.filter(col("doc_id") <= 4)
    val drop = docs.filter(col("doc_id") > 4)
    val bl = labels.filter(col("doc_id") <= 4)
    val dl = labels.filter(col("doc_id") > 4)
    NbModelStore.build(base, bl, path)
    NbModelStore.append(drop, dl, path)
    assert(modelRows(NbModelStore.model(spark, path)) ==
      modelRows(Classifier.nbTrain(docs, labels)))
    val priorE4 = NbModelStore.prior(spark, path).as[Long].collect().head
    assert(priorE4 == math.round(math.log(3.0 / 3.0) * 10000))
  }

  test("delete is exact subtraction: survivors' fresh train, and it bites") {
    val path = freshPath("del")
    val removed = docs.filter(col("doc_id") === 6L)
    val rl = labels.filter(col("doc_id") === 6L)
    NbModelStore.build(docs, labels, path)
    NbModelStore.delete(removed, rl, path)
    val served = modelRows(NbModelStore.model(spark, path))
    val survivors = docs.filter(col("doc_id") =!= 6L)
    val survLabels = labels.filter(col("doc_id") =!= 6L)
    assert(served == modelRows(Classifier.nbTrain(survivors, survLabels)))
    // the retraction BITES: the full-corpus model is different
    assert(served != modelRows(Classifier.nbTrain(docs, labels)))
    // doc 6's private tokens left the vocabulary entirely
    val toks = served.map(_._1).toSet
    assert(!toks.contains("snowflake") && !toks.contains("unique"), toks)
  }

  test("compact folds the delta layers without changing the answer") {
    val path = freshPath("compact")
    val removed = docs.filter(col("doc_id") === 6L)
    val rl = labels.filter(col("doc_id") === 6L)
    NbModelStore.build(docs, labels, path)
    NbModelStore.delete(removed, rl, path)
    val before = modelRows(NbModelStore.model(spark, path))
    val priorBefore = NbModelStore.prior(spark, path).as[Long].collect().head
    NbModelStore.compact(spark, path)
    assert(modelRows(NbModelStore.model(spark, path)) == before)
    assert(NbModelStore.prior(spark, path).as[Long].collect().head
      == priorBefore)
    // the raw layer is physically folded: no negative deltas survive,
    // one row per token, and the retracted tokens' rows are GONE
    val raw = spark.read.parquet(s"$path/counts")
    assert(raw.filter(col("cnt_pos") < 0 || col("cnt_neg") < 0).count() == 0L)
    val toks = raw.select("token").as[String].collect()
    assert(toks.distinct.length == toks.length)
    assert(!toks.contains("snowflake"), toks.toSeq)
    assert(spark.read.parquet(s"$path/doccounts").count() == 1L)
  }

  test("tamper: corrupted stored counts change the served model") {
    val path = freshPath("tamper")
    NbModelStore.build(docs, labels, path)
    val honest = modelRows(NbModelStore.model(spark, path))
    // an attacker (or bitrot) rewrites the counts layer with inflated
    // positives — the serve path must reflect the stored bytes, not
    // any cached or recomputed view
    val forged = spark.read.parquet(s"$path/counts")
      .withColumn("cnt_pos", col("cnt_pos") + 7L)
    forged.write.mode("overwrite").parquet(s"$path/counts_forged")
    val fs = SwapRecovery.fsOf(spark, path)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/counts"), true)
    SwapRecovery.renameOrThrow(fs,
      new org.apache.hadoop.fs.Path(s"$path/counts_forged"),
      new org.apache.hadoop.fs.Path(s"$path/counts"))
    assert(modelRows(NbModelStore.model(spark, path)) != honest)
  }

  test("lifecycle paths are mutually exclusive per store") {
    val path = freshPath("excl")
    NbModelStore.ensureRolled(
      docs.filter(col("doc_id") <= 4), labels.filter(col("doc_id") <= 4),
      docs.filter(col("doc_id") > 4), labels.filter(col("doc_id") > 4), path)
    intercept[IllegalArgumentException] {
      NbModelStore.ensureDeleted(docs, labels,
        docs.filter(col("doc_id") === 6L),
        labels.filter(col("doc_id") === 6L), path)
    }
  }

  test("flat delete against a batch-keyed store throws, never lands invisibly") {
    // a takedown's negative count deltas appended flat into a keyed
    // layer would vanish to partition discovery — the served model
    // would keep the forgotten docs' tokens silently
    val path = freshPath("keyedguard")
    NbModelStore.appendBatch(docs, labels, path, batchId = 0L)
    val before = modelRows(NbModelStore.model(spark, path))
    val err = intercept[IllegalStateException] {
      NbModelStore.delete(docs.filter(col("doc_id") === 6L),
        labels.filter(col("doc_id") === 6L), path)
    }
    assert(err.getMessage.contains("batch-keyed"))
    assert(modelRows(NbModelStore.model(spark, path)) == before,
      "the refused takedown must not half-land")
    // the keyed twin is the supported path, and it bites
    NbModelStore.deleteBatch(docs.filter(col("doc_id") === 6L),
      labels.filter(col("doc_id") === 6L), path, 1L)
    assert(modelRows(NbModelStore.model(spark, path)) ==
      modelRows(Classifier.nbTrain(
        docs.filter(col("doc_id") < 6), labels.filter(col("doc_id") < 6))))
  }
}
