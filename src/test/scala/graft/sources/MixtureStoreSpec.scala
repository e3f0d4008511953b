package graft.sources

import graft.SparkSpecBase
import graft.operators.CorpusStats
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Lifecycle spec for the persisted mixture-datasheet store: integer
  * count deltas must serve the datasheet BIT-IDENTICALLY to a fresh
  * scan (exactness, not a rounding class — the contrast with
  * GramStore's FP caveat), retraction must bite, a fully-retracted
  * slice must vanish, compaction must fold without changing the
  * answer, and a tampered layer must change the served shares.
  */
class MixtureStoreSpec extends SparkSpecBase {

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_mix_$tag").toString

  private def docs(rows: Seq[(Long, String, String, String)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, txt, l, src) =>
        Row(id, txt, l, src)
      }, 2),
      StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType, nullable = true),
        StructField("lang", StringType, nullable = true),
        StructField("source", StringType, nullable = true))))

  // two languages, two sources; the (de, wiki) slice exists ONLY in
  // the removable docs 5/6, so retracting them must erase the slice
  private def all = docs(Seq(
    (1L, "a b c", "en", "web"),
    (2L, "d e", "en", "web"),
    (3L, "f g h i", "en", "wiki"),
    (4L, "j", "en", "wiki"),
    (5L, "k l m", "de", "wiki"),
    (6L, "n o", "de", "wiki")))

  private def served(path: String): Seq[Row] =
    MixtureStore.served(spark, path)
      .orderBy("lang", "source").collect().toSeq

  private def fresh(corpus: DataFrame): Seq[Row] =
    CorpusStats.mixture(corpus)
      .orderBy("lang", "source").collect().toSeq

  test("append ≡ rebuild, bit-identically (integer counts)") {
    val path = freshPath("roll")
    MixtureStore.build(all.filter("doc_id <= 4"), path)
    MixtureStore.append(all.filter("doc_id > 4"), path)
    assert(served(path) == fresh(all))
  }

  test("delete retracts exactly, bites, and a fully-retracted slice vanishes") {
    val path = freshPath("del")
    MixtureStore.build(all, path)
    MixtureStore.delete(all.filter("doc_id >= 5"), path)
    val got = served(path)
    assert(got == fresh(all.filter("doc_id <= 4")))
    assert(got != fresh(all)) // shares and counts visibly move
    // the (de, wiki) slice lived only in the retracted docs — gone,
    // as if never ingested (not present with zero counts)
    assert(!got.exists(r => r.getString(0) == "de"))
    assert(got.size == fresh(all).size - 1)
  }

  test("partial retraction keeps the slice with reduced exact counts") {
    val path = freshPath("part")
    MixtureStore.build(all, path)
    MixtureStore.delete(all.filter("doc_id = 3"), path) // one of two (en, wiki)
    assert(served(path) == fresh(all.filter("doc_id <> 3")))
  }

  test("compact folds to one row per slice without changing the datasheet") {
    val path = freshPath("compact")
    MixtureStore.build(all.filter("doc_id <= 4"), path)
    MixtureStore.append(all.filter("doc_id > 4"), path)
    MixtureStore.delete(all.filter("doc_id >= 5"), path)
    val before = served(path)
    MixtureStore.compact(spark, path)
    assert(served(path) == before)
    // 2 surviving slices, one folded row each; the retracted slice's
    // rows are PHYSICALLY gone (the takedown retention guarantee)
    assert(spark.read.parquet(s"$path/slices").count() == 2L)
  }

  test("tamper: corrupted stored counts change the served datasheet") {
    import org.apache.spark.sql.functions._
    val path = freshPath("tamper")
    MixtureStore.build(all, path)
    val honest = served(path)
    val forged = spark.read.parquet(s"$path/slices")
      .withColumn("n_tokens", col("n_tokens") * 10L)
    forged.write.mode("overwrite").parquet(s"$path/slices_forged")
    val fs = SwapRecovery.fsOf(spark, path)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/slices"), true)
    SwapRecovery.renameOrThrow(fs,
      new org.apache.hadoop.fs.Path(s"$path/slices_forged"),
      new org.apache.hadoop.fs.Path(s"$path/slices"))
    assert(served(path) != honest)
  }

  test("the serve path reads only the store — the corpus is never rescanned") {
    val corpus = Tables.documents(spark, sfDir)
    val path = freshPath("serveplan")
    MixtureStore.build(corpus, path)
    val plan = MixtureStore.served(spark, path)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      s"serve plan rescans the corpus:\n$plan")
  }

  test("gate slices: store over the sf corpus equals the fresh datasheet") {
    val corpus = Tables.documents(spark, sfDir)
    val path = freshPath("sf")
    MixtureStore.build(corpus.filter("doc_id % 5 <> 0"), path)
    MixtureStore.append(corpus.filter("doc_id % 5 = 0"), path)
    assert(served(path) == fresh(corpus))
  }

  test("flat delete against a batch-keyed store throws, never lands invisibly") {
    // a streamed (batch-keyed) store must reject the flat takedown
    // path: its negated counts would land as root files that partition
    // discovery silently drops — the served datasheet would keep
    // counting the retracted docs with no error anywhere
    val path = freshPath("keyedguard")
    MixtureStore.appendBatch(all, path, batchId = 0L)
    val before = served(path)
    val err = intercept[IllegalStateException] {
      MixtureStore.delete(all.filter("doc_id = 5"), path)
    }
    assert(err.getMessage.contains("batch-keyed"))
    assert(served(path) == before,
      "the refused takedown must not half-land")
    // the keyed twin is the supported path, and it bites
    MixtureStore.deleteBatch(all.filter("doc_id in (5, 6)"), path, 1L)
    assert(served(path) == fresh(all.filter("doc_id < 5")))
  }
}
