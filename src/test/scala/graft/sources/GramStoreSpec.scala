package graft.sources

import graft.SparkSpecBase
import graft.operators.Pca
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Lifecycle spec for the persisted PCA moment store: abelian moment
  * deltas must serve the same component as a fresh scan (to the
  * operator's 6-dp Gram rounding), retraction must bite, compaction
  * must fold the layers without changing the answer, and a tampered
  * moments layer must change the served component.
  */
class GramStoreSpec extends SparkSpecBase {

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_gram_$tag").toString

  private def emb(rows: Seq[(Long, Seq[Float], Int)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, v, l) =>
        Row(id, v, l)
      }, 2),
      StructType(Seq(
        StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType), nullable = true),
        StructField("label", IntegerType, nullable = false))))

  // survivors (1-4) are x-spread; vectors 5/6 dominate the y axis, so
  // the FULL corpus's component is y while the survivors' is x — a
  // retraction of 5/6 must flip the served direction (the bite)
  private def all = emb(Seq(
    (1L, Seq(1f, 0f), 0), (2L, Seq(-1f, 0f), 0),
    (3L, Seq(2f, 0f), 0), (4L, Seq(-2f, 0f), 0),
    (5L, Seq(0f, 5f), 0), (6L, Seq(0f, -5f), 0)))

  private def served(corpus: DataFrame, path: String): Seq[(Long, Double, Double)] = {
    val (n, s, ss) = GramStore.moments(spark, path)
    Pca.fromMoments(corpus, n, s, ss).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3))).toSeq
  }

  private def fresh(corpus: DataFrame): Seq[(Long, Double, Double)] = {
    val path = freshPath("scratch")
    GramStore.build(corpus, path)
    served(corpus, path)
  }

  test("append ≡ rebuild: rolled moments serve the union's component") {
    val path = freshPath("roll")
    val base = all.filter("vec_id <= 4")
    val drop = all.filter("vec_id > 4")
    GramStore.build(base, path)
    GramStore.append(drop, path)
    assert(served(all, path) == fresh(all))
  }

  test("delete retracts exactly, and it bites") {
    val path = freshPath("del")
    // retract the two y-axis vectors: the survivors are purely
    // x-spread, so the component must land on the x axis
    val removed = all.filter("vec_id >= 5")
    val survivors = all.filter("vec_id <= 4")
    GramStore.build(all, path)
    GramStore.delete(removed, path)
    val got = served(survivors, path)
    assert(got == fresh(survivors))
    assert(got != fresh(all).filter(_._1 <= 4L)) // full-corpus law differs
    assert(got.map(_._2) == Seq(1.0, -1.0, 2.0, -2.0)) // pure x scores
  }

  test("compact folds the layers without changing the served component") {
    val path = freshPath("compact")
    GramStore.build(all.filter("vec_id <= 4"), path)
    GramStore.append(all.filter("vec_id > 4"), path)
    GramStore.delete(all.filter("vec_id >= 5"), path)
    val before = served(all.filter("vec_id <= 4"), path)
    GramStore.compact(spark, path)
    assert(served(all.filter("vec_id <= 4"), path) == before)
    assert(spark.read.parquet(s"$path/moments").count() == 1L)
  }

  test("tamper: corrupted stored moments change the served component") {
    import org.apache.spark.sql.functions._
    val path = freshPath("tamper")
    GramStore.build(all, path)
    val honest = served(all, path)
    val forged = spark.read.parquet(s"$path/moments")
      .withColumn("ss", transform(col("ss"), v => v * 3.0))
    forged.write.mode("overwrite").parquet(s"$path/moments_forged")
    val fs = SwapRecovery.fsOf(spark, path)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/moments"), true)
    SwapRecovery.renameOrThrow(fs,
      new org.apache.hadoop.fs.Path(s"$path/moments_forged"),
      new org.apache.hadoop.fs.Path(s"$path/moments"))
    assert(served(all, path) != honest)
  }

  test("flat delete against a batch-keyed store throws, never lands invisibly") {
    // negated moments appended flat into a keyed layer would be
    // dropped by partition discovery: the served component would keep
    // the retracted vectors' contribution silently
    val path = freshPath("keyedguard")
    GramStore.appendBatch(all, path, batchId = 0L)
    val err = intercept[IllegalStateException] {
      GramStore.delete(all.filter("vec_id in (5, 6)"), path)
    }
    assert(err.getMessage.contains("batch-keyed"))
    // the keyed twin is the supported takedown, and it bites (the
    // component flips from y to x once 5/6 leave)
    GramStore.deleteBatch(all.filter("vec_id in (5, 6)"), path, 1L)
    val survivors = all.filter("vec_id < 5")
    assert(served(survivors, path) == fresh(survivors))
  }
}
