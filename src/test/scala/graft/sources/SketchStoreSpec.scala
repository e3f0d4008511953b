package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame

/** Lifecycle spec for the persisted KMV sketch store: the semilattice
  * fold (union-then-keep-k-minima) must serve bit-identically to a
  * sketch built over the whole corpus, an under-full sketch must
  * answer the exact count, retraction must be REFUSED (no inverse
  * exists for lossy state — the design statement), and compaction must
  * fold the layers without changing the serve.
  */
class SketchStoreSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_kmv_$tag").toString

  private def docs(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "text", "lang")

  private def served(path: String, k: Int = 64): Seq[org.apache.spark.sql.Row] =
    SketchStore.served(spark, path, k).orderBy("lang").collect().toSeq

  private def fresh(corpus: DataFrame, k: Int = 64): Seq[org.apache.spark.sql.Row] = {
    val path = freshPath("scratch")
    SketchStore.build(corpus, path, k)
    served(path, k)
  }

  test("append ≡ rebuild on the gate corpus, bit-identically") {
    val corpus = Tables.documents(spark, sfDir)
    val path = freshPath("roll")
    SketchStore.build(corpus.filter("doc_id % 5 <> 0"), path)
    SketchStore.append(corpus.filter("doc_id % 5 = 0"), path)
    assert(served(path) == fresh(corpus))
  }

  test("a drop that displaces the k-th minimum folds exactly (k = 2)") {
    // with k=2 the base sketch keeps its 2 smallest hashes; the drop's
    // single doc hashes lower than one of them iff the union's 2-min
    // set differs from the base's — either way fold must equal a fresh
    // build over the union (the k-min-of-union law, small-k stress)
    val base = docs(Seq((1L, "alpha", "en"), (2L, "beta", "en"),
      (3L, "gamma", "en")))
    val drop = docs(Seq((4L, "delta", "en")))
    val path = freshPath("disp")
    SketchStore.build(base, path, k = 2)
    SketchStore.append(drop, path, k = 2)
    assert(served(path, k = 2) == fresh(base.union(drop), k = 2))
  }

  test("under-full sketch answers the exact distinct count") {
    val corpus = docs(Seq((1L, "a", "en"), (2L, "b", "en"),
      (3L, "a", "en"), (4L, "c", "de")))
    val path = freshPath("small")
    SketchStore.build(corpus, path)
    val got = served(path)
    // en: 3 rows, 2 distinct texts; de: 1 row, 1 distinct — all < k,
    // so est IS the exact distinct count
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getDouble(4)))
      == Seq(("de", 1L, 1.0), ("en", 3L, 2.0)))
  }

  test("delete is refused: lossy state has no inverse") {
    val path = freshPath("del")
    SketchStore.build(docs(Seq((1L, "a", "en"))), path)
    val e = intercept[UnsupportedOperationException] {
      SketchStore.delete(docs(Seq((1L, "a", "en"))), path)
    }
    assert(e.getMessage.contains("rebuild from the survivors"))
  }

  test("compact folds to one row per lang without changing the serve") {
    val corpus = Tables.documents(spark, sfDir)
    val path = freshPath("compact")
    SketchStore.build(corpus.filter("doc_id % 3 = 0"), path)
    SketchStore.append(corpus.filter("doc_id % 3 = 1"), path)
    SketchStore.append(corpus.filter("doc_id % 3 = 2"), path)
    val before = served(path)
    SketchStore.compact(spark, path)
    assert(served(path) == before)
    val layers = spark.read.parquet(s"$path/sketch")
    assert(layers.count() == layers.select("lang").distinct().count())
  }

  test("the serve path reads only the store — the corpus is never rescanned") {
    val corpus = Tables.documents(spark, sfDir)
    val path = freshPath("serveplan")
    SketchStore.build(corpus, path)
    val plan = SketchStore.served(spark, path)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      s"serve plan rescans the corpus:\n$plan")
  }

  test("tamper: a forged layer changes the served estimate") {
    import org.apache.spark.sql.functions._
    val corpus = Tables.documents(spark, sfDir)
    val path = freshPath("tamper")
    SketchStore.build(corpus, path)
    val honest = served(path)
    val forged = spark.read.parquet(s"$path/sketch")
      .withColumn("hs", transform(col("hs"), h => h / 2L))
    forged.write.mode("overwrite").parquet(s"$path/sketch_forged")
    val fs = SwapRecovery.fsOf(spark, path)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/sketch"), true)
    SwapRecovery.renameOrThrow(fs,
      new org.apache.hadoop.fs.Path(s"$path/sketch_forged"),
      new org.apache.hadoop.fs.Path(s"$path/sketch"))
    assert(served(path) != honest)
  }
}
