package graft.plans

import graft.SparkSpecBase
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._

/** The codegen'd minhash-signature kernel must produce EXACTLY the
  * values of the HOF formulation it replaced
  * (`minhashSigFromHashes(transform(wordShingles, md5Hash32), k)`) —
  * that identity is what keeps the DuckDB minhash oracles verbatim
  * (same md5-affine family, same shingle law).
  */
class MinhashSigSpec extends SparkSpecBase {

  private def legacy(df: org.apache.spark.sql.DataFrame, n: Int, k: Int) =
    df.select(col("doc_id"), TF.wordShingles(col("text"), n).as("sh"))
      .withColumn("hs", transform(col("sh"), TF.md5Hash32 _))
      .select(col("doc_id"), TF.minhashSigFromHashes(col("hs"), k).as("sig"))

  private def kernel(df: org.apache.spark.sql.DataFrame, n: Int, k: Int) = {
    GraftFunctions.ensureRegistered(spark)
    df.select(col("doc_id"), TF.words(col("text")).as("w"))
      .select(col("doc_id"), TF.minhashSigWords(col("w"), n, k).as("sig"))
  }

  test("kernel equals the HOF md5-affine pipeline on the corpus") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    for ((n, k) <- Seq((3, 32), (4, 16))) {
      val a = legacy(docs, n, k)
      val b = kernel(docs, n, k)
      assert(a.exceptAll(b).count() === 0, s"n=$n k=$k legacy-only rows")
      assert(b.exceptAll(a).count() === 0, s"n=$n k=$k kernel-only rows")
    }
  }

  test("edge cases: empty text, fewer words than n") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "one"), (3L, "one two three"),
      (4L, ("w " * 50).trim)).toDF("doc_id", "text")
    val a = legacy(docs, 3, 8).orderBy("doc_id").collect().toSeq
    val b = kernel(docs, 3, 8).orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("NULL text yields a NULL signature (legacy signed a phantom empty shingle)") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, null)).toDF("doc_id", "text")
    // the HOF formulation leaks a signature for NULL text (concat_ws
    // turns the null sliced array into md5('')); the null-intolerant
    // kernel returns NULL instead, so a NULL doc produces no band rows
    // and matches nothing — same deliberate divergence ShingleHashSpec
    // pins for the 60-bit kernel.
    assert(legacy(docs, 3, 8).filter(col("doc_id") === 2L)
      .head().isNullAt(1) === false)
    assert(kernel(docs, 3, 8).filter(col("doc_id") === 2L)
      .head().isNullAt(1) === true)
  }
}
