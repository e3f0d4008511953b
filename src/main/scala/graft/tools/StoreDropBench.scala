package graft.tools

import org.apache.spark.sql.DataFrame

/** Drop-count bench for the three round-12 maintenance stores
  * (MixtureStore integer counts, SketchStore k-min state, GramStore
  * raw moments): split the corpus into N drops (default 8), fold them
  * in one `append` at a time against `SPARK_GRAFT_SF_DIR`, and print
  * the per-drop wall curve as one JSON line. The claim under test is
  * the maintenance contract — a fold costs one pass over THE DROP
  * plus a bounded state write, so per-drop wall must stay FLAT while
  * the store's accumulated prefix grows N-fold (contrast: a
  * rescan-shaped implementation would climb linearly).
  */
object StoreDropBench {

  private def timeDrops(n: Int, slices: Int => DataFrame,
      build: (DataFrame, String) => Unit,
      append: (DataFrame, String) => Unit, path: String): Seq[Long] =
    (0 until n).map { i =>
      val d = slices(i)
      val t0 = System.nanoTime()
      if (i == 0) build(d, path) else append(d, path)
      (System.nanoTime() - t0) / 1000000L
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("SPARK_GRAFT_STORE_DROPS", "8").toInt
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .persist()
    docs.count()
    val emb = graft.sources.Tables.embeddings(spark, sfDir).persist()
    emb.count()
    def tmp(tag: String) = java.nio.file.Files
      .createTempDirectory(s"graft_dropbench_$tag").toString + "/store"

    val mixture = timeDrops(n, i => docs.filter(col("doc_id") % n === i),
      graft.sources.MixtureStore.build(_, _),
      graft.sources.MixtureStore.append(_, _), tmp("mix"))
    val kmv = timeDrops(n, i => docs.filter(col("doc_id") % n === i),
      graft.sources.SketchStore.build(_, _),
      graft.sources.SketchStore.append(_, _), tmp("kmv"))
    val gram = timeDrops(n, i => emb.filter(col("vec_id") % n === i),
      graft.sources.GramStore.build(_, _),
      graft.sources.GramStore.append(_, _), tmp("gram"))

    def arr(xs: Seq[Long]) = xs.mkString("[", ",", "]")
    println(s"""{"metric":"store_drops","sf":"$sfDir","num_drops":$n,""" +
      s""""wall_ms":{"mixture":${arr(mixture)},"kmv":${arr(kmv)},""" +
      s""""gram":${arr(gram)}}}""")
    spark.stop()
  }
}
