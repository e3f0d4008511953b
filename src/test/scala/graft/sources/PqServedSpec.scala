package graft.sources

import graft.SparkSpecBase
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class PqServedSpec extends SparkSpecBase {

  private def freshPath(tag: String): String = {
    val p = s"${sys.props("java.io.tmpdir")}/graft_pqserved_$tag"
    val hp = new org.apache.hadoop.fs.Path(p)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hp)) fs.delete(hp, true)
    p
  }

  test("served PQ equals the in-query trained PQ pipeline") {
    val emb = Tables.embeddings(spark, sfDir)
    val path = freshPath("eq")
    IvfIndexStore.build(emb, path)
    val served = IvfIndexStore
      .servedPqTopK(spark, path, emb.filter(col("vec_id") < 8))
      .orderBy("probe_id", "rnk").collect().toSeq
    // the same search computed end-to-end in one plan: train the cells,
    // encode, ADC-cut, re-rank — must land on the identical rows
    val assign = Similarity.kmeansAssign(emb, 8, 3)
      .select(col("vec_id"), col("cluster").as("cell"))
    val labeled = emb.join(assign, Seq("vec_id"))
      .select(col("vec_id"), col("embedding"), col("cell"))
    val trained = Similarity
      .ivfPqTopK(labeled, col("vec_id") < 8, labelCol = "cell")
      .orderBy("probe_id", "rnk").collect().toSeq
    assert(served === trained)
  }

  test("the serve plan never trains or re-encodes") {
    val emb = Tables.embeddings(spark, sfDir)
    val path = freshPath("plan")
    IvfIndexStore.build(emb, path)
    val df = IvfIndexStore.servedPqTopK(spark, path,
      emb.filter(col("vec_id") < 8))
    val p = df.queryExecution.optimizedPlan.toString.toLowerCase
    assert(!p.contains("centroidaggregator"), p)
    // no per-dimension explode: the grid and codes come from the store
    assert(!p.contains("posexplode"), p)
    assert(df.count() > 0)
  }
}
