package graft.tools

import graft.operators.Similarity
import graft.sources.{IvfIndexStore, Tables}
import org.apache.spark.sql.functions._

/** The 0.95 retrain trigger measured where N is real (r15 verdict
  * item 4's second half): replays the `knn_ivf_retrain` lifecycle at
  * an arbitrary SF dir — roll the delta into the frozen-quantizer
  * index, measure rolled recall@5, fire the retrain iff it dropped
  * below threshold — then reports the decision AND the served index's
  * post-decision recall. One JSON line. usage: RetrainProbe <sfDir>
  */
object RetrainProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RetrainProbe <sfDir>")
    val dir = args(0)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val emb = Tables.embeddings(spark, dir)
    val base = emb.filter(col("vec_id") % 5 =!= 4)
    val delta = emb.filter(col("vec_id") % 5 === 4)
    val path = IvfIndexStore.defaultPath(dir) + "_retrain"
    IvfIndexStore.ensureRetrained(spark, base, delta, path)
    val (rolledRecall, fired) = IvfIndexStore.retrainDecision(spark, path)
    val served = IvfIndexStore.servedAfterRetrain(spark, path,
      emb.filter(col("vec_id") < 8))
    val post = Similarity.recallOf(
        Similarity.bruteForceTopK(emb, col("vec_id") < 8), served, 5)
      .agg(avg(col("recall_at_5"))).head().getDouble(0)
    val wall = (System.nanoTime() - t0) / 1e9
    def r4(v: Double) = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val line = s"""{"metric":"retrain_decision","sf":"$dir",""" +
      s""""rolled_recall":${r4(rolledRecall)},"threshold":0.95,""" +
      s""""retrained":$fired,"served_recall":${r4(post)},""" +
      s""""wall_sec":${r4(wall)}}"""
    println(line)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (line + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
