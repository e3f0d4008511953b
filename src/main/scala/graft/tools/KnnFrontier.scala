package graft.tools

import graft.GraftSession
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The ANN recall-cost FRONTIER at the twin-free unique-vector decades
  * (r17 verdict item 3): the r17 dashboard could fail (plain label-IVF
  * read 0.75) but every trained family still read 1.0 — the eval
  * saturated above the operating point and the frontier's shape was
  * unmeasured. This sweeps the index knobs DOWN (narrower LSH buckets,
  * fewer tables; more IVF cells, fewer probes) until recall@5
  * measurably dips, emitting one JSON line per configuration: the
  * committed curve shows WHERE each family's cliff sits at decade
  * scale, so the 0.95 retrain trigger is calibrated against a
  * measured slope rather than a saturated plateau.
  *
  * usage: KnnFrontier <sfDir> [uniqueReplicas]  (1 = the raw table;
  * N>1 = ScaleSmoke.generateUniqueVectors — every replica perturbed,
  * all vectors DISTINCT, probes keep their original values)
  */
object KnnFrontier {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val replicas = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    val dir = if (replicas == 1) sfDir
    else {
      val out = java.nio.file.Files
        .createTempDirectory("graft_knnfrontier").toString
      ScaleSmoke.generateUniqueVectors(spark, sfDir, out, replicas)
      out
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .localCheckpoint()
    val n = emb.filter(col("embedding").isNotNull).count()
    val probe = col("vec_id") < 8

    val brute = Similarity.bruteForceTopK(emb, probe, 5).localCheckpoint()

    def report(family: String, knobs: String, approx: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = Similarity.recallOf(brute, approx, 5)
        .agg(count(lit(1)), round(avg(col("recall_at_5")), 4),
          min(col("recall_at_5"))).head()
      val wall = (System.nanoTime() - t0) / 1e9
      println(s"""{"metric":"knn_frontier","family":"$family",$knobs,""" +
        s""""vectors":$n,"probes":${r.getLong(0)},""" +
        s""""mean_recall":${r.getDouble(1)},"min_recall":${r.getDouble(2)},""" +
        s""""wall_sec":${f"$wall%.2f"}}""")
    }

    // LSH: DOWN = fewer tables (fewer chances) and more bits (narrower
    // buckets). The gate's operating point is (4 tables, 4 bits).
    for ((tables, bits) <- Seq((4, 4), (2, 4), (1, 4), (4, 8), (2, 8),
        (1, 8), (1, 12)))
      report("lsh", s""""tables":$tables,"bits":$bits""",
        Similarity.lshTopK(emb, probe, 5, tables, bits))

    // trained IVF: DOWN = more cells (smaller probed fraction) and
    // fewer probes. The gate's operating point is (8 cells, nprobe 2).
    for ((cells, nprobe) <- Seq((8, 2), (8, 1), (64, 2), (64, 1),
        (256, 2), (256, 1)))
      report("ivf_trained", s""""cells":$cells,"nprobe":$nprobe""",
        Similarity.ivfTrainedTopK(emb, probe, 5, nprobe, cells))

    spark.stop()
  }
}
