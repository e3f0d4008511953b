package graft.tools

import org.apache.spark.sql.functions._

/** Answer-QUALITY probe for the ANN tier at the replica decades: runs
  * a recall-family gate entry (`knn_recall`, `knn_lsh_recall`,
  * `knn_ivf_append_recall`, `knn_pq_recall`, …) at an arbitrary
  * SF dir and prints the aggregate recall@k next to the wall — the
  * r15 verdict's gap: decade WALLS were measured (`BENCH`-style) but
  * recall was only ever gated at oracle SF, so nothing proved the
  * `log2(N/64)` bits law or the 0.95 retrain trigger hold where N is
  * real. usage: RecallProbe <queryName> <sfDir>. One JSON line:
  * probes, mean/min recall, wall (the wall includes the brute-force
  * ground-truth half — by design, it IS part of the probe).
  */
object RecallProbe {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RecallProbe <queryName> <sfDir>")
    val name = args(0)
    val sfDir = args(1)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val out = graft.SparkEntry.queries(name)(spark, sfDir)
    val recallCol = out.columns.find(_.startsWith("recall_at_"))
      .getOrElse(sys.error(s"$name has no recall_at_* column"))
    val agg = out.agg(
      count(lit(1)).as("probes"),
      round(avg(col(recallCol)), 4).as("mean"),
      min(col(recallCol)).as("min")).head()
    val wall = (System.nanoTime() - t0) / 1e9
    def r4(v: Double) = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val line = s"""{"metric":"$recallCol","query":"$name","sf":"$sfDir",""" +
      s""""probes":${agg.getLong(0)},"mean":${agg.getDouble(1)},""" +
      s""""min":${agg.getDouble(2)},"wall_sec":${r4(wall)}}"""
    println(line)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (line + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
