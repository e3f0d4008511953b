package graft.tools

/** Drop-count bench for the streamed keep-best maintenance: run the
  * [[graft.streaming.StreamReplay.replayKeepBestN]] topology with N
  * drops (default 8 — the gate uses 2) against `SPARK_GRAFT_SF_DIR`
  * and print the per-batch work/timing curve from the run's `metrics/`
  * store as one JSON line. A FLAT per-batch wall/footprint curve as
  * the prefix grows is the committed proof that maintenance cost
  * tracks each drop's blast radius, not the accumulated corpus (the
  * round-11 weak item).
  */
object KeepBestDropBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val numDrops = sys.env.getOrElse("SPARK_GRAFT_KB_DROPS", "8").toInt
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val (work, finalTable) =
      graft.streaming.StreamReplay.replayKeepBestN(spark, sfDir, numDrops)
    val finalRows = finalTable.count()
    val totalSec = (System.nanoTime() - t0) / 1e9
    val m = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$work/metrics")
      .orderBy("batch").collect()
    val batches = m.map { r =>
      s"""{"batch":${r.getAs[Long]("batch")},""" +
        s""""batch_docs":${r.getAs[Long]("batch_docs")},""" +
        s""""new_edges":${r.getAs[Long]("new_edges")},""" +
        s""""region_nodes":${r.getAs[Long]("region_nodes")},""" +
        s""""n_upserts":${r.getAs[Long]("n_upserts")},""" +
        s""""n_retracts":${r.getAs[Long]("n_retracts")},""" +
        s""""prefix_docs":${r.getAs[Long]("prefix_docs")},""" +
        s""""wall_ms":${r.getAs[Long]("wall_ms")}}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"keep_best_drops","sf":"$sfDir",""" +
      s""""num_drops":$numDrops,"final_rows":$finalRows,""" +
      f""""total_sec":$totalSec%.1f,"batches":$batches}""")
    spark.stop()
  }
}
