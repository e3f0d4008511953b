package graft.tools

/** Output-cardinality probe for any gated entry: `runMain
  * graft.tools.QueryRows <query> <sfDir>` prints the entry's exact
  * output row count as one JSON line. The adjudication tool for
  * pair-grain entries whose ANSWER grows quadratically at replica
  * density (mm_phash, dedup_embedding): a decade wall ratio is only
  * interpretable next to the decade's output-row ratio — an entry
  * whose output grows 100× while its wall grows 12× is output-bound,
  * not a plan regression.
  */
object QueryRows {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryRows <queryName> <sfDir>")
    val name = args(0)
    val sfDir = args(1)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val rows = graft.SparkEntry.queries(name)(spark, sfDir).count()
    val line = s"""{"metric":"query_rows","query":"$name","sf":"$sfDir","rows":$rows}"""
    println(line)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (line + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
