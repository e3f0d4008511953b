package graft.tools

import graft.SparkEntry

/** Plan inspector: prints the formatted physical plan of one or more
  * gate queries (comma-separated in `SPARK_GRAFT_QUERIES`) against
  * `SPARK_GRAFT_SF_DIR` — the .explain feedback loop as a runnable
  * main, so shuffle counts / reused exchanges / pushed filters can be
  * audited without a REPL. `SPARK_GRAFT_EXPLAIN_RUN=1` also executes
  * the query and prints wall time.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val selected = SparkEntry.selectQueries(sys.env.get("SPARK_GRAFT_QUERIES"))
    selected.foreach { case (name, fn) =>
      println(s"===== $name =====")
      val df = fn(spark, sfDir)
      df.explain("formatted")
      if (sys.env.get("SPARK_GRAFT_EXPLAIN_RUN").contains("1")) {
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"[run] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
