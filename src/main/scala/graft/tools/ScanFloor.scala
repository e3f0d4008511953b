package graft.tools

import org.apache.spark.sql.functions._

/** The irreducible corpus-pass floor for a table's entries: wall time
  * of ONE hash-forced scan (read every column, fold
  * xxhash64(struct(*)) — exactly the Bench instrument applied to the
  * raw table). An entry whose decade ratio tracks this floor is
  * scan-bound — its collapse is working and the residual growth is
  * the data, not the plan. Best-of-N (default 3), one JSON line.
  * usage: ScanFloor [sfDir] [table=documents] — table resolves via
  * [[graft.sources.Tables]] (events' nanos handling included).
  */
object ScanFloor {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val table = args.lift(1).getOrElse("documents")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val load: () => org.apache.spark.sql.DataFrame = table match {
      case "documents" => () => graft.sources.Tables.documents(spark, sfDir)
      case "lineitem" => () => graft.sources.Tables.lineitem(spark, sfDir)
      case "orders" => () => graft.sources.Tables.orders(spark, sfDir)
      case "events" => () => graft.sources.Tables.events(spark, sfDir)
      case other => sys.error(s"unsupported floor table: $other")
    }
    val times = (0 until reps).map { _ =>
      val t0 = System.nanoTime()
      load()
        .select(xxhash64(struct(col("*"))).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    def r4(v: Double) = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val line = s"""{"metric":"scan_floor","table":"$table","sf":"$sfDir",""" +
      s""""value":${r4(times.min)},"spread":[${r4(times.min)},${r4(times.max)}],""" +
      s""""reps":$reps,"unit":"sec"}"""
    println(line)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (line + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
