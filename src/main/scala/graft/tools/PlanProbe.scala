package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.functions.col

/** One-off adaptive-plan inspector: prints the final (post-AQE)
  * physical plan of dedup_exact so scan counts are visible — the
  * collision fallback's corpus re-scan should be pruned to an empty
  * relation when no suspect groups exist.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val out = Dedup.exact(docs)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    val empties = plan.linesIterator.count(_.contains("LocalTableScan <empty>"))
    println(s"[probe] parquet scans in final plan: $scans, empty relations: $empties")
    println(plan.linesIterator.filter(l =>
      l.contains("Scan parquet") || l.contains("LocalTableScan") ||
        l.contains("Exchange") || l.contains("HashAggregate")).mkString("\n"))
    spark.stop()
  }
}
