package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.functions.col

/** Adaptive-plan inspector: prints the final (post-AQE) physical plan
  * of dedup_exact so scan counts are visible. The operator's contract
  * is ONE parquet scan and one hash-keyed aggregation — this tool
  * caught the earlier verify-and-regroup variant costing three corpus
  * scans (AQE never pruned its "empty" fallback branch at runtime),
  * which led to the single-aggregation design.
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
