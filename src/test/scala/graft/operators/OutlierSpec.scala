package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class OutlierSpec extends SparkSpecBase {
  import spark.implicits._

  test("flags only rows beyond the per-group threshold") {
    // group a: mean 10, one far spike; group b: tight, no outliers
    val df = (Seq.fill(20)(("a", 10.0)) ++ Seq(("a", 1000.0)) ++
      Seq(("b", 5.0), ("b", 6.0), ("b", 7.0))).toDF("g", "v")
    val out = Quality.zScoreOutliers(df, "v", Seq("g"), 2.5)
      .select($"g", $"v").collect().toSeq
    assert(out == Seq(org.apache.spark.sql.Row("a", 1000.0)))
  }

  test("zero-variance and singleton groups produce no outliers") {
    val df = Seq(("c", 4.0), ("c", 4.0), ("d", 9.0)).toDF("g", "v")
    assert(Quality.zScoreOutliers(df, "v", Seq("g"), 0.0).count() == 0)
  }

  test("stats side broadcasts; the fact side is never exchanged") {
    val df = graft.sources.Tables.events(spark, sfDir)
      .select($"event_id", $"event_type", col("value"))
    val plan = Quality.zScoreOutliers(df, "value", Seq("event_type"), 2.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"stats join not broadcast:\n$plan")
  }
}
