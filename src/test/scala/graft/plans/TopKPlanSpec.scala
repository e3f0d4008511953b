package graft.plans

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPlanSpec extends SparkSpecBase {
  import spark.implicits._

  test("planned top-k equals the window formulation, with exchange inserted") {
    val df = (1 to 4000).map { i =>
      (i.toLong % 11, (i * 31 % 97).toDouble, i.toLong)
    }.toDF("g", "score", "id").repartition(6)
    val planned = TopKPlanner.perGroup(df, "g", "score", "id", k = 3)
    val got = planned.select("g", "score", "id", "rnk")
      .orderBy("g", "rnk").collect().toSeq
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    val want = df.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 3).select("g", "score", "id", "rnk")
      .orderBy("g", "rnk").collect().toSeq
    assert(got == want)
    // the strategy's physical nodes are in the executed plan, and the
    // required distribution forced an exchange between the phases
    val plan = planned.queryExecution.executedPlan.toString
    assert(plan.contains("TopKFinal"), plan)
    assert(plan.contains("TopKPartial"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
  }

  test("string ties rank by binary collation and match the window form") {
    val df = (1 to 2000).map { i =>
      (i.toLong % 7, (i % 13).toDouble, s"tok${i % 101}")
    }.toDF("g", "score", "tok").repartition(5)
    val planned = TopKPlanner.perGroup(df, "g", "score", "tok", k = 4)
    val got = planned.select("g", "score", "tok", "rnk")
      .orderBy("g", "rnk", "tok").collect().toSeq
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"tok")
    val want = df.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 4).select("g", "score", "tok", "rnk")
      .orderBy("g", "rnk", "tok").collect().toSeq
    assert(got == want)
  }

  test("a NULL string tie is skipped, and duplicate ties keep both rows") {
    val df = Seq(
      (1L, 9.0, "b"),
      (1L, 9.0, "a"),   // tie on score: 'a' outranks 'b'
      (1L, 9.0, "a"),   // duplicate (score, tie): both rows kept
      (1L, 9.0, null.asInstanceOf[String])
    ).toDF("g", "score", "tok")
    val out = TopKPlanner.perGroup(df, "g", "score", "tok", k = 3)
      .orderBy("rnk", "tok").collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[String]("tok")).toSeq == Seq("a", "a", "b"))
  }

  test("k < 1 fails fast at plan time, not with an executor crash") {
    val df = Seq((1L, 1.0, 1L)).toDF("g", "score", "id")
    intercept[IllegalArgumentException] {
      TopKPlanner.perGroup(df, "g", "score", "id", k = 0)
    }
  }

  test("NULL group/order/tie rows are excluded, not ranked as zero") {
    // pre-fix the heap read NULL slots positionally as 0: a NULL score
    // would beat negative scores and corrupt ranks
    val df = Seq[(Option[Long], Option[Double], Option[Long])](
      (Some(1L), Some(-5.0), Some(10L)),
      (Some(1L), None, Some(11L)),        // NULL score must not outrank -5
      (Some(1L), Some(-7.0), Some(12L)),
      (None, Some(99.0), Some(13L)),      // NULL group competes nowhere
      (Some(2L), Some(3.0), None),        // NULL tie is excluded too
      (Some(2L), Some(1.0), Some(14L))
    ).toDF("g", "score", "id")
    val got = TopKPlanner.perGroup(df, "g", "score", "id", k = 2)
      .select("g", "score", "id", "rnk")
      .as[(Long, Double, Long, Int)].collect().toSeq.sorted
    assert(got == Seq((1L, -7.0, 12L, 2), (1L, -5.0, 10L, 1), (2L, 1.0, 14L, 1)).sorted)
  }

  test("partial phase bounds shuffled rows to groups*k per partition") {
    val df = (1 to 10000).map(i => (1L, i.toDouble, i.toLong))
      .toDF("g", "score", "id").repartition(4)
    val out = TopKPlanner.perGroup(df, "g", "score", "id", k = 2)
    // one group: exactly 2 rows survive, ranks 1..2, best scores
    val rows = out.select("score", "rnk").as[(Double, Int)]
      .collect().toSeq.sortBy(_._2)
    assert(rows == Seq((10000.0, 1), (9999.0, 2)))
  }
}
