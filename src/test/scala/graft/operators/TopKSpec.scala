package graft.operators

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpecBase {
  import spark.implicits._

  test("bounded-heap top-k equals the window row_number formulation") {
    val df = (1 to 5000).map { i =>
      (i.toLong % 7, (i * 37 % 100).toDouble / 10.0, i.toLong)
    }.toDF("g", "score", "id").repartition(8)
    val viaTopK = TopK.perGroup(df, "g", "score", "id", k = 5)
      .select("g", "score", "id", "rnk")
      .orderBy("g", "rnk").collect().toSeq
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    val viaWindow = df.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 5).select("g", "score", "id", "rnk")
      .orderBy("g", "rnk").collect().toSeq
    assert(viaTopK == viaWindow)
  }

  test("groups smaller than k keep all rows") {
    val df = Seq((1L, 0.5, 10L), (1L, 0.7, 11L), (2L, 0.1, 12L))
      .toDF("g", "score", "id")
    val out = TopK.perGroup(df, "g", "score", "id", k = 5)
    assert(out.count() == 3)
    assert(out.filter($"g" === 1 && $"rnk" === 1).select("id").as[Long].head() == 11L)
  }

  test("brute-force knn via TopK matches per-probe ordering invariants") {
    val out = Similarity.bruteForceTopK(
      Tables.embeddings(spark, sfDir), col("vec_id") < 3, k = 4)
    val rows = out.select("probe_id", "cosine", "rnk")
      .as[(Long, Double, Int)].collect()
    assert(rows.length == 12)
    rows.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._3)
      assert(sorted.map(_._2).sliding(2).forall(p => p(0) >= p(1)))
    }
  }
}
