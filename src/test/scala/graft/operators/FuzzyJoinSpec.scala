package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def names = Seq(
    "cold widget", "old widget",   // same block "widget", dist 1
    "cold gizmo",                  // different block
    "bold widget",                 // dist 1 of cold AND of old (drop the b)
    "small ring", "smell ring"     // same block "ring", dist 1
  ).toDF("name")

  test("pairs share a block and sit within maxDist, one row per pair") {
    val out = FuzzyJoin.nearNames(names, "name", maxDist = 2)
      .orderBy("name_a", "name_b")
      .as[(String, String, Long)].collect().toSeq
    assert(out == Seq(
      ("bold widget", "cold widget", 1L),
      ("bold widget", "old widget", 1L),
      ("cold widget", "old widget", 1L),
      ("small ring", "smell ring", 1L)))
  }

  test("cross-block near-names are NOT paired (the blocking contract)") {
    val df = Seq("cold widget", "cold widgets").toDF("name") // dist 1, blocks differ
    assert(FuzzyJoin.nearNames(df, "name", maxDist = 2).count() == 0)
  }

  test("duplicate rows collapse: pairs come from distinct values") {
    val df = Seq("a x", "a x", "b x").toDF("name")
    val out = FuzzyJoin.nearNames(df, "name", maxDist = 1).collect()
    assert(out.length == 1)
  }

  test("join shuffles on the block key, not all-pairs") {
    val plan = FuzzyJoin.nearNames(names, "name", maxDist = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join planned as all-pairs:\n$plan")
  }
}
