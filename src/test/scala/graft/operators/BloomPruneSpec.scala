package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpecBase {
  import spark.implicits._

  private def fact = spark.read.parquet(s"$sfDir/lineitem.parquet")
    .select($"l_partkey", $"l_quantity")
  private def dim = spark.read.parquet(s"$sfDir/part.parquet")
    .filter($"p_brand" === "Brand#13").select($"p_partkey")

  test("no false negatives: every true-matching fact row survives the prune") {
    val pruned = BloomPrune.reduce(fact, "l_partkey", dim, "p_partkey", 10000L)
    val lostTrueMatches = fact.join(dim, $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"l_quantity")
      .exceptAll(pruned.join(dim, $"l_partkey" === $"p_partkey")
        .select($"l_partkey", $"l_quantity"))
    assert(lostTrueMatches.count() == 0)
  }

  test("pruned join result is row-identical to the plain join") {
    val plain = fact.join(dim, $"l_partkey" === $"p_partkey")
      .groupBy($"l_partkey").agg(sum($"l_quantity").as("q"))
    val viaBloom = BloomPrune.reduce(fact, "l_partkey", dim, "p_partkey", 10000L)
      .join(dim, $"l_partkey" === $"p_partkey")
      .groupBy($"l_partkey").agg(sum($"l_quantity").as("q"))
    assert(viaBloom.orderBy("l_partkey").collect().toSeq ==
      plain.orderBy("l_partkey").collect().toSeq)
  }

  test("the prune actually reduces the fact (selective dim)") {
    val total = fact.count()
    val kept = BloomPrune.reduce(fact, "l_partkey", dim, "p_partkey", 10000L).count()
    assert(kept < total / 2, s"bloom kept $kept of $total rows - not selective")
  }

  test("NULL fact keys are dropped, not passed to the probe") {
    val withNulls = Seq(Option(1L), Option.empty[Long], Option(999999L))
      .toDF("l_partkey").withColumn("l_quantity", lit(1.0))
    val d = Seq(1L).toDF("p_partkey")
    val kept = BloomPrune.reduce(withNulls, "l_partkey", d, "p_partkey", 10L)
      .select($"l_partkey").as[Option[Long]].collect().toSeq
    assert(kept.contains(Some(1L)) && !kept.contains(None))
  }

  test("probe is codegen'd inside the scan stage, before any exchange") {
    val pruned = BloomPrune.reduce(fact, "l_partkey", dim, "p_partkey", 10000L)
      .groupBy($"l_partkey").agg(sum($"l_quantity"))
    val plan = pruned.queryExecution.executedPlan.toString
    val probeAt = plan.indexOf("graft_bloom_might_contain")
    val exchangeAt = plan.indexOf("Exchange")
    assert(probeAt >= 0, "bloom probe missing from the physical plan")
    // plan prints top-down: the probe must sit BELOW (after) the
    // aggregation exchange, i.e. in the scan-side stage
    assert(exchangeAt >= 0 && probeAt > exchangeAt,
      "bloom probe did not stay below the exchange")
  }
}
