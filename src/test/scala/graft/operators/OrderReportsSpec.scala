package graft.operators

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class OrderReportsSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s + " 00:00:00")

  test("an order counts as late once, however many late items it has") {
    val orders = Seq(
      (1L, t("2024-01-01"), "1-URGENT"),
      (2L, t("2024-01-01"), "5-LOW")
    ).toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val lineitem = Seq(
      (1L, t("2024-04-01")),  // 91 days late
      (1L, t("2024-05-01")),  // also late: must not double-count
      (2L, t("2024-01-15"))   // within grace
    ).toDF("l_orderkey", "l_shipdate")
    val out = Relational.latePriorityCounts(orders, lineitem, graceDays = 60)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("o_orderpriority") == "1-URGENT")
    assert(out.head.getAs[Long]("n_late_orders") == 1L)
  }

  test("co-purchase pairs count each order once, unordered, duplicates collapsed") {
    val lineitem = Seq(
      (1L, 10L), (1L, 20L), (1L, 10L),  // dup part 10 in order 1: one basket entry
      (2L, 20L), (2L, 10L),             // same pair, other order
      (3L, 30L)                          // singleton basket: no pairs
    ).toDF("l_orderkey", "l_partkey")
    val out = Relational.coPurchasePairs(lineitem).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getAs[Long]("part_a"), r.getAs[Long]("part_b"),
      r.getAs[Long]("n_orders")) == ((10L, 20L, 2L)))
  }

  test("returned-item revenue counts only R-flag items, ranked by exact revenue") {
    val lineitem = Seq(
      (1L, 100.0, 0.0, "R"),
      (1L, 50.0, 0.0, "N"),   // not returned: excluded
      (2L, 30.0, 0.0, "R")
    ).toDF("l_orderkey", "l_extendedprice", "l_discount", "l_returnflag")
    val orders = Seq((1L, 10L), (2L, 20L)).toDF("o_orderkey", "o_custkey")
    val customer = Seq((10L, "Customer#A", 0), (20L, "Customer#B", 0))
      .toDF("c_custkey", "c_name", "c_nationkey")
    val nation = Seq((0, "NATION_0")).toDF("n_nationkey", "n_name")
    val out = Relational.returnedItemRevenue(customer, orders, lineitem, nation)
      .collect()
    assert(out.map(r => (r.getAs[Long]("c_custkey"), r.getAs[Double]("revenue"),
      r.getAs[Long]("n_items"))).toSeq ==
      Seq((10L, 100.0, 1L), (20L, 30.0, 1L)))
  }

  test("association rules score support, confidence, and lift by hand-check") {
    // 4 baskets: {10,20} ×3, {10} ×1 → rule 20→10 has conf 1.0,
    // lift 1.0/(4/4)=1.0; rule 10→20: conf 3/4, lift 0.75/(3/4)=1.0
    val lineitem = Seq(
      (1L, 10L), (1L, 20L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L),
      (4L, 10L)
    ).toDF("l_orderkey", "l_partkey")
    val out = Relational.assocRules(lineitem).collect().map(r =>
      ((r.getAs[Long]("part_a"), r.getAs[Long]("part_b")),
        (r.getAs[Long]("n_ab"), r.getAs[Double]("support"),
          r.getAs[Double]("confidence"), r.getAs[Double]("lift")))).toMap
    assert(out.size == 2)
    assert(out((10L, 20L)) == ((3L, 0.75, 0.75, 1.0)))
    assert(out((20L, 10L)) == ((3L, 0.75, 1.0, 1.0)))
  }

  test("basket collapse parity: co-purchase + assoc rules equal the raw per-order forms on a replicated corpus") {
    // the distinctBaskets support law (counts = Σ basket multiplicity
    // over distinct baskets holding the pair), pinned value-identical
    // against the pre-collapse per-ORDER forms on the ScaleSmoke
    // geometry: every order mirrored once under fresh keys — byte-equal
    // baskets, the exact shape where the raw form's pair stream doubles
    // while the collapsed form's is constant
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
    val replicated = li.unionByName(
      li.withColumn("l_orderkey", col("l_orderkey") + 100000000L))

    // raw per-order reference: deduped (order, part) self-join
    val basket = replicated
      .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
      .distinct()
    val rawPairs = basket.select(col("l_orderkey"), col("l_partkey").as("part_a"))
      .join(basket.select(col("l_orderkey"), col("l_partkey").as("part_b")),
        Seq("l_orderkey"))
      .filter(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(20)
      .as[(Long, Long, Long)].collect().toSeq
    val collapsed = Relational.coPurchasePairs(replicated)
      .as[(Long, Long, Long)].collect().toSeq
    assert(collapsed == rawPairs)

    // raw assoc-rules reference, same arithmetic and rounding order
    val total = basket.agg(
      countDistinct(col("l_orderkey")).cast("double").as("n_total"))
    val items = basket.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_item"))
    val rawRulePairs = basket
      .select(col("l_orderkey"), col("l_partkey").as("part_a"))
      .join(basket.select(col("l_orderkey"), col("l_partkey").as("part_b")),
        Seq("l_orderkey"))
      .filter(col("part_a") =!= col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 2)
    val rawRules = rawRulePairs
      .join(items.select(col("l_partkey").as("part_a"),
        col("n_item").as("n_a")), Seq("part_a"))
      .join(items.select(col("l_partkey").as("part_b"),
        col("n_item").as("n_b")), Seq("part_b"))
      .crossJoin(broadcast(total))
      .select(col("part_a"), col("part_b"), col("n_ab"),
        round(col("n_ab") / col("n_total"), 4).as("support"),
        round(col("n_ab") / col("n_a"), 4).as("confidence"),
        round((col("n_ab") / col("n_a"))
          / (col("n_b") / col("n_total")), 4).as("lift"))
      .orderBy(col("lift").desc, col("part_a"), col("part_b"))
      .limit(20)
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    val collapsedRules = Relational.assocRules(replicated)
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(collapsedRules == rawRules)
  }

  test("skyline keeps exactly the undominated parts; twins both survive") {
    val part = Seq(
      (1L, "a", BigDecimal("10.00"), 5), // dominated by 3 (cheaper, same size)
      (2L, "b", BigDecimal("10.00"), 5), // dominated by 3
      (3L, "c", BigDecimal("5.00"), 5),  // skyline
      (4L, "d", BigDecimal("20.00"), 10), // skyline (largest size)
      (5L, "e", BigDecimal("20.00"), 9), // dominated by 4 (same price, bigger)
      (6L, "f", BigDecimal("3.00"), 1),  // dominated by 7 (cheaper, same size)
      (7L, "g", BigDecimal("2.00"), 1),  // skyline twin
      (8L, "h", BigDecimal("2.00"), 1)   // skyline twin (no strict edge between twins)
    ).toDF("p_partkey", "p_name", "p_retailprice", "p_size")
    val got = Relational.skyline2d(part)
      .select("p_partkey").as[Long].collect().toSet
    assert(got == Set(3L, 4L, 7L, 8L))
  }
}
