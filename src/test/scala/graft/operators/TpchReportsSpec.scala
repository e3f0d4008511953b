package graft.operators

import graft.SparkSpecBase
import java.sql.Timestamp

class TpchReportsSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s + " 00:00:00")

  test("customer distribution buckets zero-order and urgent-only customers at 0") {
    val customer = Seq(1L, 2L, 3L, 4L).toDF("c_custkey")
    val orders = Seq(
      (10L, 1L, "5-LOW"),
      (11L, 1L, "2-HIGH"),
      (12L, 2L, "1-URGENT"), // filtered out: customer 2 counts as 0 orders
      (13L, 3L, "5-LOW")
    ).toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val out = Relational.custOrderDistribution(customer, orders)
      .collect()
      .map(r => (r.getAs[Long]("order_count"), r.getAs[Long]("custdist")))
      .toMap
    assert(out == Map(0L -> 2L, 1L -> 1L, 2L -> 1L))
  }

  test("top supplier surfaces exact-revenue ties and respects the ship window") {
    val supplier = Seq((1L, "S#1"), (2L, "S#2"), (3L, "S#3"))
      .toDF("s_suppkey", "s_name")
    val lineitem = Seq(
      (1L, t("1998-02-01"), 100.0, 0.0),
      (2L, t("1998-02-01"), 100.0, 0.0),  // exact tie with supplier 1
      (3L, t("1997-12-31"), 999.0, 0.0)   // outside window: ignored
    ).toDF("l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    val out = Relational.topSupplier(supplier, lineitem)
      .collect()
      .map(r => (r.getAs[Long]("s_suppkey"), r.getAs[Double]("total_revenue")))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1L, 100.0), (2L, 100.0)))
  }

  test("small-qty revenue keeps strictly-below-20%-of-average items of the brand") {
    val part = Seq((1L, "Brand#11"), (2L, "Brand#99"))
      .toDF("p_partkey", "p_brand")
    // part 1 quantities: 1, 9, 10 → avg 20/3 ≈ 6.67, 20% ≈ 1.33: only qty 1 counts
    val lineitem = Seq(
      (1L, 1.0, 70.0),
      (1L, 9.0, 500.0),
      (1L, 10.0, 500.0),
      (2L, 1.0, 999.0) // other brand: excluded entirely
    ).toDF("l_partkey", "l_quantity", "l_extendedprice")
    val out = Relational.smallQtyRevenue(part, lineitem).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("avg_yearly") == 10.0) // 70 / 7
  }

  test("big orders apply a strict HAVING before the joins") {
    val customer = Seq((1L, "C#1")).toDF("c_custkey", "c_name")
    val orders = Seq(
      (10L, 1L, t("2024-01-01"), 5000.0),
      (11L, 1L, t("2024-01-02"), 9000.0)
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val lineitem = Seq(
      (10L, 150.0), (10L, 51.0), // 201 > 200: kept
      (11L, 200.0)               // exactly 200: strict >, dropped
    ).toDF("l_orderkey", "l_quantity")
    val out = Relational.bigOrders(customer, orders, lineitem).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("o_orderkey") == 10L)
    assert(out.head.getAs[Double]("sum_qty") == 201.0)
  }

  test("nation flow keeps only cross-nation pairs, split by direction") {
    val nation = Seq((1L, "NATION_18"), (2L, "NATION_19"), (3L, "NATION_0"))
      .toDF("n_nationkey", "n_name")
    val supplier = Seq((10L, 1L), (11L, 2L), (12L, 3L))
      .toDF("s_suppkey", "s_nationkey")
    val customer = Seq((20L, 2L), (21L, 1L)).toDF("c_custkey", "c_nationkey")
    val orders = Seq(
      (100L, 20L, t("1997-06-01")),
      (101L, 21L, t("1998-06-01"))
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val lineitem = Seq(
      (100L, 10L, 100.0, 0.0), // 18 -> 19: kept
      (100L, 11L, 50.0, 0.0),  // 19 -> 19: same nation, dropped
      (101L, 11L, 80.0, 0.0),  // 19 -> 18: kept, other direction
      (100L, 12L, 999.0, 0.0)  // NATION_0 supplier: outside the pair
    ).toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val out = Relational.nationFlow(nation, customer, supplier, orders, lineitem)
      .collect()
      .map(r => (r.getAs[String]("supp_nation"), r.getAs[String]("cust_nation"),
        r.getAs[Int]("order_year"), r.getAs[Double]("volume")))
      .sortBy(x => (x._1, x._2))
    assert(out.toSeq == Seq(
      ("NATION_18", "NATION_19", 1997, 100.0),
      ("NATION_19", "NATION_18", 1998, 80.0)))
  }

  test("order gaps: first order excluded, same-day ties ordered by key") {
    val orders = Seq(
      (1L, 1L, t("2024-01-01")),
      (2L, 1L, t("2024-01-11")), // gap 10
      (3L, 1L, t("2024-01-11")), // same day: gap 0 via orderkey tiebreak
      (4L, 2L, t("2024-03-01"))  // single order: no gaps, no output row
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val out = Relational.orderGaps(orders).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("o_custkey") == 1L)
    assert(r.getAs[Long]("n_gaps") == 2L)
    assert(r.getAs[Double]("avg_gap_days") == 5.0)
    assert((r.getAs[Long]("min_gap_days"), r.getAs[Long]("max_gap_days")) == ((0L, 10L)))
  }

  test("forecast revenue sums price*discount inside the band only") {
    val lineitem = Seq(
      (t("1997-06-01"), 100.0, 0.03, 10.0), // in band: 100*0.03 = 3
      (t("1997-06-01"), 100.0, 0.05, 10.0), // discount out of band
      (t("1997-06-01"), 100.0, 0.03, 30.0), // quantity too large
      (t("1998-06-01"), 100.0, 0.03, 10.0)  // shipped outside the year
    ).toDF("l_shipdate", "l_extendedprice", "l_discount", "l_quantity")
    val out = Relational.forecastRevenue(lineitem).collect().head
    assert(out.getAs[Double]("revenue_delta") == 3.0)
    assert(out.getAs[Long]("n_items") == 1L)
  }

  test("promo share divides exact conditional and total revenue per month") {
    val part = Seq((1L, "PROMO"), (2L, "STANDARD")).toDF("p_partkey", "p_type")
    val lineitem = Seq(
      (1L, t("1997-06-02"), 30.0, 0.0),
      (2L, t("1997-06-20"), 70.0, 0.0),
      (2L, t("1997-07-01"), 50.0, 0.0)  // other month, no promo
    ).toDF("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
    val out = Relational.promoShare(part, lineitem).collect()
      .map(r => r.getAs[String]("ship_month") ->
        ((r.getAs[Double]("promo_revenue"), r.getAs[Double]("total_revenue"),
          r.getAs[Double]("promo_share")))).toMap
    assert(out("1997-06") == ((30.0, 100.0, 0.3)))
    assert(out("1997-07") == ((0.0, 50.0, 0.0)))
  }

  test("event paths order by time, break ties on id, truncate at 5 steps") {
    val events = Seq(
      (1L, t("2024-01-01"), 1L, "view"),
      (2L, t("2024-01-01"), 1L, "click"),   // same ts: event_id orders it
      (3L, Timestamp.valueOf("2024-01-01 01:00:00"), 1L, "purchase"),
      (4L, Timestamp.valueOf("2024-01-01 02:00:00"), 1L, "view"),
      (5L, Timestamp.valueOf("2024-01-01 03:00:00"), 1L, "view"),
      (6L, Timestamp.valueOf("2024-01-01 04:00:00"), 1L, "error"), // 6th: cut
      (7L, t("2024-01-02"), 2L, "view")     // other journey
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Relational.topEventPaths(events).collect()
      .map(r => r.getAs[String]("path") -> r.getAs[Long]("n_journeys")).toMap
    assert(out == Map(
      "view>click>purchase>view>view" -> 1L,
      "view" -> 1L))
  }

  test("rfm: quartile scores bucket users without a global sort") {
    // 4 users with clearly separated metrics -> scores 1..4 each axis
    val events = (1 to 4).flatMap { u =>
      (1 to u * 2).map { i =>
        (t(s"2024-0$u-01"), "purchase", u.toLong, u * 10.0 + i)
      }
    } :+ ((t("2024-04-02"), "view", 9L, 999.0)) // non-purchase: ignored
    val df = events.toDF("ts", "event_type", "user_id", "value")
    val out = Relational.rfmSegments(df).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Int]("r_score"), r.getAs[Int]("f_score"),
          r.getAs[Int]("m_score"), r.getAs[String]("segment")))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    // user 4 purchased most recently, most often, for the most value
    assert(out(4L) == ((4, 4, 4, "444")))
    assert(out(1L)._1 == 1 && out(1L)._2 == 1 && out(1L)._3 == 1)
    // plan guard: no unpartitioned window over the user frame
    val plan = Relational.rfmSegments(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("grouping sets emit the two marginals and nothing else") {
    val lineitem = Seq(
      ("R", "F", 1.0),
      ("R", "O", 2.0),
      ("N", "F", 4.0)
    ).toDF("l_returnflag", "l_linestatus", "l_quantity")
    val out = Relational.marginalSummary(lineitem).collect()
    // per-flag marginal: grouping(ls)=1; per-status marginal: grouping(rf)=1
    val byFlag = out.filter(_.getAs[Int]("g_ls") == 1)
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Double]("sum_qty")).toMap
    val byStatus = out.filter(_.getAs[Int]("g_rf") == 1)
      .map(r => r.getAs[String]("l_linestatus") -> r.getAs[Double]("sum_qty")).toMap
    assert(byFlag == Map("R" -> 3.0, "N" -> 4.0))
    assert(byStatus == Map("F" -> 5.0, "O" -> 2.0))
    // no (rf, ls) detail rows and no grand total: exactly the two sets
    assert(out.length == 4)
  }

  test("new-vs-returning: every first-day order is new, later ones returning") {
    val orders = Seq(
      (1L, 1L, t("1997-03-01"), 10.0), // first day, two orders: both new
      (2L, 1L, t("1997-03-01"), 20.0),
      (3L, 1L, t("1998-05-01"), 40.0), // later year: returning
      (4L, 2L, t("1998-07-01"), 5.0)   // only order: new
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val out = Relational.newVsReturning(orders).collect()
      .map(r => (r.getAs[Int]("order_year"), r.getAs[String]("cohort")) ->
        ((r.getAs[Long]("n_orders"), r.getAs[Double]("revenue")))).toMap
    assert(out == Map(
      (1997, "new") -> ((2L, 30.0)),
      (1998, "returning") -> ((1L, 40.0)),
      (1998, "new") -> ((1L, 5.0))))
  }

  test("lapsed rich customers: recent order excludes, old order does not") {
    val customer = Seq(
      (1L, "SEG_A", 100.0), // above avg, only an old order: counted
      (2L, "SEG_A", 100.0), // above avg, recent order: excluded
      (3L, "SEG_B", 10.0),  // below avg: excluded
      (4L, "SEG_B", 100.0)  // above avg, no orders at all: counted
    ).toDF("c_custkey", "c_mktsegment", "c_acctbal")
    val orders = Seq(
      (1L, t("1999-05-01")),
      (2L, t("2000-06-01"))
    ).toDF("o_custkey", "o_orderdate")
    val out = Relational.idleRichCustomers(customer, orders)
      .collect()
      .map(r => (r.getAs[String]("c_mktsegment"), r.getAs[Long]("n_custs"),
        r.getAs[Double]("total_bal")))
      .sortBy(_._1)
    assert(out.toSeq == Seq(("SEG_A", 1L, 100.0), ("SEG_B", 1L, 100.0)))
  }
}
