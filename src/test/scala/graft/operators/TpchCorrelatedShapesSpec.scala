package graft.operators

import graft.SparkSpecBase
import java.sql.Timestamp

/** Laws of the three correlated-subquery-shaped TPC-H reports added in
  * round 17: Q19's disjunction across the join, Q20's >½-of-part-total
  * dominance, Q2's per-group argmin join-back.
  */
class TpchCorrelatedShapesSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s + " 00:00:00")

  test("disjunctive revenue keeps a row only when ONE arm matches whole") {
    val part = Seq(
      (1L, "Brand#12", 5),   // size inside arm 1
      (2L, "Brand#12", 15),  // size OUTSIDE arm 1 (but inside arm 2's bound)
      (3L, "Brand#23", 15),  // arm 2 part
      (4L, "Brand#9", 5)     // brand in no arm
    ).toDF("p_partkey", "p_brand", "p_size")
    val lineitem = Seq(
      (1L, 10.0, 100.0, 0.0), // arm 1: Brand#12, size ≤ 10, qty 1..20 ✓
      (1L, 25.0, 900.0, 0.0), // qty 25 outside arm 1's band → dropped
      (2L, 10.0, 900.0, 0.0), // Brand#12 but size 15 > 10 → dropped
      (3L, 25.0, 200.0, 0.5), // arm 2: Brand#23, size ≤ 20, qty 10..30 ✓
      (4L, 25.0, 900.0, 0.0)  // Brand#9: no arm → dropped
    ).toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val out = Relational.disjunctiveRevenue(part, lineitem)
      .collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[Double]("revenue"),
        r.getAs[Long]("n_items")))
      .sortBy(_._1)
    assert(out.toSeq == Seq(("Brand#12", 100.0, 1L), ("Brand#23", 100.0, 1L)))
  }

  test("excess supply requires STRICTLY more than half, inside the window") {
    val supplier = Seq((1L, "S#1"), (2L, "S#2"), (3L, "S#3"))
      .toDF("s_suppkey", "s_name")
    val lineitem = Seq(
      // part 10: supplier 1 ships 60 of 100 → dominant
      (10L, 1L, 60.0, t("1997-06-01")),
      (10L, 2L, 40.0, t("1997-06-01")),
      // part 20: exact 50/50 split → nobody dominates (strict >)
      (20L, 1L, 50.0, t("1997-06-01")),
      (20L, 2L, 50.0, t("1997-06-01")),
      // part 30: supplier 3 alone in-window; its out-of-window
      // competition is invisible → trivially dominant
      (30L, 3L, 10.0, t("1997-06-01")),
      (30L, 1L, 999.0, t("1996-06-01"))
    ).toDF("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
    val out = Relational.excessSupply(supplier, lineitem)
      .collect()
      .map(r => (r.getAs[Long]("s_suppkey"), r.getAs[Long]("n_dominant_parts"),
        r.getAs[Double]("dominated_qty")))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L, 60.0), (3L, 1L, 10.0)))
  }

  test("sole-late supplier needs competition present AND on time") {
    val supplier = Seq((1L, "S#1"), (2L, "S#2"), (3L, "S#3"))
      .toDF("s_suppkey", "s_name")
    val orders = Seq(
      (10L, t("1997-01-01")),
      (20L, t("1997-01-01")),
      (30L, t("1997-01-01"))
    ).toDF("o_orderkey", "o_orderdate")
    val lineitem = Seq(
      // order 10: supplier 1 late, supplier 2 on time → counts for 1
      (10L, 1L, t("1997-06-01")),
      (10L, 2L, t("1997-01-15")),
      // order 20: BOTH suppliers late → counts for neither
      (20L, 1L, t("1997-06-01")),
      (20L, 3L, t("1997-06-01")),
      // order 30: supplier 3 late but ALONE on the order → no competition
      (30L, 3L, t("1997-06-01"))
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val out = Relational.lateAloneSuppliers(supplier, orders, lineitem)
      .collect()
      .map(r => (r.getAs[Long]("s_suppkey"), r.getAs[Long]("n_waiting_orders")))
    assert(out.toSeq == Seq((1L, 1L)))
  }

  test("ranking windows: quartiles, percent_rank and first_value follow the tiebroken orders") {
    val events = Seq(
      (1L, 101L, t("2024-01-01"), 10.0),
      (1L, 102L, t("2024-01-02"), 30.0),
      (1L, 103L, t("2024-01-03"), 20.0),
      (1L, 104L, t("2024-01-04"), 40.0),
      (2L, 201L, t("2024-01-01"), 5.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = Relational.windowRankFuncs(events)
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Int]("rn"), r.getAs[Int]("quartile"),
          r.getAs[Double]("val_pct"), r.getAs[Double]("first_val"))))
      .toMap
    // user 1 value order: 101(10) < 103(20) < 102(30) < 104(40)
    assert(out(101L) == ((1, 1, 0.0, 10.0)))
    assert(out(103L) == ((3, 2, 1.0 / 3, 10.0)))
    assert(out(102L) == ((2, 3, 2.0 / 3, 10.0)))
    assert(out(104L) == ((4, 4, 1.0, 10.0)))
    // singleton partition: percent_rank is 0 by definition
    assert(out(201L) == ((1, 1, 0.0, 5.0)))
  }

  test("min-cost supplier surfaces exact-price ties and honors the slice") {
    val part = Seq(
      (1L, "p1", "PROMO", 3),
      (2L, "p2", "PROMO", 9),   // size > 5: outside the slice
      (3L, "p3", "LARGE", 3)    // wrong type: outside the slice
    ).toDF("p_partkey", "p_name", "p_type", "p_size")
    val supplier = Seq((1L, "S#1", 10.0), (2L, "S#2", 20.0), (3L, "S#3", 30.0))
      .toDF("s_suppkey", "s_name", "s_acctbal")
    val lineitem = Seq(
      (1L, 1L, 50.0),  // min price for part 1 …
      (1L, 2L, 50.0),  // … exact tie: both suppliers must surface
      (1L, 3L, 60.0),  // above the min: dropped
      (2L, 3L, 1.0),   // part outside the slice: dropped
      (3L, 3L, 1.0)    // part outside the slice: dropped
    ).toDF("l_partkey", "l_suppkey", "l_extendedprice")
    val out = Relational.minCostSupplier(part, supplier, lineitem)
      .collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Long]("s_suppkey"),
        r.getAs[Double]("min_price")))
      .sortBy(x => (x._1, x._2))
    assert(out.toSeq == Seq((1L, 1L, 50.0), (1L, 2L, 50.0)))
  }
}
