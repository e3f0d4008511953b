package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class MarketShareSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s + " 00:00:00")

  // two regions, two supplier nations; only region EUROPE's customers count
  private val region = Seq((0, "EUROPE"), (1, "ASIA")).toDF("r_regionkey", "r_name")
  private val nation = Seq((0, "NATION_A", 0), (1, "NATION_B", 0), (2, "NATION_C", 1))
    .toDF("n_nationkey", "n_name", "n_regionkey")
  private val customer = Seq((100L, 0), (101L, 2)).toDF("c_custkey", "c_nationkey")
  private val supplier = Seq((10L, 0), (11L, 1)).toDF("s_suppkey", "s_nationkey")
  private val orders = Seq(
    (1000L, 100L, ts("2024-03-01")), // EUROPE customer
    (1001L, 101L, ts("2024-03-02"))  // ASIA customer — excluded
  ).toDF("o_orderkey", "o_custkey", "o_orderdate")
  private val lineitem = Seq(
    (1000L, 10L, 30.0, 0.0),  // EUROPE order, NATION_A supplier: rev 30
    (1000L, 11L, 70.0, 0.0),  // EUROPE order, NATION_B supplier: rev 70
    (1001L, 10L, 999.0, 0.0)  // ASIA order — excluded entirely
  ).toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")

  test("share is the target nation's fraction of region revenue, per year") {
    val out = Relational.marketShare(region, nation, customer, supplier,
      orders, lineitem, regionName = "EUROPE", suppNation = "NATION_A")
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("order_year") == 2024L)
    assert(r.getAs[Double]("mkt_share") == 0.3)
    assert(r.getAs[Double]("total_revenue") == 100.0)
    assert(r.getAs[Long]("n_items") == 2L)
  }

  test("a year with no target-nation revenue reports share 0, not a missing row") {
    val out = Relational.marketShare(region, nation, customer, supplier,
      orders, lineitem, regionName = "EUROPE", suppNation = "NATION_C")
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("mkt_share") == 0.0)
    assert(out.head.getAs[Double]("total_revenue") == 100.0)
  }
}
