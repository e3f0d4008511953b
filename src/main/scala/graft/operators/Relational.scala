package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General relational surface (the capability the reference's Snowflake
  * layer implies): multi-aggregate scans, selective multi-joins,
  * analytic windows, time-bucketed and session-windowed aggregation.
  *
  * Determinism rule (SURVEY §5): every money aggregate goes through
  * exact DECIMAL arithmetic and only the final value is cast to DOUBLE,
  * so results are bit-identical across engines regardless of float
  * summation order.
  */
object Relational {

  private def dec(c: Column, p: Int = 12, s: Int = 2): Column =
    c.cast(s"decimal($p,$s)")

  /** TPC-H Q1-shaped pricing summary: single scan, 8 aggregates,
    * map-side partial agg, 6-group output. Filter reaches the parquet
    * scan (PushedFilters on l_shipdate).
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate").cast("date") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice"), 10, 2) * dec(lit(1) - col("l_discount"), 4, 2))
          .cast("double").as("sum_disc_price"),
        sum(dec(col("l_extendedprice"), 10, 2) * dec(lit(1) - col("l_discount"), 4, 2)
          * dec(lit(1) + col("l_tax"), 4, 2)).cast("double").as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        (sum(dec(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-shaped shipping priority: segment-filtered customer ⋈
    * orders ⋈ lineitem, revenue agg, top 10. Customer side broadcast
    * (dim ≪ fact); date filters push to both scans.
    */
  def shippingPriority(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame): DataFrame = {
    val cutoff = lit("1998-01-01")
    val c = customer.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = orders
      .filter(col("o_orderdate").cast("date") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").as("o_orderdate"), col("o_orderpriority"))
    val l = lineitem
      .filter(col("l_shipdate").cast("date") > cutoff)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice"), 10, 2) * dec(lit(1) - col("l_discount"), 4, 2))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Per-customer running order totals + sequence numbers — the analytic
    * window surface. Partitioned by customer (hash-distributes cleanly);
    * order key (date, orderkey) is unique so RANGE≡ROWS framing agrees
    * across engines.
    */
  def runningTotals(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders.select(
        col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        dec(col("o_totalprice")).as("price_d"))
      .withColumn("running_total", sum(col("price_d")).over(w).cast("double"))
      .withColumn("order_seq", row_number().over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("price_d").cast("double").as("o_totalprice"),
        col("running_total"), col("order_seq"))
  }

  /** Tumbling 1-hour event aggregation (the batch twin of the streaming
    * windowed agg in [[graft.streaming.EventStream]]).
    */
  def hourlyEventAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Session windows per user (30-minute inactivity gap) — native
    * `session_window`, which runs distributed by user and is the same
    * operator Structured Streaming uses for stateful sessionization.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(
        col("user_id"),
        date_trunc("second", col("session_window.start")).as("session_start"),
        col("n_events"), col("sum_value"))
}
