package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's four analytic views, Spark-first.
  *
  * Reference: astro-sdk-tutorial/dags/etl_s3_snowflake_aggregated_views.py
  * :22-35 (yearly_item_view_count), :38-52 (item_view_based_on_particular
  * _year), :55-73 (most_viewed_item_based_on_most_recent_year), :76-94
  * (most_used_platform_in_particular_year). All four are: filter the fact
  * to view events, join the item dim, bucket by time, COUNT, DENSE_RANK.
  *
  * The driver testdata spans one month, so the time bucket is the DAY
  * (`CAST(ts AS DATE)`) — same operator shape as the reference's YEAR().
  *
  * Scale notes: the item dim is ≪ the fact, so the dim join is an
  * explicit `broadcast()` — the 100 TB fact never shuffles for the join.
  * COUNT by (day, item) gets map-side partial aggregation; the DENSE_RANK
  * window runs on the already-aggregated (tiny) result, partitioned by
  * day — no single-partition window anywhere.
  */
object Views {

  private def viewFact(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") === "view")
      .select(
        col("ts").cast("date").as("period_day"),
        get_json_object(col("props"), "$.k").cast("bigint").as("item_key"))

  private def joined(events: DataFrame, items: DataFrame): DataFrame =
    viewFact(events).join(
      broadcast(items.select(col("p_partkey"), col("p_name"))),
      col("item_key") === col("p_partkey"))

  /** View 1 — total item views per period. */
  def yearlyCounts(events: DataFrame, items: DataFrame): DataFrame =
    joined(events, items)
      .groupBy(col("period_day"))
      .agg(count(lit(1)).as("item_views"))

  private def itemCounts(events: DataFrame, items: DataFrame): DataFrame =
    joined(events, items)
      .groupBy(col("period_day"), col("p_name").as("item_name"))
      .agg(count(lit(1)).as("item_views"))

  /** View 2 — per-period per-item view counts + DENSE_RANK. */
  def itemRankByPeriod(events: DataFrame, items: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("period_day")).orderBy(col("item_views").desc)
    itemCounts(events, items)
      .withColumn("item_view_rank", dense_rank().over(w).cast("bigint"))
  }

  /** View 3 — the single most-viewed item of the latest period (total
    * order: views desc, then name — the reference's LIMIT 1 made total).
    */
  def topItemRecentPeriod(events: DataFrame, items: DataFrame): DataFrame = {
    val counts = itemCounts(events, items)
    val latest = counts.groupBy().agg(max(col("period_day")).as("latest_day"))
    counts
      .join(broadcast(latest), col("period_day") === col("latest_day"))
      .drop("latest_day")
      .orderBy(col("item_views").desc, col("item_name"))
      .limit(1)
  }

  /** View 4 — dominant platform per period among VIEW events: rank = 1
    * rows. The reference scopes this view (like the other three) to
    * `event_name = 'view_item'` before ranking platforms
    * (aggregated_views.py:81-87). The driver testdata has no separate
    * platform column, so `event_type` plays both `event_name` (the
    * view filter) and `EVENT_PLATFORM` (the ranked dimension) — the
    * filtered result is degenerate (one platform) but the operator
    * shape (filter → join dim → count → dense_rank → rank=1) mirrors
    * the reference exactly.
    */
  def topPlatformByPeriod(events: DataFrame, items: DataFrame): DataFrame = {
    val fact = events
      .filter(col("event_type") === "view")
      .select(
        col("ts").cast("date").as("period_day"),
        col("event_type").as("platform"),
        get_json_object(col("props"), "$.k").cast("bigint").as("item_key"))
    val counts = fact
      .join(broadcast(items.select(col("p_partkey"))), col("item_key") === col("p_partkey"))
      .groupBy(col("period_day"), col("platform"))
      .agg(count(lit(1)).as("platform_views"))
    val w = Window.partitionBy(col("period_day")).orderBy(col("platform_views").desc)
    counts
      .withColumn("platform_rank", dense_rank().over(w).cast("bigint"))
      .filter(col("platform_rank") === 1)
  }
}
