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
        col("event_type").as("platform"),
        get_json_object(col("props"), "$.k").cast("bigint").as("item_key"))

  /** The shared view-layer fact: VIEW events joined to the item dim,
    * carrying every column any of the four views groups on. The daily
    * chain materializes THIS once per load and derives all four views
    * from it ([[graft.Pipeline]]) — one fact scan + one broadcast join
    * instead of four of each; each view is then a small aggregate over
    * the shared frame. Row multiset per view is unchanged: `p_partkey`
    * is unique in the dim, so joining the wider dim projection cannot
    * change join cardinality, and each view selects exactly the
    * columns it grouped on before.
    */
  def viewJoined(events: DataFrame, items: DataFrame): DataFrame =
    viewFact(events).join(
      broadcast(items.select(col("p_partkey"), col("p_name"))),
      col("item_key") === col("p_partkey"))

  /** [[viewJoined]] over an already-[[StarSchema.prep]]ped frame: no
    * JSON re-parse (`item_key` reads the parsed map), the day bucket
    * derives from the second-truncated event time (same date value).
    */
  def viewJoinedPrepped(p: DataFrame, items: DataFrame): DataFrame =
    p.filter(col("event_type") === "view")
      .select(
        col("event_time").cast("date").as("period_day"),
        col("event_type").as("platform"),
        element_at(col("props_map"), "k").cast("bigint").as("item_key"))
      .join(
        broadcast(items.select(col("p_partkey"), col("p_name"))),
        col("item_key") === col("p_partkey"))

  /** View 1 — total item views per period. */
  def yearlyCounts(events: DataFrame, items: DataFrame): DataFrame =
    yearlyCountsFrom(viewJoined(events, items))

  def yearlyCountsFrom(joined: DataFrame): DataFrame =
    joined
      .groupBy(col("period_day"))
      .agg(count(lit(1)).as("item_views"))

  private def itemCountsFrom(joined: DataFrame): DataFrame =
    joined
      .groupBy(col("period_day"), col("p_name").as("item_name"))
      .agg(count(lit(1)).as("item_views"))

  /** View 2 — per-period per-item view counts + DENSE_RANK. */
  def itemRankByPeriod(events: DataFrame, items: DataFrame): DataFrame =
    itemRankFrom(viewJoined(events, items))

  def itemRankFrom(joined: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("period_day")).orderBy(col("item_views").desc)
    itemCountsFrom(joined)
      .withColumn("item_view_rank", dense_rank().over(w).cast("bigint"))
  }

  /** View 3 — the single most-viewed item of the latest period (total
    * order: views desc, then name — the reference's LIMIT 1 made total).
    */
  def topItemRecentPeriod(events: DataFrame, items: DataFrame): DataFrame =
    topItemFrom(viewJoined(events, items))

  def topItemFrom(joined: DataFrame): DataFrame = {
    val counts = itemCountsFrom(joined)
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
  def topPlatformByPeriod(events: DataFrame, items: DataFrame): DataFrame =
    topPlatformFrom(viewJoined(events, items))

  def topPlatformFrom(joined: DataFrame): DataFrame = {
    val counts = joined
      .groupBy(col("period_day"), col("platform"))
      .agg(count(lit(1)).as("platform_views"))
    val w = Window.partitionBy(col("period_day")).orderBy(col("platform_views").desc)
    counts
      .withColumn("platform_rank", dense_rank().over(w).cast("bigint"))
      .filter(col("platform_rank") === 1)
  }
}
