package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL front door for the reference's four analytic views — the
  * layer the reference actually targets is Snowflake SQL (`run_raw_sql`
  * in astro-sdk-tutorial/dags/etl_s3_snowflake_aggregated_views.py:
  * 22-94), while this engine's native surface is the DataFrame API.
  * Registering the star tables and the views as TEMP VIEWS and serving
  * them through `spark.sql` proves the same Catalyst plans are
  * reachable from the SQL front door too: a user can port the
  * reference's view DDL verbatim (modulo dialect) and get the
  * broadcast-dim-join + partial-agg + windowed-rank plans the
  * DataFrame twins ([[Views]]) produce — the gate pins both twins to
  * one oracle.
  *
  * View names mirror the reference's
  * (aggregated_views.py:22/38/55/76). The item dim carries an explicit
  * BROADCAST hint — same 100 TB shape as the DataFrame side: the fact
  * table never shuffles for the dim join.
  */
object SqlFacade {

  /** Shared fact CTE: view events bucketed by day with the JSON item
    * key extracted — the [[Views.viewFact]] shape in SQL.
    */
  private val factCte =
    """SELECT CAST(ts AS DATE) AS period_day,
      |       CAST(get_json_object(props, '$.k') AS BIGINT) AS item_key
      |FROM graft_events WHERE event_type = 'view'""".stripMargin

  private val itemCountsCte =
    s"""fe AS ($factCte),
       |c AS (SELECT /*+ BROADCAST(d) */ period_day, d.p_name AS item_name,
       |        count(*) AS item_views
       |      FROM fe JOIN graft_part d ON fe.item_key = d.p_partkey
       |      GROUP BY period_day, d.p_name)""".stripMargin

  /** Register the star tables + the reference's four views as temp
    * views in the session catalog. Idempotent (CREATE OR REPLACE).
    */
  def registerViews(spark: SparkSession, events: DataFrame,
      items: DataFrame): Unit = {
    events.createOrReplaceTempView("graft_events")
    items.createOrReplaceTempView("graft_part")
    spark.sql(
      s"""CREATE OR REPLACE TEMP VIEW yearly_item_view_count AS
         |WITH fe AS ($factCte)
         |SELECT /*+ BROADCAST(d) */ period_day, count(*) AS item_views
         |FROM fe JOIN graft_part d ON fe.item_key = d.p_partkey
         |GROUP BY period_day""".stripMargin)
    spark.sql(
      s"""CREATE OR REPLACE TEMP VIEW item_view_based_on_particular_year AS
         |WITH $itemCountsCte
         |SELECT period_day, item_name, item_views,
         |  CAST(dense_rank() OVER (PARTITION BY period_day
         |       ORDER BY item_views DESC) AS BIGINT) AS item_view_rank
         |FROM c""".stripMargin)
    spark.sql(
      s"""CREATE OR REPLACE TEMP VIEW most_viewed_item_based_on_most_recent_year AS
         |WITH $itemCountsCte
         |SELECT period_day, item_name, item_views FROM c
         |WHERE period_day = (SELECT max(period_day) FROM c)
         |ORDER BY item_views DESC, item_name LIMIT 1""".stripMargin)
    spark.sql(
      s"""CREATE OR REPLACE TEMP VIEW most_used_platform_in_particular_year AS
         |WITH fact AS (
         |  SELECT CAST(ts AS DATE) AS period_day, event_type AS platform,
         |         CAST(get_json_object(props, '$$.k') AS BIGINT) AS item_key
         |  FROM graft_events WHERE event_type = 'view'),
         |c AS (SELECT /*+ BROADCAST(d) */ period_day, platform,
         |        count(*) AS platform_views
         |      FROM fact JOIN graft_part d ON fact.item_key = d.p_partkey
         |      GROUP BY period_day, platform),
         |r AS (SELECT *, CAST(dense_rank() OVER (PARTITION BY period_day
         |        ORDER BY platform_views DESC) AS BIGINT) AS platform_rank
         |      FROM c)
         |SELECT period_day, platform, platform_views, platform_rank
         |FROM r WHERE platform_rank = 1""".stripMargin)
    ()
  }
}
