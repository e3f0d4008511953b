package graft.operators

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SQL-façade parity ([[SqlFacade]]): the reference's four views
  * served through `spark.sql` must return EXACTLY the rows the
  * DataFrame twins ([[Views]]) return — one ground truth, two front
  * doors — and the SQL plans must keep the DataFrame twins' 100 TB
  * shape (the item dim joins as a BROADCAST, never a fact shuffle).
  */
class SqlFacadeSpec extends SparkSpecBase {

  private lazy val events = Tables.events(spark, sfDir)
  private lazy val items = Tables.part(spark, sfDir)

  private def registered(): Unit =
    SqlFacade.registerViews(spark, events, items)

  private def rows(df: DataFrame, order: Seq[String]): Seq[org.apache.spark.sql.Row] =
    df.orderBy(order.map(col): _*).collect().toSeq

  test("all four SQL views return exactly the DataFrame twins' rows") {
    registered()
    val cases: Seq[(String, DataFrame, Seq[String])] = Seq(
      ("yearly_item_view_count",
        Views.yearlyCounts(events, items), Seq("period_day")),
      ("item_view_based_on_particular_year",
        Views.itemRankByPeriod(events, items),
        Seq("period_day", "item_view_rank", "item_name")),
      ("most_viewed_item_based_on_most_recent_year",
        Views.topItemRecentPeriod(events, items), Seq("item_name")),
      ("most_used_platform_in_particular_year",
        Views.topPlatformByPeriod(events, items),
        Seq("period_day", "platform")))
    cases.foreach { case (view, dfTwin, order) =>
      val sqlRows = rows(spark.sql(s"SELECT * FROM $view"), order)
      val dfRows = rows(dfTwin, order)
      assert(sqlRows.nonEmpty, s"$view must return rows on the gate data")
      assert(sqlRows == dfRows, s"$view diverges from its DataFrame twin")
    }
  }

  test("the SQL plans broadcast the item dim (no fact-side shuffle for the join)") {
    registered()
    spark.sharedState.cacheManager.clearCache()
    val plan = spark.sql("SELECT * FROM yearly_item_view_count")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the dim join must broadcast from the SQL front door too:\n$plan")
  }

  test("the LLM-tier front-door slice: SQL exact dedup equals the DataFrame twin") {
    // the door is not view-shaped only: the exact-dedup law as literal
    // SQL over a temp view must return EXACTLY Dedup.exact's rows, and
    // the SQL plan must keep the hash-keyed shuffle (group keys are the
    // two hashes + length — the document body never enters an exchange)
    val docs = Tables.documents(spark, sfDir)
    docs.createOrReplaceTempView("graft_documents")
    val sql = spark.sql(
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM graft_documents
        |GROUP BY xxhash64(text), length(text), xxhash64(1, text)
        |ORDER BY keep_id""".stripMargin)
    val sqlRows = sql.collect().toSeq
    val dfRows = Dedup.exact(docs).orderBy(col("keep_id")).collect().toSeq
    assert(sqlRows.nonEmpty && sqlRows == dfRows)
    val plan = sql.queryExecution.executedPlan.toString
    assert(plan.contains("xxhash64"),
      s"the SQL door must key the shuffle on the hash convention:\n$plan")
  }
}
