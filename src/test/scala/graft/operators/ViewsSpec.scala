package graft.operators

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class ViewsSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val events = Tables.events(spark, sfDir)
  private lazy val part = Tables.part(spark, sfDir)

  test("yearly counts equal the sum of per-item counts") {
    val total = Views.yearlyCounts(events, part)
      .agg(sum("item_views")).as[Long].head()
    val perItem = Views.itemRankByPeriod(events, part)
      .agg(sum("item_views")).as[Long].head()
    assert(total == perItem && total > 0)
  }

  test("ranks start at 1 per day and follow counts") {
    val r = Views.itemRankByPeriod(events, part)
    assert(r.filter(col("item_view_rank") === 1).select("period_day")
      .distinct().count() == r.select("period_day").distinct().count())
    // rank 1 rows carry the max count of their day
    val bad = r.alias("a").join(
        r.groupBy(col("period_day").as("d")).agg(max("item_views").as("mx")),
        col("a.period_day") === col("d"))
      .filter(col("a.item_view_rank") === 1 && col("a.item_views") =!= col("mx"))
    assert(bad.count() == 0)
  }

  test("top platform rows all have rank 1 and one+ per day") {
    val p = Views.topPlatformByPeriod(events, part)
    assert(p.filter(col("platform_rank") =!= 1).count() == 0)
    assert(p.count() >= p.select("period_day").distinct().count())
    // reference scopes the view to view events (aggregated_views.py:81-87);
    // with event_type doubling as platform, every surviving row is 'view'
    assert(p.filter(col("platform") =!= "view").count() == 0)
    // counts agree with view 1 (same filter + dim join + day bucket)
    val yc = Views.yearlyCounts(events, part)
      .withColumnRenamed("item_views", "yc_views")
    val mismatch = p.join(yc, "period_day")
      .filter(col("platform_views") =!= col("yc_views"))
    assert(mismatch.count() == 0)
  }

  test("top item of recent period is a single row from the latest day") {
    val top = Views.topItemRecentPeriod(events, part)
    assert(top.count() == 1)
    val maxDay = Views.yearlyCounts(events, part)
      .agg(max("period_day")).head().getDate(0)
    assert(top.head().getDate(top.head().fieldIndex("period_day")) == maxDay)
  }
}
