package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsOfRangeSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("attribution picks the latest strictly-earlier view per user") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, "view"),
      (1L, ts("2024-01-01 10:05:00"), 101L, "view"),
      (1L, ts("2024-01-01 10:10:00"), 102L, "purchase"), // → view 101
      (1L, ts("2024-01-01 10:10:00"), 103L, "view"),     // same-ts: excluded
      (1L, ts("2024-01-01 10:20:00"), 104L, "purchase"), // → view 103
      (2L, ts("2024-01-01 09:00:00"), 200L, "purchase"), // no prior view
      (2L, ts("2024-01-01 09:30:00"), 201L, "click")     // ignored type
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = AsOfJoin.attribution(events).orderBy("purchase_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(out == Seq((102L, 101L, 300L), (104L, 103L, 600L), (200L, -1L, -1L)))
  }

  test("forward as-of picks the earliest strictly-later view inside the tolerance") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, "purchase"), // → view 102 (10:10)
      (1L, ts("2024-01-01 10:00:00"), 101L, "view"),     // same-ts: excluded
      (1L, ts("2024-01-01 10:10:00"), 102L, "view"),
      (1L, ts("2024-01-01 10:20:00"), 103L, "view"),     // later than 102: not picked
      (2L, ts("2024-01-01 09:00:00"), 200L, "purchase"), // only view 90min out → tolerance null
      (2L, ts("2024-01-01 10:30:00"), 201L, "view"),
      (3L, ts("2024-01-01 09:00:00"), 300L, "purchase")  // no later view at all
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = AsOfJoin.attributionForward(events).orderBy("purchase_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(out == Seq((100L, 102L, 600L), (200L, -1L, -1L), (300L, -1L, -1L)))
  }

  test("interval counts match a brute-force filter join") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val viaBuckets = RangeJoin.nearbyCounts(events, "error", 60L)
      .orderBy("probe_id").as[(Long, Long)].collect().toSeq
    val e = events.filter($"event_type" === "error")
      .select($"event_id".as("probe_id"), unix_micros($"ts").as("pus"))
    val brute = events.select($"event_id", unix_micros($"ts").as("us"))
      .crossJoin(e)
      .filter(abs($"us" - $"pus") <= 60000000L)
      .groupBy($"probe_id").agg(count(lit(1)).as("n"))
      .orderBy("probe_id").as[(Long, Long)].collect().toSeq
    assert(viaBuckets == brute)
    assert(viaBuckets.nonEmpty)
  }

  test("multi-touch splits credit across in-window views, weights sum to 1") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, "view", 0.0),
      (1L, ts("2024-01-01 10:30:00"), 101L, "view", 0.0),
      (1L, ts("2024-01-01 11:00:00"), 102L, "purchase", 50.0),
      (1L, ts("2024-01-01 08:00:00"), 103L, "view", 0.0), // outside lookback
      (2L, ts("2024-01-01 09:59:00"), 200L, "view", 0.0),
      (2L, ts("2024-01-01 10:00:00"), 201L, "purchase", 10.0)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = AsOfJoin.multiTouch(events).orderBy("purchase_id", "view_id").collect()
    // purchase 102: views 100 (age 60m) and 101 (age 30m); 201: view 200 only
    assert(out.map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("view_id"))).toSeq ==
      Seq((102L, 100L), (102L, 101L), (201L, 200L)))
    val p102 = out.filter(_.getAs[Long]("purchase_id") == 102L)
    assert(p102.forall(_.getAs[Double]("w_linear") == 0.5))
    // decay: raw 1/61 vs 1/31 → recent view gets more credit
    val wByView = p102.map(r => r.getAs[Long]("view_id") -> r.getAs[Double]("w_decay")).toMap
    assert(wByView(101L) > wByView(100L))
    assert(math.abs(wByView(100L) + wByView(101L) - 1.0) < 2e-4)
    // single-touch purchase gets full credit and full value
    val p201 = out.filter(_.getAs[Long]("purchase_id") == 201L).head
    assert(p201.getAs[Double]("w_decay") == 1.0 &&
      p201.getAs[Double]("attributed_value") == 10.0)
  }
}
