package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class FunnelSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  private def run(rows: Seq[(Long, Timestamp, String)]): Map[Long, (Option[Timestamp], Option[Timestamp], Option[Timestamp], Int)] =
    Relational.funnel(rows.toDF("user_id", "ts", "event_type"))
      .collect()
      .map(r => r.getAs[Long]("user_id") -> ((
        Option(r.getAs[Timestamp]("first_view")),
        Option(r.getAs[Timestamp]("first_click")),
        Option(r.getAs[Timestamp]("first_purchase")),
        r.getAs[Int]("funnel_depth"))))
      .toMap

  test("full path in order reaches depth 3") {
    val out = run(Seq(
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 11:00:00"), "click"),
      (1L, t("2024-01-01 12:00:00"), "purchase")))
    assert(out(1L) == ((Some(t("2024-01-01 10:00:00")),
      Some(t("2024-01-01 11:00:00")), Some(t("2024-01-01 12:00:00")), 3)))
  }

  test("a click before the first view does not advance the funnel") {
    val out = run(Seq(
      (1L, t("2024-01-01 09:00:00"), "click"),   // pre-view: ignored
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 10:30:00"), "purchase") // no qualifying click yet
    ))
    assert(out(1L)._2.isEmpty)
    assert(out(1L)._4 == 1)
  }

  test("a purchase before the first qualifying click stays at depth 2") {
    val out = run(Seq(
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 10:30:00"), "purchase"), // before any click
      (1L, t("2024-01-01 11:00:00"), "click")))
    assert(out(1L)._3.isEmpty)
    assert(out(1L)._4 == 2)
  }

  test("stage transitions are strict: a click sharing the view's timestamp is ignored") {
    val out = run(Seq(
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 10:00:00"), "click")))
    assert(out(1L)._2.isEmpty)
    assert(out(1L)._4 == 1)
  }

  test("attribution windows bound each transition") {
    val rows = Seq(
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 12:00:00"), "click"),    // 2h after view: outside 1h window
      (2L, t("2024-01-01 10:00:00"), "view"),
      (2L, t("2024-01-01 10:30:00"), "click"),    // within 1h
      (2L, t("2024-01-03 11:00:00"), "purchase")) // 2 days after click: outside 24h
      .toDF("user_id", "ts", "event_type")
    val out = Relational.funnel(rows,
        clickWithin = Some("1 HOUR"), purchaseWithin = Some("24 HOURS"))
      .collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("funnel_depth")).toMap
    assert(out == Map(1L -> 1, 2L -> 2))
  }

  test("a user with activity but no view is depth 0") {
    val out = run(Seq(
      (1L, t("2024-01-01 10:00:00"), "click"),
      (1L, t("2024-01-01 11:00:00"), "purchase")))
    assert(out(1L) == ((None, None, None, 0)))
  }

  test("the first purchase after the first qualifying click is reported, not a later one") {
    val out = run(Seq(
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 11:00:00"), "click"),
      (1L, t("2024-01-01 11:30:00"), "purchase"),
      (1L, t("2024-01-01 12:00:00"), "purchase")))
    assert(out(1L)._3 == Some(t("2024-01-01 11:30:00")))
  }
}
