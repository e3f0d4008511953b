package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class RetentionSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("cohort week is the Monday of the first event; offsets bucket by 7 days") {
    // 2024-01-03 is a Wednesday -> cohort week Monday 2024-01-01.
    // Second event 2024-01-09 (Tue) is 8 days after the Monday -> offset 1.
    val ev = Seq(
      (1L, t("2024-01-03 10:00:00")),
      (1L, t("2024-01-09 10:00:00"))
    ).toDF("user_id", "ts")
    val out = Relational.cohortRetention(ev).orderBy("week_offset").collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[java.sql.Date]("cohort_week").toString == "2024-01-01"))
    assert(out.map(_.getAs[Long]("week_offset")).toSeq == Seq(0L, 1L))
    assert(out.forall(_.getAs[Long]("n_cohort") == 1L))
  }

  test("retention is the distinct-active share of the cohort, per cell") {
    // two users join in week 0; only one is active in week 1
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00")),
      (2L, t("2024-01-02 10:00:00")),
      (1L, t("2024-01-08 10:00:00")),
      (1L, t("2024-01-08 12:00:00"))  // same user twice: still 1 distinct
    ).toDF("user_id", "ts")
    val out = Relational.cohortRetention(ev).orderBy("week_offset").collect()
    assert(out.map(r => (r.getAs[Long]("week_offset"), r.getAs[Long]("n_active"),
      r.getAs[Double]("retention"))).toSeq ==
      Seq((0L, 2L, 1.0), (1L, 1L, 0.5)))
  }

  test("users joining in different weeks form separate cohorts") {
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00")),
      (2L, t("2024-01-10 10:00:00"))
    ).toDF("user_id", "ts")
    val out = Relational.cohortRetention(ev).collect()
    assert(out.map(_.getAs[java.sql.Date]("cohort_week").toString).toSet ==
      Set("2024-01-01", "2024-01-08"))
    assert(out.forall(_.getAs[Long]("n_cohort") == 1L))
  }

  test("cohort LTV accumulates purchase revenue per cohort week") {
    // 2024-01-01 is a Monday: week 1 = Jan 1-7, week 3 starts Jan 15
    val ev = Seq(
      // user 1: first seen week 1 (view), buys 10 in week 1, 20 in week 3
      (1L, t("2024-01-02 10:00:00"), "view", 0.0),
      (1L, t("2024-01-05 10:00:00"), "purchase", 10.0),
      (1L, t("2024-01-16 10:00:00"), "purchase", 20.0),
      // user 2: same week-1 cohort, buys 5 immediately
      (2L, t("2024-01-03 09:00:00"), "purchase", 5.0),
      // user 3: week-2 cohort, never buys — contributes to n_cohort only
      (3L, t("2024-01-09 08:00:00"), "view", 0.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val out = Relational.cohortLtv(ev)
      .orderBy("cohort_week", "week_offset").collect()
    val rows = out.map(r => (r.getAs[java.sql.Date]("cohort_week").toString,
      r.getAs[Long]("week_offset"), r.getAs[Double]("revenue"),
      r.getAs[Double]("cum_revenue"), r.getAs[Double]("ltv_per_user")))
    // week-1 cohort (2 users): offset 0 = 10+5, offset 2 = user 1's
    // week-3 purchase; the week-2 cohort never buys -> no cells
    assert(rows.toSeq == Seq(
      ("2024-01-01", 0L, 15.0, 15.0, 7.5),
      ("2024-01-01", 2L, 20.0, 35.0, 17.5)))
  }

  test("decile lift: top decile leads, shares accumulate to 1, lift decays") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val out = Relational.decileLift(events).orderBy("decile").collect()
    assert(out.length == 10)
    val rev = out.map(_.getAs[Double]("revenue"))
    // ntile ordered by spend desc: decile revenue must be non-increasing
    assert(rev.zip(rev.tail).forall { case (a, b) => a >= b }, rev.toSeq)
    assert(out.last.getAs[Double]("cum_rev_share") == 1.0)
    val lift = out.map(_.getAs[Double]("lift"))
    assert(lift.head >= 1.0 && lift.last == 1.0, lift.toSeq)
    assert(lift.zip(lift.tail).forall { case (a, b) => a >= b - 1e-9 }, lift.toSeq)
  }
}
