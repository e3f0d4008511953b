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
}
