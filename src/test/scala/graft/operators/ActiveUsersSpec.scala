package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class ActiveUsersSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("wau counts a multi-day user once and drops users out of the window") {
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00")),
      (1L, t("2024-01-03 10:00:00")),  // same user later in window
      (2L, t("2024-01-01 11:00:00")),
      (3L, t("2024-01-09 10:00:00"))   // day 9: window [3,9] keeps user 1, drops user 2
    ).toDF("user_id", "ts")
    val out = Relational.activeUsers(ev).orderBy("day")
      .select(col("day").cast("string"), col("dau"), col("wau_7d"))
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", 2L, 2L),
      ("2024-01-03", 1L, 2L),   // users 1 and 2 both within trailing 7d; 1 counted once
      ("2024-01-09", 1L, 2L)))  // user 1 active on day 3 still in [3,9]; user 2 out
  }

  test("days with no events do not appear even when inside some window") {
    val ev = Seq((1L, t("2024-01-01 10:00:00"))).toDF("user_id", "ts")
    val out = Relational.activeUsers(ev).collect()
    assert(out.length == 1)
    assert(out.head.getAs[java.sql.Date]("day").toString == "2024-01-01")
  }
}
