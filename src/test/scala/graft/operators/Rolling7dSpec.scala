package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class Rolling7dSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("gap days enter the frame as zero-event days, not skipped rows") {
    // events on day 1 and day 3 only — day 2 is a gap
    val ev = Seq(
      (t("2024-01-01 10:00:00"), "view", 10.0),
      (t("2024-01-03 10:00:00"), "view", 20.0)
    ).toDF("ts", "event_type", "value")
    val out = Relational.rolling7d(ev)
      .orderBy("day")
      .select($"day".cast("string"), $"roll7_value", $"roll7_events")
      .as[(String, Double, Long)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", 10.0, 1L),
      ("2024-01-02", 10.0, 1L),   // the gap day exists and carries the window
      ("2024-01-03", 30.0, 2L)))
  }

  test("the frame drops days older than 7 calendar days even across gaps") {
    val ev = Seq(
      (t("2024-01-01 10:00:00"), "view", 100.0),
      (t("2024-01-09 10:00:00"), "view", 1.0)   // 8 days later: 100 must be gone
    ).toDF("ts", "event_type", "value")
    val last = Relational.rolling7d(ev)
      .orderBy($"day".desc).limit(1)
      .select($"roll7_value", $"roll7_events")
      .as[(Double, Long)].collect().head
    assert(last == ((1.0, 1L)))
  }

  test("types roll independently over a shared spine") {
    val ev = Seq(
      (t("2024-01-01 10:00:00"), "view", 1.0),
      (t("2024-01-02 10:00:00"), "click", 2.0)
    ).toDF("ts", "event_type", "value")
    val out = Relational.rolling7d(ev)
    assert(out.count() == 4) // 2 types x 2 spine days
    val clickDay1 = out.filter($"event_type" === "click" &&
      $"day" === lit("2024-01-01").cast("date")).collect().head
    assert(clickDay1.getAs[Long]("roll7_events") == 0L)
    assert(clickDay1.isNullAt(clickDay1.fieldIndex("roll7_value")))
  }
}
