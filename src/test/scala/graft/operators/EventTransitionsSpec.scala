package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class EventTransitionsSpec extends SparkSpecBase {

  test("hand case: within-user ordered pairs only, no cross-user leakage") {
    import spark.implicits._
    val ev = Seq(
      // user 1: a -> b -> a ; user 2: c (no transition, and no
      // cross-user a->c or c->... pair may appear)
      (1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "a"), (4L, 2L, "c"))
      .map { case (id, u, t) =>
        (id, u, t, java.sql.Timestamp.valueOf(s"2024-01-01 00:0$id:00"))
      }.toDF("event_id", "user_id", "event_type", "ts")
    val out = Relational.eventTransitions(ev)
      .orderBy("prev_type", "next_type").collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getDouble(3))).toSeq ===
      Seq(("a", "b", 1L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("per-prev probabilities sum to 1 on the corpus") {
    val out = Relational.eventTransitions(
      graft.sources.Tables.events(spark, sfDir))
    val sums = out.groupBy("prev_type").agg(sum("p_next").as("s")).collect()
    assert(sums.nonEmpty)
    // each row rounds to 4 dp, so a 5-type row-sum sits within 5e-4 of 1
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 5e-4, r))
    // counts conserve: total transitions = events - users-with-events
    val ev = graft.sources.Tables.events(spark, sfDir)
    val expected = ev.count() -
      ev.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(out.agg(sum("n_transitions")).head().getLong(0) === expected)
  }
}
