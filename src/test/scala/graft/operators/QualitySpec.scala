package graft.operators

import graft.SparkSpecBase

class QualitySpec extends SparkSpecBase {
  import spark.implicits._

  test("rules count nulls, dup surplus, range breaks, and orphans") {
    val t = Seq(
      (Some(1L), 5.0), (Some(1L), 6.0), (Some(1L), 7.0), // key 1 × 3 → 2 surplus
      (Some(2L), -1.0),                                  // range violation
      (None, 3.0)                                        // null key
    ).toDF("k", "v")
    val parent = Seq(1L).toDF("p")                        // key 2 is an orphan
    val report = Quality.report(Seq(
      Quality.notNull(t, "k", "k_not_null"),
      Quality.unique(t, "k", "k_unique"),
      Quality.inRange(t, "v", 0.0, 10.0, "v_range"),
      Quality.refIntegrity(t.filter($"k".isNotNull), "k", parent, "p", "k_ref")))
      .orderBy("rule").as[(String, Long)].collect().toSeq
    assert(report == Seq(
      ("k_not_null", 1L), ("k_ref", 1L), ("k_unique", 2L), ("v_range", 1L)))
  }

  test("audit matches the per-rule report exactly, including quoting") {
    val t = Seq(
      (Some(1L), 5.0), (Some(1L), 6.0), (Some(1L), 7.0),
      (Some(2L), -1.0),
      (None, 3.0)
    ).toDF("k", "v")
    val audited = Quality.audit(t, Seq(
      Quality.NotNull("k", "k_not_null"),
      Quality.Unique("k", "k_unique"),
      Quality.InRange("v", 0.0, 10.0, "v'range") // quote survives stack()
    )).orderBy("rule").as[(String, Long)].collect().toSeq
    assert(audited == Seq(
      ("k_not_null", 1L), ("k_unique", 2L), ("v'range", 1L)))
  }

  test("audit with only unique rules (no scan-rule aggregate) still reports") {
    val t = Seq((1L, 1L), (1L, 2L)).toDF("a", "b")
    val r = Quality.audit(t, Seq(Quality.Unique("a", "a_unique")))
      .as[(String, Long)].collect().toSeq
    assert(r == Seq(("a_unique", 1L)))
  }

  test("clean tables report zero violations") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val r = Quality.report(Seq(
      Quality.notNull(events, "event_id", "id_not_null"),
      Quality.unique(events, "event_id", "id_unique")))
      .as[(String, Long)].collect().toMap
    assert(r.values.forall(_ == 0L))
  }
}
