package graft.operators

import graft.SparkSpecBase

class MergeIntoSpec extends SparkSpecBase {
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "name", "price")

  test("upsert updates matched rows, keeps unmatched, inserts new") {
    val delta = Seq((2L, "B2", 99.0), (4L, "d", 40.0)).toDF("k", "name", "price")
    val out = MergeInto.upsert(target, delta, Seq("k"), Seq("price"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    // price updates from delta; name is NOT in updateCols so target wins on match
    assert(out == Seq(
      (1L, "a", 10.0), (2L, "b", 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("insertIfAbsent never overwrites existing keys") {
    val delta = Seq((2L, "CLASH", 0.0), (5L, "e", 50.0)).toDF("k", "name", "price")
    val out = MergeInto.insertIfAbsent(target, delta, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (5L, "e", 50.0)))
  }

  test("upsert propagates NULL from the delta on matched rows") {
    val delta = Seq((2L, Option.empty[String], Option(99.0)))
      .toDF("k", "name", "price")
    val out = MergeInto.upsert(
        target.select($"k", $"name".as("name"), $"price"),
        delta, Seq("k"), Seq("name", "price"))
      .filter($"k" === 2L).collect().head
    assert(out.isNullAt(1))        // delta's NULL wins, not stale "b"
    assert(out.getDouble(2) == 99.0)
  }

  test("upsert is idempotent: merging the same delta twice = once") {
    val delta = Seq((2L, "b", 99.0), (4L, "d", 40.0)).toDF("k", "name", "price")
    val once = MergeInto.upsert(target, delta, Seq("k"), Seq("price"))
    val twice = MergeInto.upsert(once, delta, Seq("k"), Seq("price"))
    assert(twice.orderBy("k").collect().toSeq == once.orderBy("k").collect().toSeq)
  }
}
