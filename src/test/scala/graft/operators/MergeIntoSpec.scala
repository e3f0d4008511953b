package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

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

  private def targetWithNull = Seq(
    (Option(1L), "a", 10.0), (Option(2L), "b", 20.0), (Option.empty[Long], "n", 30.0)
  ).toDF("k", "name", "price")

  test("broadcast upsert is equivalent to the full-outer form (incl. NULL keys)") {
    val delta = Seq(
      (Option(2L), "B2", 99.0),              // update
      (Option(4L), "d", 40.0),               // insert
      (Option.empty[Long], "N2", 77.0)       // NULL key: updates stored NULL row
    ).toDF("k", "name", "price")
    val full = MergeInto.upsert(targetWithNull, delta, Seq("k"),
      Seq("name", "price"), broadcastDelta = false)
    val bcast = MergeInto.upsert(targetWithNull, delta, Seq("k"),
      Seq("name", "price"), broadcastDelta = true)
    val f = full.orderBy(asc_nulls_first("k")).collect().toSeq
    val b = bcast.orderBy(asc_nulls_first("k")).collect().toSeq
    assert(f == b, s"full=$f bcast=$b")
    assert(f.size == 4) // NULL matched NULL — no duplicate row
  }

  test("NULL-key delta row is NOT re-inserted across two incremental upserts") {
    val delta = Seq((Option.empty[Long], "NEW", 1.0)).toDF("k", "name", "price")
    val once = MergeInto.upsert(targetWithNull, delta, Seq("k"), Seq("name", "price"))
    val twice = MergeInto.upsert(once, delta, Seq("k"), Seq("name", "price"))
    assert(once.filter($"k".isNull).count() == 1)
    assert(twice.filter($"k".isNull).count() == 1)
    assert(twice.count() == 3)
  }

  test("NULL-key delta row is NOT re-inserted across two insertIfAbsent loads") {
    val delta = Seq((Option.empty[Long], "NEW", 1.0)).toDF("k", "name", "price")
    val once = MergeInto.insertIfAbsent(target, delta, Seq("k"))
    assert(once.filter($"k".isNull).count() == 1) // first load inserts it
    val twice = MergeInto.insertIfAbsent(once, delta, Seq("k"))
    assert(twice.filter($"k".isNull).count() == 1) // second load matches it
    assert(twice.count() == 4)
  }

  test("syncDelete: update + insert + delete-unmatched-target in one merge") {
    val delta = Seq((2L, "B2", 99.0), (4L, "d", 40.0)).toDF("k", "name", "price")
    val out = MergeInto.syncDelete(target, delta, Seq("k"), Seq("price"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    // 1 and 3 deleted (not in delta), 2 updated (name kept — not an
    // updateCol), 4 inserted
    assert(out == Seq((2L, "b", 99.0), (4L, "d", 40.0)))
  }

  test("broadcast syncDelete is equivalent to the full-outer form (incl. NULL keys)") {
    val delta = Seq((Option(2L), "B2", 99.0), (Option.empty[Long], "N2", 1.0),
      (Option(4L), "d", 40.0)).toDF("k", "name", "price")
    val a = MergeInto.syncDelete(targetWithNull, delta, Seq("k"), Seq("price"))
      .orderBy("k").collect().toSeq
    val b = MergeInto.syncDelete(targetWithNull, delta, Seq("k"), Seq("price"),
        broadcastDelta = true)
      .orderBy("k").collect().toSeq
    assert(a == b)
    // null-safe: the NULL-key target row matched the NULL-key delta row
    // (updated, not deleted+reinserted): name stays "n", price updates
    assert(a.exists(r => r.isNullAt(0) && r.getString(1) == "n" &&
      r.getDouble(2) == 1.0), a)
  }

  test("syncDelete is idempotent: syncing the same snapshot twice = once") {
    val delta = Seq((2L, "B2", 99.0), (4L, "d", 40.0)).toDF("k", "name", "price")
    val once = MergeInto.syncDelete(target, delta, Seq("k"), Seq("price"))
    val twice = MergeInto.syncDelete(once, delta, Seq("k"), Seq("price"))
    assert(twice.orderBy("k").collect().toSeq ==
      once.orderBy("k").collect().toSeq)
  }

  test("deleteMatched removes exactly the delta's key set, null-safe") {
    val takedown = Seq(Option(2L), Option.empty[Long]).toDF("k")
    val out = MergeInto.deleteMatched(targetWithNull, takedown, Seq("k"))
      .orderBy("k").collect().toSeq
    assert(out.map(_.get(0)) == Seq(1L)) // 2 and the NULL-key row removed
  }

  test("upsert raises on duplicate delta keys instead of fanning out") {
    val dup = Seq((2L, "x", 1.0), (2L, "y", 2.0)).toDF("k", "name", "price")
    val ex = intercept[Exception] {
      MergeInto.upsert(target, dup, Seq("k"), Seq("price")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("duplicate keys")), ex)
  }
}
