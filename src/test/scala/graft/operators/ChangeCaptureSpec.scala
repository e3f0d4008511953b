package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ChangeCaptureSpec extends SparkSpecBase {
  import spark.implicits._

  private def old = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "name", "price")

  test("classifies inserts, updates, deletes; drops unchanged") {
    val cur = Seq(
      (1L, "a", 10.0),   // unchanged -> dropped
      (2L, "b", 21.0),   // updated
      (4L, "d", 40.0)    // inserted; 3 deleted
    ).toDF("k", "name", "price")
    val out = ChangeCapture.diff(old, cur, Seq("k"))
      .orderBy("k")
      .select($"k", $"change_type", $"old_price", $"new_price")
      .as[(Long, String, Option[Double], Option[Double])].collect().toSeq
    assert(out == Seq(
      (2L, "U", Some(20.0), Some(21.0)),
      (3L, "D", Some(30.0), None),
      (4L, "I", None, Some(40.0))))
  }

  test("NULL value transitions are updates; NULL == NULL is unchanged") {
    val o = Seq((1L, Option("a")), (2L, Option.empty[String]))
      .toDF("k", "name")
    val c = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "name")
    val out = ChangeCapture.diff(o, c, Seq("k")).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("k") == 1L)
    assert(out.head.getAs[String]("change_type") == "U")
  }

  test("NULL keys match null-safely instead of reporting a delete+insert") {
    val o = Seq((Option.empty[Long], "x")).toDF("k", "name")
    val c = Seq((Option.empty[Long], "y")).toDF("k", "name")
    val out = ChangeCapture.diff(o, c, Seq("k")).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("change_type") == "U")
  }

  test("diff feeds MergeInto: applying U+I to the old snapshot converges") {
    val cur = Seq((2L, "b", 21.0), (4L, "d", 40.0), (1L, "a", 10.0))
      .toDF("k", "name", "price")
    val d = ChangeCapture.diff(old, cur, Seq("k"))
    val upserts = d.filter($"change_type".isin("U", "I"))
      .select($"k", $"new_name".as("name"), $"new_price".as("price"))
    val deletes = d.filter($"change_type" === "D").select($"k")
    val applied = MergeInto.upsert(old, upserts, Seq("k"), Seq("name", "price"))
      .join(deletes, Seq("k"), "left_anti")
    assert(applied.orderBy("k").collect().toSeq ==
      cur.orderBy("k").collect().toSeq)
  }
}
