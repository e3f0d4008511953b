package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpecBase {
  import spark.implicits._

  private def load1 = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "name", "price")

  private def h0 = Scd2.init(load1, Seq("k"), lit("2024-01-01"))

  test("init opens one current version per row") {
    val rows = h0.orderBy("k").collect()
    assert(rows.length == 3)
    assert(rows.forall(r => r.getAs[Boolean]("is_current")))
    assert(rows.forall(r => r.getAs[java.sql.Date]("effective_to") == null))
    assert(rows.forall(r =>
      r.getAs[java.sql.Date]("effective_from").toString == "2024-01-01"))
  }

  test("merge closes changed rows and opens new versions") {
    val load2 = Seq(
      (1L, "a", 11.0),   // changed -> close + new version
      (2L, "b", 20.0),   // unchanged -> untouched
      (4L, "d", 40.0)    // new key -> insert
    ).toDF("k", "name", "price")
    val h1 = Scd2.merge(h0, load2, Seq("k"), Seq("name", "price"),
      lit("2024-02-01"))
    val rows = h1.orderBy($"k", $"effective_from")
      .select($"k", $"price", $"effective_from".cast("string"),
        $"effective_to".cast("string"), $"is_current")
      .as[(Long, Double, String, Option[String], Boolean)].collect().toSeq
    assert(rows == Seq(
      (1L, 10.0, "2024-01-01", Some("2024-02-01"), false),
      (1L, 11.0, "2024-02-01", None, true),
      (2L, 20.0, "2024-01-01", None, true),
      (3L, 30.0, "2024-01-01", None, true),
      (4L, 40.0, "2024-02-01", None, true)))
  }

  test("a key absent from the load stays current; closed rows are immutable") {
    val h1 = Scd2.merge(h0, Seq((1L, "a", 11.0)).toDF("k", "name", "price"),
      Seq("k"), Seq("name", "price"), lit("2024-02-01"))
    val h2 = Scd2.merge(h1, Seq((2L, "b", 22.0)).toDF("k", "name", "price"),
      Seq("k"), Seq("name", "price"), lit("2024-03-01"))
    val k1 = h2.filter($"k" === 1L).orderBy($"effective_from").collect()
    assert(k1.map(_.getAs[Boolean]("is_current")).toSeq == Seq(false, true))
    assert(k1.head.getAs[java.sql.Date]("effective_to").toString == "2024-02-01")
    // exactly one current row per key, always
    val perKey = h2.filter($"is_current").groupBy($"k").count().collect()
    assert(perKey.forall(_.getLong(1) == 1L))
  }

  test("closeAbsent: a retracted key closes WITHOUT a replacing version; re-appearing reopens") {
    // load 2 is a FULL snapshot missing key 3 → its version closes at
    // the load date with no successor (deletion as an SCD2 event)
    val load2 = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "price")
    val h1 = Scd2.merge(h0, load2, Seq("k"), Seq("name", "price"),
      lit("2024-02-01"), closeAbsent = true)
    val k3 = h1.filter($"k" === 3L)
      .select($"effective_to".cast("string"), $"is_current")
      .as[(Option[String], Boolean)].collect().toSeq
    assert(k3 == Seq((Some("2024-02-01"), false)), k3)
    assert(h1.count() == 3) // no replacement row inserted
    // key 3 returns in load 3 → fresh open version, gap preserved
    val load3 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 31.0))
      .toDF("k", "name", "price")
    val h2 = Scd2.merge(h1, load3, Seq("k"), Seq("name", "price"),
      lit("2024-03-01"), closeAbsent = true)
    val k3v = h2.filter($"k" === 3L)
      .orderBy($"effective_from")
      .select($"price", $"effective_from".cast("string"),
        $"effective_to".cast("string"), $"is_current")
      .as[(Double, String, Option[String], Boolean)].collect().toSeq
    assert(k3v == Seq(
      (30.0, "2024-01-01", Some("2024-02-01"), false),
      (31.0, "2024-03-01", None, true)), k3v)
    // incremental default is unchanged: absent keys stay open
    val hInc = Scd2.merge(h0, load2, Seq("k"), Seq("name", "price"),
      lit("2024-02-01"))
    assert(hInc.filter($"k" === 3L && $"is_current").count() == 1)
  }

  test("NULL transitions close versions null-safely, NULL->NULL does not") {
    val base = Seq((1L, Option("a")), (2L, Option.empty[String]))
      .toDF("k", "name")
    val h = Scd2.init(base, Seq("k"), lit("2024-01-01"))
    val load2 = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "name")
    val h1 = Scd2.merge(h, load2, Seq("k"), Seq("name"), lit("2024-02-01"))
    // k=1: 'a' -> NULL is a change; k=2: NULL -> NULL is not
    assert(h1.filter($"k" === 1L).count() == 2)
    assert(h1.filter($"k" === 2L).count() == 1)
    assert(h1.filter($"k" === 1L && $"is_current").collect().head.isNullAt(1))
  }

  test("duplicate delta keys raise in-plan") {
    val dup = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k", "name", "price")
    val ex = intercept[Exception] {
      Scd2.merge(h0, dup, Seq("k"), Seq("name", "price"),
        lit("2024-02-01")).count()
    }
    assert(ex.getMessage.contains("duplicate keys"))
  }

  test("asOf resolves the version valid at each fact time, half-open [from, to)") {
    val load2 = Seq((1L, "a", 11.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "price")
    val h1 = Scd2.merge(h0, load2, Seq("k"), Seq("name", "price"),
      lit("2024-02-01"))
    val facts = Seq(
      (1L, "2023-12-31"), // before any version: drops
      (1L, "2024-01-15"), // inside v1
      (1L, "2024-02-01"), // boundary: belongs to v2, not v1
      (1L, "2024-03-01"), // inside v2
      (2L, "2024-03-01"), // unchanged key: still v1
      (9L, "2024-03-01")  // unknown key: drops
    ).toDF("fk", "d").withColumn("d", col("d").cast("date"))
    val out = Scd2.asOf(h1, facts, "k", "fk", "d")
      .select(col("fk"), col("d").cast("string"), col("price"))
      .as[(Long, String, Double)].collect().toSet
    assert(out == Set(
      (1L, "2024-01-15", 10.0),
      (1L, "2024-02-01", 11.0),
      (1L, "2024-03-01", 11.0),
      (2L, "2024-03-01", 20.0)))
    // the natural case: fact and dim share the key NAME — must resolve
    // without an ambiguous-reference analysis error
    val sameName = Seq((1L, "2024-03-01")).toDF("k", "d")
      .withColumn("d", col("d").cast("date"))
    val sn = Scd2.asOf(h1, sameName, "k", "k", "d")
      .select(col("price")).as[Double].collect().toSeq
    assert(sn == Seq(11.0))
  }

  test("broadcast and shuffled forms agree") {
    val load2 = Seq((1L, "a", 11.0), (4L, "d", 40.0)).toDF("k", "name", "price")
    val b = Scd2.merge(h0, load2, Seq("k"), Seq("name", "price"),
      lit("2024-02-01"), broadcastDelta = true)
    val s = Scd2.merge(h0, load2, Seq("k"), Seq("name", "price"),
      lit("2024-02-01"), broadcastDelta = false)
    assert(b.orderBy($"k", $"effective_from").collect().toSeq ==
      s.orderBy($"k", $"effective_from").collect().toSeq)
  }
}
