package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpecBase {
  import spark.implicits._

  private val spec = IncrementalAgg.Spec(
    sums = Seq("v"), mins = Seq("v"), maxs = Seq("v"))

  test("folding drops equals the one-shot aggregate") {
    val all = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 10.0), ("b", -1.0), ("c", 5.0)
    ).toDF("k", "v")
    val drops = Seq(
      all.limit(2), all.offset(2).limit(2), all.offset(4))
    val inc = IncrementalAgg.foldAll(drops, Seq("k"), spec)
      .withColumn("sum_v", $"sum_v".cast("double"))
      .orderBy("k")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(inc == Seq(
      ("a", 3L, 6.0, 1.0, 3.0),
      ("b", 2L, 9.0, -1.0, 10.0),
      ("c", 1L, 5.0, 5.0, 5.0)))
  }

  test("fold order does not matter (associative, commutative state)") {
    val d1 = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
    val d2 = Seq(("a", 3.0)).toDF("k", "v")
    val d3 = Seq(("c", 4.0), ("a", 5.0)).toDF("k", "v")
    def run(ds: Seq[org.apache.spark.sql.DataFrame]) =
      IncrementalAgg.foldAll(ds, Seq("k"), spec)
        .orderBy("k").collect().toSeq
    assert(run(Seq(d1, d2, d3)) == run(Seq(d3, d1, d2)))
  }

  test("NULL values keep SQL aggregate semantics through folds") {
    val d1 = Seq(("a", Option.empty[Double]), ("b", Option(1.0)))
      .toDF("k", "v")
    val d2 = Seq(("a", Option.empty[Double]), ("b", Option.empty[Double]))
      .toDF("k", "v")
    val out = IncrementalAgg.foldAll(Seq(d1, d2), Seq("k"), spec)
      .orderBy("k").collect()
    val a = out(0)
    assert(a.getAs[Long]("n_rows") == 2L)
    assert(a.isNullAt(a.fieldIndex("sum_v")))   // all-NULL key stays NULL
    assert(a.isNullAt(a.fieldIndex("min_v")))
    val b = out(1)
    assert(b.getAs[java.math.BigDecimal]("sum_v").doubleValue() == 1.0)
    assert(b.getAs[Double]("min_v") == 1.0)     // NULL never poisons min/max
  }

  test("NULL keys merge null-safely instead of duplicating per drop") {
    val d1 = Seq((Option.empty[String], 1.0)).toDF("k", "v")
    val d2 = Seq((Option.empty[String], 2.0)).toDF("k", "v")
    val out = IncrementalAgg.foldAll(Seq(d1, d2), Seq("k"), spec).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_rows") == 2L)
  }
}
