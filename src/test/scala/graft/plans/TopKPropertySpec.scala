package graft.plans

import graft.SparkSpecBase
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the bounded-heap top-k: against a reference
  * sort-based formulation over randomized inputs, including NULL slots,
  * duplicate scores/ties, and both tie kinds. Pure-JVM (no Spark jobs),
  * so hundreds of trials are cheap.
  */
class TopKPropertySpec extends SparkSpecBase {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(200)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  /** (group, score, tie) with ~10% nulls per slot. */
  private def rowGen[T](tieGen: Gen[T]): Gen[List[(Option[Long], Option[Double], Option[T])]] =
    Gen.listOfN(60, for {
      g <- Gen.frequency(9 -> Gen.choose(0L, 4L).map(Some(_)), 1 -> Gen.const(None))
      o <- Gen.frequency(9 -> Gen.choose(0, 9).map(i => Some(i.toDouble)), 1 -> Gen.const(None))
      t <- Gen.frequency(9 -> tieGen.map(Some(_)), 1 -> Gen.const(None))
    } yield (g, o, t))

  private def toRow(g: Option[Long], o: Option[Double], t: Option[Any]): InternalRow =
    new GenericInternalRow(Array[Any](
      g.map(Long.box).orNull, o.map(Double.box).orNull, t.orNull))

  /** Reference: per group, rank by (score desc, tie asc), keep k. */
  private def reference[T: Ordering](
      data: List[(Option[Long], Option[Double], Option[T])], k: Int)
      : Map[Long, List[(Double, T)]] =
    data.collect { case (Some(g), Some(o), Some(t)) => (g, o, t) }
      .groupBy(_._1)
      .map { case (g, rows) =>
        g -> rows.map(r => (r._2, r._3))
          .sortBy { case (o, t) => (-o, t) }(
            Ordering.Tuple2(Ordering.Double.TotalOrdering, implicitly[Ordering[T]]))
          .take(k)
      }

  private def run(rows: List[InternalRow], k: Int, tie: TieKind)
      : Map[Long, List[(Double, Any)]] =
    HeapPass.topK(rows.iterator, 0, 1, 2, k, tie)
      .map { case (g, es) => g -> es.map(e => (e._1, e._2)) }
      .toMap

  test("long-tie heap equals the reference sort on randomized inputs") {
    val prop = Prop.forAll(rowGen(Gen.choose(0L, 20L)), Gen.choose(1, 6)) {
      (data, k) =>
        val got = run(data.map(d => toRow(d._1, d._2, d._3.map(Long.box))), k, LongTie)
          .map { case (g, es) => g -> es.map(e => (e._1, e._2.asInstanceOf[Long])) }
        got == reference(data, k)
    }
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("string-tie heap equals the reference sort on randomized inputs") {
    val tieGen = Gen.oneOf("a", "b", "ba", "z", "", "aa")
    val prop = Prop.forAll(rowGen(tieGen), Gen.choose(1, 6)) { (data, k) =>
      val got = run(
        data.map(d => toRow(d._1, d._2, d._3.map(UTF8String.fromString))),
        k, StringTie)
        .map { case (g, es) => g -> es.map(e => (e._1, e._2.toString)) }
      got == reference(data, k)
    }
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("planned top-k equals the window formulation on a randomized frame") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val datasets = Gen.listOfN(400,
      Gen.zip(Gen.choose(0L, 9L), Gen.choose(0, 19).map(_.toDouble),
        Gen.oneOf("x", "y", "xy", "z", "q")))
      .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(7L)).get
    val df = datasets.toDF("g", "score", "tok").repartition(7)
    val got = TopKPlanner.perGroup(df, "g", "score", "tok", k = 3)
      .select("g", "score", "tok", "rnk").orderBy("g", "rnk", "tok")
      .collect().toSeq
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"tok")
    val want = df.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 3).select("g", "score", "tok", "rnk")
      .orderBy("g", "rnk", "tok").collect().toSeq
    assert(got == want)
  }
}
