package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpecBase {

  test("identical segments: jaccard 1, overlap exact when the sketch isn't full") {
    import spark.implicits._
    val ev = (1L to 100L).flatMap(u => Seq(("a", u), ("b", u)))
      .toDF("event_type", "user_id")
    val out = Sketches.kmvOverlap(ev, k = 256).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Double]("jaccard") === 1.0)
    // 100 distinct < k: every estimate is the exact count
    assert(r.getAs[Double]("est_a") === 100.0)
    assert(r.getAs[Double]("est_union") === 100.0)
    assert(r.getAs[Double]("est_overlap") === 100.0)
    assert(r.getAs[Long]("exact_overlap") === 100L)
  }

  test("disjoint segments: jaccard 0, overlap 0") {
    import spark.implicits._
    val ev = ((1L to 50L).map(("a", _)) ++ (1001L to 1050L).map(("b", _)))
      .toDF("event_type", "user_id")
    val r = Sketches.kmvOverlap(ev, k = 256).collect().head
    assert(r.getAs[Double]("jaccard") === 0.0)
    assert(r.getAs[Double]("est_overlap") === 0.0)
    assert(r.getAs[Long]("exact_overlap") === 0L)
  }

  test("full-sketch estimates track exact overlaps on the corpus") {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val rows = Sketches.kmvOverlap(ev).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est_overlap")
      val exact = r.getAs[Long]("exact_overlap").toDouble
      if (exact >= 50) {
        // k=256 → expected relative error ~6%; assert a generous 35%
        // band so the test pins correctness, not luck
        assert(math.abs(est - exact) / exact <= 0.35,
          s"${r.getString(0)}x${r.getString(1)}: est $est vs exact $exact")
      }
    }
  }

  test("withExact=false drops the user-grain self-join (the 100 TB shape)") {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val df = Sketches.kmvOverlap(ev, withExact = false)
    assert(!df.columns.contains("exact_overlap"))
    assert(df.count() > 0)
  }
}
