package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpecBase {
  import spark.implicits._

  test("normalization audit: centering zeroes the mean, norms are exact") {
    // dim means: (2, 4). centered: v1 = (-1, -2), v2 = (1, 2)
    val emb = Seq(
      (1L, Array(1.0f, 2.0f), "a"),
      (2L, Array(3.0f, 6.0f), "a")
    ).toDF("vec_id", "embedding", "label")
    val out = Quantize.normalizeAudit(emb).orderBy("vec_id").collect()
    assert(out.map(_.getAs[Long]("n_dims")).toSeq == Seq(2L, 2L))
    assert(out(0).getAs[Double]("norm_before") == math.sqrt(5.0).round4)
    assert(out(0).getAs[Double]("norm_centered") == math.sqrt(5.0).round4)
    assert(out(0).getAs[Double]("centered_sum") == -3.0)
    assert(out(1).getAs[Double]("centered_sum") == 3.0)
    // centered components sum to zero ACROSS the corpus per dimension
    assert(out.map(_.getAs[Double]("centered_sum")).sum == 0.0)
  }

  private implicit class R4(d: Double) {
    def round4: Double = math.rint(d * 1e4) / 1e4
  }

  test("codes hit the grid endpoints and midpoints exactly") {
    // dim 0 spans [0, 10]: 0 -> 0, 10 -> 255, 5 -> round(127.5) = 128
    // dim 1 is flat: always code 0
    val emb = Seq(
      (1L, Array(0.0f, 7.0f)),
      (2L, Array(10.0f, 7.0f)),
      (3L, Array(5.0f, 7.0f))
    ).toDF("vec_id", "embedding")
    val out = Quantize.scalarCodes(emb).orderBy("vec_id").collect()
    def codes(i: Int) = (out(i).getAs[Long]("min_code"), out(i).getAs[Long]("max_code"))
    assert(out.forall(_.getAs[Long]("n_dims") == 2L))
    assert(codes(0) == ((0L, 0L)))      // both dims code 0
    assert(codes(1) == ((0L, 255L)))    // flat dim 0, max dim 255
    assert(out(2).getAs[Long]("sum_code") == 128L)
  }

  test("sum_code is the plain sum of per-dimension codes") {
    val emb = Seq(
      (1L, Array(0.0f, 0.0f)),
      (2L, Array(1.0f, 2.0f)),
      (3L, Array(2.0f, 4.0f))
    ).toDF("vec_id", "embedding")
    // dim0 spans [0,2] -> codes 0, 128, 255; dim1 spans [0,4] -> same
    val out = Quantize.scalarCodes(emb).orderBy("vec_id").collect()
    assert(out.map(_.getAs[Long]("sum_code")).toSeq == Seq(0L, 256L, 510L))
  }

  test("randomProject preserves norms within the JL distortion band") {
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val out = Quantize.randomProject(emb).collect()
    assert(out.nonEmpty)
    // E[distortion] = 1; at outDim=16 nearly all mass is within ±60%
    val ds = out.map(_.getAs[Double]("distortion"))
    assert(ds.forall(d => d > 0.3 && d < 1.9),
      s"distortion out of band: min=${ds.min} max=${ds.max}")
    val mean = ds.sum / ds.length
    assert(math.abs(mean - 1.0) < 0.15, s"mean distortion $mean")
  }

  test("randomProject matches a hand-computed projection and stays shuffle-free") {
    import spark.implicits._
    val w = graft.functions.VectorFunctions.planeWeights(16, 64)
    val v = Array.tabulate(64)(i => (i % 5 - 2).toFloat)
    val emb = Seq((1L, v.toSeq, "x")).toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "cast(embedding as array<float>) as embedding", "label")
    val row = Quantize.randomProject(emb).collect().head
    val expected0 = math.round(
      v.zip(w(0)).map { case (x, s) => x.toDouble * s }.sum / 4.0 * 1e4) / 1e4
    assert(row.getAs[Double]("proj_0") == expected0)
    val plan = Quantize.randomProject(emb).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
