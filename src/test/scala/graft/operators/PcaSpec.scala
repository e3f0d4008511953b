package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class PcaSpec extends SparkSpecBase {

  private def emb(rows: Seq[(Long, Seq[Float], Int)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, v, l) =>
        Row(id, v, l)
      }, 2),
      StructType(Seq(
        StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType), nullable = true),
        StructField("label", IntegerType, nullable = false))))

  test("hand-computed axis-aligned case: component lands on the dominant axis") {
    // points (±1, 0), (±2, 0): means (0,0), centered Gram [[10,0],[0,0]];
    // power iteration from (1,1): w=(10,0), s=10, v=(1,0) and stays —
    // scores are the x coordinates, ev_scale is the eigenvalue 10
    val df = emb(Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(-1f, 0f), 0),
      (3L, Seq(2f, 0f), 0), (4L, Seq(-2f, 0f), 0)))
    val out = Pca.topComponent(df).orderBy("vec_id").collect()
    assert(out.map(_.getDouble(2)).toSeq === Seq(1.0, -1.0, 2.0, -2.0))
    assert(out.map(_.getDouble(3)).distinct.toSeq === Seq(10.0))
  }

  test("null embeddings are excluded, not scored") {
    val df = emb(Seq(
      (1L, Seq(1f, 0f), 0), (2L, null, 0), (3L, Seq(-1f, 0f), 0)))
    val out = Pca.topComponent(df)
    assert(out.count() === 2)
    assert(out.filter(col("vec_id") === 2L).count() === 0)
  }

  test("degenerate corpus (all vectors identical) yields zeros, never NaN") {
    val df = emb(Seq(
      (1L, Seq(2f, 3f), 0), (2L, Seq(2f, 3f), 0), (3L, Seq(2f, 3f), 0)))
    val out = Pca.topComponent(df).orderBy("vec_id").collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(!r.getDouble(2).isNaN && r.getDouble(2) === 0.0)
      assert(!r.getDouble(3).isNaN && r.getDouble(3) === 0.0)
    }
  }

  test("scores are deterministic across runs and sum to ~zero (centered)") {
    val df = graft.sources.Tables.embeddings(spark, sfDir)
    val a = Pca.topComponent(df).orderBy("vec_id").collect()
    val b = Pca.topComponent(df).orderBy("vec_id").collect()
    assert(a.toSeq === b.toSeq)
    // projections of mean-centered vectors sum to zero up to rounding:
    // each score is rounded to 4 dp, so the sum is bounded by n * 5e-5
    val s = a.map(_.getDouble(2)).sum
    assert(math.abs(s) <= a.length * 5e-5 + 1e-3)
  }

  test("the component explains at least as much variance as any raw axis") {
    // the dominant eigenvalue (ev_scale after convergence-ish rounds)
    // must dominate every diagonal Gram entry; check via score energy:
    // sum(score^2) >= max over dims of sum(centered^2) within slack
    val df = graft.sources.Tables.embeddings(spark, sfDir)
    val out = Pca.topComponent(df)
    val scoreEnergy = out.agg(sum(col("pc1_score") * col("pc1_score")))
      .head().getDouble(0)
    val pts = df.filter(col("embedding").isNotNull)
      .select(graft.functions.VectorFunctions.asDouble(col("embedding")).as("x"))
    val dimStats = pts.select(posexplode(col("x")).as(Seq("pos", "v")))
      .groupBy("pos")
      .agg((sum(col("v") * col("v")) - sum(col("v")) * sum(col("v")) / count(lit(1)))
        .as("energy"))
      .agg(max(col("energy"))).head().getDouble(0)
    // 3 power rounds from all-ones may not fully converge; allow 5% slack
    assert(scoreEnergy >= dimStats * 0.95,
      s"PC1 energy $scoreEnergy should dominate best axis $dimStats")
  }

  test("topComponents2: deflation finds the second axis, orthogonal to the first") {
    // x-axis variance 10, y-axis variance 4 — pc1 = x, pc2 = y, and
    // the two directions are orthogonal (pc_dot = 0)
    val df = emb(Seq(
      (1L, Seq(1f, 1f), 0), (2L, Seq(-1f, -1f), 0),
      (3L, Seq(2f, -1f), 0), (4L, Seq(-2f, 1f), 0)))
    // 8 rounds: the orthogonality claim needs a CONVERGED first
    // direction (Hotelling deflation with a half-converged v1 leaves
    // its residue in the second component by construction — the gate's
    // 3-round default trades that tail for a fixed replayable law)
    val out = Pca.topComponents2(df, iters = 8).orderBy("vec_id").collect()
    val pc1 = out.map(_.getDouble(2)).toSeq
    val pc2 = out.map(_.getDouble(3)).toSeq
    val ev1 = out.head.getDouble(4)
    val ev2 = out.head.getDouble(5)
    val dot = out.head.getDouble(6)
    // pc1 is the x-dominant direction, pc2 the residual one; the
    // deflated eigen-scale must be strictly smaller
    assert(ev1 > ev2 && ev2 > 0, (ev1, ev2))
    assert(math.abs(dot) < 0.01, s"components not orthogonal: $dot")
    // the two projections decorrelate: sample covariance of
    // (pc1, pc2) scores is ~0
    val cov = pc1.zip(pc2).map { case (a, b) => a * b }.sum / pc1.length
    assert(math.abs(cov) < 0.05, s"scores correlated: $cov")
  }

  test("driftAgainstMoments: a shifted dim drifts, an unshifted one does not") {
    // reference moments: 4 vectors, dim-0 mean 0.0, dim-1 mean 1.0
    val refN = 4L
    val refS = Array(0.0, 4.0)
    // current drop: dim-0 mean 0.5 (shift 0.5 > 0.1), dim-1 mean 1.0
    val cur = emb(Seq(
      (1L, Seq(0.5f, 1f), 0), (2L, Seq(0.5f, 1f), 0)))
    val out = Pca.driftAgainstMoments(cur, refN, refS, threshold = 0.1)
      .orderBy("dim_idx").collect()
    assert(out.length === 2)
    assert(out(0).getDouble(1) === 0.0 && out(0).getDouble(2) === 0.5)
    assert(out(0).getDouble(3) === 0.5 && out(0).getBoolean(4))
    assert(out(1).getDouble(1) === 1.0 && out(1).getDouble(2) === 1.0)
    assert(out(1).getDouble(3) === 0.0 && !out(1).getBoolean(4))
  }

  test("driftAgainstMoments: a drop drawn from the reference shows zero drift") {
    val df = graft.sources.Tables.embeddings(spark, sfDir)
    val pts = df.filter(col("embedding").isNotNull)
      .select(graft.functions.VectorFunctions.asDouble(col("embedding")).as("x"))
    val n = pts.count()
    val dim = Similarity.embeddingDim(df)
    val sums = pts.select(posexplode(col("x")).as(Seq("pos", "v")))
      .groupBy("pos").agg(sum(col("v")).as("sv")).collect()
    val s = new Array[Double](dim)
    sums.foreach(r => s(r.getInt(0)) = r.getDouble(1))
    // current == the reference corpus itself: every per-dim shift is a
    // pure rounding residue (two 6-dp roundings of the same mean)
    val out = Pca.driftAgainstMoments(df, n, s, threshold = 0.01).collect()
    assert(out.length === dim)
    out.foreach { r =>
      assert(r.getDouble(3) <= 1e-6, r)
      assert(!r.getBoolean(4), r)
    }
  }

  test("driftAgainstMoments fails CLOSED: an empty slice alarms every dim") {
    // the monitored slice vanished (filter matches nothing) — the
    // dashboard must still emit every dimension, flagged, not return
    // an empty frame that reads as "no drift"
    val cur = emb(Seq((1L, Seq(1f, 2f), 0))).filter("vec_id < 0")
    val out = Pca.driftAgainstMoments(cur, 4L, Array(0.0, 4.0))
      .orderBy("dim_idx").collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.isNullAt(2) && r.isNullAt(3) && r.getBoolean(4), r)
    }
  }

  test("driftAgainstMoments: the gate slice bites both ways at threshold 0.01") {
    val df = graft.sources.Tables.embeddings(spark, sfDir)
    val pts = df.filter(col("embedding").isNotNull)
      .select(graft.functions.VectorFunctions.asDouble(col("embedding")).as("x"))
    val n = pts.count()
    val dim = Similarity.embeddingDim(df)
    val sums = pts.select(posexplode(col("x")).as(Seq("pos", "v")))
      .groupBy("pos").agg(sum(col("v")).as("sv")).collect()
    val s = new Array[Double](dim)
    sums.foreach(r => s(r.getInt(0)) = r.getDouble(1))
    val out = Pca.driftAgainstMoments(
      df.filter(col("label") === 3), n, s, threshold = 0.01).collect()
    val drifted = out.count(_.getBoolean(4))
    assert(drifted > 0, "no dim drifted — the gate flag is vacuous")
    assert(drifted < out.length, "every dim drifted — the flag cannot split")
  }

  test("topComponents2: degenerate corpus yields zeros on both components") {
    val df = emb(Seq(
      (1L, Seq(2f, 3f), 0), (2L, Seq(2f, 3f), 0)))
    val out = Pca.topComponents2(df).collect()
    out.foreach { r =>
      (2 to 6).foreach(i =>
        assert(!r.getDouble(i).isNaN && r.getDouble(i) === 0.0, r))
    }
  }
}
