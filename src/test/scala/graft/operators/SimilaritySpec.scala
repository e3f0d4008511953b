package graft.operators

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  test("brute-force top-k is ordered, self-free, and k-bounded") {
    val out = Similarity.bruteForceTopK(
      Tables.embeddings(spark, sfDir), col("vec_id") < 4, k = 5)
    val rows = out.select("probe_id", "cand_id", "cosine", "rnk")
      .as[(Long, Long, Double, Int)].collect()
    assert(rows.length == 4 * 5)
    assert(rows.forall { case (p, c, _, _) => p != c })
    rows.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to 5))
      // cosine non-increasing with rank
      assert(sorted.map(_._3).sliding(2).forall(w => w(0) >= w(1)))
    }
  }

  test("LSH candidates are a subset-quality result: every hit ≤ brute-force best") {
    val emb = Tables.embeddings(spark, sfDir)
    val brute = Similarity.bruteForceTopK(emb, col("vec_id") < 4, k = 1)
      .select("probe_id", "cosine").as[(Long, Double)].collect().toMap
    val lsh = Similarity.lshTopK(emb, col("vec_id") < 4, k = 1)
      .select("probe_id", "cosine").as[(Long, Double)].collect()
    assert(lsh.nonEmpty)
    lsh.foreach { case (p, c) => assert(c <= brute(p) + 1e-9) }
  }

  test("IVF search stays inside probed cells and never beats brute force") {
    val emb = Tables.embeddings(spark, sfDir)
    val out = Similarity.ivfTopK(emb, col("vec_id") < 4, k = 5, nprobe = 2)
    val rows = out.select("probe_id", "cand_id", "cosine", "rnk")
      .as[(Long, Long, Double, Int)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (p, c, _, _) => p != c })
    // candidates come from at most nprobe distinct cells per probe
    val cellOf = emb.select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(r => cellOf(r._2)).distinct.length <= 2)
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to sorted.length))
      assert(sorted.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    }
    // an ANN hit can never exceed the true best
    val brute = Similarity.bruteForceTopK(emb, col("vec_id") < 4, k = 1)
      .select("probe_id", "cosine").as[(Long, Double)].collect().toMap
    rows.foreach { case (p, _, c, _) => assert(c <= brute(p) + 1e-9) }
  }

  test("recall@k is exactly 1 when nprobe covers every cell") {
    val emb = Tables.embeddings(spark, sfDir)
    val nCells = emb.select($"label").distinct().count().toInt
    val out = Similarity.recallAtK(emb, col("vec_id") < 4, k = 5, nprobe = nCells)
      .select("probe_id", "n_hits", "recall_at_5")
      .as[(Long, Long, Double)].collect()
    assert(out.length == 4)
    assert(out.forall { case (_, h, r) => h == 5L && r == 1.0 })
  }

  test("LSH recall@k: bounded, consistent with lshTopK, above the tuning floor") {
    val emb = Tables.embeddings(spark, sfDir)
    val out = Similarity.lshRecallAtK(emb, col("vec_id") < 8)
      .select("probe_id", "n_hits", "recall_at_5")
      .as[(Long, Long, Double)].collect()
    assert(out.length == 8)
    assert(out.forall { case (_, h, r) => h >= 0 && h <= 5 && r >= 0.0 && r <= 1.0 })
    // replay: n_hits equals |lshTopK ∩ bruteForceTopK| per probe
    val brute = Similarity.bruteForceTopK(emb, col("vec_id") < 8)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(emb, col("vec_id") < 8)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    val wantHits = brute.groupBy(_._1).map { case (p, g) =>
      p -> g.count(lsh.contains).toLong }
    out.foreach { case (p, h, _) => assert(h == wantHits(p)) }
    // the default table/bit settings must actually retrieve: mean
    // recall over the probes stays above a tuning floor, so a user
    // following the documented defaults is not flying blind
    val mean = out.map(_._3).sum / out.length
    assert(mean >= 0.4, s"mean LSH recall@5 $mean below floor")
  }

  test("trained IVF: inside trained cells, never beats brute force, k-bounded") {
    val emb = Tables.embeddings(spark, sfDir)
    val rows = Similarity.ivfTrainedTopK(emb, col("vec_id") < 4)
      .select("probe_id", "cand_id", "cosine", "rnk")
      .as[(Long, Long, Double, Int)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (p, c, _, _) => p != c })
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.length <= 5)
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to sorted.length))
    }
    val brute = Similarity.bruteForceTopK(emb, col("vec_id") < 4, k = 1)
      .select("probe_id", "cosine").as[(Long, Double)].collect().toMap
    rows.foreach { case (p, _, c, _) => assert(c <= brute(p) + 1e-9) }
    // candidates come from at most nprobe trained cells per probe
    val cellOf = Similarity.kmeansAssign(emb)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(r => cellOf(r._2)).distinct.length <= 2)
    }
  }

  test("kmeans recovers planted clusters and labels by seed id") {
    // two tight groups far apart; seeds (2 lowest ids) land one per group
    val emb = Seq(
      (0L, Array(10f, 0f, 0f, 0f)), (2L, Array(10.1f, 0f, 0f, 0f)),
      (4L, Array(9.9f, 0.1f, 0f, 0f)),
      (1L, Array(0f, 10f, 0f, 0f)), (3L, Array(0f, 10.2f, 0f, 0f)),
      (5L, Array(0.1f, 9.8f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.kmeansAssign(emb, k = 2, iters = 3)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(out(0L) == 0L && out(2L) == 0L && out(4L) == 0L)
    assert(out(1L) == 1L && out(3L) == 1L && out(5L) == 1L)
  }

  test("kmeans on the corpus is deterministic and k-bounded") {
    val emb = Tables.embeddings(spark, sfDir)
    val a = Similarity.kmeansAssign(emb).orderBy("vec_id").collect().toSeq
    val b = Similarity.kmeansAssign(emb).orderBy("vec_id").collect().toSeq
    assert(a == b)
    val clusters = a.map(_.getLong(1)).distinct
    assert(clusters.nonEmpty && clusters.size <= 8)
    // every assignment's d2 is non-negative and finite
    assert(a.forall(r => r.getDouble(2) >= -1e-9))
  }

  test("IVF+PQ: inside probed cells, exact final scores, ADC bounds the fetch") {
    val emb = Tables.embeddings(spark, sfDir)
    val rows = Similarity.ivfPqTopK(emb, col("vec_id") < 4, k = 5, nprobe = 2)
      .select("probe_id", "cand_id", "adc_cosine", "cosine", "rnk")
      .as[(Long, Long, Double, Double, Int)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (p, c, _, _, _) => p != c })
    // candidates come from at most nprobe distinct cells per probe
    val cellOf = emb.select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(r => cellOf(r._2)).distinct.length <= 2)
      assert(g.length <= 5)
      val sorted = g.sortBy(_._5)
      assert(sorted.map(_._5).toSeq == (1 to sorted.length))
      // final ordering is by the EXACT cosine, not the ADC score
      assert(sorted.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    }
    // the exact re-rank reproduces the true cosine: every survivor's
    // final score equals the plain-IVF score for the same pair
    val ivf = Similarity.ivfTopK(emb, col("vec_id") < 4, k = 5, nprobe = 2)
      .select("probe_id", "cand_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map { case (p, c, s) => (p, c) -> s }.toMap
    rows.foreach { case (p, c, _, s, _) =>
      ivf.get((p, c)).foreach(want => assert(s == want)) }
    // the ADC approximation is close: quantization to 255 levels keeps
    // the approximate cosine within a coarse band of the exact one
    rows.foreach { case (_, _, adc, s, _) => assert(math.abs(adc - s) < 0.05) }
    // an ANN hit can never exceed the true best
    val brute = Similarity.bruteForceTopK(emb, col("vec_id") < 4, k = 1)
      .select("probe_id", "cosine").as[(Long, Double)].collect().toMap
    rows.foreach { case (p, _, _, s, _) => assert(s <= brute(p) + 1e-9) }
  }

  test("recall@k divides by the probe's actual ground-truth size") {
    val emb = Tables.embeddings(spark, sfDir)
    val bruteCounts = Similarity.bruteForceTopK(emb, col("vec_id") < 8)
      .groupBy("probe_id").count()
      .as[(Long, Long)].collect().toMap
    val out = Similarity.recallAtK(emb, col("vec_id") < 8)
      .select("probe_id", "n_hits", "recall_at_5")
      .as[(Long, Long, Double)].collect()
    assert(out.length == 8)
    assert(out.forall { case (p, h, r) =>
      val n = bruteCounts(p)
      h >= 0 && h <= n &&
        r == math.round(h.toDouble / n * 1e4) / 1e4
    })
  }

  private def outlierEmb(rows: Seq[(Long, Seq[Float], Int)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, v, l) =>
        org.apache.spark.sql.Row(id, v, l)
      }, 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType), nullable = true),
        org.apache.spark.sql.types.StructField("label",
          org.apache.spark.sql.types.IntegerType, nullable = false))))

  test("embeddingOutliers: a far-from-centroid spike is flagged, the tight mass is not") {
    // label 0: eight points hugging (0,0) plus one spike at (10,10);
    // label 1: a tight pair — zero outliers by construction
    val df = outlierEmb(
      (1L to 8L).map(i => (i, Seq(if (i % 2 == 0) 0.1f else -0.1f, 0f), 0)) ++
        Seq((9L, Seq(10f, 10f), 0), (10L, Seq(5f, 5f), 1), (11L, Seq(5f, 5f), 1)))
    val out = Similarity.embeddingOutliers(df).orderBy("vec_id").collect()
    assert(out.length == 11)
    val flagged = out.filter(_.getBoolean(5)).map(_.getLong(0)).toSeq
    assert(flagged == Seq(9L), s"expected only the spike, got $flagged")
  }

  test("embeddingOutliers: zero-variance labels flag nothing (no NaN)") {
    val df = outlierEmb(Seq(
      (1L, Seq(2f, 3f), 0), (2L, Seq(2f, 3f), 0), (3L, Seq(2f, 3f), 0)))
    val out = Similarity.embeddingOutliers(df).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(!r.getDouble(2).isNaN && !r.getDouble(4).isNaN)
      assert(!r.getBoolean(5))
    }
  }

  test("embeddingOutliers: gate corpus bites both ways; stats joins broadcast") {
    val df = Tables.embeddings(spark, sfDir)
    val out = Similarity.embeddingOutliers(df)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"centroid/stats joins not broadcast:\n$plan")
    val rows = out.collect()
    val n = rows.count(_.getBoolean(5))
    assert(n > 0, "no outlier flagged — the gate flag is vacuous")
    assert(n < rows.length / 10, s"$n/${rows.length} flagged — not a tail")
  }
}
