package graft.operators

import graft.SparkSpecBase

/** Laws of [[Dedup.semanticDedup]] (the SemDeDup shape): candidates
  * come ONLY from within the k-means cell, twins fold in as group
  * sizes with cosine 1.0, and the keep-lowest-id action drops every
  * member with a lower-id semantic neighbor.
  */
class SemanticDedupSpec extends SparkSpecBase {
  import spark.implicits._

  // k=2, iters=1 ⇒ assignment = nearest of the two lowest-id seeds
  // (vec 1 and vec 2). Geometry: 3 and its twin 4 sit by seed 1;
  // 5 sits by seed 2 but is cosine-similar (0.6 ≥ 0.5) to vec 1 —
  // the cross-cluster pair SemDeDup deliberately never scores.
  private val emb = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
    (3L, Seq(0.99f, 0.01f, 0.0f, 0.0f)),
    (4L, Seq(0.99f, 0.01f, 0.0f, 0.0f)), // exact twin of 3
    (5L, Seq(0.6f, 0.8f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  private lazy val out = Dedup
    .semanticDedup(emb, k = 2, iters = 1, threshold = 0.5)
    .collect()
    .map(r => r.getAs[Long]("vec_id") ->
      ((r.getAs[Long]("cluster"), r.getAs[Long]("n_dups"),
        r.getAs[Boolean]("kept"))))
    .toMap

  test("within-cluster neighborhoods count twins and near-dups, not cross-cluster pairs") {
    // vec 1: neighbors 3 and 4 (cosine ≈ 0.99995); vec 5 is similar
    // (0.6) but lives in the OTHER cell → excluded by construction
    assert(out(1L)._2 == 2L)
    // vec 3: its twin 4 (cosine 1.0) + group {1}
    assert(out(3L)._2 == 2L)
    assert(out(4L)._2 == 2L)
    // cell B: 2 ↔ 5 at cosine 0.8
    assert(out(2L)._2 == 1L)
    assert(out(5L)._2 == 1L)
  }

  test("keep-lowest-id action: the minimum id of each neighborhood survives") {
    assert(out(1L)._3)       // lowest id of {1,3,4}
    assert(!out(3L)._3)      // 1 < 3 in its neighborhood
    assert(!out(4L)._3)      // twin of 3, and 3 < 4
    assert(out(2L)._3)       // lowest id of {2,5}
    assert(!out(5L)._3)
  }

  test("cells follow the seed geometry") {
    assert(out(1L)._1 == out(3L)._1 && out(3L)._1 == out(4L)._1)
    assert(out(2L)._1 == out(5L)._1)
    assert(out(1L)._1 != out(2L)._1)
  }

  test("incremental: the drop routes to frozen cells and pairs only within them") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.99f, 0.01f))
    ).toDF("vec_id", "embedding")
    val delta = Seq(
      (10L, Seq(0.95f, 0.05f)), // nearest stored centroid: vec 3's cell
      (11L, Seq(0.9f, 0.1f)),   // same cell as 10 → drop-internal pair
      (20L, Seq(0.6f, 0.8f))    // vec 2's cell; similar to vec 1 (0.6)
                                // but CROSS-cell → never paired with it
    ).toDF("vec_id", "embedding")
    val path = graft.sources.StorePaths.keyedTmp("ivfsemtest",
      java.util.UUID.randomUUID().toString)
    graft.sources.StorePaths.wipe(spark, path)
    graft.sources.IvfIndexStore.ensure(corpus, path)
    val pairs = graft.operators.Dedup.semanticNearDupsDelta(
      corpus.unionByName(delta),
      graft.sources.IvfIndexStore.cellsTable(spark, path)
        .select(org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.col("cell")),
      graft.sources.IvfIndexStore.assignCells(spark, delta, path),
      threshold = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
      .toSet
    assert(pairs == Set((3L, 10L), (3L, 11L), (10L, 11L), (2L, 20L)),
      pairs.toString)
  }

  test("rep-grain delta conserves the pair mass: sum(n_pairs) == pair-grain rows") {
    // replica-heavy corpus: stored value A × 3 twins, delta near-A
    // value × 2 twins plus a delta twin of a second cell's value
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (4L, Seq(1.0f, 0.0f)), (6L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.99f, 0.01f))
    ).toDF("vec_id", "embedding")
    val delta = Seq(
      (10L, Seq(0.95f, 0.05f)), (20L, Seq(0.95f, 0.05f)), // twins → cell of 3
      (30L, Seq(0.6f, 0.8f))                              // cell of 2
    ).toDF("vec_id", "embedding")
    val path = graft.sources.StorePaths.keyedTmp("ivfsemreps",
      java.util.UUID.randomUUID().toString)
    graft.sources.StorePaths.wipe(spark, path)
    graft.sources.IvfIndexStore.ensure(corpus, path)
    val stored = graft.sources.IvfIndexStore.cellsTable(spark, path)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("cell"))
    val assigned = graft.sources.IvfIndexStore.assignCells(spark, delta, path)
    val all = corpus.unionByName(delta)
    val pairRows = graft.operators.Dedup
      .semanticNearDupsDelta(all, stored, assigned, threshold = 0.5).count()
    val reps = graft.operators.Dedup
      .semanticNearDupsDeltaReps(all, stored, assigned, threshold = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("a_rep"), r.getAs[Long]("b_rep"),
        r.getAs[Long]("n_pairs")))
    assert(reps.map(_._3).sum == pairRows)
    // the delta twin group contributes a SELF row with C(2,2)=1 mass
    assert(reps.exists(r => r._1 == r._2 && r._3 == 1L), reps.mkString(","))
    // rep-grain cardinality is bounded by distinct values, not members
    assert(reps.length < pairRows)
  }

  test("takedown bites: tombstoned members leave the candidate lists, cells stay frozen") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.99f, 0.01f))
    ).toDF("vec_id", "embedding")
    val delta = Seq(
      (10L, Seq(0.95f, 0.05f)), // routes to vec 3's cell
      (11L, Seq(0.9f, 0.1f))    // same cell → drop-internal pair survives
    ).toDF("vec_id", "embedding")
    val removed = Seq(Tuple1(3L)).toDF("vec_id")
    val path = graft.sources.StorePaths.keyedTmp("ivfsemdeltest",
      java.util.UUID.randomUUID().toString)
    graft.sources.IvfIndexStore.ensureDeleted(corpus, removed, path)
    val pairs = graft.operators.Dedup.semanticNearDupsDelta(
      corpus.unionByName(delta),
      graft.sources.IvfIndexStore.cellsTable(spark, path)
        .select(org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.col("cell")),
      graft.sources.IvfIndexStore.assignCells(spark, delta, path),
      threshold = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
      .toSet
    // (3,10)/(3,11) are gone WITH the cell routing intact: the drop
    // still lands in the tombstoned member's cell (frozen quantizer —
    // vec 1 stays cross-cell and never pairs), only the drop-internal
    // pair remains
    assert(pairs == Set((10L, 11L)), pairs.toString)
  }

  test("an isolated vector keeps with zero dups") {
    val lonely = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(-1.0f, 0.1f))
    ).toDF("vec_id", "embedding")
    val r = Dedup.semanticDedup(lonely, k = 2, iters = 1, threshold = 0.5)
      .collect().map(x => x.getAs[Long]("vec_id") ->
        ((x.getAs[Long]("n_dups"), x.getAs[Boolean]("kept")))).toMap
    assert(r(1L) == ((0L, true)) && r(2L) == ((0L, true)))
  }

  test("overlapping stored/delta vec_ids fail loudly, not by double-emitting") {
    // the documented disjointness precondition, now ENFORCED in-plan:
    // id 3 appears on both sides — pairs would double-emit silently
    val all = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (3L, Seq(0.99f, 0.01f)),
      (10L, Seq(0.95f, 0.05f))
    ).toDF("vec_id", "embedding")
    val stored = Seq((1L, 0L), (3L, 0L)).toDF("vec_id", "cell")
    val delta = Seq((3L, 0L), (10L, 0L)).toDF("vec_id", "cell")
    val ex = intercept[Exception] {
      Dedup.semanticNearDupsDelta(all, stored, delta, threshold = 0.5)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("overlap")), ex.toString)
  }
}
