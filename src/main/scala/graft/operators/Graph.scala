package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge-list DataFrames — the shapes
  * (join-aggregate power iteration, never an adjacency matrix) that
  * scale to billions of edges because each round is one shuffle on the
  * edge key.
  */
object Graph {

  /** Symmetric co-purchase edge list from the order baskets: one
    * directed edge each way per distinct item pair that shares an
    * order. Per-order fan-out is bounded by basket size (squared), so
    * the pair explosion stays linear-ish in lineitem at any corpus
    * size; the distinct collapses repeat co-purchases.
    */
  def coPurchaseEdges(lineitem: DataFrame): DataFrame = {
    val basket = lineitem
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct()
    basket.select(col("l_orderkey"), col("l_partkey").as("src"))
      .join(basket.select(col("l_orderkey"), col("l_partkey").as("dst")),
        Seq("l_orderkey"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
      .distinct()
  }

  /** PageRank by fixed-round power iteration (Brin & Page 1998), for a
    * SYMMETRIC edge list (every node appears as a src, so there are no
    * dangling nodes and the node set is `distinct src`).
    *
    * Determinism is engineered for cross-engine replay: ranks round to
    * 10 decimals after every round, so the only inter-engine
    * difference — float summation order inside the per-node
    * aggregate, ~1e-18 at these magnitudes — is absorbed and every
    * round starts from bit-identical inputs. The teleport and damping
    * terms are written as the same double literals on both sides.
    *
    * Scale shape: each round is one edge⋈rank hash join plus one
    * groupBy(dst) partial-agg — shuffles bounded by the edge list,
    * nothing quadratic, no driver state beyond the node count (one
    * scalar action). `localCheckpoint` per round caps lineage depth
    * (the iterative-loop rule from connectedComponents).
    */
  def pageRank(edges: DataFrame, iters: Int = 5,
      damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("node")).distinct().localCheckpoint()
    val n = nodes.count().toDouble
    val deg = e.groupBy(col("src"))
      .agg(count(lit(1)).cast("double").as("outdeg"))
      .localCheckpoint()
    var r = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      r = pageRankRound(e, nodes, deg, r, n, damping).localCheckpoint()
    }
    r
  }

  /** One power-iteration round (shared by the fixed-round and the
    * converged form, so "m converged rounds" is bit-identical to
    * `pageRank(iters = m)`).
    */
  private def pageRankRound(e: DataFrame, nodes: DataFrame, deg: DataFrame,
      r: DataFrame, n: Double, damping: Double): DataFrame = {
    val contrib = e
      .join(r.select(col("node").as("src"), col("rank")), Seq("src"))
      .join(deg, Seq("src"))
      .select(col("dst").as("node"), (col("rank") / col("outdeg")).as("c"))
      .groupBy(col("node"))
      .agg(sum(col("c")).as("acc"))
    nodes.join(contrib, Seq("node"), "left")
      .select(col("node"),
        round(lit(1.0 - damping) / n
          + lit(damping) * coalesce(col("acc"), lit(0.0)), 10).as("rank"))
  }

  /** Tolerance-stopped PageRank: iterate until the max per-node rank
    * change falls below `eps` (or `maxIters`), returning the ranks AND
    * the number of rounds actually run. Same per-round math and 10-dp
    * rounding as [[pageRank]], so the result after m rounds equals
    * `pageRank(iters = m)` exactly — the fixed-round form stays the
    * oracle; this form is what production runs, because the right
    * round count is a property of the GRAPH, not a constant.
    *
    * Cost shape: convergence is checked (and the lineage checkpointed)
    * every `checkEvery` rounds, NOT every round — between checks the
    * rounds stay LAZY, so the whole k-round block materializes once,
    * in one action, at the check. Measured at sf0.1 (20k nodes, co-
    * purchase graph): a per-round delta action costs ~2.5× the
    * fixed-round form at the same round count; this block form costs
    * ~1.5×. The trade: the stop can overshoot (it only observes the
    * k-round aggregate delta, which bounds the per-round delta from
    * above, so the stop is never premature — ranks contract
    * monotonically; at sf0.1 it stops at 9 rounds for eps=1e-8 where
    * per-round checking would stop at ~5).
    */
  def pageRankConverged(edges: DataFrame, eps: Double = 1e-9,
      maxIters: Int = 50, damping: Double = 0.85,
      checkEvery: Int = 3): (DataFrame, Int) = {
    require(eps > 0 && maxIters >= 1 && checkEvery >= 1)
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("node")).distinct().localCheckpoint()
    val n = nodes.count().toDouble
    if (n == 0) return (nodes.withColumn("rank", lit(0.0)), 0)
    val deg = e.groupBy(col("src"))
      .agg(count(lit(1)).cast("double").as("outdeg"))
      .localCheckpoint()
    var r = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint()
    var rounds = 0
    var delta = Double.MaxValue
    while (rounds < maxIters && delta >= eps) {
      var stepped = r
      var inner = 0
      while (inner < checkEvery && rounds < maxIters) {
        stepped = pageRankRound(e, nodes, deg, stepped, n, damping)
        inner += 1
        rounds += 1
      }
      val next = stepped.localCheckpoint()
      delta = next
        .join(r.select(col("node"), col("rank").as("prev")), Seq("node"))
        .agg(max(abs(col("rank") - col("prev"))).as("d"))
        .head().getDouble(0)
      r = next
    }
    (r, rounds)
  }
}
