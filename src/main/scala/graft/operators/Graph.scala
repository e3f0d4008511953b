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
      val contrib = e
        .join(r.select(col("node").as("src"), col("rank")), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"), (col("rank") / col("outdeg")).as("c"))
        .groupBy(col("node"))
        .agg(sum(col("c")).as("acc"))
      r = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          round(lit(1.0 - damping) / n
            + lit(damping) * coalesce(col("acc"), lit(0.0)), 10).as("rank"))
        .localCheckpoint()
    }
    r
  }
}
