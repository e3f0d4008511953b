package graft.operators

import graft.SparkSpecBase
import graft.sources.Tables

class GraphSpec extends SparkSpecBase {
  import spark.implicits._

  test("symmetric 2-node graph converges to the uniform fixpoint") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = Graph.pageRank(e).as[(Long, Double)].collect().toMap
    assert(r == Map(1L -> 0.5, 2L -> 0.5))
  }

  test("a hub out-ranks leaves and total mass stays ~1") {
    // star: 1 <-> {2,3,4} (symmetric)
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (1L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val r = Graph.pageRank(e).as[(Long, Double)].collect().toMap
    assert(r(1L) > r(2L))
    assert(r(2L) == r(3L) && r(3L) == r(4L)) // symmetric leaves tie exactly
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
  }

  test("pageRank is deterministic across runs") {
    val edges = Graph.coPurchaseEdges(Tables.lineitem(spark, sfDir))
    val a = Graph.pageRank(edges, iters = 3).orderBy("node").collect().toSeq
    val b = Graph.pageRank(edges, iters = 3).orderBy("node").collect().toSeq
    assert(a == b)
  }

  test("coPurchaseEdges is symmetric, self-free, and distinct") {
    val e = Graph.coPurchaseEdges(Tables.lineitem(spark, sfDir))
      .as[(Long, Long)].collect()
    assert(e.nonEmpty)
    assert(e.forall { case (s, d) => s != d })
    val set = e.toSet
    assert(set.size == e.length)
    assert(e.forall { case (s, d) => set.contains((d, s)) })
  }
}
