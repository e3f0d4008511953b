package graft.operators

import graft.SparkSpecBase

class ComponentsSpec extends SparkSpecBase {
  import spark.implicits._

  test("connected components label every node with its cluster minimum") {
    // two chains and a singleton-free edge set:
    // {1-2, 2-3, 3-4} and {10-11}, node 20 paired with 21
    val edges = Seq((2L, 1L), (3L, 2L), (4L, 3L), (11L, 10L), (20L, 21L))
      .toDF("a", "b")
    val out = Dedup.connectedComponents(edges, "a", "b")
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L),
      (20L, 20L), (21L, 20L)))
  }

  test("a long path converges within the iteration budget") {
    val edges = (1 until 15).map(i => (i.toLong, i.toLong + 1)).toDF("a", "b")
    val out = Dedup.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(out.values.toSet == Set(1L))
    assert(out.size == 15)
  }

  test("distributed loop (threshold 0) labels identically to union-find") {
    val edges = Seq((2L, 1L), (3L, 2L), (11L, 10L), (20L, 21L), (21L, 22L))
      .toDF("a", "b")
    val local = Dedup.connectedComponents(edges, "a", "b")
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val dist = Dedup.connectedComponents(edges, "a", "b", localThreshold = 0L)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(local == dist)
    assert(local.map(_._2).toSet == Set(1L, 10L, 20L))
  }
}
