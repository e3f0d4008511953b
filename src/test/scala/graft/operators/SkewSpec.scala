package graft.operators

import graft.SparkSpecBase

class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted join returns exactly the rows of the plain join") {
    // heavy-hitter: 90% of the fact on one key
    val big = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i)).toDF("k", "v")
    val small = Seq((1L, "hot"), (950L, "cold"), (999L, "cold2")).toDF("k", "name")
    val plain = big.join(small, "k").orderBy("k", "v").collect().toSeq
    val salted = Skew.saltedJoin(big, small, "k", factor = 8)
      .select("k", "v", "name").orderBy("k", "v").collect().toSeq
    assert(salted == plain)
    assert(salted.size == 902)
  }
}
