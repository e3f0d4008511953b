package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SurrogateKeySpec extends SparkSpecBase {
  import spark.implicits._

  test("dense ids are 1..N in key order, matching a global row_number") {
    val df = Seq(30L, 10L, 20L, 50L, 40L).toDF("k")
    val out = SurrogateKey.withDenseId(df, Seq("k"), "id")
      .orderBy("k").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((10L, 1L), (20L, 2L), (30L, 3L), (40L, 4L), (50L, 5L)))
  }

  test("ids stay dense and unique on a real table across partitions") {
    val e = graft.sources.Tables.events(spark, sfDir).select($"event_id")
    val out = SurrogateKey.withDenseId(e, Seq("event_id"), "guid")
    val n = out.count()
    val stats = out.agg(min($"guid"), max($"guid"), countDistinct($"guid")).head()
    assert(stats.getLong(0) == 1L)
    assert(stats.getLong(1) == n)
    assert(stats.getLong(2) == n)
  }
}
