package graft

import java.nio.file.Files

class PipelineSpec extends SparkSpecBase {

  test("daily pipeline lands the full star schema and is idempotent") {
    val w = Files.createTempDirectory("graft_wh").toString
    val first = Pipeline.runDaily(spark, sfDir, w)
    assert(first.map(_.name) == Seq("event_raw", "d_event", "d_user",
      "d_parameter", "d_item", "f_events", "view_yearly_counts",
      "view_item_rank", "view_top_item", "view_top_platform"))
    assert(first.forall(_.rows > 0))
    // re-running the same load must not change any table (MERGE semantics)
    val second = Pipeline.runDaily(spark, sfDir, w)
    assert(second.map(r => r.name -> r.rows) == first.map(r => r.name -> r.rows))
    // spot-check a merged dim equals its source build
    val dUser = spark.read.parquet(s"$w/d_user")
    assert(dUser.count() ==
      graft.sources.Tables.events(spark, sfDir).select("user_id").distinct().count())
  }
}
