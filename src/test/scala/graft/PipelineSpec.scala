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

  test("two different daily drops merge into one consistent star schema") {
    import org.apache.spark.sql.functions._
    val stage = Files.createTempDirectory("graft_drops").toString
    val events = graft.sources.Tables.events(spark, sfDir)
    val part = graft.sources.Tables.part(spark, sfDir)
    val cutoff = "2024-01-05"
    def writeDrop(name: String, df: org.apache.spark.sql.DataFrame): String = {
      val dir = s"$stage/$name"
      df.write.parquet(s"$dir/events.parquet")
      part.write.parquet(s"$dir/part.parquet")
      dir
    }
    val drop1 = writeDrop("day1", events.filter(col("ts") < cutoff))
    val drop2 = writeDrop("day2", events.filter(col("ts") >= cutoff))
    val w = s"$stage/wh"
    Pipeline.runDaily(spark, drop1, w)
    Pipeline.runDaily(spark, drop2, w)
    // the merged fact covers both drops exactly once
    val fact = spark.read.parquet(s"$w/f_events")
    assert(fact.count() == events.count())
    assert(fact.select("event_id").distinct().count() == events.count())
    // user dim accumulated across drops with unique stable surrogates
    val dUser = spark.read.parquet(s"$w/d_user")
    assert(dUser.count() == events.select("user_id").distinct().count())
    assert(dUser.select("guid_user").distinct().count() == dUser.count())
  }

  test("surrogate keys stay stable and unique across incremental drops") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_sur").toString + "/d"
    // drop 1: keys B, C
    graft.sources.Sinks.mergeDimSurrogate(spark,
      path, Seq(20L, 30L).toDF("k"), "k", "guid")
    val first = spark.read.parquet(path).as[(Long, Long)].collect().toMap
    // drop 2: new key A sorts BEFORE the stored ones, plus re-sent B
    graft.sources.Sinks.mergeDimSurrogate(spark,
      path, Seq(10L, 20L).toDF("k"), "k", "guid")
    val second = spark.read.parquet(path).as[(Long, Long)].collect().toMap
    assert(second(20L) == first(20L) && second(30L) == first(30L)) // stable
    assert(second(10L) == first.values.max + 1)                    // appended
    assert(second.values.toSeq.sorted == Seq(1L, 2L, 3L))          // dense+unique
  }
}
