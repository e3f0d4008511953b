package graft.streaming

import graft.SparkSpecBase
import graft.sources.Sinks
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class DimDelta(ts: Timestamp, k: Long, name: String, price: Double)

class DimFeedSpec extends SparkSpecBase {

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("dedupStream drops re-delivered keys across micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[DimDelta]
    val q = DimFeed.dedupStream(input.toDF(), Seq("k"))
      .writeStream.format("memory").queryName("dedup_stream_test")
      .outputMode("append").start()
    try {
      input.addData(
        DimDelta(t("2024-01-01 10:00:00"), 1L, "a", 1.0),
        DimDelta(t("2024-01-01 10:00:30"), 1L, "a", 1.0))  // in-batch dup
      q.processAllAvailable()
      input.addData(
        DimDelta(t("2024-01-01 10:01:00"), 1L, "a", 1.0),  // cross-batch dup
        DimDelta(t("2024-01-01 10:01:00"), 2L, "b", 2.0))  // new key
      q.processAllAvailable()
      val keys = spark.table("dedup_stream_test")
        .select($"k").as[Long].collect().toSeq.sorted
      assert(keys == Seq(1L, 2L))
    } finally q.stop()
  }

  test("scd2Sink maintains the history across micro-batches, idempotent on replay") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val stage = java.nio.file.Files.createTempDirectory("graft_scd2s").toString
    val (path, chk) = (s"$stage/dim", s"$stage/chk")
    val dates = Map(0L -> "2024-01-01", 1L -> "2024-02-01")
    val input = MemoryStream[DimDelta]
    val q = DimFeed.scd2Sink(
        input.toDF(), path, Seq("k"), Seq("name", "price"), dates)
      .option("checkpointLocation", chk).start()
    try {
      input.addData(
        DimDelta(t("2024-01-01 10:00:00"), 1L, "a", 10.0),
        DimDelta(t("2024-01-01 10:00:00"), 2L, "b", 20.0))
      q.processAllAvailable()
      // a drained backlog: TWO changes to k=1 in ONE micro-batch — the
      // sink must collapse to the latest instead of crash-looping on
      // the merge's duplicate-key guard
      input.addData(
        DimDelta(t("2024-02-01 09:00:00"), 1L, "a", 10.5),
        DimDelta(t("2024-02-01 10:00:00"), 1L, "a", 11.0))
      q.processAllAvailable()
      val h = spark.read.parquet(path)
      val rows = h.orderBy($"k", $"effective_from")
        .select($"k", $"price", $"effective_to".cast("string"), $"is_current")
        .as[(Long, Double, Option[String], Boolean)].collect().toSeq
      assert(rows == Seq(
        (1L, 10.0, Some("2024-02-01"), false),
        (1L, 11.0, None, true),
        (2L, 20.0, None, true)))
      // at-least-once replay: merging batch 1 again must not change it
      Sinks.mergeDimScd2(spark, path,
        Seq((1L, "a", 11.0)).toDF("k", "name", "price"),
        Seq("k"), Seq("name", "price"), lit("2024-02-01"))
      val replayed = spark.read.parquet(path).orderBy($"k", $"effective_from")
        .select($"k", $"price", $"effective_to".cast("string"), $"is_current")
        .as[(Long, Double, Option[String], Boolean)].collect().toSeq
      assert(replayed == rows)
    } finally q.stop()
  }
}
