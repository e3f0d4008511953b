package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class StreamEvent(ts: Timestamp, event_type: String, user_id: Long)
case class IdEvent(event_id: Long, ts: Timestamp, user_id: Long)

class EventStreamSpec extends SparkSpecBase {

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming hourly counts aggregate within the hour bucket") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val q = EventStream.hourlyCounts(input.toDF())
      .writeStream.format("memory").queryName("hourly_test")
      .outputMode("complete").start()
    try {
      input.addData(
        StreamEvent(t("2024-01-01 10:05:00"), "view", 1L),
        StreamEvent(t("2024-01-01 10:55:00"), "view", 2L),
        StreamEvent(t("2024-01-01 11:05:00"), "view", 3L),
        StreamEvent(t("2024-01-01 10:30:00"), "click", 4L))
      q.processAllAvailable()
      val out = spark.table("hourly_test")
        .orderBy("hour_start", "event_type")
        .select(col("hour_start").cast("string"), col("event_type"), col("n_events"))
        .as[(String, String, Long)].collect().toSeq
      assert(out == Seq(
        ("2024-01-01 10:00:00", "click", 1L),
        ("2024-01-01 10:00:00", "view", 2L),
        ("2024-01-01 11:00:00", "view", 1L)))
    } finally q.stop()
  }

  test("gated ingest drops malformed events and reports observed metrics") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val q = EventStream.gatedIngest(input.toDF())
      .writeStream.format("memory").queryName("gated_test")
      .outputMode("append").start()
    try {
      input.addData(
        StreamEvent(t("2024-01-01 10:05:00"), "view", 1L),
        StreamEvent(t("2024-01-01 10:06:00"), null, 2L),      // dropped
        StreamEvent(null, "click", 3L),                        // dropped
        StreamEvent(t("2024-01-01 10:07:00"), "  ", 4L),       // dropped
        StreamEvent(t("2024-01-01 10:08:00"), "click", 5L))
      q.processAllAvailable()
      val kept = spark.table("gated_test").as[StreamEvent].collect()
      assert(kept.map(_.user_id).sorted.toSeq == Seq(1L, 5L))
      val metrics = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("ingest_quality")))
      val seen = metrics.map(_.getAs[Long]("n_seen")).sum
      val dropped = metrics.map(_.getAs[Long]("n_dropped")).sum
      val keptN = metrics.map(_.getAs[Long]("n_kept")).sum
      assert(seen == 5L)
      assert(dropped == 3L)
      assert(keptN == 2L)
    } finally q.stop()
  }

  test("file sink + checkpoint: restart resumes exactly once") {
    import spark.implicits._
    val stage = java.nio.file.Files.createTempDirectory("graft_chk").toString
    val (in, out, chk) = (s"$stage/in", s"$stage/out", s"$stage/chk")
    def drop(events: StreamEvent*): Unit =
      events.toDF().write.mode("append").parquet(in)
    drop(StreamEvent(t("2024-01-01 10:00:00"), "view", 1L),
      StreamEvent(t("2024-01-01 10:30:00"), "click", 2L))
    val schema = spark.read.parquet(in).schema
    def run(): Unit = {
      val q = spark.readStream.schema(schema).parquet(in)
        .withColumn("day", org.apache.spark.sql.functions.to_date($"ts"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    run()
    assert(spark.read.parquet(out).count() == 2)
    // second batch lands while the query is DOWN; restart picks it up
    drop(StreamEvent(t("2024-01-01 11:00:00"), "view", 3L))
    run()
    val rows = spark.read.parquet(out)
    assert(rows.count() == 3)                       // exactly once, no re-emit
    assert(rows.select("user_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("custom-state sessionization: in-batch close, timeout close, eviction") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[SEvent]
    val q = EventStream.sessionizeStateful(input.toDS())
      .writeStream.format("memory").queryName("sess_state")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session); a third 2 hours
      // later closes it IN-BATCH and opens a new one. user 2: singleton.
      input.addData(
        SEvent(t("2024-01-01 10:00:00"), "view", 1L),
        SEvent(t("2024-01-01 10:10:00"), "click", 1L),
        SEvent(t("2024-01-01 12:30:00"), "view", 1L),
        SEvent(t("2024-01-01 10:05:00"), "view", 2L))
      q.processAllAvailable()
      // advance the watermark far past every open session's last+gap;
      // timeouts fire on the NEXT trigger after the watermark moves
      input.addData(SEvent(t("2024-01-02 09:00:00"), "view", 99L))
      q.processAllAvailable()
      input.addData(SEvent(t("2024-01-02 09:00:01"), "view", 99L))
      q.processAllAvailable()
      val out = spark.table("sess_state")
        .select(col("user_id"), col("session_start").cast("string"),
          col("session_end").cast("string"), col("n_events"))
        .as[(Long, String, String, Long)].collect().toSet
      // in-batch close: first user-1 session carries TRUE event bounds
      // (10:00–10:10), not gap-padded window edges
      assert(out.contains((1L, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2L)))
      // timeout close: the reopened user-1 session and user 2's singleton
      assert(out.contains((1L, "2024-01-01 12:30:00", "2024-01-01 12:30:00", 1L)))
      assert(out.contains((2L, "2024-01-01 10:05:00", "2024-01-01 10:05:00", 1L)))
      // exactly one row per closed session — no duplicate emission
      assert(out.size == out.map(r => (r._1, r._2)).size)
    } finally q.stop()
  }

  test("stream-stream interval join pairs purchases with in-window views only") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val views = MemoryStream[IdEvent]
    val purchases = MemoryStream[IdEvent]
    val q = EventStream.purchaseAttribution(views.toDF(), purchases.toDF(),
        lookback = "1 hour")
      .writeStream.format("memory").queryName("attr_test")
      .outputMode("append").start()
    try {
      views.addData(
        IdEvent(10L, t("2024-01-01 09:30:00"), 1L),  // 40 min before: in window
        IdEvent(11L, t("2024-01-01 08:00:00"), 1L),  // 2h10m before: too old
        IdEvent(12L, t("2024-01-01 09:45:00"), 2L))  // other user
      purchases.addData(IdEvent(100L, t("2024-01-01 10:10:00"), 1L))
      q.processAllAvailable()
      // advance both watermarks so the joined rows flush out of append mode
      views.addData(IdEvent(13L, t("2024-01-01 14:00:00"), 9L))
      purchases.addData(IdEvent(101L, t("2024-01-01 14:00:00"), 9L))
      q.processAllAvailable()
      val out = spark.table("attr_test")
        .select(col("purchase_id"), col("view_id"))
        .as[(Long, Long)].collect().toSeq
      assert(out == Seq((100L, 10L)))
    } finally q.stop()
  }

  test("streaming sessionization merges events within the gap") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val q = EventStream.sessionize(input.toDF(), gap = "30 minutes")
      .writeStream.format("memory").queryName("session_test")
      .outputMode("complete").start()
    try {
      input.addData(
        StreamEvent(t("2024-01-01 10:00:00"), "view", 1L),
        StreamEvent(t("2024-01-01 10:10:00"), "view", 1L), // same session
        StreamEvent(t("2024-01-01 11:00:00"), "view", 1L), // new session
        StreamEvent(t("2024-01-01 10:00:00"), "view", 2L))
      q.processAllAvailable()
      val out = spark.table("session_test")
        .orderBy("user_id", "session_start")
        .select(col("user_id"), col("n_events"))
        .as[(Long, Long)].collect().toSeq
      assert(out == Seq((1L, 2L), (1L, 1L), (2L, 1L)))
    } finally q.stop()
  }

  test("file-replay attribution equals the batch interval self-join") {
    val streamed = StreamReplay.replayEvents(spark, sfDir,
        ev => EventStream.purchaseAttribution(
          ev.filter(col("event_type") === "view"),
          ev.filter(col("event_type") === "purchase")),
        watermark = null,
        mode = org.apache.spark.sql.streaming.OutputMode.Append())
      .select("purchase_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = graft.sources.Tables.events(spark, sfDir)
    val batch = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("u"),
        col("ts").as("pts"))
      .join(
        ev.filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id").as("vu"),
            col("ts").as("vts")),
        expr("u = vu AND vts < pts AND vts >= pts - INTERVAL 1 HOUR"))
      .select("purchase_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }
}
