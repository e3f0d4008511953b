package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The reference's raw extract shape: CSV with a quoted JSON payload
  * column (event.csv) — written here as synthetic rows of the same
  * shape, read back through the schema'd CSV reader, payload parsed.
  */
class CsvIngestSpec extends SparkSpecBase {
  import spark.implicits._

  test("event-shaped CSV with quoted JSON payload round-trips") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "event.csv")
    val rows = Seq(
      """event_id,event_time,user_id,event_payload""",
      """e1,6/26/2017 11:23,101,"{""event_name"":""view_item"",""platform"":""android"",""parameter_name"":""item_id"",""parameter_value"":""3526""}"""",
      """e2,6/27/2017 10:46,102,"{""event_name"":""view_item"",""platform"":""web"",""parameter_name"":""item_id"",""parameter_value"":""1514""}"""")
    Files.write(f.toPath, rows.mkString("\n").getBytes)

    val raw = Tables.readCsv(spark, f.getAbsolutePath, Tables.eventCsvSchema)
    assert(raw.count() == 2)
    val parsed = raw.select(
      col("event_id"),
      to_timestamp(col("event_time"), "M/d/yyyy HH:mm").as("event_time"),
      col("user_id"),
      get_json_object(col("event_payload"), "$.event_name").as("event_name"),
      get_json_object(col("event_payload"), "$.platform").as("event_platform"),
      get_json_object(col("event_payload"), "$.parameter_value").cast("bigint")
        .as("event_parameter_value"))
    val got = parsed.orderBy("event_id")
      .as[(String, java.sql.Timestamp, Long, String, String, Long)]
      .collect().toSeq
    assert(got.map(_._1) == Seq("e1", "e2"))
    assert(got.map(_._4).forall(_ == "view_item"))
    assert(got.map(_._5) == Seq("android", "web"))
    assert(got.map(_._6) == Seq(3526L, 1514L))
    assert(got.head._2 == java.sql.Timestamp.valueOf("2017-06-26 11:23:00"))
  }
}
