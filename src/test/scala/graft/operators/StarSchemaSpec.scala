package graft.operators

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class StarSchemaSpec extends SparkSpecBase {

  private lazy val events = Tables.events(spark, sfDir)

  test("rawIngest parses the JSON payload and keys every row") {
    val out = StarSchema.rawIngest(events)
    assert(out.count() == events.count())
    assert(out.filter(col("param_k").isNull).count() == 0)
    assert(out.filter(col("guid_event_raw").isNull).count() == 0)
  }

  test("dims are distinct on their natural key") {
    val dU = StarSchema.dUser(events)
    assert(dU.count() == dU.select("user_id").distinct().count())
    val dP = StarSchema.dParameter(events)
    assert(dP.count() >= 1) // payload keys
    val dI = StarSchema.dItem(Tables.part(spark, sfDir))
    assert(dI.count() == dI.select("item_id").distinct().count())
  }

  test("fEvents flattens payload into typed fact columns") {
    val f = StarSchema.fEvents(events)
    assert(f.columns.toSet == Set("event_id", "event_time", "event_user_id",
      "event_name", "event_parameter_name", "event_parameter_value",
      "event_value", "guid_event"))
    assert(f.filter(col("event_parameter_name") =!= "k").count() == 0)
  }

  test("fEvents numbers latest-first like the reference") {
    // f_events.py:36 sorts event_time descending before assigning
    // guid = 1..N, so guid 1 is the newest event
    val f = StarSchema.fEvents(events)
    val first = f.filter(col("guid_event") === 1L)
      .select("event_time").head().getTimestamp(0)
    val maxTs = f.agg(max("event_time")).head().getTimestamp(0)
    assert(first == maxTs)
    // dense 1..N with no gaps
    val n = f.count()
    val stats = f.agg(min("guid_event"), max("guid_event"),
      countDistinct("guid_event")).head()
    assert(stats.getLong(0) == 1L && stats.getLong(1) == n && stats.getLong(2) == n)
  }
}
