package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's star-schema builders, Spark-first.
  *
  * Raw events carry a JSON payload column; the reference explodes it with
  * pandas `json_normalize` and builds four dims + one fact (reference:
  * astro-sdk-tutorial/dags/etl_s3_snowflake_raw_event_ingest.py:28,
  * etl_s3_snowflake_f_events.py:23-44, etl_s3_snowflake_d_event.py:24-31,
  * etl_s3_snowflake_d_user.py:28-35, etl_s3_snowflake_d_parameter.py:24-37).
  * Here the payload parse is `get_json_object` / `json_object_keys`
  * (codegen'd, no UDF), dedup is `distinct()` (map-side partial agg), and
  * surrogate keys are [[SurrogateKey.withDenseId]] (distributed — see its
  * scaladoc for why not a global row_number window).
  *
  * Driver-testdata mapping: `events.parquet.props` is the JSON payload
  * (parameter key `k` ≈ the reference's `item_id` parameter, joining the
  * item dim on `part.p_partkey`); `part.parquet` plays `item.csv`.
  *
  * Timestamps are truncated to seconds on output (`date_trunc`) so results
  * are stable across engines/precisions (source data is ns; Spark is µs).
  */
object StarSchema {

  /** ONE-PARSE projection of the raw events — the frame the daily
    * chain caches per load and every stage derives from
    * ([[graft.Pipeline]]): the JSON payload is parsed exactly once
    * (`from_json` into a string map; `$.k` lookups and key listings
    * both read the map), the timestamp is second-truncated once, and
    * the frame is narrow enough to pin for the duration of a load (it
    * is DROP-sized, never warehouse-sized). Without this the chain
    * re-scanned and re-parsed the raw drop once per stage — 9× per
    * load. Values are identical to the per-stage parses: the payload
    * is a flat unique-key JSON object, so `map[key]` ==
    * `get_json_object($.key)` string-for-string.
    */
  def prep(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      date_trunc("second", col("ts")).as("event_time"),
      col("user_id"),
      col("event_type"),
      col("value"),
      from_json(col("props"),
        org.apache.spark.sql.types.DataType.fromDDL("map<string,string>"))
        .as("props_map"))

  private def paramK: org.apache.spark.sql.Column =
    element_at(col("props_map"), "k").cast("bigint")

  /** event_raw: parse payload, type columns, surrogate index.
    * Reference: etl_s3_snowflake_raw_event_ingest.py:26-34. */
  def rawIngest(events: DataFrame): DataFrame =
    rawIngestPrepped(prep(events))

  /** [[rawIngest]] over an already-[[prep]]ped frame (no re-parse). */
  def rawIngestPrepped(p: DataFrame): DataFrame = {
    val parsed = p.select(
      col("event_id"), col("event_time"), col("user_id"),
      col("event_type"), col("value"), paramK.as("param_k"))
    SurrogateKey.withDenseId(parsed, Seq("event_id"), "guid_event_raw")
  }

  /** d_event: dedup on event_id + dense surrogate.
    * Reference: etl_s3_snowflake_d_event.py:24-31. */
  def dEvent(events: DataFrame): DataFrame =
    SurrogateKey.withDenseId(
      events.select(col("event_id")).distinct(),
      Seq("event_id"), "guid_event")

  /** d_user: dedup on user_id + dense surrogate.
    * Reference: etl_s3_snowflake_d_user.py:28-35. */
  def dUser(events: DataFrame): DataFrame =
    SurrogateKey.withDenseId(
      events.select(col("user_id")).distinct(),
      Seq("user_id"), "guid_user")

  /** Payload keys as an array column: one `from_json` into a map (a
    * single parse, faster than `json_object_keys`' per-call parser).
    */
  private def payloadKeys: org.apache.spark.sql.Column =
    map_keys(from_json(col("props"),
      org.apache.spark.sql.types.DataType.fromDDL("map<string,string>")))

  /** Distinct payload key names (no surrogate) — input to the
    * surrogate-stable dim merge in [[graft.sources.Sinks.mergeDimSurrogate]].
    */
  def parameterNames(events: DataFrame): DataFrame =
    events.select(explode(payloadKeys).as("parameter_name")).distinct()

  /** [[parameterNames]] over an already-[[prep]]ped frame. */
  def parameterNamesPrepped(p: DataFrame): DataFrame =
    p.select(explode(map_keys(col("props_map"))).as("parameter_name"))
      .distinct()

  /** d_parameter: distinct JSON payload keys + dense surrogate.
    * Reference: etl_s3_snowflake_d_parameter.py:24-37. */
  def dParameter(events: DataFrame): DataFrame =
    SurrogateKey.withDenseId(
      events
        .select(explode(payloadKeys).as("parameter_name"))
        .distinct(),
      Seq("parameter_name"), "guid_parameter")

  /** d_item: item dim — projection + rename + typed price.
    * Reference: etl_s3_snowflake_d_item.py:25-30 (rename to item_*),
    * :41-49 (typed target table, price DECIMAL). */
  def dItem(part: DataFrame): DataFrame =
    part.select(
      col("p_partkey").as("item_id"),
      col("p_name").as("item_name"),
      col("p_brand").as("item_brand"),
      col("p_type").as("item_type"),
      col("p_size").as("item_size"),
      col("p_retailprice").cast("decimal(12,2)").cast("double").as("item_price"))

  /** The fact's flat projection, no surrogate — for incremental loads
    * the surrogate must come from the stable event dim
    * ([[graft.Pipeline]] joins `d_event`), not a per-drop numbering.
    */
  def fEventsFlat(events: DataFrame): DataFrame =
    fEventsFlatPrepped(prep(events))

  /** [[fEventsFlat]] over an already-[[prep]]ped frame. */
  def fEventsFlatPrepped(p: DataFrame): DataFrame =
    p.select(
      col("event_id"),
      col("event_time"),
      col("user_id").as("event_user_id"),
      col("event_type").as("event_name"),
      element_at(map_keys(col("props_map")), 1).as("event_parameter_name"),
      paramK.as("event_parameter_value"),
      col("value").as("event_value"))

  /** f_events: fact — flatten payload into typed columns, surrogate key.
    * Reference: etl_s3_snowflake_f_events.py:23-44 (json_normalize +
    * merge + rename), :50-62 (typed fact table). The reference sorts
    * latest-first before numbering (f_events.py:36 `sort_values(
    * 'event_time', ascending=False)` then guid = 1..N), so guid 1 is
    * the newest event; event_id breaks second-precision ties to keep
    * the numbering a total order across engines. */
  def fEvents(events: DataFrame): DataFrame =
    SurrogateKey.withDenseIdOrdered(fEventsFlat(events),
      Seq(col("event_time").desc, col("event_id")), "guid_event")
}
