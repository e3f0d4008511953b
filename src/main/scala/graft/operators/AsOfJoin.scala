package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (event-time) join — match each left event to the most recent
  * right event at a strictly earlier timestamp, per key.
  *
  * Spark has no native ASOF JOIN; the scalable composition is the
  * union + running-last trick: tag both sides, sort once per key by
  * (ts, side, id), and carry the latest right-side id forward with
  * `last(..., ignoreNulls)` — ONE shuffle on the key, no range
  * self-join, no per-row probing. The side tag orders left rows before
  * right rows at equal timestamps, which realizes the strict `<`
  * semantics exactly.
  */
object AsOfJoin {

  /** Marketing attribution over the event stream: for every purchase,
    * the latest prior view by the same user (reference's business
    * question "sales success of viewed items" made row-level;
    * README.md:5-8 of the reference repo).
    * Output: purchase_id, view_id (nullable), gap_seconds (nullable).
    */
  def attribution(events: DataFrame): DataFrame = {
    val base = events
      .filter(col("event_type").isin("view", "purchase"))
      .select(
        col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "view", 1).otherwise(0).as("is_view"))
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_view"), col("event_id"))
    base
      .withColumn("view_id",
        last(when(col("is_view") === 1, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("view_ts",
        last(when(col("is_view") === 1, col("ts")), ignoreNulls = true).over(w))
      .filter(col("is_view") === 0)
      .select(
        col("event_id").as("purchase_id"),
        col("view_id"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("view_ts")))
          .as("gap_seconds"))
  }
}
