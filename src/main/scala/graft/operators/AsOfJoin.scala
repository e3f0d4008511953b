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

  /** FORWARD as-of with tolerance — the `merge_asof
    * direction='forward'` face (the backward [[attribution]]'s dual):
    * for every purchase, the EARLIEST strictly-later view by the same
    * user within `toleranceMin` (the "did they come back and look
    * again" follow-up read). Same scalable composition, reversed: one
    * shuffle on the key, the per-key sort runs ts DESC with purchases
    * ordered BEFORE equal-ts views (strict `>` exactly), and
    * `last(..., ignoreNulls)` carries the nearest later view backward.
    * The tolerance compares RAW timestamps (micro-exact — a
    * seconds-truncated gap comparison would misclassify sub-second
    * boundary straddles); the published gap is whole seconds.
    */
  def attributionForward(events: DataFrame,
      toleranceMin: Int = 60): DataFrame = {
    val base = events
      .filter(col("event_type").isin("view", "purchase"))
      .select(
        col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "view", 1).otherwise(0).as("is_view"))
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("is_view"), col("event_id").desc)
    base
      .withColumn("nv_id",
        last(when(col("is_view") === 1, col("event_id")), ignoreNulls = true)
          .over(w))
      .withColumn("nv_ts",
        last(when(col("is_view") === 1, col("ts")), ignoreNulls = true)
          .over(w))
      .filter(col("is_view") === 0)
      .withColumn("ok", col("nv_ts").isNotNull &&
        col("nv_ts") <= col("ts") + expr(s"INTERVAL $toleranceMin MINUTES"))
      .select(
        col("event_id").as("purchase_id"),
        when(col("ok"), col("nv_id")).as("next_view_id"),
        when(col("ok"),
          unix_timestamp(col("nv_ts")) - unix_timestamp(col("ts")))
          .as("gap_seconds"))
  }

  /** MULTI-touch attribution — the standard marketing-analytics step
    * past last-touch ([[attribution]]): every view in the `lookbackMin`
    * window before a purchase shares credit, under two models at once:
    *  - `w_linear`: equal split 1/n across the n candidate views;
    *  - `w_decay`: inverse-age decay `1/(1+age_min)` normalized per
    *    purchase — recent touches weigh more, no half-life constant to
    *    tune and no `pow()` (whose last-ulp behavior is libm-specific;
    *    add/divide are IEEE correctly-rounded, so both engines agree
    *    bit-for-bit before the 4-dp rounding absorbs the per-purchase
    *    SUM order noise);
    *  - `attributed_value`: the purchase's `value` split by the ROUNDED
    *    decay weight, so the revenue split is deterministic given the
    *    published weights.
    *
    * Scale shape: one interval join per (user) key — candidates are
    * bounded by the lookback window, never all history; the per-purchase
    * normalization is a window sum over those few candidate rows (same
    * partitioning as the join output, no extra shuffle of the corpus).
    */
  def multiTouch(events: DataFrame, lookbackMin: Int = 60): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("event_id").as("view_id"),
        col("ts").as("vts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("pts"), col("value"))
    val joined = purchases.join(views,
      col("vu") === col("user_id") && col("vts") < col("pts") &&
        col("vts") >= col("pts") - expr(s"INTERVAL $lookbackMin MINUTES"))
      .withColumn("age_min",
        (unix_timestamp(col("pts")) - unix_timestamp(col("vts")))
          .cast("double") / 60.0)
      .withColumn("raw_w", lit(1.0) / (lit(1.0) + col("age_min")))
    val perPurchase = Window.partitionBy(col("purchase_id"))
    val wDecay = round(col("raw_w") /
      sum(col("raw_w")).over(perPurchase), 4)
    joined
      .withColumn("n_touches", count(lit(1)).over(perPurchase))
      .withColumn("w_decay", wDecay)
      .select(
        col("purchase_id"), col("view_id"), col("user_id"),
        col("n_touches"),
        round(col("age_min"), 4).as("age_min"),
        round(lit(1.0) / col("n_touches"), 4).as("w_linear"),
        col("w_decay"),
        round(col("value") * col("w_decay"), 4).as("attributed_value"))
  }
}
