package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event for the custom-state operators. */
case class SEvent(ts: java.sql.Timestamp, event_type: String, user_id: Long)

/** One closed session emitted by [[EventStream.sessionizeStateful]]. */
case class SessionAgg(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long)

/** Per-user open-session state (event-time MICROS — java.sql.Timestamp
  * carries microsecond data in its nanos field; folding on `getTime`
  * millis would silently truncate bounds the batch oracle keeps).
  */
private[streaming] case class SessState(startUs: Long, lastUs: Long, n: Long)

/** Structured Streaming surface: the reference's daily-batch event loads
  * (reference: astro-sdk-tutorial/dags/etl_s3_snowflake_raw_event_ingest
  * .py — `@daily` schedule, delta appends) re-expressed as a continuous
  * pipeline. The same transforms run on `readStream` inputs:
  * watermarked tumbling-window aggregation and session windows. Batch
  * twins live in [[graft.operators.Relational]] so semantics are
  * verified against the SQL oracle; these entry points add the
  * watermarking/output-mode wiring.
  */
object EventStream {

  /** Watermarked tumbling 1-hour counts per event_type. Append-safe. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n_events"))

  /** Quality-gated ingest with OBSERVED metrics: drops malformed events
    * (null timestamp/user, empty type) and publishes per-micro-batch
    * seen/dropped/kept counters
    * through `Dataset.observe`, so every `StreamingQueryProgress`
    * carries the gate's health without a second aggregation pass.
    *
    * Scale shape: the filter and the observation are both pipelined
    * into the scan stage (observe compiles to an accumulator-backed
    * aggregate — no shuffle, no extra pass); monitoring cost is zero
    * even at full ingest rate. The same plan runs on a batch frame,
    * where the metrics surface via `QueryExecutionListener`.
    */
  def gatedIngest(events: DataFrame): DataFrame = {
    val valid = col("ts").isNotNull && col("user_id").isNotNull &&
      col("event_type").isNotNull && length(trim(col("event_type"))) > 0
    events
      .observe("ingest_quality",
        count(lit(1)).as("n_seen"),
        count(when(!valid, 1)).as("n_dropped"),
        // count, not sum: an empty micro-batch must observe 0 for all
        // three gate metrics (sum over zero rows is NULL)
        count(when(valid, 1)).as("n_kept"))
      .filter(valid)
  }

  /** Watermarked per-user session windows (30-minute gap). State is
    * keyed by (user, session) and evicted by the watermark — bounded
    * memory at any scale.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Watermarked STREAM-STREAM interval join: each purchase pairs with
    * the same user's views from the preceding `lookback` window — the
    * continuous twin of the batch as-of attribution
    * ([[graft.operators.AsOfJoin]]), expressed as Structured
    * Streaming's inner interval join.
    *
    * Both sides are watermarked and the join condition bounds
    * `view_ts` to `[purchase_ts - lookback, purchase_ts)`, so the
    * engine can compute how long each buffered view can still match
    * and EVICT join state once the purchase-side watermark passes
    * `view_ts + lookback` — bounded state at any stream rate, the
    * requirement for running this join for months. Append mode.
    */
  def purchaseAttribution(views: DataFrame, purchases: DataFrame,
      lookback: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val v = views
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
      .withWatermark("view_ts", watermark)
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", watermark)
    p.join(v, expr(
        s"""p_user = v_user AND
           |view_ts < purchase_ts AND
           |view_ts >= purchase_ts - INTERVAL $lookback""".stripMargin))
      .select(col("purchase_id"), col("view_id"), col("p_user").as("user_id"),
        col("purchase_ts"), col("view_ts"))
  }

  /** Sessionization as CUSTOM state — `flatMapGroupsWithState` with an
    * event-time timeout, for session semantics the built-in
    * `session_window` can't express (here: the emitted row carries the
    * true first/last event times rather than gap-padded window bounds;
    * the same shape carries arbitrary per-session aggregates).
    *
    * State per user is one [[SessState]] (24 bytes), updated per
    * micro-batch and EVICTED by the event-time timeout when the
    * watermark passes `last event + gap` — bounded memory at any key
    * cardinality. A session closes either by a later in-batch event
    * beyond the gap or by the timeout firing; both paths emit exactly
    * one row (Append mode).
    */
  def sessionizeStateful(events: Dataset[SEvent], gapMs: Long = 30L * 60 * 1000,
      watermark: String = "2 hours"): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    def usOf(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    def tsOf(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(us / 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    val gapUs = gapMs * 1000L
    def emit(user: Long, s: SessState): SessionAgg =
      SessionAgg(user, tsOf(s.startUs), tsOf(s.lastUs), s.n)
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionAgg](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[SEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap: the open session is final
            val s = state.get
            state.remove()
            Iterator.single(emit(user, s))
          } else {
            // events within one micro-batch arrive unordered — sort
            // before folding (bounded: one group's batch slice)
            val sorted = it.toIndexedSeq.sortBy(e => usOf(e.ts))
            val closed = Seq.newBuilder[SessionAgg]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = usOf(e.ts)
              cur match {
                case Some(s) if t - s.lastUs <= gapUs =>
                  cur = Some(s.copy(lastUs = math.max(s.lastUs, t), n = s.n + 1))
                case Some(s) =>
                  closed += emit(user, s)
                  cur = Some(SessState(t, t, 1))
                case None =>
                  cur = Some(SessState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeouts are milli-grain: round UP so eviction can
              // never fire before last + gap has truly passed
              state.setTimeoutTimestamp((s.lastUs + gapUs + 999L) / 1000L)
            }
            closed.result().iterator
          }
      }
  }
}
