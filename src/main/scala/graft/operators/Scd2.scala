package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{broadcast, col, lit, when}
import org.apache.spark.sql.types.DateType

/** SCD Type 2 dimension maintenance: close-and-insert history.
  *
  * The reference maintains its dims SCD-1 (Snowflake MERGE
  * `if_conflicts="update"`, reference:
  * astro-sdk-tutorial/dags/etl_s3_snowflake_d_item.py:72) — an update
  * overwrites the stored row and the old attribute values are gone. A
  * warehouse that feeds time-aware analytics needs the Type-2 variant:
  * every change CLOSES the current row (`effective_to` = load date,
  * `is_current` = false) and INSERTS a new current version, so any
  * fact can be joined to the dim "as of" its event time.
  *
  * History-table invariants maintained here:
  *  - exactly one `is_current` row per natural key (delta key
  *    uniqueness is enforced in-plan, like MERGE);
  *  - closed rows are immutable — a later load never touches them;
  *  - a key absent from a load stays current (snapshots are treated as
  *    "upserts observed", not as the complete key universe — deletes
  *    are [[ChangeCapture]]'s job).
  *
  * Scale shape (dim history ≫ delta, the daily-load case): the history
  * is scanned twice and NEVER shuffled — both joins broadcast the
  * delta-sized side, mirroring [[MergeInto.upsert]]'s decomposition:
  *  1. current-rows ⟕ broadcast(delta): one projection conditionally
  *     closes changed rows in place (kept and closed rows come out of
  *     the same scan — no filter split);
  *  2. current-rows ⋈ broadcast(delta) where tracked cols are EQUAL:
  *     delta-sized "already stored" key list;
  *  3. delta ▷ broadcast(that list): the insert set — brand-new keys
  *     plus new versions of changed keys (delta-sized both sides).
  * Non-current rows pass through untouched. With `broadcastDelta =
  * false` (a backfill-sized delta) the same three joins run as
  * shuffled hash joins on the natural key; the current slice then
  * shuffles once per join it feeds (twice total), never more, and the
  * closed majority of the history still bypasses every exchange.
  *
  * Key skew cannot amplify these joins: BOTH join inputs are key-unique
  * by invariant — the current slice holds exactly one open row per
  * natural key and the delta's key uniqueness is enforced in-plan
  * ([[MergeInto.requireUniqueKeys]]) — so every probe matches at most
  * one build row and no hot key fans out. The only place versions
  * accumulate is the non-current slice, which never joins at all.
  *
  * All key and tracked-column comparisons are null-safe (`<=>`): a
  * NULL attribute value is a real value — NULL → 'x' closes a row,
  * 'x' → NULL closes a row, NULL → NULL is unchanged.
  */
object Scd2 {

  val FromCol = "effective_from"
  val ToCol = "effective_to"
  val CurrentCol = "is_current"

  /** Partition column of the compacted layout
    * ([[graft.sources.Sinks.compactScd2]]): `year(effective_to)`,
    * 9999 for open versions.
    */
  val CloseYearCol = "close_year"

  /** First load: every row becomes the open current version. */
  def init(snapshot: DataFrame, keys: Seq[String], loadDate: Column): DataFrame =
    MergeInto.requireUniqueKeys(snapshot, keys)
      .withColumn(FromCol, loadDate.cast(DateType))
      .withColumn(ToCol, lit(null).cast(DateType))
      .withColumn(CurrentCol, lit(true))

  /** Fold one load into the history. `tracked` are the columns whose
    * change closes a version; untracked non-key columns ride along
    * with whatever version they arrived on. Loads must be applied in
    * date order (`loadDate` monotonically increasing).
    */
  def merge(history: DataFrame, delta: DataFrame, keys: Seq[String],
      tracked: Seq[String], loadDate: Column,
      broadcastDelta: Boolean = true,
      closeAbsent: Boolean = false): DataFrame = {
    val d0 = MergeInto.requireUniqueKeys(delta, keys)
      .withColumn("__s_present", lit(true))
    val d = (if (broadcastDelta) broadcast(d0) else d0).alias("s")
    val cur = history.filter(col(CurrentCol)).alias("t")
    val nonCur = history.filter(!col(CurrentCol))
    val cond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    // null-safe per-column compare: never NULL, so the predicates below
    // are decidable even on join misses
    val differs = tracked.map(c => !(col(s"t.$c") <=> col(s"s.$c"))).reduce(_ || _)
    // closeAbsent = snapshot contract (the delta is the FULL current
    // key set): a current version whose key vanished from the snapshot
    // is closed WITHOUT a replacing open version — deletion as an SCD2
    // event. The key re-appearing in a later load inserts a fresh open
    // version, leaving the gap in the history (close-and-reinsert).
    // Default (incremental contract): unmatched keys stay open.
    val closing = (col("s.__s_present").isNotNull && differs) ||
      (lit(closeAbsent) && col("s.__s_present").isNull)

    // scan 1: every current row survives — unchanged, or closed in place
    val curOut = cur.join(d, cond, "left_outer").select(
      history.columns.map {
        case ToCol => when(closing, loadDate.cast(DateType))
          .otherwise(col(s"t.$ToCol")).as(ToCol)
        case CurrentCol => (!closing).as(CurrentCol)
        case c => col(s"t.$c").as(c)
      }.toIndexedSeq: _*)

    // scan 2: delta keys whose tracked values are already stored
    // unchanged (delta-sized output — the broadcastable side of join 3)
    val sameKeys = cur.join(d, cond, "inner").filter(!differs)
      .select(keys.map(k => col(s"s.$k").as(s"__m_$k")): _*)
    val antiCond = keys.map(k => col(s"i.$k") <=> col(s"__m_$k")).reduce(_ && _)
    val inserts = delta.alias("i")
      .join(if (broadcastDelta) broadcast(sameKeys) else sameKeys,
        antiCond, "left_anti")
      .select(delta.columns.map(col).toIndexedSeq: _*)
      .withColumn(FromCol, loadDate.cast(DateType))
      .withColumn(ToCol, lit(null).cast(DateType))
      .withColumn(CurrentCol, lit(true))

    nonCur.unionByName(curOut).unionByName(inserts.select(
      history.columns.map(col).toIndexedSeq: _*))
  }

  /** As-of temporal join: resolve, for every fact row, the dim version
    * that was valid at the fact's event time — `effective_from ≤ t`
    * and (`effective_to` IS NULL or `t < effective_to`), i.e. versions
    * own the half-open interval [from, to). This is THE read path an
    * SCD2 history exists for: facts join the dim "as of" their own
    * time, not the current truth.
    *
    * Scale shape: an equi hash join on the natural key with the
    * interval test as a residual filter — the versions of one key
    * partition time, so each fact matches at most one version and the
    * join never amplifies. History-side skew cannot arise for the
    * same reason as in [[merge]]: versions accumulate per key only as
    * genuine history, and the interval residual keeps exactly one.
    */
  /** [[asOf]] against a COMPACTED history
    * ([[graft.sources.Sinks.compactScd2]] layout) for a fact window
    * bounded below by `minFactDate` (a LITERAL, so pruning is static):
    * a version closed before the bound cannot own any fact at or after
    * it, and since the close year is a partition column the eliminated
    * versions never leave the file manifest — the history scan itself
    * shrinks with the window (plan-audited in PlanAuditSpec). The
    * interval residual inside [[asOf]] is unchanged, so results equal
    * the unpruned join for any fact at or after the bound.
    */
  def asOfPruned(compacted: DataFrame, facts: DataFrame, historyKey: String,
      factKey: String, factTimeCol: String,
      minFactDate: Column): DataFrame = {
    val pruned = compacted.filter(
      col(CurrentCol) || col(CloseYearCol) >= org.apache.spark.sql.functions
        .year(minFactDate.cast(DateType)))
    asOf(pruned.drop(CloseYearCol), facts, historyKey, factKey, factTimeCol)
  }

  def asOf(history: DataFrame, facts: DataFrame, historyKey: String,
      factKey: String, factTimeCol: String): DataFrame = {
    // qualified references, so the natural case of historyKey ==
    // factKey (or a fact frame carrying its own effective_* columns)
    // does not hit an ambiguous-reference analysis error
    val h = history.alias("__h")
    val f = facts.alias("__f")
    val t = col(s"__f.$factTimeCol")
    f.join(h,
      col(s"__h.$historyKey") === col(s"__f.$factKey") &&
        t >= col(s"__h.$FromCol") &&
        (col(s"__h.$ToCol").isNull || t < col(s"__h.$ToCol")))
  }
}
