package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit, when}

/** Batch MERGE INTO, the reference's central load operator.
  *
  * The reference refreshes every table with Snowflake `MERGE INTO` via
  * astro-sdk `aql.merge` in two modes (reference:
  * astro-sdk-tutorial/dags/etl_s3_snowflake_d_item.py:72
  * `if_conflicts="update"` — SCD-1 upsert — and
  * etl_s3_snowflake_d_event.py:70 `if_conflicts="ignore"` —
  * insert-if-absent).
  *
  * Spark-first re-expression: a MERGE over immutable storage is a keyed
  * full-outer join + column-wise coalesce (upsert), or a left-anti union
  * (ignore). Both shuffle each side once on the merge key — at 100 TB
  * this is the minimal movement unless the delta is small, in which case
  * `broadcastDelta = true` broadcasts the delta and the target never
  * shuffles at all (the common daily-delta case in the reference).
  */
object MergeInto {

  /** SCD-1 upsert: rows matched on `keys` take `updateCols` from the
    * delta; unmatched target rows pass through; unmatched delta rows are
    * inserted. Non-key columns not listed in `updateCols` keep the
    * target's value when matched.
    */
  def upsert(
      target: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      updateCols: Seq[String],
      broadcastDelta: Boolean = false): DataFrame = {
    // presence markers, not COALESCE on data columns: MERGE WHEN MATCHED
    // must take the delta's value even when that value is NULL
    val d0 = delta.withColumn("__s_present", org.apache.spark.sql.functions.lit(true))
    val d = if (broadcastDelta) broadcast(d0) else d0
    val t = target.withColumn("__t_present", org.apache.spark.sql.functions.lit(true))
      .alias("t")
    val s = d.alias("s")
    val cond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val sHit = col("s.__s_present").isNotNull
    val tHit = col("t.__t_present").isNotNull
    val out = target.columns.map { c =>
      if (keys.contains(c))
        coalesce(col(s"s.$c"), col(s"t.$c")).as(c)
      else if (updateCols.contains(c))
        when(sHit, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)
      else
        when(tHit, col(s"t.$c")).otherwise(col(s"s.$c")).as(c)
    }
    t.join(s, cond, "full_outer").select(out.toIndexedSeq: _*)
  }

  /** Insert-if-absent: keep every target row; append delta rows whose key
    * is not present in the target.
    */
  def insertIfAbsent(
      target: DataFrame,
      delta: DataFrame,
      keys: Seq[String]): DataFrame = {
    val missing = delta.join(
      target.select(keys.map(col): _*).distinct(),
      keys,
      "left_anti")
    target.unionByName(missing)
  }
}
