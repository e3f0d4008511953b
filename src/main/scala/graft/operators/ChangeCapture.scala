package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, col, lit, when}

/** Snapshot diff — change-data-capture between two versions of a table.
  *
  * The reference's loads are daily full-table drops merged with
  * Snowflake MERGE (reference:
  * astro-sdk-tutorial/dags/etl_s3_snowflake_f_events.py:87-96), which
  * applies changes but never REPORTS them. `diff` recovers the change
  * feed two snapshots imply: one row per inserted ('I'), updated
  * ('U'), or deleted ('D') key, with the old and new value of every
  * shared non-key column side by side. Unchanged keys are dropped
  * in-plan. This is the extract half of incremental pipelines: feed
  * the 'U'+'I' rows to [[MergeInto]] / [[Scd2]], the 'D' rows to a
  * retention delete.
  *
  * Scale shape: one null-safe full-outer join on the key — each
  * snapshot shuffles exactly once, the minimum for a whole-table diff
  * (neither side is broadcastable at fact scale). Comparison is an
  * exact null-safe per-column check, not a row-hash: a hash prefilter
  * (project to (key, xxhash64(cols)), diff the narrow frames, join
  * back for values) would shuffle less for very wide rows, but turns a
  * 2^-64 collision into a silently dropped update — this operator
  * keeps the exact form; snapshots that are date-partitioned should be
  * pruned to the compared partitions before calling.
  */
object ChangeCapture {

  /** Diff `cur` against `old` on `keys`. Output: the key columns, a
    * `change_type` column ('I' | 'U' | 'D'), then `old_c` / `new_c`
    * for every non-key column the snapshots share (old side NULL for
    * inserts, new side NULL for deletes).
    */
  def diff(old: DataFrame, cur: DataFrame, keys: Seq[String]): DataFrame = {
    val shared = old.columns.filter(cur.columns.contains).filterNot(keys.contains)
    // presence markers, not key-null checks: NULL is a legal key value
    // under the null-safe join
    val o = old.withColumn("__o_present", lit(true)).alias("o")
    val n = cur.withColumn("__n_present", lit(true)).alias("n")
    val cond = keys.map(k => col(s"o.$k") <=> col(s"n.$k")).reduce(_ && _)
    val oHit = col("o.__o_present").isNotNull
    val nHit = col("n.__n_present").isNotNull
    val differs = shared.map(c => !(col(s"o.$c") <=> col(s"n.$c"))).reduce(_ || _)
    val out =
      keys.map(k => coalesce(col(s"n.$k"), col(s"o.$k")).as(k)) ++
        Seq(when(!oHit, lit("I")).when(!nHit, lit("D"))
          .when(differs, lit("U")).as("change_type")) ++
        shared.flatMap(c => Seq(col(s"o.$c").as(s"old_$c"), col(s"n.$c").as(s"new_$c")))
    o.join(n, cond, "full_outer")
      .select(out.toIndexedSeq: _*)
      .filter(col("change_type").isNotNull)
  }
}
