package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: fold a new drop into a stored
  * aggregate table without rescanning history.
  *
  * The reference rebuilds its aggregate views from the full fact on
  * every run (reference: astro-sdk-tutorial/dags/
  * etl_s3_snowflake_aggregated_views.py — each view is a full
  * CREATE-or-REPLACE over f_events). At 100 TB a daily refresh must
  * touch the DAY, not the decade: keep the aggregate table in
  * MERGEABLE state form (count / sum / min / max per key — avg derives
  * as sum/n at read time), aggregate only the delta, and combine the
  * two small keyed frames. The history fact is never read again.
  *
  * Shuffle budget per load: one partial aggregation of the delta
  * (map-side combined) plus one keyed join of stored-aggs × delta-aggs
  * — both sized by key cardinality, not data volume. The combine is
  * associative and null-faithful (a key's sum stays NULL until a
  * non-NULL value arrives, exactly like one-shot SQL `sum`), so any
  * drop arrival order yields the table a full recompute would — which
  * is precisely what the DuckDB oracle checks.
  *
  * Sums are computed on exact DECIMAL (cast by the caller or here via
  * `sumDecimal`) — decimal addition is associative, so incremental
  * folding is bit-identical to the one-shot aggregate; float sums
  * would drift with fold order.
  */
object IncrementalAgg {

  /** Which value columns to maintain, by mergeable shape. */
  final case class Spec(sums: Seq[String] = Nil, mins: Seq[String] = Nil,
      maxs: Seq[String] = Nil)

  /** Exact decimal for sum state (associative across folds). */
  private def sumDecimal(c: String) = sum(col(c).cast("decimal(18,6)"))

  /** Aggregate state of one drop. */
  def partial(delta: DataFrame, keys: Seq[String], spec: Spec): DataFrame =
    delta.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_rows"),
      (spec.sums.map(c => sumDecimal(c).as(s"sum_$c")) ++
        spec.mins.map(c => min(col(c)).as(s"min_$c")) ++
        spec.maxs.map(c => max(col(c)).as(s"max_$c"))): _*)

  /** Combine two aggregate-state frames (stored table + a new drop's
    * [[partial]]). Keys are null-safe; a key present on one side
    * passes through.
    */
  def fold(stored: DataFrame, delta: DataFrame, keys: Seq[String],
      spec: Spec): DataFrame = {
    val s = stored.withColumn("__a", lit(true)).alias("a")
    val d = delta.withColumn("__b", lit(true)).alias("b")
    val cond = keys.map(k => col(s"a.$k") <=> col(s"b.$k")).reduce(_ && _)
    def both(c: String, combine: (org.apache.spark.sql.Column,
        org.apache.spark.sql.Column) => org.apache.spark.sql.Column) = {
      val (x, y) = (col(s"a.$c"), col(s"b.$c"))
      when(col("a.__a").isNull, y)
        .when(col("b.__b").isNull, x)
        .otherwise(combine(x, y)).as(c)
    }
    val out =
      keys.map(k => coalesce(col(s"b.$k"), col(s"a.$k")).as(k)) ++
        Seq(both("n_rows", _ + _)) ++
        // SQL-sum null semantics: NULL + x = x only when one side has
        // no state at all is handled above; within a matched pair a
        // NULL sum means "all values so far NULL" -> the other side wins
        spec.sums.map(c => both(s"sum_$c",
          (x, y) => when(x.isNull, y).when(y.isNull, x).otherwise(x + y))) ++
        spec.mins.map(c => both(s"min_$c", least(_, _))) ++
        spec.maxs.map(c => both(s"max_$c", greatest(_, _)))
    s.join(d, cond, "full_outer").select(out.toIndexedSeq: _*)
  }

  /** Fold a sequence of raw drops from scratch (first drop initializes). */
  def foldAll(drops: Seq[DataFrame], keys: Seq[String], spec: Spec): DataFrame =
    drops.map(partial(_, keys, spec)).reduce(fold(_, _, keys, spec))
}
