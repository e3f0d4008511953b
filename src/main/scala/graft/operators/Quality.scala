package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality validation — the contract the reference declares in its
  * CREATE TABLEs (NOT NULL columns, key columns; reference:
  * astro-sdk-tutorial/dags/etl_s3_snowflake_f_events.py:50-62) made an
  * executable, distributed check. Every rule is a single aggregate or
  * anti-join over the table — no collects; a full-table audit is one
  * pass per rule and rules on the same table share the scan under AQE.
  */
object Quality {

  private def one(rule: String, n: org.apache.spark.sql.Column,
      df: DataFrame): DataFrame =
    df.agg(n.cast("bigint").as("n_violations")).withColumn("rule", lit(rule))
      .select(col("rule"), col("n_violations"))

  /** Rows where `c` is NULL. */
  def notNull(df: DataFrame, c: String, rule: String): DataFrame =
    one(rule, count(when(col(c).isNull, 1)), df)

  /** Surplus rows in duplicate key groups (0 ⇔ key is unique). */
  def unique(df: DataFrame, c: String, rule: String): DataFrame =
    df.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .agg(coalesce(sum(col("cnt") - 1), lit(0L)).cast("bigint").as("n_violations"))
      .withColumn("rule", lit(rule))
      .select(col("rule"), col("n_violations"))

  /** Rows outside [lo, hi]. */
  def inRange(df: DataFrame, c: String, lo: Double, hi: Double,
      rule: String): DataFrame =
    one(rule, count(when(col(c) < lo || col(c) > hi, 1)), df)

  /** Child rows whose key has no parent (referential integrity). */
  def refIntegrity(child: DataFrame, childKey: String, parent: DataFrame,
      parentKey: String, rule: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).cast("bigint").as("n_violations"))
      .withColumn("rule", lit(rule))
      .select(col("rule"), col("n_violations"))

  /** Union a set of rule results into one (rule, n_violations) report. */
  def report(rules: Seq[DataFrame]): DataFrame =
    rules.reduce(_ unionByName _)

  /** A declarative per-table check for [[audit]]. */
  sealed trait Check { def rule: String }
  /** `c` must not be NULL. */
  final case class NotNull(c: String, rule: String) extends Check
  /** `c` must lie in [lo, hi]. */
  final case class InRange(c: String, lo: Double, hi: Double, rule: String)
      extends Check
  /** `c` must be unique (violations = surplus rows in dup groups). */
  final case class Unique(c: String, rule: String) extends Check

  /** Single-pass audit of one table: every NotNull/InRange check folds
    * into ONE groupBy-less aggregate (conditional counts over one
    * scan), unpivoted back to the (rule, n_violations) contract;
    * each Unique check is the one keyed aggregate it inherently needs.
    * A 5-rule audit of a 100 TB table therefore reads it once for all
    * scan rules — not once per rule — plus one shuffle per unique key.
    */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit requires at least one check")
    val scanAggs = checks.collect {
      case NotNull(c, r) => r -> count(when(col(c).isNull, 1))
      case InRange(c, lo, hi, r) => r -> count(when(col(c) < lo || col(c) > hi, 1))
    }
    val scanReport = if (scanAggs.isEmpty) Nil else {
      val aggs = scanAggs.zipWithIndex.map { case ((_, n), i) =>
        n.cast("bigint").as(s"v$i") }
      // unpivot via explode of (rule, count) structs — rule names stay
      // literal Columns, never SQL text (no escaping surface)
      val pairs = scanAggs.zipWithIndex.map { case ((r, _), i) =>
        struct(lit(r).as("rule"), col(s"v$i").as("n_violations")) }
      Seq(df.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(pairs: _*)).as("kv"))
        .select(col("kv.rule").as("rule"), col("kv.n_violations").as("n_violations")))
    }
    val keyedReports = checks.collect { case Unique(c, r) => unique(df, c, r) }
    report(scanReport ++ keyedReports)
  }

  /** Per-group z-score outliers: rows whose `valueCol` sits at least
    * `threshold` sample standard deviations from their group's mean.
    *
    * Two passes over the table (group stats, then the scan that tags
    * rows), but the stats frame is one row per group — it broadcasts,
    * so the fact is never shuffled. The z-score is rounded to 4
    * decimals BEFORE the threshold compare in both this plan and the
    * DuckDB oracle, so the classification boundary is identical
    * cross-engine (SURVEY §5's cosine rule, applied to anomaly
    * flags). Groups with zero variance or a single row have NULL
    * sigma — their rows are never outliers.
    */
  def zScoreOutliers(df: DataFrame, valueCol: String, groupCols: Seq[String],
      threshold: Double): DataFrame = {
    require(!Seq("z", "__mu", "__sigma").exists(df.columns.contains),
      "zScoreOutliers reserves columns z, __mu, __sigma")
    val stats = df.groupBy(groupCols.map(col): _*).agg(
      avg(col(valueCol)).as("__mu"),
      // a zero-variance group would divide by zero under ANSI mode;
      // NULL sigma drops its rows — the oracle NULLs sigma=0 explicitly
      // (nullif) so the classification never leans on an engine's
      // division-by-zero convention
      when(stddev_samp(col(valueCol)) =!= 0.0, stddev_samp(col(valueCol)))
        .as("__sigma"))
    df.join(broadcast(stats), groupCols, "inner")
      .withColumn("z", round((col(valueCol) - col("__mu")) / col("__sigma"), 4))
      .filter(abs(col("z")) >= threshold)
      .drop("__mu", "__sigma")
  }
}
