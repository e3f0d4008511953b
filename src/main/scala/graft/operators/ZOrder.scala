package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — multi-dimensional file clustering
  * (Morton '66; the technique behind Delta/Iceberg `OPTIMIZE ZORDER
  * BY`): interleave the bits of two scaled dimension buckets so that
  * sorting by the single z-value co-locates rows that are close in
  * BOTH dimensions. Files cut from z-ranges then cover small
  * (custkey × date) rectangles, so a scan filtered on EITHER dimension
  * prunes most files by min/max stats — the layout step that turns a
  * 100 TB full scan into a few-file read for selective predicates.
  *
  * Everything is integer bit arithmetic (shift / and / or magic-number
  * spreading) plus one exact double division for the range scaling —
  * bit-identical across engines, so the gate checks every z-value and
  * every per-file bounding rectangle. The bounds ride along as a
  * ONE-ROW broadcast (no driver collect); the z-map itself is a pure
  * per-row projection — zero shuffle until the per-file stats rollup,
  * whose cardinality is the file count, not the row count. In
  * production the same z column feeds `repartitionByRange(z)` +
  * `sortWithinPartitions(z)` before the parquet write; the emitted
  * stats table IS the min/max footer index that write would produce.
  */
object ZOrder {

  /** Spread the low 8 bits of `x` so bit i lands at bit 2i. */
  def spread8(x: Column): Column = {
    val a = x.bitwiseAND(lit(255L))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x3333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x5555L))
  }

  /** Morton interleave of two 8-bit bucket values → z in [0, 65536). */
  def morton8(x: Column, y: Column): Column =
    shiftleft(spread8(x), 1).bitwiseOR(spread8(y))

  /** Scale `v` from [minV, maxV] onto integer buckets 0..255. The
    * products are exact in double (inputs ≪ 2^53) and division is
    * correctly rounded, so `floor` lands identically in every engine.
    */
  private def bucket256(v: Column, minV: Column, maxV: Column): Column =
    floor(((v - minV).cast("double") * 256.0) /
      (maxV - minV + lit(1)).cast("double")).cast("long")

  /** Z-order layout audit for `orders` over (o_custkey, o_orderdate):
    * per z-range file, the row count and the (custkey-bucket ×
    * day-bucket) bounding rectangle — tight rectangles = good pruning.
    * `fileShift` cuts files as z >> shift (1024 z-ranges at the
    * default — each an 8-aligned 8×8 bucket block; raise the shift to
    * cut fewer, larger files as row volume grows).
    */
  def ordersLayout(orders: DataFrame, fileShift: Int = 6): DataFrame =
    ordersWithZ(orders)
      .select(col("o_orderkey"), col("xb"), col("yb"), col("zval"))
      .groupBy(shiftright(col("zval"), fileShift).as("file_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("xb")).as("ck_bucket_min"), max(col("xb")).as("ck_bucket_max"),
        min(col("yb")).as("day_bucket_min"), max(col("yb")).as("day_bucket_max"),
        min(col("zval")).as("z_min"), max(col("zval")).as("z_max"))

  /** Every source column plus the (xb, yb, zval) z-order columns for
    * orders over (o_custkey, o_orderdate-day). Bounds ride along as a
    * one-row broadcast; the z map stays a pure per-row projection.
    */
  def ordersWithZ(orders: DataFrame): DataFrame = {
    val day = datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
    val rows = orders
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
      .withColumn("d", day)
    val bounds = rows.agg(
      min(col("o_custkey")).as("ckmin"), max(col("o_custkey")).as("ckmax"),
      min(col("d")).as("dmin"), max(col("d")).as("dmax"))
    rows.crossJoin(broadcast(bounds))
      .withColumn("xb", bucket256(col("o_custkey"), col("ckmin"), col("ckmax")))
      .withColumn("yb", bucket256(col("d"), col("dmin"), col("dmax")))
      .withColumn("zval", morton8(col("xb"), col("yb")))
      .drop("ckmin", "ckmax", "dmin", "dmax", "d")
  }

  /** The PHYSICAL z-order write: `repartitionByRange(zval)` +
    * `sortWithinPartitions(zval)` cuts each output file on a
    * contiguous z range — a small (custkey × date) rectangle — so the
    * parquet footer min/max on BOTH dimensions is tight per file, and
    * a selective predicate on either dimension skips nearly every row
    * group at scan time (pushed filters against footer stats). This is
    * the write [[ordersLayout]]'s stats table models; ZOrderSpec
    * asserts the pruning with scan metrics against an unordered
    * layout of the same rows.
    */
  def writeOrdersZOrdered(orders: DataFrame, path: String,
      numFiles: Int = 64): Unit =
    ordersWithZ(orders)
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
      .drop("xb", "yb")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
}
