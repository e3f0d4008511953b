package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpecBase {

  /** Reference bit-interleave for 8-bit values. */
  private def mortonRef(x: Int, y: Int): Int =
    (0 until 8).foldLeft(0) { (acc, i) =>
      acc | (((x >> i) & 1) << (2 * i + 1)) | (((y >> i) & 1) << (2 * i))
    }

  test("morton8 matches the bit-by-bit reference interleave") {
    import spark.implicits._
    val pairs = Seq((0, 0), (255, 255), (1, 0), (0, 1), (170, 85), (37, 201))
    val df = pairs.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.morton8(col("x").cast("long"), col("y").cast("long")).as("z"))
    df.collect().foreach { r =>
      assert(r.getAs[Long]("z") == mortonRef(r.getAs[Int]("x"), r.getAs[Int]("y")))
    }
  }

  test("layout files cover aligned 8x8 bucket rectangles and keep every row") {
    val orders = graft.sources.Tables.load(spark, sfDir, "orders")
    val out = ZOrder.ordersLayout(orders).collect()
    assert(out.nonEmpty)
    // z >> 6 strips 3 low bits of each dimension: every file's rectangle
    // sits inside one 8-aligned 8x8 block — the pruning guarantee
    out.foreach { r =>
      val (ckMin, ckMax) = (r.getAs[Long]("ck_bucket_min"), r.getAs[Long]("ck_bucket_max"))
      val (dMin, dMax) = (r.getAs[Long]("day_bucket_min"), r.getAs[Long]("day_bucket_max"))
      assert(ckMin >> 3 == ckMax >> 3, s"custkey rectangle spans blocks: $r")
      assert(dMin >> 3 == dMax >> 3, s"day rectangle spans blocks: $r")
      assert(r.getAs[Long]("z_max") - r.getAs[Long]("z_min") < 64)
    }
    assert(out.map(_.getAs[Long]("n_rows")).sum ==
      orders.filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull).count())
  }

  test("physical z-order write prunes: selective scans read a fraction of an unordered layout") {
    // sf0.01 (15k rows): at sf0.001 the unordered baseline's 12-row
    // files get accidentally-selective footers and prune too — ~120
    // rows per file makes the unordered footers span the key range
    // sf0.01 (15k rows): at sf0.001 the unordered baseline's 12-row
    // files get accidentally-selective footers and prune too — ~120
    // rows per file makes the unordered footers span the key range.
    // o_orderdate goes to DATE up front: parquet filter pushdown
    // covers date/int/long/string but NOT timestamp_ntz, so an ntz
    // date column would silently disable the very pruning under test.
    val orders = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "orders")
      .withColumn("o_orderdate", to_date(col("o_orderdate")))
    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    // same rows, two layouts: z-range-cut files vs hash-shuffled files
    ZOrder.writeOrdersZOrdered(orders, s"$base/zorder", numFiles = 128)
    ZOrder.ordersWithZ(orders).drop("xb", "yb")
      .repartition(128).write.parquet(s"$base/flat")

    // rows the parquet reader actually surfaces from the scan (after
    // row-group stats skipping, before the residual filter)
    def scanRows(path: String, pred: org.apache.spark.sql.Column): Long = {
      val df = spark.read.parquet(path).where(pred)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      df.collect()
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.map(_.metrics("numOutputRows").value).sum
    }

    val b = orders.agg(
      min(col("o_custkey")), max(col("o_custkey")),
      min(col("o_orderdate")), max(col("o_orderdate"))).head()
    val (ckLo, ckHi) = (b.getLong(0), b.getLong(1))
    val ckPred = col("o_custkey") <= lit(ckLo + (ckHi - ckLo) / 64)
    val dLoD = b.getAs[java.sql.Date](2).toLocalDate
    val dHiD = b.getAs[java.sql.Date](3).toLocalDate
    val spanDays = java.time.temporal.ChronoUnit.DAYS.between(dLoD, dHiD)
    val datePred = col("o_orderdate") <=
      lit(java.sql.Date.valueOf(dLoD.plusDays(spanDays / 64)))

    for (pred <- Seq(ckPred, datePred)) {
      // pruning loses nothing: both layouts return identical rows
      val zKeys = spark.read.parquet(s"$base/zorder").where(pred)
        .select("o_orderkey").collect().map(_.getLong(0)).sorted
      val fKeys = spark.read.parquet(s"$base/flat").where(pred)
        .select("o_orderkey").collect().map(_.getLong(0)).sorted
      assert(zKeys.sameElements(fKeys))
      // the unordered layout reads ~every row (each file spans the full
      // key range); the z layout skips row groups whose footer
      // rectangle misses the predicate
      val zRead = scanRows(s"$base/zorder", pred)
      val fRead = scanRows(s"$base/flat", pred)
      info(s"pruning ratio: z=$zRead flat=$fRead (${zRead.toDouble / fRead})")
      assert(zRead <= fRead / 3,
        s"z-order read $zRead rows vs $fRead unordered — no pruning")
    }
  }

  test("the z map is a pure projection: no shuffle before the stats rollup") {
    val orders = graft.sources.Tables.load(spark, sfDir, "orders")
    val plan = ZOrder.ordersLayout(orders).queryExecution.executedPlan.toString
    // exactly one exchange: the per-file aggregation; the bounds ride
    // along as a broadcast, never a shuffle
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1, plan)
  }
}
