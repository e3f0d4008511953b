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

  test("the z map is a pure projection: no shuffle before the stats rollup") {
    val orders = graft.sources.Tables.load(spark, sfDir, "orders")
    val plan = ZOrder.ordersLayout(orders).queryExecution.executedPlan.toString
    // exactly one exchange: the per-file aggregation; the bounds ride
    // along as a broadcast, never a shuffle
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1, plan)
  }
}
