package graft.operators

import graft.plans.HeapPass
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Top-k rows per group without a full per-group sort — the RDD-level
  * composition twin of the planned operator in
  * [[graft.plans.TopKPlanner]] (same [[graft.plans.HeapPass]] heap,
  * hand-placed phases instead of a Strategy). Prefer the planned
  * version; this one exists as the dependency-free form and as the
  * reference implementation its spec compares against.
  */
object TopK {

  /** Keep the k highest `orderCol` rows per `groupCol`, ties broken by
    * `tieCol` ascending. Emits the input columns plus `rnk` (1..k).
    * Column types must be (bigint, double, bigint) — the heap reads
    * fields positionally.
    */
  def perGroup(df: DataFrame, groupCol: String, orderCol: String,
      tieCol: String, k: Int): DataFrame = {
    require(k >= 1, s"top-k requires k >= 1, got $k")
    val spark = df.sparkSession
    val cols = df.columns
    val gi = cols.indexOf(groupCol)
    val oi = cols.indexOf(orderCol)
    val ti = cols.indexOf(tieCol)
    require(gi >= 0 && oi >= 0 && ti >= 0, s"missing columns in ${cols.mkString(",")}")
    val schema = df.schema
    require(schema(gi).dataType == LongType, s"$groupCol must be bigint")
    require(schema(oi).dataType == DoubleType, s"$orderCol must be double")
    require(schema(ti).dataType == LongType, s"$tieCol must be bigint")

    def pass(rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]) =
      rdd.mapPartitions(it =>
        HeapPass.topK(it, gi, oi, ti, k, graft.plans.LongTie)
          .flatMap(_._2.iterator.map(_._3)))

    val partial = pass(GraftInternal.toInternalRdd(df))
    val survivors = GraftInternal.internalCreateDataFrame(spark, partial, schema)
      .repartition(col(groupCol))
    val fin = pass(GraftInternal.toInternalRdd(survivors))
    val topk = GraftInternal.internalCreateDataFrame(spark, fin, schema)
    // ranks over ≤ k rows per group — the window input is already tiny
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(orderCol).desc, col(tieCol))
    topk.withColumn("rnk", row_number().over(w))
  }
}
