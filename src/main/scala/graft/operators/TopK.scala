package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._

/** Top-k rows per group without a full per-group sort.
  *
  * The window formulation (`row_number() OVER (PARTITION BY g ORDER BY
  * o) <= k`) sorts every group completely — O(n log n) per group and a
  * full materialized sort buffer. At 100 TB with millions of rows per
  * group and k in the tens, a bounded heap is the right operator:
  * O(n log k) and O(groups·k) memory.
  *
  * Two-phase like an aggregation: partial top-k per input partition
  * (map-side, no shuffle), shuffle only the surviving ≤ groups·k·P rows,
  * final top-k per group. Results are total-order deterministic: the
  * comparator is (orderValue desc, then the remaining columns asc).
  */
object TopK {

  /** Keep the k highest `orderCol` rows per `groupCol`, ties broken by
    * `tieCol` ascending. Emits the input columns plus `rnk` (1..k).
    */
  def perGroup(df: DataFrame, groupCol: String, orderCol: String,
      tieCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    val cols = df.columns
    val gi = cols.indexOf(groupCol)
    val oi = cols.indexOf(orderCol)
    val ti = cols.indexOf(tieCol)
    require(gi >= 0 && oi >= 0 && ti >= 0, s"missing columns in ${cols.mkString(",")}")
    val schema = df.schema

    def partialTopK(it: Iterator[InternalRow]): Iterator[InternalRow] = {
      // max-heap ranked by "badness" (-order, tie): top = worst kept row
      val heaps = new java.util.HashMap[Long, scala.collection.mutable.PriorityQueue[(Double, Long, InternalRow)]]()
      implicit val heapOrd: Ordering[(Double, Long, InternalRow)] =
        Ordering.by[(Double, Long, InternalRow), (Double, Long)](t => (-t._1, t._2))
      it.foreach { r =>
        val g = r.getLong(gi)
        val o = r.getDouble(oi)
        val t = r.getLong(ti)
        var h = heaps.get(g)
        if (h == null) {
          h = scala.collection.mutable.PriorityQueue.empty[(Double, Long, InternalRow)]
          heaps.put(g, h)
        }
        if (h.size < k) h.enqueue((o, t, r.copy()))
        else {
          val worst = h.head // head = worst kept (smallest cosine, largest tie)
          if (o > worst._1 || (o == worst._1 && t < worst._2)) {
            h.dequeue(); h.enqueue((o, t, r.copy()))
          }
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator.flatMap(_.iterator.map(_._3))
    }

    val partial = GraftInternal.toInternalRdd(df).mapPartitions(partialTopK)
    val survivors = GraftInternal.internalCreateDataFrame(spark, partial, schema)
      .repartition(col(groupCol))
    val fin = GraftInternal.toInternalRdd(survivors).mapPartitions(partialTopK)
    val topk = GraftInternal.internalCreateDataFrame(spark, fin, schema)
    // ranks over ≤ k rows per group — the window input is already tiny
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(orderCol).desc, col(tieCol))
    topk.withColumn("rnk", row_number().over(w))
  }
}
