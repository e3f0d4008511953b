package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Dense 1..N surrogate keys, distributed.
  *
  * The reference assigns surrogate ids with a pandas
  * `df.assign(guid_event=range(1,len(df)+1))` after sorting — a
  * single-process sequence (reference:
  * astro-sdk-tutorial/dags/etl_s3_snowflake_d_event.py:31,
  * etl_s3_snowflake_f_events.py:43). On Spark the equivalent
  * `row_number() OVER (ORDER BY …)` collapses to ONE partition — a
  * non-starter at 100 TB. Instead: range-repartition on the order key,
  * sort within partitions, then `zipWithIndex` (one extra count job to
  * compute per-partition offsets, no driver collect, no single-partition
  * stage). Result is bit-identical to the global row_number as long as
  * the order key is unique.
  */
object SurrogateKey {

  def withDenseId(df: DataFrame, orderCols: Seq[String], name: String): DataFrame =
    withDenseIdOrdered(df, orderCols.map(col), name)

  /** As [[withDenseId]] but over arbitrary sort expressions (e.g.
    * `col("event_time").desc` for the reference's latest-first fact
    * numbering). The combined key must still be a total order.
    */
  def withDenseIdOrdered(df: DataFrame, orderCols: Seq[Column], name: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val outSchema = StructType(sorted.schema.fields :+ StructField(name, LongType, nullable = false))
    // zipWithIndex over InternalRow (no external-Row encode/decode);
    // its internal start-offset job shares the shuffle lineage, so the
    // sort's exchange runs exactly once
    val zipped = org.apache.spark.sql.GraftInternal.toInternalRdd(sorted)
      .zipWithIndex()
      .mapPartitions { it =>
        val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
        val idRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
          .create(outSchema)
        it.map { case (r, i) =>
          idRow.update(0, i + 1L)
          // projection output buffer is reused — copy, downstream buffers
          proj(joined(r, idRow)).copy(): org.apache.spark.sql.catalyst.InternalRow
        }
      }
    org.apache.spark.sql.GraftInternal.internalCreateDataFrame(spark, zipped, outSchema)
  }
}
