package graft.tools

import graft.GraftSession
import graft.sources.{Sinks, Tables}
import org.apache.spark.sql.functions._

/** Adjudicates the fact-load scale question (r17 verdict item 1): does
  * the daily fact MERGE cost scale with the DROP or with the
  * WAREHOUSE?
  *
  * Setup mirrors the reference's daily load
  * (etl_s3_snowflake_f_events.py:87-96 — MERGE one day's events into
  * the accumulated fact): a warehouse is built from every event day
  * EXCEPT the last, then the last-day drop loads through
  *
  *  - the legacy FULL-TABLE merge (read whole fact, full-outer merge,
  *    stage-and-swap the whole table — the pre-r18 path), and
  *  - the PARTITION-SCOPED merge ([[Sinks.mergeFactByDate]] — only the
  *    drop's date partitions are read and rewritten).
  *
  * Run at two replica factors: the full-table wall must track the
  * warehouse (~R×) while the scoped wall tracks the drop.
  *
  * usage: FactMergeBench <sfDir> [replicas]  → one JSON line
  */
object FactMergeBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val replicas = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    val off = 100000000L
    val ev0 = Tables.events(spark, sfDir)
      .filter(col("event_id").isNotNull)
    val ev = if (replicas == 1) ev0
    else (0 until replicas).map(i =>
      ev0.withColumn("event_id", col("event_id") + lit(i * off))
        .withColumn("user_id", col("user_id") + lit(i * off)))
      .reduce(_ unionByName _)

    // the fact delta shape the pipeline merges (guid source does not
    // affect merge cost — use the natural key)
    val flat = graft.operators.StarSchema.fEventsFlat(ev)
      .withColumn("guid_event", col("event_id"))
      .withColumn("event_date", to_date(col("event_time")))
    val lastDay = flat.agg(max(col("event_date"))).head().getDate(0)
    val bulk = flat.filter(col("event_date") < lit(lastDay)).localCheckpoint()
    val drop = flat.filter(col("event_date") === lit(lastDay)).localCheckpoint()
    val keys = Seq("event_id", "event_parameter_name", "event_parameter_value")
    val upd = Seq("event_time", "event_user_id", "event_name", "event_value",
      "guid_event")

    val base = java.nio.file.Files.createTempDirectory("graft_factbench")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // legacy layout: unpartitioned table, full-table stage-and-swap
    val pFull = s"$base/fact_full"
    Sinks.mergeDim(spark, pFull, bulk.drop("event_date"), keys, upd,
      Sinks.Update, broadcastDelta = false, pinResult = false)
    val tFull = timed {
      Sinks.mergeDim(spark, pFull, drop.drop("event_date"), keys, upd,
        Sinks.Update, broadcastDelta = false, pinResult = false)
    }

    // partition-scoped layout
    val pScoped = s"$base/fact_scoped"
    Sinks.mergeFactByDate(spark, pScoped, bulk, keys, upd)
    val tScoped = timed {
      Sinks.mergeFactByDate(spark, pScoped, drop, keys, upd)
    }

    val nBulk = bulk.count(); val nDrop = drop.count()
    println(s"""{"metric":"fact_merge_drop_load","sfdir":"$sfDir",""" +
      s""""replicas":$replicas,"warehouse_rows":$nBulk,"drop_rows":$nDrop,""" +
      s""""full_merge_sec":${f"$tFull%.2f"},""" +
      s""""scoped_merge_sec":${f"$tScoped%.2f"}}""")
    spark.stop()
  }
}
