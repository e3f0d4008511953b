package graft.tools

import graft.GraftSession
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Decade evidence for the hot-band cap (r17 verdict item 4): a
  * boilerplate-heavy corpus — every document prefixed with the same
  * 30-word header, the shape exact-collapse CANNOT absorb because the
  * documents stay DISTINCT — measured at replica decades.
  *
  * The uncapped candidate mass is computed ANALYTICALLY from the band
  * occupancy histogram (Σ C(n_band, 2) — one aggregate, no join), so
  * the probe can quantify the bomb it refuses to detonate at the
  * larger decade; the capped pass actually runs, wall-clocked, with F
  * from the count-probe law (Dedup.bandCapFromCount).
  *
  * usage: HotBandProbe <sfDir> [replicas]  → one JSON line
  */
object HotBandProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val replicas = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import graft.functions.{TextFunctions => TF}
    graft.plans.GraftFunctions.ensureRegistered(spark)

    val boiler = (1 to 30).map(i => s"boiler$i").mkString(" ")
    val off = 100000000L
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val docs = (0 until replicas).map(i =>
      base.withColumn("doc_id", col("doc_id") + lit(i * off)))
      .reduce(_ unionByName _)
      .withColumn("text", concat(lit(boiler + " "), col("text")))
      .localCheckpoint()
    val n = docs.count()
    val cap = Dedup.bandCapFromCount(n)

    // analytic uncapped mass from the occupancy histogram
    val banded = docs
      .select(col("doc_id"), TF.words(col("text")).as("w"))
      .select(col("doc_id"), TF.minhashSigWords(col("w"), 3, 32).as("sig"))
      .select(col("doc_id"), explode(TF.bandTuples(col("sig"), 8, 4)).as("bk"))
    val hist = banded.groupBy(col("bk")).agg(count(lit(1)).as("nb"))
      .agg(sum(col("nb") * (col("nb") - 1) / 2).as("uncapped_pairs"),
        sum(when(col("nb") > cap, 1).otherwise(0)).as("hot_bands"),
        max(col("nb")).as("max_band"))
      .head()
    val uncappedPairs = hist.getAs[java.math.BigDecimal](0).longValue()
    val hotBands = hist.getLong(1)
    val maxBand = hist.getLong(2)

    val t0 = System.nanoTime()
    val cappedPairs = Dedup
      .minhashNearDupPairs(docs, maxBandFreq = Some(cap)).count()
    val wall = (System.nanoTime() - t0) / 1e9

    println(s"""{"metric":"hot_band_cap","sfdir":"$sfDir",""" +
      s""""replicas":$replicas,"docs":$n,"cap":$cap,""" +
      s""""uncapped_candidate_pairs":$uncappedPairs,""" +
      s""""hot_bands":$hotBands,"max_band_occupancy":$maxBand,""" +
      s""""capped_candidate_pairs":$cappedPairs,""" +
      s""""capped_wall_sec":${f"$wall%.2f"}}""")
    spark.stop()
  }
}
