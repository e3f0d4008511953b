package graft.tools

import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch profiler: times labeled plan variants to find bottlenecks.
  * Current probe set: the doc-grain rollup anatomy at the replica
  * decades — where do the ~10 s the three collapsed rollups
  * (minhash/simhash/ngram) share at ~sf100 actually go? Stages are
  * timed under the HASH-FORCE instrument (count() prunes rollup
  * columns — the r13 lesson).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.select(xxhash64(struct(col("*"))).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    time("warmup/floor: docs scan+hash")(docs)
    time("floor rep 2: docs scan+hash")(docs)
    time("ids only: doc_id scan+hash")(docs.select(col("doc_id")))
    val withH = docs.filter(col("text").isNotNull)
      .select(col("doc_id") +: Dedup.textGroupKeys(col("text")): _*)
    time("election keys: withH projection")(withH)
    val grp = withH.groupBy(Dedup.TextGroupKeyNames.map(col): _*)
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("n_copies"))
    time("election agg: grp")(grp)
    val docRep = withH.join(grp, Dedup.TextGroupKeyNames)
      .select(col("doc_id"), col("rep"), col("n_copies"))
    time("election join-back: docRep")(docRep)
    time("full dedup_minhash")(Dedup.minhashNearDups(docs))
    time("full dedup_simhash")(Dedup.simhashNearDups(docs))
    time("full dedup_simhash rep 2")(Dedup.simhashNearDups(docs))
    // final-plan anatomy of the laggard: where do its exchanges sit?
    val sh = Dedup.simhashNearDups(docs)
    sh.select(xxhash64(struct(col("*"))).as("h"))
      .agg(expr("bit_xor(h)")).collect()
    val p = sh.queryExecution.executedPlan.toString
    println("[prof] simhash final-plan exchanges/joins/scans:")
    p.split("== Initial Plan ==").head.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Join") ||
        l.contains("Scan parquet") || l.contains("HashAggregate") ||
        l.contains("Window"))
      .foreach(l => println("[prof]   " + l.trim.take(150)))
    spark.stop()
  }
}
