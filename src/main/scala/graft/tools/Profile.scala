package graft.tools

import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch profiler: times labeled plan variants to find bottlenecks.
  * Current probe set: the all-corpus near-dup bucket-width scaling
  * story (candidates ∝ numTables × N² / 2^bits, so `bitsPerTable`
  * must grow with log2 N — measured here at the ~sf1 replica).
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
      val n = df.count()
      println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    val emb = Tables.embeddings(spark, dir)
    time("warmup: embeddings count")(emb)

    // keep-best stage anatomy at the replica SF
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    time("warmup: docs")(docs)
    val hashable = docs.filter(col("text").isNotNull)
    time("exact groupBy")(Dedup.exact(hashable))
    val canonIds = Dedup.exact(hashable)
      .select(col("keep_id").as("doc_id")).localCheckpoint()
    val canonDocs = hashable.join(canonIds, Seq("doc_id"), "left_semi")
    time("nd pairs over canonicals") {
      Dedup.minhashNearDupPairs(canonDocs).filter(col("jaccard") >= 0.5)
    }
    val nd = Dedup.minhashNearDupPairs(canonDocs)
      .filter(col("jaccard") >= 0.5)
    time("connectedComponents")(
      Dedup.connectedComponents(nd, "id_a", "id_b"))
    time("minhashKeep (for comparison)")(Dedup.minhashKeep(docs))
    val quality = docs.select(col("doc_id"),
      CorpusStats.qualityScore(col("text")).as("quality_score"))
    time("minhashKeepBest full")(Dedup.minhashKeepBest(docs, quality))
    time("minhashKeepBest full (rep 2)")(Dedup.minhashKeepBest(docs, quality))
    spark.stop()
  }
}
