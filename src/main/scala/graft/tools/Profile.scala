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
    for (bits <- Seq(4, 6, 8, 10); tables <- Seq(8)) {
      time(s"nearDupsAll tables=$tables bits=$bits") {
        Dedup.embeddingNearDupsAll(emb, numTables = tables, bitsPerTable = bits)
      }
    }
    time("kmeans k=8 iters=3")(Similarity.kmeansAssign(emb))
    time("pagerank 5 rounds") {
      Graph.pageRank(Graph.coPurchaseEdges(Tables.lineitem(spark, dir)))
    }
    spark.stop()
  }
}
