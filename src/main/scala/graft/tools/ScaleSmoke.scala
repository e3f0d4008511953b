package graft.tools

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale smoke: replicate the sf0.1 testdata N× with offset keys into a
  * scratch dir (facts replicated with consistent join keys, dims kept
  * single — the realistic shape) so Bench can run at ~sf1 without
  * touching the read-only testdata. usage: ScaleSmoke [n] [outDir]
  */
object ScaleSmoke {

  def generate(spark: SparkSession, srcDir: String, outDir: String, n: Int): Unit = {
    // events.parquet carries TIMESTAMP(NANOS): read the raw nanos as
    // LONG and write them back as a plain long column — Tables.events
    // converts either representation
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val off = 100000000L
    def replicate(name: String, keyCols: Seq[String]): Unit = {
      val base = spark.read.parquet(s"$srcDir/$name.parquet")
      val parts = (0 until n).map { i =>
        keyCols.foldLeft(base)((df, c) => df.withColumn(c, col(c) + lit(i * off)))
      }
      parts.reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name.parquet")
    }
    def copy(name: String): Unit =
      spark.read.parquet(s"$srcDir/$name.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name.parquet")

    replicate("lineitem", Seq("l_orderkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("customer", Seq("c_custkey"))
    replicate("events", Seq("event_id", "user_id"))
    replicate("documents", Seq("doc_id"))
    replicate("embeddings", Seq("vec_id"))
    copy("part"); copy("supplier"); copy("nation"); copy("region")
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10)
    val outDir = args.lift(1).getOrElse("/tmp/sfbig")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    generate(spark, "/root/testdata/sf0.1", outDir, n)
    println(s"[scale] wrote ${n}x sf0.1 to $outDir")
    spark.stop()
  }
}
