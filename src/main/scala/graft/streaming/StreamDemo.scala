package graft.streaming

import graft.GraftSession
import graft.sources.Tables
import org.apache.spark.sql.SaveMode

/** Runnable streaming demo: replays the events table as a file stream
  * (one file per micro-batch) through the watermarked hourly
  * aggregation, proving the same transforms run batch and streaming.
  *
  * usage: graft.streaming.StreamDemo [sfDir] [chunks]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val chunks = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = GraftSession.local(8)

    val stage = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val inDir = s"$stage/in"
    val events = Tables.events(spark, sfDir)
    events.repartition(chunks).write.mode(SaveMode.Overwrite).parquet(inDir)

    val stream = spark.readStream
      .schema(spark.read.parquet(inDir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
    val q = EventStream.hourlyCounts(stream)
      .writeStream.format("memory").queryName("hourly_stream")
      .outputMode("complete")
      .start()
    q.processAllAvailable()
    val batches = q.recentProgress.length
    val out = spark.table("hourly_stream")
    val total = out.agg(org.apache.spark.sql.functions.sum("n_events")).head().getLong(0)
    println(s"[stream] micro-batches=$batches windows=${out.count()} events=$total (source=${events.count()})")
    q.stop()
    spark.stop()
  }
}
