package graft.sources

import graft.SparkSpecBase
import graft.streaming.StreamReplay
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** The driver's testdata regeneration has shipped `events.ts` under THREE
  * different parquet encodings across rounds:
  *
  *   1. TIMESTAMP(NANOS)  → with `nanosAsLong` Spark reads LongType nanos
  *   2. TIMESTAMP(MICROS, isAdjustedToUTC=false) → Spark reads TIMESTAMP_NTZ
  *   3. TIMESTAMP(MICROS, isAdjustedToUTC=true)  → Spark reads TimestampType
  *
  * Round 7 regressed 4 queries because encoding 2 appeared and the loader
  * only normalized encoding 1 — `withWatermark` and `unix_micros` both
  * reject NTZ. This spec pins ALL THREE through [[Tables.events]] (same
  * instants in, same TimestampType micros out) and proves the stream
  * replay path watermarks an NTZ-encoded file. The session timezone is
  * pinned UTC, so the NTZ→TIMESTAMP cast is a pure reinterpretation.
  */
class EventTsEncodingSpec extends SparkSpecBase {

  // three instants, expressed as epoch micros (UTC)
  private val micros = Seq(1700000000000000L, 1700000001500000L, 1700003600000000L)

  private def tmpTable(writer: String => Unit): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tsenc").toString
    writer(s"$dir/events.parquet")
    dir
  }

  private def loadedMicros(dir: String): (DataType, Seq[Long]) = {
    val df = Tables.events(spark, dir)
    val tpe = df.schema("ts").dataType
    val vals = df.select(unix_micros(col("ts")).as("us"))
      .orderBy("us").collect().map(_.getLong(0)).toSeq
    (tpe, vals)
  }

  test("nanos-as-LONG encoding normalizes to TimestampType micros") {
    // nanosAsLong reads TIMESTAMP(NANOS) as a LongType column of nanos;
    // a plain INT64 column of nanos produces the identical loaded schema,
    // so it exercises the same normalization branch
    val dir = tmpTable { path =>
      val rows = micros.map(us => Row(us * 1000L))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(StructField("ts", LongType, nullable = false)))
      ).write.parquet(path)
    }
    val (tpe, vals) = loadedMicros(dir)
    assert(tpe === TimestampType)
    assert(vals === micros)
  }

  test("TIMESTAMP_NTZ encoding normalizes to TimestampType micros") {
    val dir = tmpTable { path =>
      val rows = micros.map(us => Row(
        java.time.LocalDateTime.ofEpochSecond(
          us / 1000000L, ((us % 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(StructField("ts", TimestampNTZType, nullable = false)))
      ).write.parquet(path)
    }
    val (tpe, vals) = loadedMicros(dir)
    assert(tpe === TimestampType)
    assert(vals === micros)
  }

  test("plain TIMESTAMP encoding passes through unchanged") {
    val dir = tmpTable { path =>
      val rows = micros.map(us => Row(java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(StructField("ts", TimestampType, nullable = false)))
      ).write.parquet(path)
    }
    val (tpe, vals) = loadedMicros(dir)
    assert(tpe === TimestampType)
    assert(vals === micros)
  }

  test("stream replay watermarks an NTZ-encoded events file") {
    // the exact failure mode of round 7: readStream over an NTZ file +
    // withWatermark threw EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    val dir = tmpTable { path =>
      val rows = micros.map(us => Row(
        java.time.LocalDateTime.ofEpochSecond(
          us / 1000000L, ((us % 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC), "e"))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(
          StructField("ts", TimestampNTZType, nullable = false),
          StructField("event_name", StringType, nullable = false)))
      ).write.parquet(path)
    }
    val out = StreamReplay.replayEvents(spark, dir,
      df => df.groupBy(window(col("ts"), "1 hour")).count())
    assert(out.count() === 2) // instants span two distinct hours
  }
}
