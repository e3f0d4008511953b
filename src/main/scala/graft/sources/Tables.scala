package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Schema'd table loaders.
  *
  * Mirrors the reference's extract layer (S3 CSV → warehouse): the
  * reference loads `event.csv` / `item.csv` with astro-sdk `load_file`
  * (reference: astro-sdk-tutorial/dags/etl_s3_snowflake_raw_event_ingest.py:30,
  * etl_s3_snowflake_d_item.py:20). Here the same surface is a schema'd
  * `spark.read` — parquet for the driver testdata, CSV with an explicit
  * schema for raw drops. Explicit schemas (never `inferSchema`) so a
  * 100 TB ingest does not pay a sampling pass and cannot drift types.
  */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** The events table carries TIMESTAMP(NANOS) parquet, which Spark's
    * TimestampType (µs) cannot represent natively — read the raw nanos as
    * LONG (`spark.sql.legacy.parquet.nanosAsLong`) and convert to a µs
    * timestamp column inline. Set here (not only in the session builders)
    * so any caller-provided session works.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) loads as NTZ;
        // the session timezone is pinned UTC in every entrypoint, so the
        // cast to TimestampType is a pure reinterpretation (bit-identical
        // micros) — and it restores watermark/unix_micros compatibility
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw // already a timestamp column (re-written drops)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Raw event CSV schema — reference event.csv header:
    * event_id,event_time,user_id,event_payload (JSON string payload).
    */
  val eventCsvSchema: StructType = StructType(Seq(
    StructField("event_id", StringType, nullable = false),
    StructField("event_time", StringType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_payload", StringType, nullable = false)
  ))

  /** Raw item CSV schema — reference item.csv header:
    * adjective,category,created_at,id,modifier,name,price.
    */
  val itemCsvSchema: StructType = StructType(Seq(
    StructField("adjective", StringType, nullable = true),
    StructField("category", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = false),
    StructField("id", DoubleType, nullable = false),
    StructField("modifier", StringType, nullable = true),
    StructField("name", StringType, nullable = false),
    StructField("price", DoubleType, nullable = false)
  ))

  /** CSV ingest with an explicit schema (header row, quoted JSON fields). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .schema(schema)
      .csv(path)
}
