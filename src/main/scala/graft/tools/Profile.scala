package graft.tools

import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch profiler: times labeled plan variants to find bottlenecks. */
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

    val events = Tables.events(spark, dir)
    time("warmup: events count")(events)
    time("json get_json_object parse") {
      events.select(get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .filter(col("k").isNotNull)
    }
    time("json from_json struct parse") {
      events.select(from_json(col("props"),
        org.apache.spark.sql.types.DataType.fromDDL("struct<k:long>")).getField("k").as("k"))
        .filter(col("k").isNotNull)
    }
    time("regexp extract parse") {
      events.select(regexp_extract(col("props"), "\"k\"\\s*:\\s*\"?(-?\\d+)", 1)
        .cast("bigint").as("k")).filter(col("k").isNotNull)
    }
    time("view_yearly_counts full") {
      graft.operators.Views.yearlyCounts(events, Tables.part(spark, dir))
    }
    time("flat only (no surrogate)") {
      events.select(
        col("event_id"), date_trunc("second", col("ts")).as("event_time"),
        col("user_id").as("event_user_id"), col("event_type").as("event_name"),
        element_at(map_keys(from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("map<string,string>"))), 1)
          .as("event_parameter_name"),
        get_json_object(col("props"), "$.k").cast("bigint").as("event_parameter_value"),
        col("value").as("event_value"))
    }
    time("raw_ingest flat only") {
      events.select(
        col("event_id"), date_trunc("second", col("ts")).as("event_time"),
        col("user_id"), col("event_type"), col("value"),
        get_json_object(col("props"), "$.k").cast("bigint").as("param_k"))
    }
    def flatVariant(paramName: org.apache.spark.sql.Column): DataFrame =
      events.select(
        col("event_id"), date_trunc("second", col("ts")).as("event_time"),
        col("user_id").as("event_user_id"), col("event_type").as("event_name"),
        paramName.as("event_parameter_name"),
        get_json_object(col("props"), "$.k").cast("bigint").as("event_parameter_value"),
        col("value").as("event_value"))
    time("surrogate on flat+lit key") {
      SurrogateKey.withDenseId(flatVariant(lit("k")), Seq("event_id"), "guid")
    }
    time("surrogate on flat+regex key") {
      SurrogateKey.withDenseId(
        flatVariant(regexp_extract(col("props"), "\"(\\w+)\"\\s*:", 1)),
        Seq("event_id"), "guid")
    }
    time("surrogate on flat+from_json key") {
      SurrogateKey.withDenseId(flatVariant(element_at(map_keys(from_json(col("props"),
        org.apache.spark.sql.types.DataType.fromDDL("map<string,string>"))), 1)),
        Seq("event_id"), "guid")
    }
    time("fEvents full")(StarSchema.fEvents(events))
    time("fEvents + orderBy")(StarSchema.fEvents(events).orderBy("event_id"))
    time("rawIngest full")(StarSchema.rawIngest(events))
    time("rawIngest + orderBy")(StarSchema.rawIngest(events).orderBy("event_id"))
    spark.stop()
  }
}
