package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SinksSpec extends SparkSpecBase {
  import spark.implicits._

  test("appendPartitioned lands date partitions that prune on read") {
    val dir = Files.createTempDirectory("graft_part").toString + "/fact"
    val df = Tables.events(spark, sfDir)
      .withColumn("day", col("ts").cast("date").cast("string"))
    Sinks.appendPartitioned(df, dir, "day")
    val re = spark.read.parquet(dir)
    assert(re.count() == df.count())
    val oneDay = re.filter(col("day") === "2024-01-01")
    val plan = oneDay.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters"), plan)
    assert(oneDay.count() > 0)
  }

  test("mergeDim update vs ignore semantics across loads") {
    val path = Files.createTempDirectory("graft_dim").toString + "/dim"
    val v1 = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "name", "price")
    Sinks.mergeDim(spark, path, v1, Seq("k"), Seq("name", "price"))
    val delta = Seq((2L, "B", 9.0), (3L, "c", 3.0)).toDF("k", "name", "price")
    // SCD-1: 2 updates, 3 inserts
    val updated = Sinks.mergeDim(spark, path, delta, Seq("k"), Seq("name", "price"),
      Sinks.Update).orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(updated == Seq((1L, "a", 1.0), (2L, "B", 9.0), (3L, "c", 3.0)))
    // ignore: existing keys keep their values
    val delta2 = Seq((3L, "CLASH", 0.0), (4L, "d", 4.0)).toDF("k", "name", "price")
    val ignored = Sinks.mergeDim(spark, path, delta2, Seq("k"), Nil, Sinks.Ignore)
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(ignored == Seq((1L, "a", 1.0), (2L, "B", 9.0), (3L, "c", 3.0), (4L, "d", 4.0)))
  }

  test("mergeDimSurrogate: NULL natural key gets ONE surrogate across loads") {
    val path = Files.createTempDirectory("graft_dim_null").toString + "/dim"
    val load1 = Seq(Option("a"), Option("b"), Option.empty[String]).toDF("nk")
    val v1 = Sinks.mergeDimSurrogate(spark, path, load1, "nk", "guid")
    assert(v1.count() == 3)
    assert(v1.filter(col("nk").isNull).count() == 1)
    // re-deliver the same keys (incl. NULL) plus one new: only the new
    // key gets a surrogate; the NULL row is matched, not re-inserted
    val g1 = v1.filter(col("nk").isNull).select("guid").head().getLong(0)
    val load2 = Seq(Option("a"), Option.empty[String], Option("c")).toDF("nk")
    val v2 = Sinks.mergeDimSurrogate(spark, path, load2, "nk", "guid")
    assert(v2.count() == 4, v2.collect().toSeq.toString)
    assert(v2.filter(col("nk").isNull).count() == 1)
    // surrogates stay unique and stable
    assert(v2.select("guid").distinct().count() == 4)
    val g2 = v2.filter(col("nk").isNull).select("guid").head().getLong(0)
    assert(g1 == g2)
  }

  test("held merge result survives subsequent loads and compaction") {
    // regression: mergeDim/mergeDimSurrogate used to return a lazy
    // spark.read.parquet(path) whose file listing the NEXT swap renamed
    // away — any held handle then failed with FILE_NOT_EXIST
    val path = Files.createTempDirectory("graft_dim_held").toString + "/dim"
    val v1 = Sinks.mergeDim(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("k", "name"), Seq("k"), Seq("name"))
    val s1 = Sinks.mergeDimSurrogate(spark, path + "_s",
      Seq("x", "y").toDF("nk"), "nk", "guid")
    // second loads swap both table directories out from under any lazy reader
    Sinks.mergeDim(spark, path,
      Seq((2L, "B"), (3L, "c")).toDF("k", "name"), Seq("k"), Seq("name"))
    Sinks.mergeDimSurrogate(spark, path + "_s", Seq("z").toDF("nk"), "nk", "guid")
    Sinks.compact(spark, path, rowsPerFile = 1000L)
    // the held v1/s1 handles must still answer from their own snapshot
    assert(v1.orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    assert(s1.count() == 2)
    assert(s1.select("guid").distinct().count() == 2)
  }

  test("compaction shrinks file count and preserves rows") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    val df = Tables.lineitem(spark, sfDir)
    df.repartition(40).write.parquet(dir)
    def nFiles = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(nFiles == 40)
    val rows = Sinks.compact(spark, dir, rowsPerFile = 2000L)
    assert(rows == df.count())
    assert(nFiles == ((rows + 1999) / 2000).toInt)
    assert(spark.read.parquet(dir).count() == rows)
  }

  test("bucketed tables join with zero exchange") {
    Sinks.writeBucketed(
      Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
      "orders_b", "o_orderkey", 8)
    Sinks.writeBucketed(
      Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity"),
      "lineitem_b", "l_orderkey", 8)
    // at test scale the planner prefers broadcast; force the shuffle
    // path to show bucketing removes the hash Exchange
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_b").join(
        spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      assert(joined.count() == Tables.lineitem(spark, sfDir).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
