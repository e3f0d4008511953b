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

  test("mergeFactByDate: only touched date partitions are rewritten, the rest stay byte-identical") {
    val path = Files.createTempDirectory("graft_factpart").toString + "/fact"
    def day(s: String) = java.sql.Date.valueOf(s)
    val load1 = Seq(
      (1L, "p", 1L, day("2024-01-01"), 10.0),
      (2L, "p", 1L, day("2024-01-02"), 20.0),
      (3L, "q", 2L, day("2024-01-03"), 30.0)
    ).toDF("event_id", "pname", "pval", "event_date", "v")
    Sinks.mergeFactByDate(spark, path, load1,
      Seq("event_id", "pname", "pval"), Seq("v"))
    def files(d: String): Map[String, Long] = {
      val dir = new java.io.File(s"$path/event_date=$d")
      dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val before01 = files("2024-01-01")
    val before03 = files("2024-01-03")
    assert(before01.nonEmpty && before03.nonEmpty)
    Thread.sleep(1100) // mtime granularity guard
    // the drop touches ONLY 2024-01-02: one update + one insert there
    val delta = Seq(
      (2L, "p", 1L, day("2024-01-02"), 99.0),
      (4L, "r", 3L, day("2024-01-02"), 40.0)
    ).toDF("event_id", "pname", "pval", "event_date", "v")
    val merged = Sinks.mergeFactByDate(spark, path, delta,
      Seq("event_id", "pname", "pval"), Seq("v"))
    assert(merged.count() == 4)
    val got = merged.select("event_id", "v").orderBy("event_id")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 10.0), (2L, 99.0), (3L, 30.0), (4L, 40.0)))
    // untouched dates: same files, same mtimes — never rewritten
    assert(files("2024-01-01") == before01)
    assert(files("2024-01-03") == before03)
    // idempotent re-merge of the same drop
    val again = Sinks.mergeFactByDate(spark, path, delta,
      Seq("event_id", "pname", "pval"), Seq("v"))
    assert(again.select("event_id", "v").orderBy("event_id")
      .as[(Long, Double)].collect().toSeq == got)
  }

  test("mergeFactByDate: a crashed partition swap recovers from the external backup") {
    val path = Files.createTempDirectory("graft_factcrash").toString + "/fact"
    def day(s: String) = java.sql.Date.valueOf(s)
    val load1 = Seq(
      (1L, "p", day("2024-01-01"), 1.0),
      (2L, "p", day("2024-01-02"), 2.0)
    ).toDF("event_id", "pname", "event_date", "v")
    Sinks.mergeFactByDate(spark, path, load1,
      Seq("event_id", "pname"), Seq("v"))
    // simulate a crash window: partition dir renamed to the backup,
    // replacement never landed (the backup root is OUTSIDE the table
    // root, so partition discovery on the half-swapped table stays
    // valid — no `date=X.backup` pseudo-partition)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = new org.apache.hadoop.fs.Path(s"$path/event_date=2024-01-02")
    val backupRoot = new org.apache.hadoop.fs.Path(path + ".pbackup")
    fs.mkdirs(backupRoot)
    assert(fs.rename(part,
      new org.apache.hadoop.fs.Path(backupRoot, "event_date=2024-01-02")))
    assert(spark.read.parquet(path).count() == 1) // crash-window view
    // the next load recovers the partition BEFORE merging
    val delta = Seq((3L, "q", day("2024-01-03"), 3.0))
      .toDF("event_id", "pname", "event_date", "v")
    val merged = Sinks.mergeFactByDate(spark, path, delta,
      Seq("event_id", "pname"), Seq("v"))
    assert(merged.count() == 3)
    assert(!fs.exists(backupRoot))
  }

  test("mergeFactByDate rejects NULL partition dates in-plan") {
    val path = Files.createTempDirectory("graft_factnull").toString + "/fact"
    val bad = Seq((1L, Option(java.sql.Date.valueOf("2024-01-01")), 1.0),
      (2L, Option.empty[java.sql.Date], 2.0))
      .toDF("event_id", "event_date", "v")
    val ex = intercept[Exception] {
      Sinks.mergeFactByDate(spark, path, bad, Seq("event_id"), Seq("v"))
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("NULL event_date")), ex.toString)
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
