package graft

import graft.operators.{StarSchema, Views}
import graft.sources.{Sinks, Tables}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

/** The full reference ETL as one in-library batch pipeline.
  *
  * The reference chains seven Airflow DAGs with TriggerDagRunOperator
  * (raw ingest → d_event → d_item → d_parameter → d_user → f_events →
  * aggregated views; reference: each DAG under astro-sdk-tutorial/dags
  * ends with `trigger_dependent_dag`). Orchestration stays external by
  * design (BASELINE: "Spark jobs orchestrated by Airflow") — this runner
  * IS the job an orchestrator schedules daily: each stage is a separate
  * Spark action with the same dependency order, MERGE semantics per
  * table matching the reference's `if_conflicts` choices, and
  * re-runnable (idempotent) end to end.
  */
object Pipeline {

  case class StageResult(name: String, rows: Long, seconds: Double)

  private def timed(name: String)(f: => Long): StageResult = {
    val t0 = System.nanoTime()
    val rows = f
    StageResult(name, rows, (System.nanoTime() - t0) / 1e9)
  }

  /** Overwrite `path` and return the row count FROM THE WRITE PASS
    * itself (`Dataset.observe`): the count accumulates while the rows
    * stream through the writer, so the table is never read back and
    * the plan never runs twice. At 100 TB a read-back count doubles
    * the stage's I/O; an up-front `df.count()` doubles its compute.
    */
  private def overwrite(df: DataFrame, path: String): Long = {
    val obs = org.apache.spark.sql.Observation()
    df.observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("rows"))
      .write.mode(SaveMode.Overwrite).parquet(path)
    obs.get("rows").asInstanceOf[Long]
  }

  /** Stage names in dependency order — the public contract between
    * [[runDaily]], the per-stage CLI ([[main]] with a stage argument),
    * and the Airflow DAG (`dags/graft_daily_dag.py`, whose task ids a
    * spec checks against this list).
    */
  val StageNames: Seq[String] = Seq(
    "event_raw", "d_event", "d_user", "d_parameter", "d_item",
    "f_events", "view_yearly_counts", "view_item_rank",
    "view_top_item", "view_top_platform")

  /** One daily load: srcDir (raw drop) → warehouseDir (star schema +
    * views). Returns per-stage row counts and timings.
    */
  def runDaily(spark: SparkSession, srcDir: String, warehouseDir: String): Seq[StageResult] =
    runDailyLoad(spark, Tables.events(spark, srcDir),
      Tables.part(spark, srcDir), warehouseDir)

  /** [[runDaily]] over in-plan source frames instead of a source dir —
    * the entry point for PARTIAL drops (an incremental or LATE slice
    * of the day's events): the MERGE stages fold the slice into the
    * stored warehouse, the raw/view overwrite stages reflect the drop
    * (the reference's latest-drop-wins layer).
    */
  def runDailyLoad(spark: SparkSession, eventsRaw: DataFrame,
      part: DataFrame, warehouseDir: String): Seq[StageResult] = {
    // ONE parse, ONE view join per load: the chain's stages all derive
    // from the prepped drop (StarSchema.prep — JSON parsed once) and
    // the four views from one shared fact⋈dim frame. Both frames are
    // DROP-sized (never warehouse-sized), so pinning them for the
    // duration of the load is safe at any scale; without the pins the
    // chain re-scanned and re-parsed the raw drop in 9 of its 10
    // stages (guide §1.2 step 1: don't compute things twice).
    val (prepped, jf) = prepFrames(spark, eventsRaw, part)
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    prepped.persist(lvl)
    jf.persist(lvl)
    try {
      val stageMap = stagesPrepped(spark, prepped, jf, part, warehouseDir).toMap
      // run each phase's INDEPENDENT stages concurrently (guide §2.6:
      // actions are only sequential because driver code calls them
      // sequentially) — exactly the fan-out the orchestration contract
      // declares (dags/graft_daily_dag.py: event_raw >> the four dims;
      // d_event >> f_events; f_events >> the four views). Stages write
      // disjoint tables, so phase-internal order cannot change content;
      // the result list keeps StageNames order.
      val phases = Seq(
        Seq("event_raw"),
        Seq("d_event", "d_user", "d_parameter", "d_item"),
        Seq("f_events"),
        Seq("view_yearly_counts", "view_item_rank", "view_top_item",
          "view_top_platform"))
      phases.flatMap { names =>
        if (names.size == 1) Seq(timed(names.head)(stageMap(names.head)()))
        else {
          // materialize the shared view join once before the view fan-
          // out, so four concurrent first-readers don't race to fill
          // the same cache partitions with duplicate work
          if (names.head.startsWith("view")) { jf.count(); () }
          val pool = java.util.concurrent.Executors
            .newFixedThreadPool(names.size)
          implicit val ec: scala.concurrent.ExecutionContext =
            scala.concurrent.ExecutionContext.fromExecutorService(pool)
          try {
            val fs = names.map(n =>
              scala.concurrent.Future(timed(n)(stageMap(n)())))
            fs.map(f => scala.concurrent.Await.result(f,
              scala.concurrent.duration.Duration.Inf))
          } finally pool.shutdown()
        }
      }
    } finally {
      jf.unpersist(false)
      prepped.unpersist(false)
    }
  }

  /** Run ONE stage by name — the spark-submit unit an external
    * orchestrator (Airflow, cron, anything) schedules; stage ordering
    * is the orchestrator's contract (see `dags/graft_daily_dag.py`).
    */
  def runStage(spark: SparkSession, srcDir: String, warehouseDir: String,
      stage: String): StageResult = {
    // single-stage path: the shared frames stay LAZY (no persist — a
    // lone stage has no reuse to amortize, and an orchestrator-driven
    // per-stage run must not leak pinned blocks past its stage)
    val (prepped, jf) = prepFrames(spark,
      Tables.events(spark, srcDir), Tables.part(spark, srcDir))
    val all = stagesPrepped(spark, prepped, jf,
      Tables.part(spark, srcDir), warehouseDir).toMap
    require(all.contains(stage),
      s"unknown stage '$stage' (expected one of ${StageNames.mkString(", ")})")
    timed(stage)(all(stage)())
  }

  /** The two frames every stage derives from: the one-parse prepped
    * drop and the shared view-layer fact⋈dim join.
    */
  private def prepFrames(spark: SparkSession, eventsRaw: DataFrame,
      part: DataFrame): (DataFrame, DataFrame) = {
    // NULL natural keys can't join the star schema (null-unsafe merge
    // and fact↔dim joins would silently drop them) — exclude up front;
    // Quality.notNull is the check that surfaces them to operators
    val events = eventsRaw
      .filter(org.apache.spark.sql.functions.col("event_id").isNotNull)
    val prepped = StarSchema.prep(events)
    (prepped, Views.viewJoinedPrepped(prepped, part))
  }

  private def stagesPrepped(spark: SparkSession, prepped: DataFrame,
      jf: DataFrame, part: DataFrame, warehouseDir: String): Seq[(String, () => Long)] = {
    val w = warehouseDir.stripSuffix("/")

    Seq(
      // raw layer: full overwrite, latest drop wins (reference:
      // etl_s3_snowflake_raw_event_ingest.py "overwrite mode")
      "event_raw" -> (() => overwrite(StarSchema.rawIngestPrepped(prepped), s"$w/event_raw")),
      // dims keyed on their natural key, insert-if-absent with
      // surrogate ids that stay stable across incremental drops (new
      // keys continue after the stored max — never renumbered)
      // d_event is one row per EVENT — fact-sized, so don't pin the
      // returned frame in the block manager (pinResult = false); the
      // count below is its only consumer before the next load
      "d_event" -> (() => Sinks.mergeDimSurrogate(spark, s"$w/d_event",
        prepped.select("event_id"), "event_id", "guid_event",
        pinResult = false).count()),
      "d_user" -> (() => Sinks.mergeDimSurrogate(spark, s"$w/d_user",
        prepped.select("user_id"), "user_id", "guid_user").count()),
      "d_parameter" -> (() => Sinks.mergeDimSurrogate(spark, s"$w/d_parameter",
        StarSchema.parameterNamesPrepped(prepped), "parameter_name", "guid_parameter").count()),
      // item dim: SCD-1 update on item_id
      "d_item" -> (() => Sinks.mergeDim(spark, s"$w/d_item",
        StarSchema.dItem(part), Seq("item_id"),
        Seq("item_name", "item_brand", "item_type", "item_size", "item_price"),
        Sinks.Update).count()),
      // fact: SCD-1 update on the composite event/parameter key; the
      // surrogate comes from the STABLE d_event dim (merged above), so
      // fact guids are unique and never renumbered across drops
      "f_events" -> (() => {
        // d_event is one row per event — fact-sized, so this is a
        // shuffle join on the key, NOT a broadcast
        val dEvent = spark.read.parquet(s"$w/d_event")
        val withGuid = StarSchema.fEventsFlatPrepped(prepped)
          .join(dEvent, Seq("event_id"))
          // partition date derives from the immutable event time, so a
          // drop only ever touches its own dates — the precondition
          // that makes the partition-scoped MERGE exact
          .withColumn("event_date",
            org.apache.spark.sql.functions.to_date(
              org.apache.spark.sql.functions.col("event_time")))
        // PARTITION-SCOPED merge: only the drop's event dates are
        // read or rewritten; at 100 TB the stage cost scales with the
        // DROP, not the warehouse (a full-table stage-and-swap here
        // rewrote the entire fact per daily load)
        Sinks.mergeFactByDate(spark, s"$w/f_events", withGuid,
          Seq("event_id", "event_parameter_name", "event_parameter_value"),
          Seq("event_time", "event_user_id", "event_name", "event_value", "guid_event"))
          .count()
      }),
      // the four analytic views, rebuilt per load — all derived from
      // the ONE shared fact⋈dim frame (jf)
      "view_yearly_counts" -> (() =>
        overwrite(Views.yearlyCountsFrom(jf), s"$w/view_yearly_counts")),
      "view_item_rank" -> (() =>
        overwrite(Views.itemRankFrom(jf), s"$w/view_item_rank")),
      "view_top_item" -> (() =>
        overwrite(Views.topItemFrom(jf), s"$w/view_top_item")),
      "view_top_platform" -> (() =>
        overwrite(Views.topPlatformFrom(jf), s"$w/view_top_platform"))
    )
  }

  /** Content summary of a warehouse built by [[runDaily]] — one row per
    * table: row count, key cardinality, a surrogate/key checksum, and
    * an exact-DECIMAL value checksum (doubles only after the sum, so
    * partition sum order can't move a bit). This is the gate surface
    * for the CHAINED pipeline: the numbers only come out right if
    * stage ordering holds (f_events joins the MERGED d_event — its
    * key_sum is the guid sum THROUGH that join), each table's MERGE
    * mode is right, and a re-run is idempotent. Surrogate dims check
    * as n·(n+1)/2 — dense ids from an empty warehouse — so any
    * renumbering or double-insert shifts key_sum.
    */
  def warehouseSummary(spark: SparkSession, warehouseDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val w = warehouseDir.stripSuffix("/")
    def read(t: String) = spark.read.parquet(s"$w/$t")
    def row(tbl: String, df: DataFrame, nKeys: Column, keySum: Column,
        valSum: Column): DataFrame =
      df.agg(count(lit(1)).as("n_rows"), nKeys.cast("long").as("n_keys"),
          keySum.cast("long").as("key_sum"),
          round(valSum.cast("double"), 4).as("val_sum"))
        .select(lit(tbl).as("tbl"), col("n_rows"), col("n_keys"),
          col("key_sum"), col("val_sum"))
    Seq(
      row("event_raw", read("event_raw"), countDistinct(col("event_id")),
        sum(col("guid_event_raw")), sum(col("value").cast("decimal(18,6)"))),
      row("d_event", read("d_event"), countDistinct(col("event_id")),
        sum(col("guid_event")), lit(0.0)),
      row("d_user", read("d_user"), countDistinct(col("user_id")),
        sum(col("guid_user")), lit(0.0)),
      row("d_parameter", read("d_parameter"),
        countDistinct(col("parameter_name")), sum(col("guid_parameter")),
        lit(0.0)),
      row("d_item", read("d_item"), countDistinct(col("item_id")),
        sum(col("item_id")), sum(col("item_price").cast("decimal(18,2)"))),
      row("f_events", read("f_events"), countDistinct(col("event_id")),
        sum(col("guid_event")), sum(col("event_value").cast("decimal(18,6)"))),
      row("view_yearly_counts", read("view_yearly_counts"),
        countDistinct(col("period_day")), sum(col("item_views")), lit(0.0)),
      row("view_item_rank", read("view_item_rank"),
        countDistinct(col("item_name")),
        sum(col("item_views") * col("item_view_rank")), lit(0.0)),
      row("view_top_item", read("view_top_item"),
        countDistinct(col("item_name")), sum(col("item_views")), lit(0.0)),
      row("view_top_platform", read("view_top_platform"),
        countDistinct(col("period_day")), sum(col("platform_views")),
        lit(0.0))
    ).reduce(_.unionByName(_))
  }

  /** CLI: runDaily(srcDir, warehouseDir). */
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: graft.Pipeline <srcDir> <warehouseDir> [stage]")
      sys.exit(2)
    }
    val Array(srcDir, outDir) = args.take(2)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    // with a stage argument, run exactly that stage (the Airflow task
    // unit — dags/graft_daily_dag.py passes one per task); without,
    // the whole chain in dependency order
    val results = args.lift(2) match {
      case Some(stage) => Seq(runStage(spark, srcDir, outDir, stage))
      case None => runDaily(spark, srcDir, outDir)
    }
    results.foreach(r =>
      println(f"[pipeline] ${r.name}%-22s ${r.rows}%9d rows ${r.seconds}%7.2f s"))
    spark.stop()
  }
}
