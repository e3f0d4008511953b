package graft.sources

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Train-once / serve-many persistence for the IVF ANN index — the
  * production shape [[graft.operators.Similarity.ivfTrainedTopK]]
  * lacks (it retrains its k-means inside every query).
  *
  * Layout under `path`:
  *
  *  - `centroids/` — (cell, cvec: array<double>) parquet, one row per
  *    trained cell, 6-dp rounded (the same construction as the
  *    in-query coarse quantizer, so a replay that retrains arrives at
  *    byte-identical centroids).
  *  - `cells/` — (vec_id, embedding) parquet PARTITIONED BY cell: the
  *    inverted lists ARE a cell-partitioned copy of the corpus. A
  *    serve-time probe touches `nprobe` cells, so the scan prunes to
  *    nprobe/cells of the data by layout alone (dynamic partition
  *    pruning at cluster scale — the partition filter comes from the
  *    probed-cells join).
  *
  * Determinism: training is [[Similarity.kmeansAssign]] (lowest-id
  * seeds, per-round rounding), so rebuilding from the same corpus
  * reproduces the stored tables exactly — which is what lets a served
  * query keep a full value-level oracle: the oracle retrains in SQL
  * and lands on the same index contents.
  *
  * [[ensure]] builds at most once per JVM per path (a concurrent map
  * guards re-entry): the first caller trains and persists, every
  * later caller — including later bench reps and other queries in the
  * same session — pays only the serve-time probe. On-disk leftovers
  * from an EARLIER process are rebuilt over, never trusted.
  */
object IvfIndexStore {

  private val built = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Deterministic per-(dataset, params) index location under the JVM
    * temp dir.
    */
  def defaultPath(datasetDir: String, cells: Int = 8, iters: Int = 3): String =
    StorePaths.keyedTmp("ivf", datasetDir, s"_c${cells}_i$iters")

  /** Train the coarse quantizer and persist (centroids, cell lists) —
    * plus the PQ layer: `grid/` (the per-dimension int8 min/max law)
    * and `codes/` (cell-partitioned int8 codes, the memory-bounded
    * representation [[servedPqTopK]] scans instead of full vectors —
    * d bytes per vector instead of 4d).
    */
  def build(emb: DataFrame, path: String, cells: Int = 8,
      iters: Int = 3): Unit = {
    val assign = Similarity.kmeansAssign(emb, cells, iters)
      .select(col("vec_id"), col("cluster").as("cell"))
    val labeled = emb.join(assign, Seq("vec_id"))
      .select(col("vec_id"), col("embedding"), col("cell"))
    labeled.write.mode(SaveMode.Overwrite)
      .partitionBy("cell").parquet(s"$path/cells")
    Similarity.cellCentroids(labeled, "cell")
      .write.mode(SaveMode.Overwrite).parquet(s"$path/centroids")
    val stats = labeled
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x")).cast("double").as("mn"),
        max(col("x")).cast("double").as("mx"))
    stats.write.mode(SaveMode.Overwrite).parquet(s"$path/grid")
    writeCodes(labeled, stats, path, SaveMode.Overwrite)
  }

  /** Encode against the grid and land the int8 `codes/` layer. The
    * clamp to [0, 255] is a no-op for the build (the grid IS the
    * corpus min/max) and the honest int8 bound for appended vectors
    * that fall outside the frozen grid's range.
    */
  private def writeCodes(labeled: DataFrame, stats: DataFrame, path: String,
      mode: SaveMode): Unit = {
    val gridRow = spark_grid(stats)
    val code = zip_with(col("embedding"), col("ms"), (x, m) => {
      val step = (m.getField("mx") - m.getField("mn")) / 255d
      when(m.getField("mx") === m.getField("mn"), lit(0))
        .otherwise(greatest(lit(0), least(lit(255),
          floor((x.cast("double") - m.getField("mn")) / step + 0.5d)
            .cast("int"))))
    })
    labeled.crossJoin(broadcast(gridRow))
      .select(col("vec_id"), col("cell"), code.as("codes"))
      .write.mode(mode)
      .partitionBy("cell").parquet(s"$path/codes")
  }

  /** Nearest STORED centroid per row — the append-time coarse
    * assignment. Same math as a [[Similarity.kmeansAssign]] assignment
    * round (4-dp-rounded squared distance, argmin with ties on cell
    * asc), but run against the index's persisted `centroids/` instead
    * of a retrain: appending must never move the quantizer.
    */
  private def assignStored(rows: DataFrame, cents: DataFrame): DataFrame = {
    import graft.functions.{VectorFunctions => VF}
    rows.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"),
        VF.asDouble(col("embedding")).as("x"),
        VF.dot(col("embedding"), col("embedding")).as("xx"))
      .crossJoin(broadcast(
        cents.withColumn("cc", VF.dot(col("cvec"), col("cvec")))))
      .select(col("vec_id"), col("embedding"),
        round(col("xx") - lit(2.0) * VF.dot(col("x"), col("cvec"))
          + col("cc"), 4).as("d2"),
        col("cell"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cell"), col("embedding"))).as("m"))
      .select(col("vec_id"), col("m.embedding").as("embedding"),
        col("m.cell").as("cell"))
  }

  /** Fold a new drop INTO the stored index without retraining: each
    * delta vector is assigned to its nearest STORED centroid
    * ([[assignStored]] — the quantizer and the int8 grid stay FROZEN
    * at their build-time values, the production semantics of an index
    * append), then lands in the same cell-partitioned `cells/` and
    * `codes/` layouts. Centroids/grid are never rewritten, so a serve
    * after an append reads the identical quantizer — spec-pinned,
    * plus a tamper test proving the stored centroids (not a retrain)
    * drive the assignment. Periodic RE-TRAINS (when drift degrades
    * recall) are a fresh [[build]]; the recall eval loop
    * (`knn_recall`) is the drift detector.
    */
  /** Frozen-quantizer cell assignment for a delta — [[append]]'s
    * assignment law WITHOUT the fold (read-only): each row lands in
    * its nearest STORED centroid's cell (4dp-rounded d2 argmin, ties
    * to the lowest cell id). What an incremental consumer
    * ([[graft.operators.Dedup.semanticNearDupsDelta]]) uses to route a
    * drop against the stored cell lists before deciding anything.
    */
  def assignCells(spark: SparkSession, rows: DataFrame,
      path: String): DataFrame =
    assignStored(rows, centroidsTable(spark, path))
      .select(col("vec_id"), col("cell"))

  def append(spark: SparkSession, delta: DataFrame, path: String): Unit =
    IndexLease.withLease(spark, path, "ivf-append") {
      val labeled = assignStored(delta, centroidsTable(spark, path))
        .select(col("vec_id"), col("embedding"), col("cell"))
      labeled.write.mode(SaveMode.Append)
        .partitionBy("cell").parquet(s"$path/cells")
      writeCodes(labeled, spark.read.parquet(s"$path/grid"), path,
        SaveMode.Append)
    }

  /** Memoized build-then-append lifecycle for the rollover gate: train
    * on the base corpus once per JVM per path, fold the drop in via
    * [[append]]; later callers serve from the rolled index.
    */
  def ensureRolled(spark: SparkSession, base: DataFrame, delta: DataFrame,
      path: String, cells: Int = 8, iters: Int = 3): Unit = {
    require(!built.containsKey(s"plain:$path"),
      s"$path was built by ensure; use a distinct path per lifecycle")
    built.computeIfAbsent(s"rolled:$path", _ => {
      build(base, path, cells, iters)
      append(spark, delta, path)
      java.lang.Boolean.TRUE
    })
    ()
  }

  /** The retrain LOOP closed as an action: roll the index (build on
    * the base, frozen-quantizer [[append]] of the drop), MEASURE its
    * recall@5 against brute force over the union, and when the rolled
    * recall sits below `threshold`, rebuild the quantizer over the
    * whole union — the "periodic retrain when recall degrades" the
    * append contract promises. The decision (measured drift + whether
    * the trigger fired) persists beside the indexes, so the serve path
    * ([[servedAfterRetrain]]) is a pure read of stored state.
    *
    * The recall probe is a driver-side action by design: in
    * production the number comes off the eval dashboard
    * (`knn_ivf_append_recall`); here the loop runs it inline, bounded
    * by the probe subset (8 query vectors × k).
    */
  def ensureRetrained(spark: SparkSession, base: DataFrame,
      delta: DataFrame, path: String, threshold: Double = 0.95,
      cells: Int = 8, iters: Int = 3): Unit = {
    built.computeIfAbsent(s"retrain:$path", _ => {
      import org.apache.spark.sql.functions.{avg, col}
      build(base, s"$path/rolled", cells, iters)
      append(spark, delta, s"$path/rolled")
      val union = base.unionByName(delta)
      val probes = union.filter(col("vec_id") < 8)
      val rolledRecall = Similarity.recallOf(
          Similarity.bruteForceTopK(union, col("vec_id") < 8),
          servedTopK(spark, s"$path/rolled", probes), 5)
        .agg(avg(col("recall_at_5"))).head().getDouble(0)
      val retrain = rolledRecall < threshold
      if (retrain) build(union, s"$path/full", cells, iters)
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(
        new org.apache.hadoop.fs.Path(s"$path/decision.json"), true)
      out.write(
        s"""{"rolled_recall":$rolledRecall,"threshold":$threshold,"retrained":$retrain}"""
          .getBytes("UTF-8"))
      out.close()
      java.lang.Boolean.TRUE
    })
    ()
  }

  /** The persisted retrain decision: (measured rolled recall, fired). */
  def retrainDecision(spark: SparkSession, path: String): (Double, Boolean) = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(s"$path/decision.json"))
    val txt = scala.io.Source.fromInputStream(in).mkString
    in.close()
    val recall = """"rolled_recall":([0-9.eE+-]+)""".r
      .findFirstMatchIn(txt).get.group(1).toDouble
    (recall, txt.contains(""""retrained":true"""))
  }

  /** Serve from whichever index the retrain decision picked. */
  def servedAfterRetrain(spark: SparkSession, path: String,
      probeRows: DataFrame, k: Int = 5, nprobe: Int = 2): DataFrame = {
    val sub = if (retrainDecision(spark, path)._2) "full" else "rolled"
    servedTopK(spark, s"$path/$sub", probeRows, k, nprobe)
  }

  /** One-row (pos, mn, mx)-struct-list frame from the grid stats —
    * broadcast beside every row that quantizes or dequantizes.
    */
  private def spark_grid(stats: DataFrame): DataFrame =
    stats.agg(sort_array(collect_list(
      struct(col("pos"), col("mn"), col("mx")))).as("ms"))

  /** [[build]] at most once per JVM per path. `computeIfAbsent` is the
    * memo: the first caller runs the build INSIDE the map's per-key
    * lock, so a concurrent second caller blocks until the index is
    * fully on disk rather than serving a half-written one. A build
    * that throws leaves no entry behind, so the next caller retries.
    */
  def ensure(emb: DataFrame, path: String, cells: Int = 8,
      iters: Int = 3): Unit = {
    // lifecycle-qualified memo key: ensure and ensureRolled can never
    // silently satisfy each other's contract on a shared path
    require(!built.containsKey(s"rolled:$path"),
      s"$path was built by ensureRolled; use a distinct path per lifecycle")
    built.computeIfAbsent(s"plain:$path", _ => {
      build(emb, path, cells, iters)
      java.lang.Boolean.TRUE
    })
    ()
  }

  /** The stored inverted lists; the partition column comes back as the
    * directory value, cast to the trained cell id type. Retracted
    * vectors ([[delete]]) are masked by a broadcast anti-join on the
    * tombstone list — the serve plan never sees their rows, without
    * rewriting a single list file.
    */
  def cellsTable(spark: SparkSession, path: String): DataFrame =
    maskTombstones(spark, path,
      spark.read.parquet(s"$path/cells")
        // a batch-keyed store ([[appendCellsBatch]]) exposes its layer
        // key as a `batch` partition column — serve-side consumers
        // never need it (no-op on a flat store)
        .drop("batch")
        .withColumn("cell", col("cell").cast("long")))

  /** [[cellsTable]] minus one batch layer — what a streamed maintainer
    * serves its OWN micro-batch against (the `bandsTableExcluding`
    * recompute-identity law, applied to the cell lists): if the
    * batch's fold landed but the checkpoint commit did not, a
    * redelivered batch would see its own vectors stored and re-emit
    * every drop-internal pair through the stored×drop join. On first
    * delivery the layer does not exist and the exclusion is a no-op
    * (base layer is `batch=-1`, stream ids are ≥ 0); the filter lands
    * on the `batch` partition column, so the excluded layer's files
    * are pruned, never scanned.
    */
  def cellsTableExcluding(spark: SparkSession, path: String,
      batchId: Long): DataFrame =
    maskTombstones(spark, path,
      spark.read.parquet(s"$path/cells")
        .filter(col("batch") =!= batchId)
        .drop("batch")
        .withColumn("cell", col("cell").cast("long")))

  /** [[build]] in the batch-keyed layout (cell lists under
    * `cells/batch=-1/`, centroids flat) — the starting point for a
    * store maintained by a stream of [[appendCellsBatch]] folds. The
    * PQ layers (`grid/`, `codes/`) belong to the plain serve
    * lifecycle and are not written here: the streamed near-dup
    * maintainer reads cells + centroids only.
    */
  def buildKeyed(emb: DataFrame, path: String, cells: Int = 8,
      iters: Int = 3): Unit = {
    val assign = Similarity.kmeansAssign(emb, cells, iters)
      .select(col("vec_id"), col("cluster").as("cell"))
    val labeled = emb.join(assign, Seq("vec_id"))
      .select(col("vec_id"), col("embedding"), col("cell"))
    StoreLayout.assertWritable(emb.sparkSession, path, "cells", keyed = true)
    labeled.write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(StoreLayout.batchDir(path, "cells", -1L))
    Similarity.cellCentroids(labeled, "cell")
      .write.mode(SaveMode.Overwrite).parquet(s"$path/centroids")
  }

  /** Fold one micro-batch's vectors into the keyed cell lists —
    * frozen-quantizer assignment ([[assignCells]]' law), landed with
    * Overwrite in the batch's OWN `cells/batch=<id>/` subdir so a
    * crash-redelivered batch re-lands its layer instead of
    * double-appending (the StoreLayout discipline).
    */
  def appendCellsBatch(spark: SparkSession, delta: DataFrame, path: String,
      batchId: Long): Unit =
    IndexLease.withLease(spark, path, "ivf-append-batch") {
      StoreLayout.assertWritable(spark, path, "cells", keyed = true)
      assignStored(delta, centroidsTable(spark, path))
        .select(col("vec_id"), col("embedding"), col("cell"))
        .write.mode(SaveMode.Overwrite).partitionBy("cell")
        .parquet(StoreLayout.batchDir(path, "cells", batchId))
    }

  private def maskTombstones(spark: SparkSession, path: String,
      rows: DataFrame): DataFrame =
    if (hasTombstones(spark, path))
      rows.join(broadcast(tombstonesTable(spark, path)),
        Seq("vec_id"), "left_anti")
    else rows

  private def hasTombstones(spark: SparkSession, path: String): Boolean =
    Tombstones.exists(spark, path)

  private def tombstonesTable(spark: SparkSession, path: String): DataFrame =
    Tombstones.liveMask(spark, path, "vec_id")

  /** Retract vectors from the index — takedowns / right-to-be-
    * forgotten, deletion-vector style: ids append to `tombstones/`
    * (O(|retraction|) write) and BOTH stored representations mask on
    * read ([[cellsTable]] for full-precision lists, the `codes/` scan
    * inside [[servedPqTopK]]). Centroids and the int8 grid stay
    * FROZEN — a takedown masks rows, it never moves the quantizer
    * (periodic retrains remain the recall loop's job). Run
    * [[compact]] when the list outgrows broadcast size.
    */
  def delete(vecIds: DataFrame, path: String): Unit =
    IndexLease.withLease(vecIds.sparkSession, path, "ivf-delete") {
      Tombstones.append(vecIds, path, "vec_id")
    }

  /** Fold outstanding tombstones into the files: rewrite `cells/` and
    * `codes/` without the retracted vectors, then clear the tombstone
    * list — zero masking overhead afterwards and the retracted rows
    * are physically gone (the retention guarantee takedowns need).
    * Runs under the store's single-writer [[IndexLease]] (a racing
    * [[append]] serializes against the two-layer swap) and repairs any
    * stranded crash layout via [[SwapRecovery.recover]] per layer
    * BEFORE starting; each rename is checked so a failure aborts
    * before anything destructive.
    */
  def compact(spark: SparkSession, path: String): Unit =
    IndexLease.withLease(spark, path, "ivf-compact") {
      // tombstones are deleted LAST, so every strandable crash layout
      // still has them — no tombstones means nothing to repair or fold
      if (hasTombstones(spark, path)) {
        SwapRecovery.recover(spark, path, "cells")
        SwapRecovery.recover(spark, path, "codes")
        val fs = SwapRecovery.fsOf(spark, path)
        def swap(layer: String, masked: DataFrame): Unit = {
          masked.write.mode(SaveMode.Overwrite)
            .partitionBy("cell").parquet(s"$path/${layer}_compacted")
          SwapRecovery.renameOrThrow(fs,
            new org.apache.hadoop.fs.Path(s"$path/$layer"),
            new org.apache.hadoop.fs.Path(s"$path/${layer}_old"))
          SwapRecovery.renameOrThrow(fs,
            new org.apache.hadoop.fs.Path(s"$path/${layer}_compacted"),
            new org.apache.hadoop.fs.Path(s"$path/$layer"))
          fs.delete(new org.apache.hadoop.fs.Path(s"$path/${layer}_old"), true)
          ()
        }
        swap("cells", cellsTable(spark, path))
        swap("codes", maskTombstones(spark, path,
          spark.read.parquet(s"$path/codes")
            .withColumn("cell", col("cell").cast("long"))))
        Tombstones.clear(spark, path)
      }
    }

  /** Memoized build-then-delete lifecycle for the retraction gate: the
    * first caller per JVM per path trains + persists over the corpus
    * and then retracts `removed` via [[delete]]; later callers serve
    * from the masked index.
    */
  def ensureDeleted(corpus: DataFrame, removed: DataFrame, path: String,
      cells: Int = 8, iters: Int = 3): Unit = {
    require(!built.containsKey(s"plain:$path") &&
      !built.containsKey(s"rolled:$path"),
      s"$path was built by another lifecycle; use a distinct path")
    built.computeIfAbsent(s"deleted:$path", _ => {
      StorePaths.wipe(corpus.sparkSession, path) // first caller OWNS the path
      build(corpus, path, cells, iters)
      delete(removed, path)
      java.lang.Boolean.TRUE
    })
    ()
  }

  def centroidsTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/centroids")
      .withColumn("cell", col("cell").cast("long"))

  /** Serve top-k from the STORED index: no training in the plan — the
    * quantizer is a parquet scan of `centroids/`, the candidate search
    * a cell-pruned scan of `cells/`.
    */
  def servedTopK(spark: SparkSession, path: String, probeRows: DataFrame,
      k: Int = 5, nprobe: Int = 2): DataFrame =
    Similarity.ivfSearch(cellsTable(spark, path),
      centroidsTable(spark, path), probeRows, k, nprobe)

  /** Serve top-k from the stored PQ layer: the probed cells are scanned
    * on STORED int8 codes (dequantized against the broadcast grid —
    * the candidate scan reads d bytes per vector, not 4d), the ADC
    * top-`rerank` survivors fetch full precision from `cells/` for the
    * exact re-rank, and nothing trains or re-encodes in the plan. The
    * arithmetic mirrors [[graft.operators.Similarity.ivfPqTopK]]
    * value-for-value (codes store the same `floor((x-mn)/step + .5)`
    * grid cell that the in-query form computes inline), so the oracle
    * that replays the trained pipeline also pins the served one.
    */
  def servedPqTopK(spark: SparkSession, path: String, probeRows: DataFrame,
      k: Int = 5, nprobe: Int = 2, rerank: Int = 15): DataFrame = {
    import graft.functions.{VectorFunctions => VF}
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val probed = Similarity.probeCells(centroidsTable(spark, path),
      probeRows, nprobe)
    val gridRow = spark_grid(spark.read.parquet(s"$path/grid"))
    val codes = maskTombstones(spark, path,
      spark.read.parquet(s"$path/codes")
        .withColumn("cell", col("cell").cast("long")))
    val recon = zip_with(col("codes"), col("ms"), (c, m) => {
      val step = (m.getField("mx") - m.getField("mn")) / 255d
      when(m.getField("mx") === m.getField("mn"), m.getField("mn"))
        .otherwise(m.getField("mn") + c.cast("double") * step)
    })
    // decode at CANDIDATE grain, not per (probe × candidate): the
    // reconstruction and its norm are pure functions of (codes, grid),
    // so each lands once per code row — the pre-r15 form evaluated the
    // interpreted zip_with decode TWICE per probe pair (dot + norm),
    // which dominated the ADC cut at the ~sf100 decade (22 s; the
    // probe-pair work is now one codegen graft_dot_dd per pair).
    // Separate selects on purpose: CollapseProject would otherwise
    // inline the non-cheap decode back into its two consumers.
    val decoded = codes
      .crossJoin(broadcast(gridRow))
      .select(col("cell"), col("vec_id"), recon.as("rv"))
      .select(col("cell"), col("vec_id"), col("rv"),
        sqrt(call_function("graft_dot_dd", col("rv"), col("rv"))).as("rnrm"))
    // the probe side converts to double ONCE (broadcast, bounded):
    // graft_dot_dd(probe_xd, rv) accumulates the identical product
    // sequence as the interpreted fold over (float probe, double rv)
    // after the exact float→double promotion — bit-identical, oracle
    // untouched
    val probedX = probed.withColumn("probe_xd", VF.asDouble(col("probe_emb")))
    val adc = decoded.join(broadcast(probedX), Seq("cell"))
      .filter(col("probe_id") =!= col("vec_id"))
      .select(col("probe_id"), col("vec_id").as("cand_id"),
        round(call_function("graft_dot_dd", col("probe_xd"), col("rv"))
          / (col("probe_dnrm") * col("rnrm")), 4).as("adc_cosine"))
      .filter(col("adc_cosine").isNotNull)
    val topm = graft.plans.TopKPlanner
      .perGroup(adc, "probe_id", "adc_cosine", "cand_id", rerank)
      .drop("rnk")
    val cands = cellsTable(spark, path)
      .select(col("vec_id").as("cand_id"), col("embedding").as("cand_emb"),
        VF.normNative(col("embedding")).as("cand_nrm"))
    val probesExact = probeRows
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"),
        VF.normNative(col("embedding")).as("probe_nrm"))
    val exact = cands.join(broadcast(topm), Seq("cand_id"))
      .join(broadcast(probesExact), Seq("probe_id"))
      .select(col("probe_id"), col("cand_id"), col("adc_cosine"),
        round(VF.dotNative(col("probe_emb"), col("cand_emb"))
          / (col("probe_nrm") * col("cand_nrm")), 4).as("cosine"))
      .filter(col("cosine").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    exact.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }
}
