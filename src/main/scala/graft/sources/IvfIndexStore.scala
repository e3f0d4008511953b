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
  def defaultPath(datasetDir: String, cells: Int = 8, iters: Int = 3): String = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(datasetDir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      .take(12)
    s"${sys.props("java.io.tmpdir")}/graft_ivf_${key}_c${cells}_i$iters"
  }

  /** Train the coarse quantizer and persist (centroids, cell lists). */
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
  }

  /** [[build]] at most once per JVM per path. `computeIfAbsent` is the
    * memo: the first caller runs the build INSIDE the map's per-key
    * lock, so a concurrent second caller blocks until the index is
    * fully on disk rather than serving a half-written one. A build
    * that throws leaves no entry behind, so the next caller retries.
    */
  def ensure(emb: DataFrame, path: String, cells: Int = 8,
      iters: Int = 3): Unit =
    built.computeIfAbsent(path, _ => {
      build(emb, path, cells, iters)
      java.lang.Boolean.TRUE
    })

  /** The stored inverted lists; the partition column comes back as the
    * directory value, cast to the trained cell id type.
    */
  def cellsTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/cells")
      .withColumn("cell", col("cell").cast("long"))

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
}
