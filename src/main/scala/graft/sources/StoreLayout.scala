package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Layout discipline for store layers that can be written two ways:
  * FLAT (every mutation appends files to `<layer>/` — the batch
  * lifecycle) or BATCH-KEYED (every mutation overwrites its own
  * `<layer>/batch=<id>/` subdir — the streamed-maintenance lifecycle,
  * where keying by micro-batch id makes a crash-redelivered batch
  * OVERWRITE its own layer instead of double-appending; for abelian
  * count/moment state a double fold silently corrupts sums, so
  * redelivery idempotence has to come from the layout, not a
  * marker-file guard with a crash window between append and marker).
  *
  * The two layouts MUST NOT mix in one layer: Spark's partition
  * discovery over a dir holding both root-level files and `batch=`
  * subdirs silently reads ONLY the keyed side (measured — the flat
  * rows vanish without an error). [[assertWritable]] makes the mistake
  * loud at write time instead.
  */
private[sources] object StoreLayout {

  def batchDir(path: String, layer: String, batchId: Long): String =
    s"$path/$layer/batch=$batchId"

  /** True iff the layer exists and holds `batch=` keyed subdirs. */
  def isKeyed(spark: SparkSession, path: String, layer: String): Boolean =
    visibleChildren(spark, path, layer)
      .exists(c => c.isDirectory && c.getPath.getName.startsWith("batch="))

  private def visibleChildren(spark: SparkSession, path: String,
      layer: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val fs = SwapRecovery.fsOf(spark, path)
    try fs.listStatus(new Path(s"$path/$layer")).toSeq
      .filterNot { c =>
        val n = c.getPath.getName
        n.startsWith("_") || n.startsWith(".")
      }
    catch { case _: java.io.FileNotFoundException => Seq.empty }
  }

  /** Refuse a write that would mix layouts in one layer. `keyed` is
    * the layout the caller is about to write.
    */
  def assertWritable(spark: SparkSession, path: String, layer: String,
      keyed: Boolean): Unit = {
    val children = visibleChildren(spark, path, layer)
    val hasKeyed = children
      .exists(c => c.isDirectory && c.getPath.getName.startsWith("batch="))
    val hasFlat = children
      .exists(c => !(c.isDirectory && c.getPath.getName.startsWith("batch=")))
    if (keyed && hasFlat)
      throw new IllegalStateException(
        s"$path/$layer holds FLAT layer files; a batch-keyed write would " +
          "make Spark's partition discovery silently drop them — use the " +
          "flat mutators on this store, or compact/rebuild it keyed first")
    if (!keyed && hasKeyed)
      throw new IllegalStateException(
        s"$path/$layer is batch-keyed; a flat layer write would be " +
          "silently dropped by partition discovery — use the store's " +
          "*Batch mutators on this path")
  }
}
