package graft

import org.apache.spark.sql.SparkSession

/** Tuned session factory.
  *
  * Encodes the engine's recommended configuration: AQE (runtime
  * re-planning + skew-join splitting), partition sizing for the target
  * scale, and graft's native expressions registered via
  * [[graft.plans.GraftExtensions]]. On a cluster, set
  * `shufflePartitions` to ~2-3× total executor cores and leave
  * `maxPartitionBytes` at 128m so scan tasks stay memory-bounded
  * regardless of input size.
  */
object GraftSession {

  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "134217728")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def local(shufflePartitions: Int = 32): SparkSession = {
    val s = builder(s"local[$shufflePartitions]", shufflePartitions).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.plans.GraftFunctions.ensureRegistered(s)
    s
  }
}
