package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded (interval) range join — pairs within a time radius.
  *
  * A naive `a.ts BETWEEN b.ts - r AND b.ts + r` join is a cartesian
  * product with a filter. The scalable plan buckets time into
  * radius-width bins: the probe side replicates into its bin ± 1, the
  * other side keeps one bin, the join becomes an equi-join on the bin
  * id, and the exact radius predicate filters the ≤ 3-bin candidates.
  * Shuffle volume is |probe|·3 + |build| instead of |probe|·|build|.
  */
object RangeJoin {

  /** For every `probeType` event: how many events (any type) fall
    * within ± `radiusSeconds` of it. Inclusive bounds, self included.
    */
  def nearbyCounts(events: DataFrame, probeType: String = "error",
      radiusSeconds: Long = 60L): DataFrame = {
    val radiusUs = radiusSeconds * 1000000L
    val all = events.select(
      col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("bin", (col("us") / lit(radiusUs)).cast("long"))
    val probes = events
      .filter(col("event_type") === probeType)
      .select(col("event_id").as("probe_id"), unix_micros(col("ts")).as("probe_us"))
      .withColumn("bin", explode(array(
        ((col("probe_us") / lit(radiusUs)).cast("long") - 1),
        (col("probe_us") / lit(radiusUs)).cast("long"),
        ((col("probe_us") / lit(radiusUs)).cast("long") + 1))))
    probes
      .join(all, "bin")
      .filter(abs(col("us") - col("probe_us")) <= radiusUs)
      .groupBy(col("probe_id"))
      .agg(count(lit(1)).as("n_nearby"))
  }
}
