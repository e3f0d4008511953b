package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch ALGEBRA — answers that come from combining mergeable sketch
  * states, not from re-reading data. The motivating question is the
  * audience-overlap report every marketing warehouse runs ("how many
  * distinct users did both X and Y"): exact pairwise distinct
  * intersection needs a user-grain self-join per pair — corpus-sized
  * exchanges that grow with the SQUARE of the segment count. From
  * per-segment KMV sketches ([[graft.functions.KmvAggregator]]'s k-min
  * state) every pairwise union/Jaccard/intersection estimate derives
  * by k-bounded set arithmetic on state that already exists.
  */
object Sketches {

  /** Pairwise distinct-element overlap between segments, estimated from
    * per-segment KMV k-min hash sets:
    *
    *  - union estimate: the KMV law on the k smallest of `Sa ∪ Sb`
    *    (a valid KMV sketch of the union — minima commute with union);
    *  - Jaccard: the share of those merged minima present in BOTH
    *    input sets (Broder's min-wise estimate on the shared k-sample);
    *  - intersection estimate: `jaccard × est_union`.
    *
    * One data pass builds all segment sketches (map-side partial
    * aggregation, ≤ k longs per partition per segment in the exchange);
    * the pair stage touches only segment-count² tiny rows of k-bounded
    * arrays. `exact_overlap` rides along as the recall eval — the
    * user-grain self-join you would NOT run at 100 TB (documented,
    * dropped by callers at scale via `withExact = false`).
    *
    * Everything is deterministic integer/double arithmetic on md5
    * hashes, so the oracle replays the sketches, the merge, and every
    * estimate value-for-value.
    */
  def kmvOverlap(events: DataFrame, k: Int = 256,
      segCol: String = "event_type", elemCol: String = "user_id",
      withExact: Boolean = true): DataFrame = {
    require(k >= 2, s"kmvOverlap needs k >= 2, got $k")
    val kmvSet = udaf(new graft.functions.KmvHashesAggregator(k))
    val hashed = events.filter(col(elemCol).isNotNull)
      .select(col(segCol).as("seg"),
        graft.functions.TextFunctions.md5Hash32(col(elemCol).cast("string")).as("h"))
    val sk = hashed.groupBy(col("seg")).agg(kmvSet(col("h")).as("hs"))
    val pairs = sk.select(col("seg").as("type_a"), col("hs").as("ha"))
      .join(sk.select(col("seg").as("type_b"), col("hs").as("hb")),
        col("type_a") < col("type_b"))
    def est(arr: Column): Column = {
      val n = size(arr)
      val kth = element_at(arr, n) // sorted ascending: last = k-th min
      when(n < k, n.cast("double")) // not full: the count is EXACT
        .when(kth === 0L, n.cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) / kth.cast("double"))
    }
    val withM = pairs
      .withColumn("m", slice(array_sort(array_union(col("ha"), col("hb"))), 1, k))
      .withColumn("inter_k", size(filter(col("m"),
        h => array_contains(col("ha"), h) && array_contains(col("hb"), h))))
    val estimates = withM.select(
      col("type_a"), col("type_b"),
      round(est(col("ha")), 4).as("est_a"),
      round(est(col("hb")), 4).as("est_b"),
      round(est(col("m")), 4).as("est_union"),
      round(col("inter_k").cast("double") / size(col("m")), 4).as("jaccard"),
      round(col("inter_k").cast("double") / size(col("m")) * est(col("m")), 4)
        .as("est_overlap"))
    if (!withExact) estimates
    else {
      val du = events.filter(col(elemCol).isNotNull)
        .select(col(segCol).as("seg"), col(elemCol).as("uid")).distinct()
      val exact = du.alias("x").join(du.alias("y"),
          col("x.uid") === col("y.uid") && col("x.seg") < col("y.seg"))
        .groupBy(col("x.seg").as("type_a"), col("y.seg").as("type_b"))
        .agg(count(lit(1)).as("exact_overlap"))
      estimates.join(exact, Seq("type_a", "type_b"), "left")
        .withColumn("exact_overlap", coalesce(col("exact_overlap"), lit(0L)))
    }
  }
}
