package graft.operators

import graft.plans.BloomMightContainLong
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.functions.col

/** Bloom-filter semi-join reduction: prune the fact BEFORE it moves.
  *
  * The classic 100 TB pattern the reference's star loads imply (fact ⋈
  * filtered dim, e.g. the brand/category slices behind its views): when
  * the dim side is filtered down to a sliver, most fact rows will not
  * survive the join — but a shuffled join still pays to exchange every
  * fact row first. Building a Bloom filter over the dim keys and
  * probing it inside the fact's scan stage drops the non-matching rows
  * at the source, so only plausibly-matching rows are ever shuffled
  * (or even reach the broadcast-join probe). Spark's AQE injects this
  * as a runtime filter in some shapes; this operator is the explicit,
  * always-available form for when the planner can't see the
  * opportunity (pre-staged inputs, multi-stage pipelines, a dim
  * filtered by an earlier materialized step).
  *
  * Cost model: one aggregation pass over the dim builds the filter
  * (driver holds the sketch — a few MB for 1e7 keys at 1% fpp — then
  * ships it once per executor as a codegen reference object, exactly
  * like a broadcast var). The probe is a codegen'd `mightContainLong`
  * inside the scan's WholeStageCodegen — no UDF, no extra stage. The
  * prune is semantics-preserving by construction: false positives are
  * removed by the exact join that follows; false negatives cannot
  * happen.
  */
object BloomPrune {

  /** Bloom filter over a LONG key column of `dim`. `expectedKeys`
    * sizes the sketch (overestimate is wasted bits, underestimate is
    * extra false positives — both safe).
    */
  def keyFilter(dim: DataFrame, dimKey: String, expectedKeys: Long,
      fpp: Double = 0.01): org.apache.spark.util.sketch.BloomFilter =
    dim.stat.bloomFilter(dimKey, expectedKeys, fpp)

  /** `fact` reduced to rows whose `factKey` might match a `dim` key.
    * NULL keys are dropped (they cannot equi-join anyway).
    */
  def reduce(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val probe: Column = GraftInternal.columnOf(
      BloomMightContainLong(
        GraftInternal.expressionOf(col(factKey).cast("long")),
        keyFilter(dim, dimKey, expectedKeys, fpp)))
    fact.filter(col(factKey).isNotNull && probe)
  }
}
