package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter join keys.
  *
  * AQE's skew-join handles most cases at runtime; explicit salting is
  * the deterministic fallback for pathological keys (one key = a large
  * fraction of the fact). The skewed side gets a random-but-deterministic
  * salt in [0, factor); the build side is replicated `factor`× with
  * every salt value; the join key becomes (key, salt) — splitting each
  * hot key across `factor` reducers.
  */
object Skew {

  /** Inner join `big ⋈ small` on `key`, salted `factor` ways.
    * Result is row-identical to the unsalted join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      factor: Int): DataFrame = {
    // the salt must be a pure function of ROW CONTENT: anything tied to
    // execution placement (monotonically_increasing_id, partition ids)
    // changes when a fetch failure recomputes map tasks and rows land
    // elsewhere — reducers that already fetched old output are not
    // re-run, silently losing/duplicating join rows (SPARK-23207).
    // Residual limit: rows identical in every hashable column share a
    // salt bucket; if a hot key's rows are full duplicates, pre-aggregate
    // them (key, count) before joining instead of salting.
    val hashable = big.schema.fields
      .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      .map(f => col(f.name)).toIndexedSeq
    val salted = big.withColumn("__salt",
      pmod(xxhash64(hashable: _*), lit(factor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }
}
