package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built entirely from
  * codegen'd higher-order builtins (`transform` / `zip_with` /
  * `aggregate`) — no UDF, no serialization boundary, stays inside
  * whole-stage codegen. Accumulation is in DOUBLE, left-to-right (the
  * `aggregate` fold order), so results are deterministic.
  */
object VectorFunctions {

  /** Cast an array<float> column to array<double>. */
  def asDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Dot product of two equal-length numeric arrays (double accumulate). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (exact, double). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Cosine rounded to 4 decimals — the cross-engine-stable form used by
    * every query that compares, filters, or ranks on similarity.
    */
  def cosineR(a: Column, b: Column): Column = round(cosine(a, b), 4)

  /** Random-hyperplane LSH bit signature (nBits planes). Plane weights
    * are pseudo-random ±1 derived from `xxhash64(plane, dim)` — fully
    * deterministic, computed inline per row, no shuffle, no stored model.
    * Returns an int in [0, 2^nBits).
    */
  def hyperplaneSig(a: Column, nBits: Int): Column = {
    val ad = asDouble(a)
    val bits = (0 until nBits).map { p =>
      // sum_i emb[i] * w(p, i), w = ±1 from the hash parity
      val proj = aggregate(
        zip_with(ad, sequence(lit(0), size(a) - 1), (x, i) =>
          x * when(pmod(xxhash64(lit(p), i), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))),
        lit(0.0),
        (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
