package graft.operators

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k with a broadcast probe set (the
  * corpus side never shuffles; ranking happens after a partial top-k
  * per partition via the window over the probe key — probe cardinality
  * bounds the window width). Scale path: random-hyperplane LSH tables
  * bound the candidate set per probe.
  */
object Similarity {

  /** Brute-force cosine top-k: `probes` (small, broadcast) × corpus →
    * per-probe top-k by (cosine desc, cand_id) — fully deterministic.
    */
  def bruteForceTopK(emb: DataFrame, probeFilter: org.apache.spark.sql.Column,
      k: Int = 5): DataFrame = {
    val probes = emb.filter(probeFilter)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"))
    val scored = emb
      .select(col("vec_id").as("cand_id"), col("embedding").as("cand_emb"))
      .join(broadcast(probes), col("probe_id") =!= col("cand_id"))
      .select(
        col("probe_id"), col("cand_id"),
        VF.cosineR(col("probe_emb"), col("cand_emb")).as("cosine"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** LSH-bucketed ANN top-k: `numTables` independent hyperplane tables
    * of `bitsPerTable` bits; candidates = any shared bucket; exact
    * cosine re-rank of candidates only. Candidate count per probe ≈
    * numTables × N / 2^bits — tune both for the recall/cost point.
    */
  def lshTopK(emb: DataFrame, probeFilter: org.apache.spark.sql.Column,
      k: Int = 5, numTables: Int = 4, bitsPerTable: Int = 4): DataFrame = {
    def sigs(df: DataFrame, idAs: String, embAs: String): DataFrame = {
      // each table uses distinct planes: offset the plane index by table
      val perTable = (0 until numTables).map { t =>
        val bits = (0 until bitsPerTable).map { p =>
          val plane = t * bitsPerTable + p
          val ad = VF.asDouble(col("embedding"))
          val proj = aggregate(
            zip_with(ad, sequence(lit(0), size(col("embedding")) - 1), (x, i) =>
              x * when(pmod(xxhash64(lit(plane), i), lit(2)) === 0, lit(1.0))
                .otherwise(lit(-1.0))),
            lit(0.0), (acc, x) => acc + x)
          when(proj >= 0, lit(1 << p)).otherwise(lit(0))
        }
        struct(lit(t).as("table_id"), bits.reduce(_ + _).as("sig"))
      }
      df.select(col("vec_id").as(idAs), col("embedding").as(embAs),
          explode(array(perTable: _*)).as("bucket"))
        .select(col(idAs), col(embAs),
          col("bucket.table_id").as("table_id"), col("bucket.sig").as("sig"))
    }
    val probes = sigs(emb.filter(probeFilter), "probe_id", "probe_emb")
    val cands = sigs(emb, "cand_id", "cand_emb")
    val candidates = cands
      .join(broadcast(probes), Seq("table_id", "sig"))
      .filter(col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"), col("probe_emb"), col("cand_emb"))
      .distinct()
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    candidates
      .select(col("probe_id"), col("cand_id"),
        VF.cosineR(col("probe_emb"), col("cand_emb")).as("cosine"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }
}
