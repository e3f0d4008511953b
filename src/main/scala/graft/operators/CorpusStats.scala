package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-wide token statistics — the "what is my training data made
  * of" pass every large-scale text pipeline runs before filtering.
  *
  * Classic wordcount shape, written for the 100 TB case:
  *  - tokens explode inside the scan stage (codegen'd `split` +
  *    `explode`, no UDF);
  *  - the document-frequency count is a TWO-LEVEL aggregation —
  *    groupBy (token, doc_id) then groupBy token — instead of
  *    `count(DISTINCT doc_id)` alongside the total: mixing a distinct
  *    with plain aggs triggers Catalyst's Expand rewrite, which
  *    doubles the shuffled row count (measured, see SURVEY §6); the
  *    two-level form partial-aggregates both hops;
  *  - top-N is a total order (`n_total` desc, token asc) so the cut
  *    is deterministic under ties.
  */
object CorpusStats {

  /** Per-token corpus stats: in how many documents (`n_docs`) and how
    * often overall (`n_total`) each whitespace token occurs; the
    * `topN` most frequent.
    */
  def termFrequencies(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", topN: Int = 100): DataFrame = {
    val toks = graft.functions.TextFunctions.explodedTokens(docs, textCol, Seq(idCol))
    toks.groupBy(col("token"), col(idCol))
      .agg(count(lit(1)).as("n_in_doc"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_in_doc")).as("n_total"))
      .orderBy(col("n_total").desc, col("token"))
      .limit(topN)
  }
}
