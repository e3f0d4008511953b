package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Deterministic train/valid/test assignment by CONTENT hash: the
    * first 32 bits of md5(text) pick a bucket in 0..99, buckets map
    * 98/1/1 to train/valid/test. Hashing the content (not the id)
    * makes the split stable under re-ingest/renumbering AND sends
    * byte-identical duplicates to the same split — the standard guard
    * against near-duplicate train→test leakage in LLM corpora (exact
    * twins can never straddle the boundary).
    *
    * Pure per-row projection: zero shuffle at any scale, and md5 is
    * bit-identical across engines so the oracle checks every
    * assignment.
    */
  def splitAssign(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val bucket = splitBucket(col(textCol)).as("bucket")
    docs.select(col(idCol), bucket)
      .withColumn("split",
        when(col("bucket") < 98, "train")
          .when(col("bucket") === 98, "valid")
          .when(col("bucket") === 99, "test"))
    // null text -> null bucket -> null split: degenerate rows surface
    // for upstream filtering instead of silently skewing the 1% test cut
  }

  /** The content-hash 0..99 bucket behind [[splitAssign]] (and the
    * train/test scoping of [[contamination]]) — one definition so the
    * split and everything derived from it can never disagree.
    */
  def splitBucket(text: Column): Column =
    conv(substring(md5(text), 1, 8), 16, 10).cast("long") % 100

  /** Train→test contamination audit: for every TEST-split document,
    * the share of its word `n`-gram shingles that also occur anywhere
    * in the TRAIN split — the decontamination check run before
    * trusting held-out evaluation on a corpus assembled with
    * [[splitAssign]] (exact duplicates can't straddle the split by
    * construction, so what this catches is PARTIAL overlap: shared
    * boilerplate, near-duplicates, quoted passages).
    *
    * Scale shape: shingles explode inside the scan stage; the train
    * shingle set dedups with map-side partial aggregation (it is far
    * too large to broadcast — the join shuffles on the shingle, and
    * only the 1%-sized test side rides through to the per-document
    * aggregate). The two sides scan the corpus once EACH (their bucket
    * filters and dedup keys differ, so no exchange is shared) — the
    * honest cost of a two-population audit; both scans prune to
    * (id, text). Shingles cap at `maxShingles` per document
    * (pre-explode slice, mirrored verbatim in the oracle's
    * `range(0, 2000)`) so one pathological document can't explode
    * unboundedly.
    */
  def contamination(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 4,
      maxShingles: Int = 2000): DataFrame = {
    val sh = docs
      .select(col(idCol), splitBucket(col(textCol)).as("bucket"),
        explode(slice(
          graft.functions.TextFunctions.wordShingles(col(textCol), n),
          1, maxShingles)).as("shingle"))
    val trainSh = sh.filter(col("bucket") < 98)
      .select(col("shingle")).distinct()
      .withColumn("hit", lit(1))
    val testSh = sh.filter(col("bucket") === 99)
      .select(col(idCol), col("shingle")).distinct()
    testSh.join(trainSh, Seq("shingle"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_contaminated"),
        round(sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1)), 4)
          .as("contamination"))
  }

  /** Unigram-LM document scoring — the CCNet-style "how much does this
    * document look like the corpus" quality signal: build a top-V
    * vocabulary from corpus term frequencies, smooth add-one over
    * (vocab + one OOV bucket), and score each document by the mean
    * natural-log probability of its tokens, alongside its OOV ratio.
    * Low scores / high OOV mark boilerplate, noise, or off-corpus text.
    *
    * Scale shape: two passes over the exploded token stream, neither
    * materialized — (1) token counts (map-side partial agg, shuffle is
    * |vocab|-sized), with the top-V cut a `TakeOrdered` (deterministic
    * total order: count desc, token asc); (2) per-document scoring,
    * where the vocabulary and the two scalar totals ride along as
    * BROADCASTs (V is constant, ~KBs), so the only shuffle is the
    * per-document aggregation. Nothing driver-side, no all-token sort.
    * Mean log-prob is rounded to 4dp (float-sum-order tolerance,
    * SURVEY §5); both engines compute `ln((c+1)/(T+V+1))` verbatim.
    */
  def lmScore(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", vocabSize: Int = 16): DataFrame = {
    val toks = graft.functions.TextFunctions.explodedTokens(docs, textCol, Seq(idCol))
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
    val vocab = counts.orderBy(col("c").desc, col("token")).limit(vocabSize)
    val totals = counts.agg(sum(col("c")).as("t_total"))
      .crossJoin(vocab.agg(count(lit(1)).as("v_n")))
    val denom = col("t_total") + col("v_n") + lit(1)
    toks
      .join(broadcast(vocab), Seq("token"), "left")
      .crossJoin(broadcast(totals))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(avg(log((coalesce(col("c"), lit(0L)) + 1).cast("double") /
          denom.cast("double"))), 4).as("lm_score"),
        round(sum(when(col("c").isNull, 1).otherwise(0)).cast("double") /
          count(lit(1)), 4).as("oov_ratio"))
  }
}
