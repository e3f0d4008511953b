package graft.functions

import scala.collection.mutable

/** Byte-pair-encoding tokenizer with a FIXED merge table, learned once
  * at class-load from an embedded seed text (algorithm: Sennrich,
  * Haddow & Birch, "Neural Machine Translation of Rare Words with
  * Subword Units", ACL 2016 — the GPT-2-style merge-list form).
  *
  * Everything is deterministic: the seed is a constant, training
  * breaks frequency ties lexicographically, and encoding applies
  * merges strictly in rank order with one left-to-right pass per
  * rank. That determinism is the point — token counts produced by
  * this table replay exactly in an external engine that interprets
  * the same merge list, so BPE-denominated packing/mixture numbers
  * get a value-level oracle instead of a trust-me.
  *
  * Scale shape: the merge table is a few dozen entries compiled into
  * the executor code (no model file, no broadcast); per-word results
  * are memoized in a bounded cache, so a corpus with a Zipfian vocab
  * pays the merge loop only once per distinct word per executor.
  */
object BpeTokenizer {

  /** Fixed training seed: plain descriptive English, lowercased and
    * stripped to [a-z ] before use. Changing it changes the merge
    * table and therefore every BPE count — treat as frozen.
    */
  private val SeedText: String =
    """the quick brown fox jumps over the lazy dog while the stream of
      |data flows through the query engine and the table scan feeds the
      |hash join before the sort and the merge step writes every row of
      |the result to the output the window slides over the ordered rows
      |and the group by key holds the partial sums until the final pass
      |merges the partitions the filter keeps the small values and the
      |big values spill to disk the vector of the column batch moves
      |fast and the slow path reads the line again the customer orders
      |a part and the supplier ships the order the spark driver plans
      |the stages and the executors run the tasks in parallel""".stripMargin

  /** Number of merge rules to learn. */
  val NumMerges: Int = 48

  /** One left-to-right merge pass: every adjacent (a, b) becomes a+b.
    * A merged token never re-pairs as the LEFT element of the same
    * rule within the pass (a+b ≠ a unless b is empty), so a single
    * pass is a fixpoint for rule (a, b).
    */
  private[graft] def mergePass(syms: List[String], a: String,
      b: String): List[String] = {
    val buf = mutable.ListBuffer.empty[String]
    var rest = syms
    while (rest.nonEmpty) {
      rest match {
        case x :: y :: t if x == a && y == b => buf += x + y; rest = t
        case x :: t => buf += x; rest = t
      }
    }
    buf.toList
  }

  /** Classic BPE training: repeatedly merge the most frequent adjacent
    * symbol pair across the (frequency-weighted) seed vocabulary; ties
    * break on the lexicographically smallest pair so the table is a
    * pure function of the seed.
    */
  private def train(seed: String, n: Int): IndexedSeq[(String, String)] = {
    val words = seed.toLowerCase.replaceAll("[^a-z\\s]", " ")
      .split("\\s+").filter(_.nonEmpty)
    var vocab: Vector[(List[String], Long)] = words.toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toVector
      .map { case (w, f) => w.map(_.toString).toList -> f }
    val out = mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (out.size < n && !done) {
      val pairCounts = mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      vocab.foreach { case (syms, f) =>
        syms.iterator.sliding(2).withPartial(false).foreach { w =>
          pairCounts((w.head, w(1))) += f
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val ((a, b), _) = pairCounts.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((a, b))
        vocab = vocab.map { case (syms, f) => mergePass(syms, a, b) -> f }
      }
    }
    out.toIndexedSeq
  }

  /** The frozen merge table, rank order. */
  lazy val merges: IndexedSeq[(String, String)] = train(SeedText, NumMerges)

  /** Encode one word: start from characters, apply each merge rule in
    * rank order as one left-to-right pass.
    */
  def encode(word: String): List[String] = {
    var syms = word.map(_.toString).toList
    val m = merges
    var r = 0
    while (r < m.length && syms.lengthCompare(1) > 0) {
      val (a, b) = m(r)
      syms = mergePass(syms, a, b)
      r += 1
    }
    syms
  }

  private val CacheCap = 1 << 16
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** BPE tokens in one word, memoized (bounded cache — a corpus with
    * an unbounded vocab degrades to recompute, never to OOM).
    */
  def wordTokenCount(word: String): Int = {
    val hit = cache.get(word)
    if (hit != null) hit.intValue()
    else {
      val n = encode(word).length
      if (cache.size() < CacheCap) cache.put(word, Integer.valueOf(n))
      n
    }
  }

  /** Total BPE tokens in a text: sum over whitespace-delimited words. */
  def countTokens(text: String): Long = {
    var total = 0L
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < len && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start) total += wordTokenCount(text.substring(start, i))
    }
    total
  }
}
