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
  * The table is production-shaped, not a toy: [[NumMerges]] = 512
  * rules learned from a ~7 KB prose seed, enough to fold frequent
  * English subwords ("th", "ing", "er", …) and whole common words
  * into single tokens — corpus compression lands in the realistic
  * 1.1–1.5 tokens/word band (spec-checked in BpeTokenizerSpec)
  * instead of degenerating to ~character count as a small table
  * does. The alphabet is [a-z] after cleaning, so every learned
  * token is alphanumeric — safe to embed verbatim in SQL literals
  * and regex patterns on the oracle side. Characters outside the
  * alphabet stay atomic single-char tokens (never merged), which
  * replays identically.
  *
  * Word boundaries use the SAME whitespace class as the SQL side
  * (Java/RE2 `\s` = ASCII `[ \t\n\x0B\f\r]`), NOT
  * `Character.isWhitespace` — the two differ on U+001C–U+001F and
  * Unicode spaces, which would silently desync the word split from
  * every `string_split_regex(text, '\s+')` oracle.
  *
  * Scale shape: the merge table is a few hundred entries compiled
  * into the executor code (no model file, no broadcast); per-word
  * results are memoized in a bounded cache, so a corpus with a
  * Zipfian vocab pays the merge loop only once per distinct word per
  * executor.
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
      |the stages and the executors run the tasks in parallel
      |a modern analytics system is judged by how gracefully it handles
      |growth in the volume of information it must organize every day
      |when a single machine can no longer hold the working set the
      |work is divided among many machines and each one carries a piece
      |of the whole the art of building such a system is the art of
      |deciding what to move and what to keep in place because moving
      |information between machines is the most expensive thing the
      |system ever does a good plan touches each record once and only
      |once a bad plan copies the same record across the network many
      |times and pays for the same work again and again
      |consider what happens when a person asks a simple question about
      |last year the system must find the relevant records among
      |billions skip everything that does not matter and combine what
      |remains into a short answer the first step is to prune whole
      |files whose ranges promise they hold nothing of interest the
      |second step is to read only the columns the question actually
      |mentions the third step is to evaluate the condition close to
      |the storage so that rejected records never travel anywhere at
      |all only then does real computation begin and by then the
      |problem has already shrunk by a factor of a thousand
      |people often imagine that speed comes from clever tricks but in
      |practice speed comes from restraint the fastest operation is the
      |one never performed the cheapest byte is the one never read and
      |the quickest message is the one never sent a careful engineer
      |measures before changing anything trusts numbers over feelings
      |and treats every surprising result as a chance to learn
      |something true about the machine underneath
      |language itself shows the same patterns repetition everywhere
      |common words appear again and again while rare words appear
      |perhaps once in a million lines a tokenizer exploits this by
      |learning which pairs of letters occur together most often and
      |replacing them with a single symbol applied repeatedly this
      |simple idea compresses ordinary text to a fraction of its
      |original length the most frequent words collapse into single
      |tokens while unusual words break into familiar pieces
      |training a large model begins long before any learning happens
      |first the raw text must be gathered cleaned and weighed
      |duplicate passages are found and removed because repeating the
      |same passage teaches nothing new low quality pages are scored
      |and set aside and the remaining mixture is balanced so that no
      |single source dominates the whole only after this long
      |preparation does the model see a single example and the quality
      |of that preparation decides more about the final result than
      |almost any other choice
      |the history of computing is a history of moving bottlenecks
      |once processors were slow and memory was fast then processors
      |grew quick and memory became the wall later disks were the
      |problem and after that the network today the bottleneck moves
      |depending on the question being asked and the shape of the
      |information being processed so the designer must understand the
      |whole path from storage through memory to processor and back
      |a distributed computation succeeds when its pieces agree on
      |little and share less each worker should receive its slice do
      |its part and report a small summary the coordinator should
      |combine summaries not raw records when workers must exchange
      |information they should exchange keys and counts not whole
      |documents and when one worker receives far more than its share
      |the system should notice the imbalance and split the heavy key
      |rather than wait forever on a single straggler
      |reading old programs teaches humility the authors faced the
      |same troubles we face chose among the same trades and wrote
      |down their reasons in comments that survive them a program is
      |a letter to the future reader explaining not only what the
      |machine should do but why the author believed it was right
      |the best letters are short honest and free of decoration
      |numbers deserve suspicion until they are repeated a single
      |measurement proves little because machines are noisy caches
      |warm up neighbors steal cycles and clocks drift the honest
      |report includes the spread not just the best case and the
      |honest conclusion survives a second run on a different day
      |simple structures carry most of the weight of practical
      |engineering a sorted list answers range questions a hash map
      |answers exact ones a queue keeps work in order and a tree
      |balances the cost of finding against the cost of changing
      |choosing the plain structure that fits is usually wiser than
      |inventing a clever one that almost fits
      |the seasons of a project follow a familiar cycle first the
      |rough sketch that proves the idea then the long middle where
      |every edge case is discovered one failure at a time and
      |finally the quiet period where the system simply works and
      |nobody mentions it at all the measure of success is silence
      |water finds the lowest path and information flows the same way
      |through the cheapest route available if the fast path is
      |blocked the work spills to the slow one and the whole pipeline
      |backs up behind it watching where the work pools tells the
      |observer exactly where the next improvement belongs
      |the scan feeds the join and the window orders the group the key
      |finds the part and the hash holds the value the sort ranks the
      |line and the filter keeps the row the batch fills the column and
      |the vector moves the data the query plans the merge and the""".stripMargin

  /** Number of merge rules to learn. */
  val NumMerges: Int = 512

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

  @inline private def containsPair(syms: List[String], a: String,
      b: String): Boolean = {
    var it = syms
    while (it.nonEmpty && it.tail.nonEmpty) {
      if (it.head == a && it.tail.head == b) return true
      it = it.tail
    }
    false
  }

  /** Encode one word: start from characters, apply each merge rule in
    * STRICT rank order, one left-to-right pass per rank — the exact
    * semantics the recursive-CTE oracle replays (rank only ever
    * advances). NOTE this deliberately differs from the GPT-2
    * priority-queue form (re-pick the lowest-rank pair after every
    * merge): a merge at rank r can create a pair of rank r' < r that
    * the sequential scan, like the CTE, never revisits. The adjacency
    * pre-check only skips the per-rank list rebuild for rules that
    * cannot fire — it does not change which rules fire.
    */
  def encode(word: String): List[String] = {
    var syms = word.map(_.toString).toList
    val m = merges
    var r = 0
    while (r < m.length && syms.lengthCompare(1) > 0) {
      val (a, b) = m(r)
      if (containsPair(syms, a, b)) syms = mergePass(syms, a, b)
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

  /** ASCII regex-`\s` class — Java and RE2 agree on exactly these
    * five characters plus space, and every SQL oracle splits words
    * with `\s+`; `Character.isWhitespace` is WIDER (U+001C–U+001F,
    * Unicode spaces) and must not be used here.
    */
  @inline private def isWsRegex(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** Total BPE tokens in a text: sum over `\s+`-delimited words. */
  def countTokens(text: String): Long = {
    var total = 0L
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && isWsRegex(text.charAt(i))) i += 1
      val start = i
      while (i < len && !isWsRegex(text.charAt(i))) i += 1
      if (i > start) total += wordTokenCount(text.substring(start, i))
    }
    total
  }
}
