package graft.sources

import graft.operators.{MMRecord, Multimodal}
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sign-once / query-many persistence for the MULTIMODAL frame
  * near-dup index — the [[MinhashIndexStore]] pattern applied to the
  * perceptual-hash family of
  * [[graft.operators.Multimodal.nearDupFrames]]: the corpus media pays
  * the decode + frame-sample + block-hash pass once; each new asset
  * drop signs only itself and joins the stored band table. This gives
  * the LAST near-dup family (after text-minhash, embedding-LSH and
  * IVF/PQ) the full index lifecycle: build / [[append]] (rollover) /
  * [[delete]] (tombstone retraction) / [[compact]] (crash-safe swap),
  * all mutations under the single-writer [[IndexLease]].
  *
  * Layout under `path`:
  *
  *  - `bands/` — (doc_id, frame_idx, sig_lo, sig_hi, band, bv) parquet
  *    PARTITIONED BY band: one row per (frame, 16-bit signature band),
  *    4 rows ≈ 160 bytes per frame REGARDLESS of media size — at
  *    100 TB of video the index is a vanishing fraction of the corpus,
  *    and the per-band subtrees let a constrained replay process the
  *    candidate join band-by-band. The sig halves ride ON the band row
  *    so the Hamming verify needs no second fetch — unlike text
  *    near-dup, the verdict is pure signature arithmetic (media bytes
  *    are never re-read for the verify).
  *  - `tombstones/` — retracted doc ids ([[delete]]), masked on read.
  *
  * Determinism: the aHash-style block signature is integer math over
  * the frame bytes ([[Multimodal.frameSignatures]]), so a rebuilt
  * index is byte-identical and the delta query keeps a full
  * value-level oracle (the batch all-pairs SQL filtered to pairs that
  * touch the drop).
  */
object FrameSigIndexStore {

  /** Pigeonhole bound: 4×16-bit banding is lossless only to Hamming 3
    * — the same contract as the batch operator.
    */
  val MaxHamming: Int = 3

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Deterministic per-dataset index location under the JVM temp dir. */
  def defaultPath(datasetDir: String): String =
    StorePaths.keyedTmp("framesig", datasetDir)

  /** Banded signature rows for any media frame set — the join-ready
    * layout shared by the stored corpus side and the in-plan delta
    * side. Zero shuffle: decode → frame-sample → block-hash → band
    * explode are all per-row map work; the media bytes never leave it.
    */
  def bandRows(media: Dataset[MMRecord]): DataFrame =
    Multimodal.frameBandRows(media)

  /** Sign the corpus media once and persist the band table. */
  def build(corpus: Dataset[MMRecord], path: String): Unit =
    bandRows(corpus)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("band")
      .parquet(s"$path/bands")

  /** [[build]] at most once per JVM per path (the
    * [[MinhashIndexStore.ensure]] memo contract).
    */
  def ensure(corpus: Dataset[MMRecord], path: String): Unit = {
    built.computeIfAbsent(s"plain:$path", _ => {
      build(corpus, path)
      java.lang.Boolean.TRUE
    })
    ()
  }

  /** The stored band table; retracted assets are masked by a broadcast
    * anti-join on the tombstone list — no index file rewritten.
    */
  def bandsTable(spark: SparkSession, path: String): DataFrame = {
    // a batch-keyed store ([[appendBatch]]) exposes its layer key as a
    // `batch` partition column — serve-side consumers never need it
    val bands = spark.read.parquet(s"$path/bands")
      .drop("batch")
      .withColumn("band", col("band").cast("int"))
    if (hasTombstones(spark, path))
      bands.join(broadcast(tombstonesTable(spark, path)),
        Seq("doc_id"), "left_anti")
    else bands
  }

  private def hasTombstones(spark: SparkSession, path: String): Boolean =
    Tombstones.exists(spark, path)

  /** The LIVE serve mask (shared [[Tombstones]] layer — the serve side
    * and the compact paths read one definition, so a schema change
    * cannot silently diverge between them): outstanding tombstones
    * minus the expired ledger ([[expireTombstones]]).
    */
  private def tombstonesTable(spark: SparkSession, path: String): DataFrame =
    Tombstones.liveMask(spark, path, "doc_id")

  /** Fold a vetted asset drop INTO the stored index. Signatures are
    * deterministic and per-frame independent, so append ≡ rebuild over
    * the unioned corpus (spec-pinned). Lease-guarded like every
    * mutation.
    */
  def append(delta: Dataset[MMRecord], path: String): Unit =
    IndexLease.withLease(delta.sparkSession, path, "framesig-append") {
      StoreLayout.assertWritable(delta.sparkSession, path, "bands",
        keyed = false)
      bandRows(delta)
        .write.mode(SaveMode.Append)
        .partitionBy("band")
        .parquet(s"$path/bands")
    }

  /** [[append]] for STREAMED maintenance (the
    * [[MinhashIndexStore.appendBatch]] law): the drop's band rows land
    * under `bands/batch=<id>/band=<n>` with Overwrite, so a
    * crash-redelivered batch RE-LANDS its own layer instead of
    * double-appending duplicate band rows. `batchId = -1` is the
    * pre-built base layer ([[buildKeyed]]).
    */
  def appendBatch(delta: Dataset[MMRecord], path: String,
      batchId: Long): Unit =
    IndexLease.withLease(delta.sparkSession, path, "framesig-append-batch") {
      StoreLayout.assertWritable(delta.sparkSession, path, "bands",
        keyed = true)
      bandRows(delta)
        .write.mode(SaveMode.Overwrite)
        .partitionBy("band")
        .parquet(StoreLayout.batchDir(path, "bands", batchId))
    }

  /** [[build]] in the batch-keyed layout (base layer at `batch=-1`) —
    * the starting point for a store maintained by a stream of
    * [[appendBatch]] folds.
    */
  def buildKeyed(corpus: Dataset[MMRecord], path: String): Unit =
    appendBatch(corpus, path, -1L)

  /** Retract assets — takedowns, deletion-vector style: O(|retraction|)
    * id append, masked on read by [[bandsTable]]; the quantization-free
    * signature family means there is nothing to freeze.
    */
  def delete(docIds: DataFrame, path: String): Unit =
    IndexLease.withLease(docIds.sparkSession, path, "framesig-delete") {
      docIds.select(col("doc_id"))
        .write.mode(SaveMode.Append).parquet(s"$path/tombstones")
    }

  /** Fold outstanding tombstones into the files — same lease + entry-
    * recover + checked-rename swap as [[MinhashIndexStore.compact]].
    */
  def compact(spark: SparkSession, path: String): Unit =
    IndexLease.withLease(spark, path, "framesig-compact") {
      // tombstones are deleted LAST, so every strandable crash layout
      // still has them — no tombstones means nothing to repair or fold
      if (hasTombstones(spark, path)) {
        SwapRecovery.recover(spark, path, "bands")
        val fs = SwapRecovery.fsOf(spark, path)
        // keyed layers stay keyed across compaction WITH BATCH VALUES
        // PRESERVED, and keep the tombstone mask — the redelivery
        // guard (see MinhashIndexStore.compact): folding to batch=-1
        // would make a crash-redelivered pre-compact batch land beside
        // its folded copy (duplicate band rows), and clearing the mask
        // would let a redelivered batch resurrect a takedown
        val keyed = StoreLayout.isKeyed(spark, path, "bands")
        // repeat-compact no-op probe (see MinhashIndexStore.compact):
        // skip the full rewrite+swap when no live band row carries a
        // tombstoned id — exact even under batch redelivery
        val purgeSet = Tombstones.all(spark, path, "doc_id")
        val anyMasked = !spark.read.parquet(s"$path/bands")
          .select(col("doc_id"))
          .join(broadcast(purgeSet), Seq("doc_id"), "left_semi")
          .isEmpty
        if (anyMasked) {
          // purged ledger before the swap (the expiry gate — see
          // MinhashIndexStore.compact): only ids with live rows NOW
          // are expirable later; pre-emptive takedowns never enter
          Tombstones.appendPurged(
            purgeSet.join(
              spark.read.parquet(s"$path/bands").select(col("doc_id")),
              Seq("doc_id"), "left_semi"),
            path, "doc_id")
          // both layouts fold the FULL ledger (not the live serve
          // mask) — the flat and keyed rewrites can never drift
          val raw = spark.read.parquet(s"$path/bands")
            .withColumn("band", col("band").cast("int"))
            .join(broadcast(purgeSet), Seq("doc_id"), "left_anti")
          if (keyed)
            raw.write.mode(SaveMode.Overwrite)
              .partitionBy("batch", "band")
              .parquet(s"$path/bands_compacted")
          else
            raw.write.mode(SaveMode.Overwrite)
              .partitionBy("band")
              .parquet(s"$path/bands_compacted")
          SwapRecovery.renameOrThrow(fs,
            new org.apache.hadoop.fs.Path(s"$path/bands"),
            new org.apache.hadoop.fs.Path(s"$path/bands_old"))
          SwapRecovery.renameOrThrow(fs,
            new org.apache.hadoop.fs.Path(s"$path/bands_compacted"),
            new org.apache.hadoop.fs.Path(s"$path/bands"))
          fs.delete(new org.apache.hadoop.fs.Path(s"$path/bands_old"), true)
        }
        if (!keyed) Tombstones.clear(spark, path)
      }
    }

  /** Release the redelivery guard for physically-purged takedowns —
    * the [[MinhashIndexStore.expireTombstones]] contract applied to
    * the frame-sig store: caller asserts no pre-compact batch can be
    * redelivered anymore; every COMPACT-PURGED tombstoned id
    * ([[Tombstones.purged]]) with no live band row moves to the
    * expired ledger and leaves the serve-side broadcast mask —
    * pre-emptive (delete-before-ingest) takedowns are never eligible.
    * Append-only ledgers, so any crash state under-expires.
    */
  def expireTombstones(spark: SparkSession, path: String): Unit =
    IndexLease.withLease(spark, path, "framesig-expire") {
      if (hasTombstones(spark, path)) {
        SwapRecovery.recover(spark, path, "bands")
        val gone = tombstonesTable(spark, path)
          .join(Tombstones.purged(spark, path, "doc_id"),
            Seq("doc_id"), "left_semi")
          .join(spark.read.parquet(s"$path/bands").select(col("doc_id")),
            Seq("doc_id"), "left_anti")
        Tombstones.appendExpired(gone, path, "doc_id")
      }
    }

  /** Memoized build-then-delete lifecycle for the retraction gate
    * (the [[MinhashIndexStore.ensureDeleted]] contract): the first
    * caller per JVM per path signs the corpus and retracts `removed`;
    * later callers serve from the masked index.
    */
  def ensureDeleted(corpus: Dataset[MMRecord], removed: DataFrame,
      path: String): Unit = {
    require(!built.containsKey(s"plain:$path"),
      s"$path was built by ensure; use a distinct path per lifecycle")
    built.computeIfAbsent(s"deleted:$path", _ => {
      build(corpus, path)
      delete(removed, path)
      java.lang.Boolean.TRUE
    })
    ()
  }

  /** Incremental near-dup FRAME pairs: a new asset drop against the
    * persisted band index — the daily-drop form of
    * [[Multimodal.nearDupFrames]]. Candidates = drop×stored band
    * matches ∪ drop-internal matches, so a drop frame's pair set is
    * IDENTICAL to the batch run's (the oracle: the all-pairs replay
    * filtered to pairs touching the drop). The corpus media is never
    * re-decoded or re-signed.
    *
    * 100 TB shape: the DROP COLLAPSES TO DISTINCT ASSETS first (the
    * r15 fix — the same asset collapse `nearDupFrames` got in r14;
    * the raw-grain delta pushed every twin copy of every drop band
    * row through the broadcast band join and a pair-grain distinct,
    * quadratic in the drop's twin-group sizes at replica density),
    * so only the distinct drop's band rows broadcast (a daily drop ≪
    * the corpus, its distinct assets ≪ the drop on mirrored feeds)
    * and the stored index scans without ANY exchange. The verified
    * rep-grain pairs re-expand by twin-group membership — value-
    * identical because signatures, band keys, and Hamming are pure
    * functions of the content bytes. The Hamming verify is pure
    * arithmetic on the band rows' sig halves — no media bytes move at
    * any stage. The OUTPUT stays pair-grain (the oracle's shape) and
    * genuinely quadratic at replica density — consumers that cannot
    * take that density take the rep-grain serving form
    * ([[Multimodal.nearDupFrameReps]]'s law).
    */
  def deltaPairs(drop: Dataset[MMRecord], storedBands: DataFrame,
      maxHamming: Int = MaxHamming): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= MaxHamming,
      s"4x16-bit banding is only lossless up to Hamming $MaxHamming, " +
        s"got $maxHamming")
    val (docRep, sizes) = Multimodal.assetRepElection(drop)
    val repDrop = {
      import drop.sparkSession.implicits._
      drop.toDF()
        .join(sizes.select(col("rep").as("doc_id")), Seq("doc_id"), "left_semi")
        .as[MMRecord]
    }
    // rep-grain and multiply consumed (stored join + internal join's
    // two sides + the within-group frame spine) — materialize once
    val dBands = org.apache.spark.sql.GraftInternal.pinRecomputable(
      bandRows(repDrop))
    val dSide = broadcast(dBands)
    def ham(a: String, b: String) =
      (bit_count(col(s"$a.sig_lo").bitwiseXOR(col(s"$b.sig_lo"))) +
        bit_count(col(s"$a.sig_hi").bitwiseXOR(col(s"$b.sig_hi"))))
        .cast("int").as("hamming")
    val onCols = (a: String, b: String) =>
      col(s"$a.frame_idx") === col(s"$b.frame_idx") &&
        col(s"$a.band") === col(s"$b.band") && col(s"$a.bv") === col(s"$b.bv")
    // stored × distinct-drop candidates, verified at rep grain, then
    // expanded: a stored id pairs with EVERY member of the rep's twin
    // group at the rep's per-frame verdict (stored and drop ids are
    // disjoint by the caller contract, so least/greatest restores the
    // orientation after expansion)
    val crossRep = storedBands.alias("s")
      .join(dSide.alias("d"), onCols("s", "d"))
      .select(col("s.doc_id").as("sid"), col("d.doc_id").as("rep"),
        col("s.frame_idx").as("frame_idx"), ham("s", "d"))
      .distinct() // several agreeing bands -> one candidate
      .filter(col("hamming") <= maxHamming)
    // expansion maps are drop-bounded — broadcast them explicitly so
    // the stored-side candidate stream never shuffles for the
    // expansion (the audit contract: no sort-merge join in the serve)
    val cross = crossRep
      .join(broadcast(docRep.select(col("rep"), col("doc_id").as("mid"))),
        Seq("rep"))
      .filter(col("sid") =!= col("mid")) // defensive (disjoint contract)
      .select(least(col("sid"), col("mid")).as("doc_a"),
        greatest(col("sid"), col("mid")).as("doc_b"),
        col("frame_idx"), col("hamming"))
    // drop-internal, rep grain: cross-group rep pairs expand to every
    // member pair of the two (disjoint) groups; within-group twins
    // pair at Hamming 0 on every frame of the asset
    val internalRep = dBands.alias("a")
      .join(dSide.alias("b"),
        onCols("a", "b") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ra"), col("b.doc_id").as("rb"),
        col("a.frame_idx").as("frame_idx"), ham("a", "b"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
    val internalCross = internalRep
      .join(broadcast(docRep.select(col("rep").as("ra"),
        col("doc_id").as("da"))), "ra")
      .join(broadcast(docRep.select(col("rep").as("rb"),
        col("doc_id").as("db"))), "rb")
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"),
        col("frame_idx"), col("hamming"))
    val repFrames = dBands.select(col("doc_id").as("rep"), col("frame_idx"))
      .distinct()
    val memPairs = docRep.alias("x")
      .join(broadcast(docRep.alias("y")),
        col("x.rep") === col("y.rep") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.rep").as("rep"), col("x.doc_id").as("doc_a"),
        col("y.doc_id").as("doc_b"))
    val internalWithin = memPairs.join(broadcast(repFrames), Seq("rep"))
      .select(col("doc_a"), col("doc_b"), col("frame_idx"),
        lit(0).cast("int").as("hamming"))
    cross.unionByName(internalCross).unionByName(internalWithin)
  }

  // ------------------- REP-GRAIN lifecycle (bounded streamed serving)

  /** [[buildKeyed]] at REP grain — the starting point for a stream
    * maintained by [[appendRepBatch]] folds. The store keeps TWO
    * layers, both batch-keyed: `bands/` holds band rows for each
    * layer's elected distinct-asset reps only, `sizes/` holds each
    * rep's twin-group size (`doc_id`, `n_copies`). At replica density
    * the whole store is ∝ distinct content, never ∝ corpus — the
    * index-side half of keeping the STREAMED serving form rep-grain
    * ([[deltaReps]]); the r15 close measured the raw-grain streamed
    * sink at 1.45G pair rows at ~sf100 for exactly this reason.
    *
    * BOUNDARY (deliberate): takedowns on this layout are REP-grain —
    * tombstoning a rep masks its band rows AND its size row, so the
    * whole twin group leaves the serve. A MEMBER-grain takedown
    * (retract one copy of a group of n) would need an n_copies
    * decrement this layout does not express; route member-grain
    * retractions through the pair-grain store ([[delete]] on a
    * [[buildKeyed]] index) or re-append the affected group's layer
    * with the corrected size.
    */
  def buildRepKeyed(corpus: Dataset[MMRecord], path: String): Unit =
    appendRepBatch(corpus, path, -1L)

  /** Fold a drop's DISTINCT assets + group sizes into the rep-grain
    * store, batch-id-keyed (crash-redelivery re-lands both layers —
    * the [[appendBatch]] law, applied to bands and sizes atomically
    * enough: each layer is its own `batch=<id>` overwrite, and a
    * torn crash between them is healed by the redelivery itself).
    */
  def appendRepBatch(drop: Dataset[MMRecord], path: String,
      batchId: Long): Unit =
    IndexLease.withLease(drop.sparkSession, path, "framesig-append-rep") {
      StoreLayout.assertWritable(drop.sparkSession, path, "bands",
        keyed = true)
      import drop.sparkSession.implicits._
      val (_, sizes) = Multimodal.assetRepElection(drop)
      val repDrop = drop.toDF()
        .join(sizes.select(col("rep").as("doc_id")), Seq("doc_id"),
          "left_semi")
        .as[MMRecord]
      bandRows(repDrop)
        .write.mode(SaveMode.Overwrite)
        .partitionBy("band")
        .parquet(StoreLayout.batchDir(path, "bands", batchId))
      sizes.select(col("rep").as("doc_id"),
          col("n_copies").cast("long").as("n_copies"))
        .write.mode(SaveMode.Overwrite)
        .parquet(StoreLayout.batchDir(path, "sizes", batchId))
    }

  /** The stored rep sizes (tombstone-masked like [[bandsTable]]). */
  def sizesTable(spark: SparkSession, path: String): DataFrame = {
    val sizes = spark.read.parquet(s"$path/sizes").drop("batch")
    if (hasTombstones(spark, path))
      sizes.join(broadcast(tombstonesTable(spark, path)),
        Seq("doc_id"), "left_anti")
    else sizes
  }

  /** Incremental near-dup frames at REP grain — [[deltaPairs]] with
    * the pair-grain expansion NEVER materialized (the
    * [[Multimodal.nearDupFrameReps]] serving law, applied to the
    * streamed delta): one row per (stored rep × drop rep) and
    * (drop rep × drop rep) candidate × frame, `(rep_a ≤ rep_b,
    * frame_idx, hamming, n_a, n_b)`, plus the hamming-0 self row for
    * every frame of any drop twin group with n ≥ 2. Cross rows expand
    * to n_a·n_b member pairs, self rows to n·(n−1)/2 — over the batch
    * sequence the expansion law reconstructs EXACTLY the pair-grain
    * arrival-order answer ([[deltaPairs]]' union), because group
    * membership never splits across a rep (content-keyed election)
    * and stored/drop id spaces are disjoint by the caller contract.
    *
    * 100 TB shape: both join sides are distinct-content grain (the
    * stored layer is rep-grain BY CONSTRUCTION — [[appendRepBatch]]),
    * the drop side broadcasts, and the OUTPUT is rep-grain — sink
    * rows ∝ distinct-asset pairs, constant across replica decades,
    * where the raw-grain streamed sink measured 1.45G rows at ~sf100.
    */
  def deltaReps(drop: Dataset[MMRecord], storedBands: DataFrame,
      storedSizes: DataFrame, maxHamming: Int = MaxHamming): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= MaxHamming,
      s"4x16-bit banding is only lossless up to Hamming $MaxHamming, " +
        s"got $maxHamming")
    import drop.sparkSession.implicits._
    val (_, sizes) = Multimodal.assetRepElection(drop)
    val repDrop = drop.toDF()
      .join(sizes.select(col("rep").as("doc_id")), Seq("doc_id"), "left_semi")
      .as[MMRecord]
    val dBands = org.apache.spark.sql.GraftInternal.pinRecomputable(
      bandRows(repDrop))
    val dSide = broadcast(dBands)
    def ham(a: String, b: String) =
      (bit_count(col(s"$a.sig_lo").bitwiseXOR(col(s"$b.sig_lo"))) +
        bit_count(col(s"$a.sig_hi").bitwiseXOR(col(s"$b.sig_hi"))))
        .cast("int").as("hamming")
    val onCols = (a: String, b: String) =>
      col(s"$a.frame_idx") === col(s"$b.frame_idx") &&
        col(s"$a.band") === col(s"$b.band") && col(s"$a.bv") === col(s"$b.bv")
    // stored-rep × drop-rep candidates; sizes follow their ids through
    // the least/greatest re-orientation. The DROP size map is
    // drop-bounded — broadcast explicitly, the stored band stream
    // never shuffles for it. The STORED size map is distinct-content
    // grain (could be huge at 100 TB) — NO hint: it joins the already-
    // verified candidate frame (≪ either input), and AQE broadcasts
    // whichever side is actually small at runtime.
    val dropN = sizes.select(col("rep").as("drep"),
      col("n_copies").cast("long").as("dn"))
    val storedN = storedSizes.select(col("doc_id").as("srep"),
      col("n_copies").cast("long").as("sn"))
    val cross = storedBands.alias("s")
      .join(dSide.alias("d"), onCols("s", "d"))
      .select(col("s.doc_id").as("srep"), col("d.doc_id").as("drep"),
        col("s.frame_idx").as("frame_idx"), ham("s", "d"))
      .filter(col("srep") =!= col("drep")) // defensive (disjoint contract)
      .distinct() // several agreeing bands -> one candidate
      .filter(col("hamming") <= maxHamming)
      .join(broadcast(dropN), Seq("drep"))
      .join(storedN, Seq("srep"))
      .select(least(col("srep"), col("drep")).as("rep_a"),
        greatest(col("srep"), col("drep")).as("rep_b"),
        col("frame_idx"), col("hamming"),
        when(col("srep") < col("drep"), col("sn")).otherwise(col("dn"))
          .as("n_a"),
        when(col("srep") < col("drep"), col("dn")).otherwise(col("sn"))
          .as("n_b"))
    // drop-internal rep pairs (already oriented: a < b on the join)
    val internal = dBands.alias("a")
      .join(dSide.alias("b"),
        onCols("a", "b") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ra"), col("b.doc_id").as("rb"),
        col("a.frame_idx").as("frame_idx"), ham("a", "b"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .join(broadcast(dropN.select(col("drep").as("ra"),
        col("dn").as("n_a"))), Seq("ra"))
      .join(broadcast(dropN.select(col("drep").as("rb"),
        col("dn").as("n_b"))), Seq("rb"))
      .select(col("ra").as("rep_a"), col("rb").as("rep_b"),
        col("frame_idx"), col("hamming"), col("n_a"), col("n_b"))
    // hamming-0 self rows: every frame of any drop twin group with
    // n >= 2 (within-group pairs expand as n·(n−1)/2)
    val repFrames = dBands.select(col("doc_id").as("rep"), col("frame_idx"))
      .distinct()
    val selfRows = sizes.filter(col("n_copies") >= 2)
      .join(repFrames, Seq("rep"))
      .select(col("rep").as("rep_a"), col("rep").as("rep_b"),
        col("frame_idx"), lit(0).cast("int").as("hamming"),
        col("n_copies").cast("long").as("n_a"),
        col("n_copies").cast("long").as("n_b"))
    cross.unionByName(internal).unionByName(selfRows)
  }
}
