package graft.sources

import graft.functions.{VectorFunctions => VF}
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sign-once / query-many persistence for the EMBEDDING near-dup
  * index — the [[MinhashIndexStore]] pattern applied to the
  * random-hyperplane LSH family of
  * [[graft.operators.Dedup.embeddingNearDupsAll]]: the corpus pays the
  * signature pass once, each new drop signs only itself and joins the
  * stored signature table
  * ([[graft.operators.Dedup.embeddingNearDupsDelta]]).
  *
  * Layout under `path`:
  *
  *  - `sigs/` — (vec_id, sig) parquet PARTITIONED BY table_id: one row
  *    per (vector, table) holding the table's sign-bit signature —
  *    ~12 bytes × tables per vector, ~3% of a 64-float corpus; the
  *    per-table subtrees let a replay process the bucket join
  *    table-by-table to bound peak shuffle.
  *
  * The plane weights are the seeded deterministic family
  * ([[VF.planeWeights]], same flat layout as `embeddingNearDupsAll`:
  * table `t` owns planes `[t*bits, (t+1)*bits)`), so a rebuilt index
  * is byte-identical and the delta query keeps a full value oracle.
  * `bits` is a BUILD parameter pinned in the path: the caller derives
  * it from the integer bucket-width law over the catalog total
  * (corpus + pending drops), exactly as the oracle recomputes it.
  */
object EmbLshIndexStore {

  /** Table count — same default as the batch all-corpus operator. */
  val NumTables: Int = 8

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  def defaultPath(datasetDir: String, bits: Int): String =
    StorePaths.keyedTmp("elsh", datasetDir, s"_t${NumTables}_b$bits")

  /** Per-(vector, table) signature rows for any (vec_id, embedding)
    * frame — the join-ready layout shared by the stored corpus side
    * and the in-plan delta side. Zero shuffle: the signature is a
    * per-row projection over the codegen'd hyperplane kernel.
    */
  def sigRows(emb: DataFrame, bits: Int): DataFrame = {
    graft.plans.GraftFunctions.ensureRegistered(emb.sparkSession)
    val weights = VF.planeWeights(NumTables * bits,
      Similarity.embeddingDim(emb))
    val perTable = (0 until NumTables).map { tbl =>
      struct(lit(tbl).as("table_id"),
        VF.hyperplaneSig(col("embedding"),
          weights.slice(tbl * bits, (tbl + 1) * bits)).as("sig"))
    }
    emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), explode(array(perTable: _*)).as("b"))
      .select(col("vec_id"), col("b.table_id").as("table_id"),
        col("b.sig").as("sig"))
  }

  def build(corpus: DataFrame, path: String, bits: Int): Unit =
    sigRows(corpus, bits)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("table_id")
      .parquet(s"$path/sigs")

  /** [[build]] at most once per JVM per path (same memo contract as
    * [[IvfIndexStore.ensure]]).
    */
  def ensure(corpus: DataFrame, path: String, bits: Int): Unit =
    built.computeIfAbsent(path, _ => {
      build(corpus, path, bits)
      java.lang.Boolean.TRUE
    })

  /** The stored signature table. Retracted vectors ([[delete]]) are
    * masked by a broadcast anti-join on the tombstone list — the serve
    * plan never sees their signature rows, without rewriting a single
    * index file (the [[MinhashIndexStore.bandsTable]] discipline).
    */
  def sigsTable(spark: SparkSession, path: String): DataFrame = {
    val sigs = spark.read.parquet(s"$path/sigs")
      .withColumn("table_id", col("table_id").cast("int"))
    if (hasTombstones(spark, path))
      sigs.join(broadcast(tombstonesTable(spark, path)),
        Seq("vec_id"), "left_anti")
    else sigs
  }

  private def hasTombstones(spark: SparkSession, path: String): Boolean =
    Tombstones.exists(spark, path)

  private def tombstonesTable(spark: SparkSession, path: String): DataFrame =
    Tombstones.liveMask(spark, path, "vec_id")

  /** Retract vectors from the index — takedowns / right-to-be-
    * forgotten, deletion-vector style: ids append to `tombstones/`
    * (O(|retraction|) write, never an index rewrite at serve time) and
    * [[sigsTable]] masks them on read. Run [[compact]] when the list
    * outgrows broadcast size.
    */
  def delete(vecIds: DataFrame, path: String): Unit =
    IndexLease.withLease(vecIds.sparkSession, path, "elsh-delete") {
      Tombstones.append(vecIds, path, "vec_id")
    }

  /** Fold outstanding tombstones into the files: rewrite `sigs/`
    * without the retracted vectors, then clear the tombstone list —
    * after compaction the serve pays zero masking overhead and the
    * retracted rows are physically gone (the retention guarantee
    * takedowns ultimately need). Runs under the store's single-writer
    * [[IndexLease]] and repairs any stranded crash layout via
    * [[SwapRecovery.recover]] BEFORE starting; each swap rename is
    * checked so a failure aborts before the tombstone delete
    * ([[MinhashIndexStore.compact]]'s discipline).
    */
  def compact(spark: SparkSession, path: String): Unit =
    IndexLease.withLease(spark, path, "elsh-compact") {
      // tombstones are deleted LAST, so every strandable crash layout
      // still has them — no tombstones means nothing to repair or fold
      if (hasTombstones(spark, path)) {
        SwapRecovery.recover(spark, path, "sigs")
        val fs = SwapRecovery.fsOf(spark, path)
        sigsTable(spark, path)
          .write.mode(SaveMode.Overwrite)
          .partitionBy("table_id")
          .parquet(s"$path/sigs_compacted")
        SwapRecovery.renameOrThrow(fs,
          new org.apache.hadoop.fs.Path(s"$path/sigs"),
          new org.apache.hadoop.fs.Path(s"$path/sigs_old"))
        SwapRecovery.renameOrThrow(fs,
          new org.apache.hadoop.fs.Path(s"$path/sigs_compacted"),
          new org.apache.hadoop.fs.Path(s"$path/sigs"))
        fs.delete(new org.apache.hadoop.fs.Path(s"$path/sigs_old"), true)
        Tombstones.clear(spark, path)
      }
    }

  /** Memoized build-then-delete lifecycle for the retraction gate:
    * the first caller per JVM per path signs the full corpus and then
    * retracts `removed` via [[delete]]; later callers serve from the
    * masked index. The signature family is frozen at build (`bits`
    * from the build-time catalog total) — a takedown masks rows, it
    * never re-derives the quantization, exactly like the IVF frozen
    * quantizer on append.
    */
  def ensureDeleted(corpus: DataFrame, removed: DataFrame, path: String,
      bits: Int): Unit = {
    require(!built.containsKey(path),
      s"$path was built by ensure; use a distinct path per lifecycle")
    built.computeIfAbsent(s"deleted:$path", _ => {
      StorePaths.wipe(corpus.sparkSession, path) // first caller OWNS the path
      build(corpus, path, bits)
      delete(removed, path)
      java.lang.Boolean.TRUE
    })
    ()
  }
}
