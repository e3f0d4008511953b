package graft.operators

import graft.SparkSpecBase
import graft.sources.{MinhashIndexStore, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental near-dup against the persisted MinHash band index:
  * batch equivalence (the delta query must return EXACTLY the batch
  * per-doc rollup restricted to delta ids), index determinism, and the
  * serve-plan audit (stored side scanned, not re-signed).
  */
class DedupIncrementalSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_mh_$tag").toString

  private def run(docs: DataFrame, path: String): DataFrame = {
    val delta = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    MinhashIndexStore.build(corpus, path)
    Dedup.minhashNearDupsDelta(delta, corpus,
      MinhashIndexStore.bandsTable(spark, path))
  }

  test("incremental equals the batch rollup restricted to delta ids") {
    val docs = Tables.documents(spark, sfDir)
    val path = freshPath("equiv")
    val inc = run(docs, path)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    val batch = Dedup.minhashNearDups(docs)
      .filter(col("doc_id") % 10 === 0)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(inc.nonEmpty)
    assert(inc == batch)
    // the gate split must exercise both candidate sources on this data:
    // at least one delta doc with a candidate (else the entry proves
    // nothing about the index join)
    assert(inc.exists(_._2 > 0), inc.take(20))
  }

  test("rebuilt index is byte-identical (deterministic signatures)") {
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0).limit(50)
    val a = MinhashIndexStore.bandRows(corpus)
      .orderBy(MinhashIndexStore.BandKeyCols.map(col) :+ col("doc_id"): _*)
      .collect().toSeq
    val b = MinhashIndexStore.bandRows(corpus)
      .orderBy(MinhashIndexStore.BandKeyCols.map(col) :+ col("doc_id"): _*)
      .collect().toSeq
    assert(a == b)
  }

  test("delete masks the index like a fresh build over the shrunken corpus; compact preserves") {
    val docs = Tables.documents(spark, sfDir)
    val delta = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val removed = docs.filter(col("doc_id") % 10 === 5).select(col("doc_id"))
    // tombstoned index over the full corpus
    val delPath = freshPath("del")
    MinhashIndexStore.build(corpus, delPath)
    MinhashIndexStore.delete(removed, delPath)
    val masked = Dedup.minhashNearDupsDelta(delta, docs,
        MinhashIndexStore.bandsTable(spark, delPath))
      .orderBy("doc_id").as[(Long, Long, Double, Boolean)].collect().toSeq
    // fresh index over the surviving corpus
    val freshP = freshPath("fresh")
    MinhashIndexStore.build(corpus.filter(col("doc_id") % 10 =!= 5), freshP)
    val fresh = Dedup.minhashNearDupsDelta(delta, docs,
        MinhashIndexStore.bandsTable(spark, freshP))
      .orderBy("doc_id").as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(masked == fresh)
    // the retraction must be observable: serving the UNMASKED index
    // differs (otherwise this spec proves nothing on this corpus)
    val unmasked = Dedup.minhashNearDupsDelta(delta, docs,
        spark.read.parquet(s"$delPath/bands")
          .withColumn("band", col("band").cast("int")))
      .orderBy("doc_id").as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(unmasked != masked)
    // compaction folds tombstones into the files: same serve answer,
    // no tombstone list left behind
    MinhashIndexStore.compact(spark, delPath)
    assert(!new java.io.File(s"$delPath/tombstones").exists())
    val compacted = Dedup.minhashNearDupsDelta(delta, docs,
        MinhashIndexStore.bandsTable(spark, delPath))
      .orderBy("doc_id").as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(compacted == fresh)
    // and the retracted rows are physically gone
    assert(spark.read.parquet(s"$delPath/bands")
      .filter(col("doc_id") % 10 === 5).count() == 0L)
  }

  test("exact-twin drop: collapsed query equals the uncollapsed batch rollup") {
    // the replicated-corpus shape (every text delivered several times
    // in one drop): the delta query collapses to distinct-text grain
    // internally and must still return the PER-MEMBER rollup the
    // uncollapsed batch run produces — within-group twins at Jaccard
    // exactly 1.0, cross-group and delta×stored candidates multiplied
    // by the other side's group size
    val base = Seq(
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (4L, "pack my box with five dozen liquor jugs right now"),
      (6L, "sphinx of black quartz judge my vow said the king"))
    // delta: 3 copies of a near-dup of doc 2, 2 copies of an unrelated
    // text, 1 singleton near-dup of the twin group itself
    val delta = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"),
      (20L, "the quick brown fox jumps over the lazy dog tonight"),
      (30L, "the quick brown fox jumps over the lazy dog tonight"),
      (40L, "completely different words about nothing in particular here friend"),
      (50L, "completely different words about nothing in particular here friend"),
      (60L, "the quick brown fox jumps over the lazy dog this evening"))
    val docs = (base ++ delta).toDF("doc_id", "text")
    val path = freshPath("twins")
    MinhashIndexStore.build(docs.filter(col("doc_id") < 10), path)
    val inc = Dedup.minhashNearDupsDelta(
        docs.filter(col("doc_id") >= 10), docs,
        MinhashIndexStore.bandsTable(spark, path))
      .orderBy("doc_id")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    val batch = Dedup.minhashNearDups(docs)
      .filter(col("doc_id") >= 10)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(inc == batch, s"inc=$inc\nbatch=$batch")
    // the twin group must actually exercise the expansion arithmetic
    val twinRow = inc.find(_._1 == 10L).get
    assert(twinRow._2 >= 2, twinRow) // 2 twins + any verified near-dups
    assert(twinRow._3 == 1.0, twinRow)
  }

  test("shared delta side: multi-serve equals per-serve across index states") {
    // the r18 reuse path (dedup_delete_reappend serves one drop against
    // TWO index states): a side built once with shared = true must give
    // each serve exactly what a fresh minhashNearDupsDelta gives it —
    // against the full index AND against the masked (post-delete) index
    val docs = Tables.documents(spark, sfDir)
    val delta = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val removed = docs.filter(col("doc_id") % 10 === 5).select(col("doc_id"))
    val path = freshPath("sharedside")
    MinhashIndexStore.build(corpus, path)
    val side = Dedup.prepareDeltaSide(delta, shared = true)
    def rows(df: DataFrame) = df.orderBy("doc_id")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    val full = MinhashIndexStore.bandsTable(spark, path)
    assert(rows(Dedup.minhashNearDupsDeltaWith(side, delta, docs, full))
      == rows(Dedup.minhashNearDupsDelta(delta, docs, full)))
    MinhashIndexStore.delete(removed, path)
    val masked = MinhashIndexStore.bandsTable(spark, path)
    val sharedMasked =
      rows(Dedup.minhashNearDupsDeltaWith(side, delta, docs, masked))
    assert(sharedMasked == rows(Dedup.minhashNearDupsDelta(delta, docs, masked)))
    // the two states must actually differ, or the test proves nothing
    assert(sharedMasked != rows(Dedup.minhashNearDupsDeltaWith(side, delta,
      docs, full)))
  }

  test("empty delta returns an empty frame with the contract schema") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val path = freshPath("empty")
    val out = run(docs, path)
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_candidates", "best_jaccard", "is_near_dup"))
    assert(out.count() == 0L)
  }

  test("serve plan scans the stored index; text never enters an exchange") {
    val docs = Tables.documents(spark, sfDir)
    val path = freshPath("plan")
    // the stored corpus side is a parquet scan of the index path.
    // Since r15 the candidate verify materializes eagerly (the pinned
    // copy→crep map and rep-grain verify frames), so the index scan
    // sits inside a pinned stage's job rather than the final plan —
    // capture every pinned stage's plan via the pin hook and assert
    // the index-path FileScan there (the r15 review found the old
    // final-plan disjunct `contains("Scan ExistingRDD")` vacuous once
    // pins exist in every plan).
    val pinnedPlans = scala.collection.mutable.ArrayBuffer.empty[String]
    org.apache.spark.sql.GraftInternal.pinObserver =
      d => pinnedPlans.synchronized {
        pinnedPlans += d.queryExecution.executedPlan.toString; ()
      }
    val df = try {
      val d = run(docs, path); d.collect(); d
    } finally org.apache.spark.sql.GraftInternal.pinObserver = null
    val p = df.queryExecution.executedPlan.toString
    val finalSection = p.split("== Initial Plan ==").head
    val everywhere = (p +: pinnedPlans.toSeq).mkString("\n")
    assert(everywhere.contains("graft_mh_plan"),
      s"no index-path scan in the final plan or any pinned stage\n$everywhere")
    // no corpus-only signing branch: every minhash computation in the
    // plan sits on a delta-filtered scan, so each signing Project's
    // source filter must include the POSITIVE delta predicate (the
    // semi-join-inferred contradiction branch carries both atoms and
    // passes; a corpus re-sign would carry only the NOT atom)
    val positiveDelta = """(?<!NOT \()\(\(doc_id#\d+L? % 10\) = 0\)""".r
    val corpusScanLines = finalSection.linesIterator.filter { l =>
      l.contains("documents.parquet") && l.contains("FileScan") &&
        positiveDelta.findFirstIn(l).isEmpty
    }.toSeq
    // corpus scans exist only for the verify text fetch (no signing
    // above them is proven functionally by the tampered-index test)
    assert(corpusScanLines.forall(_.contains("text")), p)
    // no text column in any exchange: band keys and ids shuffle, text
    // never does
    val exchanges = finalSection.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.forall(l => !l.contains("text") && !l.contains("shingles")), p)
  }

  test("append equals rebuild: the rolled index is byte-identical") {
    val docs = Tables.documents(spark, sfDir)
    val base = docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5)
    val drop1 = docs.filter(col("doc_id") % 10 === 5)
    val rolled = freshPath("rolled")
    MinhashIndexStore.build(base, rolled)
    MinhashIndexStore.append(drop1, rolled)
    val rebuilt = freshPath("rebuilt")
    MinhashIndexStore.build(base.unionByName(drop1), rebuilt)
    val ordCols = MinhashIndexStore.BandKeyCols.map(col) :+ col("doc_id")
    val a = MinhashIndexStore.bandsTable(spark, rolled)
      .orderBy(ordCols: _*).collect().toSeq
    val b = MinhashIndexStore.bandsTable(spark, rebuilt)
      .orderBy(ordCols: _*).collect().toSeq
    assert(a.nonEmpty)
    assert(a == b)
  }

  test("embedding incremental equals the batch pairs restricted to the delta") {
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.filter(col("embedding").isNotNull).count()
    val bits = Dedup.adaptiveBits(n)
    val delta = emb.filter(col("vec_id") % 10 === 0)
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val path = freshPath("emb")
    graft.sources.EmbLshIndexStore.build(corpus, path, bits)
    val inc = Dedup.embeddingNearDupsDelta(delta, emb,
        graft.sources.EmbLshIndexStore.sigsTable(spark, path), bits)
      .orderBy("a_id", "b_id")
      .as[(Long, Long, Double)].collect().toSeq
    val batch = Dedup.embeddingNearDupsAll(emb)
      .filter(col("a_id") % 10 === 0 || col("b_id") % 10 === 0)
      .orderBy("a_id", "b_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(inc.nonEmpty)
    assert(inc == batch)
  }

  test("stored index IS the corpus side: tampering it changes the answer") {
    // functional proof the corpus is never re-signed in the serve
    // plan: swap the stored band table for an EMPTY one — if the plan
    // recomputed corpus signatures from the docs table the answer
    // would be unchanged; with the store honored, only delta-internal
    // candidates remain, i.e. exactly the batch run over the delta
    // alone
    val docs = Tables.documents(spark, sfDir)
    val delta = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val path = freshPath("tamper")
    // a one-row decoy corpus whose shingles (and hence band tuples)
    // cannot collide with any real document
    MinhashIndexStore.build(
      Seq((999999999L, "zzzq yyyq xxxq wwwq vvvq uuuq"))
        .toDF("doc_id", "text"), path)
    val inc = Dedup.minhashNearDupsDelta(delta, corpus,
        MinhashIndexStore.bandsTable(spark, path))
      .orderBy("doc_id")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    val deltaOnly = Dedup.minhashNearDups(delta)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(inc == deltaOnly)
  }

  test("stored SIG index is the embedding corpus side: tampering it changes the answer") {
    // the embedding-LSH twin of the band-store tamper proof: serve the
    // delta against a decoy signature store — if the plan re-signed
    // the corpus from the embeddings table the decoy would be ignored;
    // with the store honored, only delta-internal pairs remain
    import graft.sources.EmbLshIndexStore
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.filter(col("embedding").isNotNull).count()
    val bits = Dedup.adaptiveBits(n)
    val delta = emb.filter(col("vec_id") % 10 === 0)
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val honest = java.nio.file.Files
      .createTempDirectory("graft_elsh_honest").toString
    EmbLshIndexStore.build(corpus, honest, bits)
    val full = Dedup.embeddingNearDupsDelta(delta, emb,
        EmbLshIndexStore.sigsTable(spark, honest), bits)
      .orderBy("a_id", "b_id").as[(Long, Long, Double)].collect().toSeq
    // decoy: one unreachable vector id with an impossible signature
    val decoy = java.nio.file.Files
      .createTempDirectory("graft_elsh_decoy").toString
    Seq((999999999L, 0, -1))
      .toDF("vec_id", "table_id", "sig")
      .write.partitionBy("table_id").parquet(s"$decoy/sigs")
    val tampered = Dedup.embeddingNearDupsDelta(delta, emb,
        EmbLshIndexStore.sigsTable(spark, decoy), bits)
      .orderBy("a_id", "b_id").as[(Long, Long, Double)].collect().toSeq
    assert(full != tampered, "store tamper must be observable")
    // with the store emptied of real vectors, every surviving pair is
    // delta-internal — the functional proof the corpus side is a SCAN
    tampered.foreach { case (a, b, _) =>
      assert(a % 10 == 0 && b % 10 == 0, s"pair ($a, $b)") }
  }
}
