package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The single-writer lease that makes index mutation concurrency-safe:
  * a DETERMINISTIC interleaving (latch-sequenced, no sleeps-and-hope)
  * proving an append cannot run inside compact's snapshot-rewrite-swap
  * window — the lost-update race all three stores' compact() docs
  * previously disclaimed — plus the crashed-holder timeout story.
  */
class IndexLeaseSpec extends SparkSpecBase {

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val base = docs.filter(col("doc_id") % 10 =!= 0)
  private lazy val delta = docs.filter(col("doc_id") % 10 === 0)

  private def freshIndex(tag: String): String = {
    val p = java.nio.file.Files
      .createTempDirectory(s"graft_lease_$tag").toString
    MinhashIndexStore.build(base, p)
    p
  }

  test("append blocks while another mutator holds the lease, then lands intact") {
    val p = freshIndex("mx")
    val baseRows = spark.read.parquet(s"$p/bands").count()
    val holderIn = new java.util.concurrent.CountDownLatch(1)
    val releaseHolder = new java.util.concurrent.CountDownLatch(1)
    val appendDone = new java.util.concurrent.CountDownLatch(1)
    // T1 simulates compact mid-swap: takes the lease and parks inside it
    val holder = new Thread(() =>
      IndexLease.withLease(spark, p, "compact-sim") {
        holderIn.countDown()
        releaseHolder.await()
      })
    holder.start()
    assert(holderIn.await(30, java.util.concurrent.TimeUnit.SECONDS))
    // T2 tries the real append — it must WAIT on the lease
    val appender = new Thread(() => {
      MinhashIndexStore.append(delta, p)
      appendDone.countDown()
    })
    appender.start()
    assert(!appendDone.await(1, java.util.concurrent.TimeUnit.SECONDS),
      "append must not proceed while the lease is held")
    assert(spark.read.parquet(s"$p/bands").count() == baseRows,
      "no appended row may land inside the holder's window")
    releaseHolder.countDown()
    assert(appendDone.await(120, java.util.concurrent.TimeUnit.SECONDS),
      "append must complete once the lease is released")
    holder.join(); appender.join()
    // nothing lost: the landed index equals a fresh build over the union
    val expected = MinhashIndexStore.bandRows(base.unionByName(delta)).count()
    assert(spark.read.parquet(s"$p/bands").count() == expected)
  }

  test("delete-then-compact-then-append under the lease loses no rows") {
    // the sequential protocol every mutator now follows: after a full
    // delete + compact cycle, an append lands on the compacted layer
    // and the serve equals a fresh build over (base - removed + delta)
    val p = freshIndex("seq")
    val removed = base.filter(col("doc_id") % 10 === 5).select(col("doc_id"))
    MinhashIndexStore.delete(removed, p)
    MinhashIndexStore.compact(spark, p)
    MinhashIndexStore.append(delta, p)
    val survivors = base.filter(col("doc_id") % 10 =!= 5).unionByName(delta)
    assert(spark.read.parquet(s"$p/bands").count() ==
      MinhashIndexStore.bandRows(survivors).count())
    assert(!new java.io.File(s"$p/_lease").exists(),
      "the lease must be released after every mutation")
  }

  test("a crashed holder's marker times out with an actionable error") {
    val p = freshIndex("crash")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$p/_lease"),
      "dead-writer".getBytes("UTF-8"))
    val err = intercept[IllegalStateException] {
      IndexLease.withLease(spark, p, "append", timeoutMs = 300L) { () }
    }
    assert(err.getMessage.contains("crashed holder"))
    // operator intervention: clear the marker, mutation proceeds
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$p/_lease"))
    MinhashIndexStore.append(delta, p)
    assert(spark.read.parquet(s"$p/bands").count() ==
      MinhashIndexStore.bandRows(base.unionByName(delta)).count())
  }

  test("the default timeout honors -Dgraft.lease.timeoutMs") {
    val p = freshIndex("knob")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$p/_lease"),
      "dead-writer".getBytes("UTF-8"))
    sys.props("graft.lease.timeoutMs") = "200"
    try {
      val t0 = System.nanoTime()
      intercept[IllegalStateException] {
        // NO explicit timeout — the sys-prop default must govern
        IndexLease.withLease(spark, p, "append") { () }
      }
      val ms = (System.nanoTime() - t0) / 1000000L
      // well under the built-in 120s default, a little over the knob
      assert(ms < 10000L, s"sys-prop timeout not honored: waited ${ms}ms")
    } finally {
      sys.props.remove("graft.lease.timeoutMs")
      java.nio.file.Files.delete(java.nio.file.Paths.get(s"$p/_lease"))
      ()
    }
  }
}
