package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Single-writer lease for index-store MUTATIONS (append / delete /
  * compact) — the mutual-exclusion protocol that closes the racing
  * append-vs-compact window all three stores previously documented
  * away: compact snapshots the live layer, rewrites it, and swaps the
  * rewrite into place, so an append that lands between the snapshot
  * and the swap writes into the doomed pre-swap directory and is
  * silently dropped by the cleanup. With every mutator running under
  * [[withLease]], an append either completes before compact snapshots
  * (its rows are in the rewrite) or starts after the swap finishes
  * (its rows land in the promoted layer) — no lost update.
  *
  * Mechanics: an atomically-created `_lease` marker file under the
  * store path (underscore-prefixed, so table readers treat it as
  * hidden). Acquisition spins with a bounded timeout; release deletes
  * the marker in a `finally`. On `file:` paths the create goes through
  * `java.nio` `createFile` (true O_EXCL atomicity — Hadoop's local FS
  * check-then-create has a race window); on HDFS `create(overwrite =
  * false)` is atomic at the NameNode. Object stores WITHOUT atomic
  * create-if-absent still need a table format's transaction log — the
  * production caveat lives here now, not inside each store's swap.
  *
  * Crash story: a holder that dies leaves the marker, and the next
  * mutator times out with an actionable message rather than running
  * into a half-mutated layout; [[SwapRecovery.recover]] (called at
  * compact entry) repairs whatever the dead holder stranded before the
  * operator clears the marker. Reads never take the lease — serving
  * stays lock-free because every intermediate compact state keeps a
  * complete layer on disk (the rename-swap invariant).
  */
object IndexLease {

  private def tryAcquire(fs: org.apache.hadoop.fs.FileSystem,
      lease: Path, who: String): Boolean =
    if (fs.getScheme == "file") {
      try {
        val p = java.nio.file.Paths.get(lease.toUri.getPath)
        java.nio.file.Files.write(p, who.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else {
      // two failure classes must not be conflated: create(overwrite =
      // false) failing means SOMEONE ELSE holds the lease (return
      // false and spin), but a failure writing/closing the diagnostic
      // tag AFTER our create succeeded means WE hold a marker we are
      // about to disown — delete it before reporting failure, or the
      // caller spins against its own orphaned lease until timeout and
      // every later mutator is locked out until hand-repair
      val created =
        try Some(fs.create(lease, false))
        catch { case _: java.io.IOException => None }
      created match {
        case None => false
        case Some(out) =>
          try {
            try out.write(who.getBytes("UTF-8")) finally out.close()
            true
          } catch {
            case e: java.io.IOException =>
              try fs.delete(lease, false)
              catch { case _: java.io.IOException => () }
              throw e
          }
      }
    }

  /** Default acquisition timeout; overridable per-JVM via the
    * `graft.lease.timeoutMs` system property — compact() holds the
    * lease across a full layer rewrite, so deployments with large
    * indexes should size this to their compaction time rather than
    * deleting a LIVE holder's marker (the timeout message's recovery
    * instructions apply only to a holder that is verifiably dead).
    */
  private def defaultTimeoutMs: Long =
    sys.props.get("graft.lease.timeoutMs").map(_.toLong).getOrElse(120000L)

  /** Run `body` holding the store's single-writer lease. `who` is a
    * diagnostic tag written into the marker (which operation, for the
    * timeout message of whoever waits on a crashed holder).
    */
  def withLease[T](spark: SparkSession, path: String, who: String,
      timeoutMs: Long = -1L)(body: => T): T = {
    val effectiveTimeoutMs =
      if (timeoutMs >= 0L) timeoutMs else defaultTimeoutMs
    val fs = SwapRecovery.fsOf(spark, path)
    fs.mkdirs(new Path(path))
    val lease = new Path(s"$path/_lease")
    val deadline = System.currentTimeMillis() + effectiveTimeoutMs
    while (!tryAcquire(fs, lease, who)) {
      if (System.currentTimeMillis() > deadline)
        throw new IllegalStateException(
          s"could not acquire index lease $lease (wanted by: $who) within " +
            s"${effectiveTimeoutMs}ms. A crashed holder leaves the marker — " +
            "but so does a LIVE long compaction: verify no writer is live " +
            "(or raise -Dgraft.lease.timeoutMs) BEFORE recovering; if the " +
            "holder is dead, run SwapRecovery.recover, then delete the marker")
      Thread.sleep(25)
    }
    try body finally { fs.delete(lease, false); () }
  }
}
