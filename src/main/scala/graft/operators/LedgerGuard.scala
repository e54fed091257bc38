package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Cross-JVM coordination primitives for the at-rest ledgers
  * ([[DedupOps.compactLedger]], [[CurationOps.advanceStatsLedger]]).
  *
  * The staging/retire rename swap is safe against crashes (each rename
  * is atomic; a crash between them is self-healed by the next writer),
  * and in-JVM writers are serialized per path — but two PROCESSES
  * advancing the same ledger could interleave the rename pair and lose
  * a batch. [[withLease]] closes that hole best-effort with a lease
  * marker file: `create(path, overwrite = false)` is atomic on HDFS and
  * local filesystems, so at most one process holds the lease; a second
  * writer FAILS FAST with an error naming the holder instead of
  * corrupting silently. The lease is best-effort by design — a plain
  * filesystem cannot promise more (no fencing tokens) — which is the
  * honest contract for an ingest cluster: the scheduler should not run
  * two compactions of one ledger, and if it does, one dies loudly.
  *
  * Staleness: a crashed holder leaves its marker behind. A lease older
  * than `staleAfterMs` is broken (deleted and re-acquired) so one crash
  * never wedges the pipeline permanently; the timeout must exceed the
  * longest legitimate swap (the staging write of a model-sized ledger —
  * minutes at most, so the 15-minute default is conservative).
  */
object LedgerGuard {

  /** Run `body` holding the lease marker `<target>.lock`. Throws
    * `IllegalStateException` naming the current holder when the lease
    * is taken and fresh; breaks and re-acquires a stale lease.
    */
  def withLease[T](fs: FileSystem, target: Path,
      staleAfterMs: Long = 15L * 60 * 1000)(body: => T): T = {
    val lock = target.suffix(".lock")
    val holderInfo =
      s"${ProcessHandle.current.pid}@${java.net.InetAddress.getLocalHost.getHostName}"
    def tryAcquire(): Boolean = {
      val created =
        try Some(fs.create(lock, false)) // atomic create-fail-if-exists
        catch { case _: java.io.IOException => None }
      created match {
        case None => false
        case Some(out) =>
          try { out.write(holderInfo.getBytes("UTF-8")); out.close(); true }
          catch { case _: java.io.IOException =>
            // create succeeded but the holder-info write failed (disk
            // full, transient IO): the file on disk is OURS and garbage.
            // Remove it before reporting failure, or every writer —
            // including this one on retry — would be refused for
            // staleAfterMs behind an empty lease.
            try fs.delete(lock, false) catch { case _: java.io.IOException => () }
            false
          }
      }
    }
    def holderOf(): String =
      try {
        val in = fs.open(lock)
        try new String(in.readNBytes(256), "UTF-8") finally in.close()
      } catch { case _: java.io.IOException => "<unreadable>" }
    if (!tryAcquire()) {
      val stale =
        try System.currentTimeMillis - fs.getFileStatus(lock).getModificationTime > staleAfterMs
        catch { case _: java.io.IOException => true } // vanished: holder released; retry
      // Break a stale lease by RENAMING the observed file, never by
      // delete-then-create: of N writers that all judged the lease
      // stale, exactly one rename succeeds (the source vanishes for the
      // rest), so a slow second breaker can never delete the winner's
      // freshly re-acquired lease — the double-holder interleaving this
      // guard exists to prevent. The winner disposes of the tombstone.
      if (stale) {
        val tomb = lock.suffix(s".stale.${ProcessHandle.current.pid}.${System.nanoTime}")
        val broke = try fs.rename(lock, tomb) catch { case _: java.io.IOException => false }
        if (broke) {
          try fs.delete(tomb, false) catch { case _: java.io.IOException => () }
        }
      }
      if (!tryAcquire())
        throw new IllegalStateException(
          s"ledger $target is locked by writer ${holderOf()} (lease $lock); " +
            "concurrent ledger writers would interleave the staging swap and lose a batch — " +
            s"wait for the holder or remove the lease if it is known dead")
    }
    try body finally fs.delete(lock, false)
  }

  /** The path a READER of the ledger should load: the target itself
    * normally; if the target is absent (the window between a writer's
    * two swap renames, or a crash there), fall back READ-ONLY to the
    * staging sibling (written complete before the target is ever
    * retired) or the retired one. Readers never rename — mutating here
    * would race the writer's own promote/rollback.
    */
  def readablePath(fs: FileSystem, target: Path): Path = {
    if (fs.exists(target)) target
    else {
      val staging = target.suffix(".staging")
      val retired = target.suffix(".old")
      if (fs.exists(staging)) staging
      else if (fs.exists(retired)) retired
      else throw new java.io.FileNotFoundException(
        s"ledger absent at $target with no staging/retired generation to read")
    }
  }
}
