package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Writer mutual exclusion on a storage root — the lock-file protocol
  * factored out of the event store (S14; the reference leans on DuckDB's
  * OS file lock plus a 5 × 100 ms retry envelope, event_data.rs:33-101)
  * so every single-writer store (event tables, the dedup index, the
  * vector index) enforces its contract instead of assuming it.
  *
  * The lock is an exclusively-created `_writer_lock` file: java.nio
  * `createFile` (atomic create-if-absent) for local paths,
  * `FileSystem.create(overwrite = false)` (namenode-atomic) elsewhere.
  *
  * An OS lock dies with its process; a lock FILE from a crashed writer
  * does not, so liveness is carried by the file's mtime:
  *  - the HOLDER heartbeats the mtime every `staleMs / 6` from a daemon
  *    thread, so a live writer is never judged stale no matter how long
  *    its Spark jobs run;
  *  - a contender breaks the lock only when the mtime is older than
  *    `staleMs` AND a re-stat immediately before the delete still shows
  *    the SAME stale mtime — a lock re-created (or heartbeated) between
  *    the two stats has a fresh stamp and is left alone. The stat→delete
  *    pair is not atomic; the residual window requires a competing
  *    breaker's delete plus a full re-acquire to interleave within it,
  *    and breakers only exist at all after a writer crash — accepted and
  *    documented (full fencing needs a coordination service, out of
  *    scope as in the reference's single-file lock).
  *
  * On a FileSystem where `setTimes` is a no-op (some object stores), the
  * heartbeat carries no signal — size `staleMs` to the worst-case job
  * duration there.
  *
  * @param attempts bounded acquire attempts before failing (every loop
  *                 iteration counts — contended lock, vanished lock,
  *                 failed stat, failed stale-delete — never a busy-spin)
  * @param waitMs   sleep between attempts
  */
final class WriterLock(spark: SparkSession, root: String,
    staleMs: Long = WriterLock.DefaultStaleMs,
    attempts: Int = WriterLock.DefaultAttempts,
    waitMs: Long = WriterLock.DefaultWaitMs) {

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Same-thread reentrancy: an API handler validates-then-inserts under
    * one lock hold while the store's own insert methods take the lock
    * too — the inner hold must not deadlock against the outer. Scoped to
    * this instance + thread; a second instance on the same root (another
    * process) still excludes through the file. */
  private val held = new ThreadLocal[java.lang.Boolean] {
    override def initialValue: java.lang.Boolean = java.lang.Boolean.FALSE
  }

  def withLock[T](f: => T): T = {
    if (held.get) return f
    val lock = new Path(root, "_writer_lock")
    def tryAcquire(): Boolean = {
      val uri = lock.toUri
      if (uri.getScheme == null || uri.getScheme == "file")
        try {
          java.nio.file.Files.createFile(java.nio.file.Paths.get(uri.getPath)); true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: java.nio.file.NoSuchFileException => // parent missing
            fs.mkdirs(new Path(root)); tryAcquire()
        }
      else
        try { fs.create(lock, false).close(); true }
        catch { case _: java.io.IOException => false }
    }
    var attempt = 0
    var acquired = tryAcquire()
    while (!acquired) {
      attempt += 1
      if (attempt > attempts)
        sys.error(s"writer lock on $root not acquired after " +
          s"$attempts × $waitMs ms — is another writer stuck?")
      val seen =
        try Some(fs.getFileStatus(lock).getModificationTime)
        catch { case _: java.io.IOException => None }
      val stale = seen.exists(_ < System.currentTimeMillis() - staleMs)
      val broke = stale && {
        val unchanged =
          try fs.getFileStatus(lock).getModificationTime == seen.get
          catch { case _: java.io.IOException => false }
        unchanged && fs.delete(lock, false)
      }
      if (!broke) Thread.sleep(waitMs) // a break retries now
      acquired = tryAcquire()
    }
    val beat = new Thread(() => {
      try while (true) {
        Thread.sleep(math.max(1L, staleMs / 6))
        // transient stat/refresh failures (namenode failover, the
        // documented breaker micro-race) must NOT kill the heartbeat —
        // a dead heartbeat re-exposes a live writer to stale-breaking
        try fs.setTimes(lock, System.currentTimeMillis(), -1)
        catch { case _: java.io.IOException => }
      } catch { case _: InterruptedException => } // released
    }, s"graft-lock-heartbeat-$root")
    beat.setDaemon(true)
    beat.start()
    held.set(java.lang.Boolean.TRUE)
    try f finally {
      held.set(java.lang.Boolean.FALSE)
      beat.interrupt(); fs.delete(lock, false)
    }
  }
}

object WriterLock {
  /** The reference's retry envelope (event_data.rs:33-36). */
  val DefaultAttempts = 5
  val DefaultWaitMs = 100L

  /** Default age after which a non-heartbeated lock is presumed
    * abandoned (crashed writer) and broken. Live holders refresh the
    * mtime every sixth of this, so only a dead writer's lock ages out. */
  val DefaultStaleMs = 60000L

  /** Envelope for index-maintenance writers: a concurrent compaction or
    * batch insert legitimately holds the lock for tens of seconds, so
    * contenders wait out a full job (120 × 500 ms = 60 s) instead of the
    * event store's 5 × 100 ms request-path envelope. */
  def forIndex(spark: SparkSession, root: String): WriterLock =
    new WriterLock(spark, root, attempts = 120, waitMs = 500L)
}
