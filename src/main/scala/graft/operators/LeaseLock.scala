package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem lease lock — the writer-serialization layer that upgrades the
  * persistent indexes from a DOCUMENTED single-writer regime to supported
  * concurrent writers.
  *
  * The maintenance guards ([[BucketedMaintenance.compact]]'s abort/rollback
  * listings, [[BucketedMaintenance.guardedAppend]]'s survivorship probes)
  * turn every writer race from silent loss into loud detection — but
  * detection means concurrent writers must QUIESCE AND RE-RUN. This lock
  * removes the races instead: every index maintenance entry point
  * (build / append / assignInto / rebuild / compact) serializes on a
  * per-index lease, so any number of appenders and one compactor can run
  * concurrently against the same index and every call commits exactly
  * once, in some serial order. The guards stay armed underneath as
  * defense-in-depth against external non-locking writers.
  *
  * Mechanics — HDFS-compatible primitives only:
  *   - ACQUIRE is `FileSystem.create(path, overwrite = false)` — atomic
  *     create-exclusive on HDFS and local filesystems. The file body holds
  *     a random holder token.
  *   - EXPIRY: a lock older than `leaseMs` (mtime) is presumed abandoned
  *     (crashed holder). Takeover is RENAME-based: exactly one contender
  *     wins the rename of the stale file to a tombstone; the winner then
  *     re-checks what it actually took — if a FRESH lock had replaced the
  *     stale one in the window (TOCTOU), it is renamed straight back and
  *     the contender backs off.
  *   - RENEW bumps mtime via `setTimes` (no rewrite window) after
  *     verifying the token — a long-running holder extends its lease.
  *   - RELEASE deletes the file only if the token still matches (after an
  *     expiry takeover, the path may be someone else's lock).
  *
  * Honest contract (the same one every mtime-lease lock carries, including
  * production lake-format S3 coordinators): mutual exclusion is
  * unconditional among live holders; takeover of an EXPIRED lease is safe
  * iff the expired holder is actually dead or will fail its token check
  * before writing again. A holder frozen past its whole lease (GC pause
  * measured in minutes) can overlap its usurper — size `leaseMs` to
  * dominate any plausible pause (default 15 min) or renew inside long
  * operations. On an object store without atomic create-exclusive or
  * rename, substitute the store's conditional-put primitive.
  *
  * Reentrant per thread: an entry point that calls another locked entry
  * point (rebuildIfNeeded → rebuild) re-enters without deadlocking. */
object LeaseLock {

  final case class Handle(fs: FileSystem, path: Path, token: String)

  val DefaultLeaseMs: Long = 15 * 60 * 1000L
  val DefaultWaitMs: Long = 120 * 1000L

  private val held = new ThreadLocal[scala.collection.mutable.Set[String]] {
    override def initialValue(): scala.collection.mutable.Set[String] =
      scala.collection.mutable.Set.empty[String]
  }

  /** Serialize `body` on the per-index lease for `tag`. The lock lives
    * under the session's warehouse directory — the coordination domain
    * every writer of a catalog table already shares — so entry points
    * without a maintenance `path` argument (assignInto) lock the same
    * lease as those with one. */
  def withTableLock[T](spark: SparkSession, tag: String,
                       leaseMs: Long = DefaultLeaseMs,
                       waitMs: Long = DefaultWaitMs)(body: => T): T = {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    // session-tunable DEFAULTS: a loaded cluster (or a saturated test JVM)
    // can hold a writer's jobs queued past the default wait — the right
    // bound is workload-specific, so the conf retunes it. An explicitly
    // passed argument always wins over the conf (the conf replaces only
    // the built-in default, never a caller's stated bound).
    def tuned(passed: Long, default: Long, key: String): Long =
      if (passed != default) passed
      else spark.conf.getOption(key).map(_.toLong).getOrElse(default)
    withLock(spark, s"$warehouse/_graft_locks/$tag.lock",
      tuned(leaseMs, DefaultLeaseMs, "spark.graft.lease.leaseMs"),
      tuned(waitMs, DefaultWaitMs, "spark.graft.lease.waitMs"))(body)
  }

  def withLock[T](spark: SparkSession, lockPath: String,
                  leaseMs: Long = DefaultLeaseMs,
                  waitMs: Long = DefaultWaitMs)(body: => T): T = {
    val p = new Path(lockPath)
    val key = p.toString
    if (held.get.contains(key)) return body // reentrant within the thread
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val h = acquire(fs, p, leaseMs, waitMs)
    held.get += key
    try body
    finally { held.get -= key; release(h) }
  }

  def acquire(fs: FileSystem, p: Path, leaseMs: Long = DefaultLeaseMs,
              waitMs: Long = DefaultWaitMs): Handle = {
    val token = java.util.UUID.randomUUID().toString
    val parent = p.getParent
    if (parent != null) fs.mkdirs(parent)
    val deadline = System.nanoTime() + waitMs * 1000000L
    var backoff = 20L
    while (true) {
      if (tryCreate(fs, p, token)) return Handle(fs, p, token)
      val stale =
        try System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime > leaseMs
        catch { case _: java.io.FileNotFoundException => false } // freed: retry create
      if (stale) {
        // rename-based takeover: exactly one contender owns the tombstone
        val tomb = new Path(parent, s"${p.getName}.expired.$token")
        val won = try fs.rename(p, tomb) catch { case _: java.io.IOException => false }
        if (won) {
          val tookFresh =
            try System.currentTimeMillis() - fs.getFileStatus(tomb).getModificationTime <= leaseMs
            catch { case _: java.io.IOException => false }
          if (tookFresh) {
            // TOCTOU: a fresh lock replaced the stale one before our rename —
            // give it straight back (we own the tombstone, so this is safe)
            try fs.rename(tomb, p) catch { case _: java.io.IOException => () }
          } else fs.delete(tomb, false)
        }
      }
      if (System.nanoTime() > deadline)
        throw new IllegalStateException(
          s"LeaseLock: could not acquire $p within ${waitMs} ms — held by a live " +
            "writer (or an abandoned lock younger than the lease). If the holder is " +
            s"known dead, delete the file or wait out the ${leaseMs} ms lease.")
      Thread.sleep(backoff)
      backoff = math.min(backoff * 2, 500L)
    }
    throw new IllegalStateException("unreachable")
  }

  /** Extend a held lease (mtime bump; no rewrite window). Throws if the
    * lock is no longer ours — the holder must stop writing immediately. */
  def renew(h: Handle): Unit = {
    require(ownsLock(h), s"LeaseLock: lease on ${h.path} lost (expired and taken over)")
    h.fs.setTimes(h.path, System.currentTimeMillis(), -1)
  }

  def release(h: Handle): Unit =
    try if (ownsLock(h)) h.fs.delete(h.path, false)
    catch { case _: java.io.IOException => () } // crashed FS: lease expiry recovers

  private def ownsLock(h: Handle): Boolean =
    try {
      val in = h.fs.open(h.path)
      val buf = new Array[Byte](256)
      val n = try in.read(buf) finally in.close()
      n > 0 && new String(buf, 0, n, "UTF-8") == h.token
    } catch { case _: java.io.IOException => false }

  /** Atomic create-exclusive. `FileSystem.create(p, overwrite = false)` is
    * atomic on HDFS (namenode-arbitrated) but CHECK-THEN-CREATE on the
    * local filesystem (LeaseLockSpec's 4-thread spin caught the overlap
    * live) — so `file:` paths go through NIO `createFile`, which is
    * O_CREAT|O_EXCL. A contender reading the file between create and the
    * token write sees an empty body: it owns nothing and backs off; a
    * crash in that window ages into an expired lease like any other. */
  private def tryCreate(fs: FileSystem, p: Path, token: String): Boolean =
    if (fs.getScheme == "file") {
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      try {
        java.nio.file.Files.createFile(local)
        java.nio.file.Files.write(local, token.getBytes("UTF-8"))
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.io.IOException => false
      }
    } else
      try {
        val out = fs.create(p, false)
        try out.write(token.getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
}
