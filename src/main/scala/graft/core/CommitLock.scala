package graft.core

import java.io.IOException

import org.apache.hadoop.fs.{FileSystem, Path}

/** Cross-process commit mutex backed by an atomic lock-file create.
  *
  * The reference serializes commits with HBase `check-and-put`
  * (hbase.clj:241-245) — atomic across processes because the server
  * arbitrates. A filesystem lock file must provide the same guarantee:
  *
  *  - `file:` scheme — Hadoop's `RawLocalFileSystem.create(overwrite
  *    = false)` is check-then-create (two syscalls, NOT atomic), so two
  *    processes can both "acquire" it. We route local paths through
  *    `java.io.File.createNewFile()` (`O_CREAT|O_EXCL`, atomic in
  *    POSIX).
  *  - HDFS-like stores — `create(path, overwrite = false)` IS atomic
  *    (the namenode arbitrates), so the generic path is used.
  *
  * The lock carries an owner id + create timestamp; locks older than
  * `leaseMs` are presumed crashed and stolen (delete + re-race). A
  * LIVE holder whose critical section legitimately outlives the lease
  * (commitStaged runs real Spark jobs under the lock; gc/retention run
  * distributed sweeps) is protected by a heartbeat daemon that renews
  * the lease (touches the lock's mtime) every `leaseMs / 3` — waiters
  * only ever steal from a crashed or frozen-longer-than-a-lease owner.
  * Release is fenced on the owner id: the holder deletes the lock only
  * if it still owns it, and if the lease WAS lost (e.g. a multi-lease
  * GC pause let a waiter steal) the holder fails loudly with
  * [[LockLeaseLostException]] instead of reporting a "serialized"
  * section that in fact ran concurrently. The engine analog of the
  * reference's disabled `lots-of-processes` tests
  * (hbase_test.clj:134-138) lives in ManifestAndLockSpec, which races
  * real JVMs through this primitive.
  */
object CommitLock {

  /** The holder's lease expired mid-critical-section and another
    * process took the lock: mutual exclusion may have been violated,
    * so the section must be treated as failed (its commit record was
    * not necessarily serialized against the stealer's).
    */
  final class LockLeaseLostException(msg: String)
    extends RuntimeException(msg)

  def withLock[T](fs: FileSystem, lock: Path, ownerId: String,
      leaseMs: Long = 60000L, timeoutMs: Long = 120000L)(body: => T): T = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var acquired = false
    while (!acquired) {
      if (tryCreate(fs, lock, ownerId)) acquired = true
      else {
        val age =
          try System.currentTimeMillis() -
            fs.getFileStatus(lock).getModificationTime
          catch { case _: IOException => -1L } // vanished: re-race
        if (age > leaseMs) {
          // presumed-crashed owner: steal. The delete itself can race
          // another stealer; both fall through to the atomic re-create
          // and exactly one wins. A live owner's heartbeat keeps age
          // below the lease, so only dead/frozen owners are stolen.
          try fs.delete(lock, false) catch { case _: IOException => () }
        } else if (System.currentTimeMillis() > deadline) {
          throw new RuntimeException(
            s"commit lock timeout after ${timeoutMs}ms: $lock held")
        } else Thread.sleep(20)
      }
    }
    // heartbeat: renew the lease while the critical section runs; if
    // the lock no longer carries our owner id, the lease was stolen
    val lost = new java.util.concurrent.atomic.AtomicBoolean(false)
    val hb = new Thread({ () =>
      try {
        var running = true
        while (running) {
          Thread.sleep(math.max(1L, leaseMs / 3))
          if (owner(fs, lock).contains(ownerId)) touch(fs, lock)
          else { lost.set(true); running = false }
        }
      } catch { case _: InterruptedException => () }
    }: Runnable, s"graft-commit-lock-heartbeat")
    hb.setDaemon(true)
    hb.start()
    val result =
      try body
      finally {
        hb.interrupt()
        try hb.join(2000) catch { case _: InterruptedException => () }
        // owner fence: only delete a lock we still own — never a
        // stealer's. (Read-then-delete is not atomic, but the fence
        // window is microseconds vs the lease's tens of seconds, and
        // a racing stealer implies the lease already expired, which
        // the `lost` flag converts to a loud failure below.)
        if (owner(fs, lock).contains(ownerId)) {
          try fs.delete(lock, false) catch { case _: IOException => () }
        } else lost.set(true)
      }
    if (lost.get())
      throw new LockLeaseLostException(
        s"commit lock $lock lease ($leaseMs ms) lost mid-section by " +
          s"$ownerId: the critical section was not serialized; treat " +
          "this commit as failed")
    result
  }

  /** Current owner id recorded in the lock file, if readable. */
  private def owner(fs: FileSystem, lock: Path): Option[String] =
    try {
      val in = fs.open(lock)
      try {
        val buf = new Array[Byte](256)
        val n = in.read(buf)
        Some(new String(buf, 0, math.max(n, 0), "UTF-8"))
      } finally in.close()
    } catch { case _: IOException => None }

  /** Renew the lease: bump the lock's modification time. */
  private def touch(fs: FileSystem, lock: Path): Unit =
    try {
      if (fs.getScheme == "file")
        new java.io.File(lock.toUri.getPath)
          .setLastModified(System.currentTimeMillis())
      else fs.setTimes(lock, System.currentTimeMillis(), -1L)
    } catch { case _: IOException => () }

  /** Atomic create-if-absent of the lock file. Returns false if it
    * already exists (someone else holds the lock).
    */
  private def tryCreate(fs: FileSystem, lock: Path,
      ownerId: String): Boolean =
    if (fs.getScheme == "file") {
      val f = new java.io.File(lock.toUri.getPath)
      val parent = f.getParentFile
      if (parent != null && !parent.exists()) parent.mkdirs()
      try {
        if (!f.createNewFile()) false // O_CREAT|O_EXCL — atomic
        else {
          val out = new java.io.FileOutputStream(f)
          try out.write(ownerId.getBytes("UTF-8")) finally out.close()
          true
        }
      } catch { case _: IOException => false }
    } else {
      try {
        val out = fs.create(lock, false) // atomic on HDFS-like stores
        try out.write(ownerId.getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: IOException => false }
    }
}
