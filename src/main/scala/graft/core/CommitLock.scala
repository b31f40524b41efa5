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
  * `leaseMs` are presumed crashed and stolen (delete + re-race). The
  * engine analog of the reference's disabled `lots-of-processes` tests
  * (hbase_test.clj:134-138) lives in CommitLockRaceSpec, which races
  * real JVMs through this primitive.
  */
object CommitLock {

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
          // and exactly one wins.
          try fs.delete(lock, false) catch { case _: IOException => () }
        } else if (System.currentTimeMillis() > deadline) {
          throw new RuntimeException(
            s"commit lock timeout after ${timeoutMs}ms: $lock held")
        } else Thread.sleep(20)
      }
    }
    try body
    finally {
      try fs.delete(lock, false) catch { case _: IOException => () }
    }
  }

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
