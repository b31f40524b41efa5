package graft

import java.nio.file.{Files, Path}

/** JVM-lifetime temp-dir registry. Every scratch/staging directory the
  * query runners create is registered here and recursively deleted at
  * JVM exit, so repeated verify/bench runs don't leak one directory per
  * run (`File.deleteOnExit` can't remove non-empty directories, and the
  * streaming runners fill theirs with symlinks/commit files).
  */
object TempDirs {
  private val roots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    roots.forEach(p => scala.util.Try(deleteRecursive(p)))))

  /** Create and register a temp directory removed at JVM exit. */
  def create(prefix: String): Path = {
    val dir = Files.createTempDirectory(prefix)
    roots.add(dir)
    dir
  }

  private def deleteRecursive(p: Path): Unit = {
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val s = Files.list(p)
      try s.forEach(c => deleteRecursive(c)) finally s.close()
    }
    Files.deleteIfExists(p)
  }
}
