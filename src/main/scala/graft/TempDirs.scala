package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Registry for process-lifetime temp directories (session-memoized index
  * layouts). Each created dir is deleted either eagerly — when its owning
  * [[SessionCache]] entry is evicted — or at JVM exit by one shared shutdown
  * hook, so long-lived processes that churn sessions don't accumulate
  * index-sized directories under java.io.tmpdir (ADVICE r6). */
object TempDirs {
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach(d => deleteTree(Paths.get(d)))
    }, "graft-tempdir-cleanup"))
  }

  def create(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix).toString
    registered.add(dir)
    dir
  }

  /** Best-effort eager delete (idempotent; unregisters the dir). */
  def delete(dir: String): Unit = {
    registered.remove(dir)
    deleteTree(Paths.get(dir))
  }

  private def deleteTree(root: Path): Unit =
    if (Files.exists(root)) {
      try {
        val walk = Files.walk(root)
        try walk.sorted(Comparator.reverseOrder[Path]())
          .forEach(p => try Files.deleteIfExists(p) catch { case _: Exception => () })
        finally walk.close()
      } catch { case _: Exception => () } // best-effort: cleanup must not fail callers
    }
}
