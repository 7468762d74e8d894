package graft

/** Deletes per-process scratch directories at JVM exit. Scratch paths are
  * keyed by (query, sfDir, pid) so concurrent JVMs never clobber each
  * other — the flip side is that nothing else ever reuses the path, so an
  * exiting JVM must clean up after itself or every Bench/Verify run leaves
  * a tree in the tmp dir. One hook, one registry, idempotent registration. */
object ScratchJanitor {
  private val dirs = java.util.concurrent.ConcurrentHashMap.newKeySet[java.io.File]()
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      dirs.forEach(d => org.apache.commons.io.FileUtils.deleteQuietly(d))))

  def register(dir: java.io.File): Unit = { hookInstalled; dirs.add(dir) }
}
