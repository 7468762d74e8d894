package graft

/** Deletes per-process scratch directories at JVM exit. Scratch paths are
  * keyed by (query, sfDir, pid) so concurrent JVMs never clobber each
  * other — the flip side is that nothing else ever reuses the path, so an
  * exiting JVM must clean up after itself or every Bench/Verify run leaves
  * a tree in the tmp dir. One hook, one registry, idempotent registration.
  *
  * The shutdown hook covers clean exits only — a SIGKILLed JVM leaks its
  * tree forever. [[reapStale]] closes that: at session startup it deletes
  * `graft_*_<pid>` trees whose pid is no longer alive (the pid key makes
  * liveness checkable; a dead process can never reclaim its dir). */
object ScratchJanitor {
  private val dirs = java.util.concurrent.ConcurrentHashMap.newKeySet[java.io.File]()
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      dirs.forEach(d => org.apache.commons.io.FileUtils.deleteQuietly(d))))

  def register(dir: java.io.File): Unit = { hookInstalled; dirs.add(dir) }

  /** Delete `graft_*_<pid>` scratch trees whose owning process is DEAD.
    * Conservative by construction: entries without a parseable trailing
    * pid are left alone, the current process's own trees are left alone,
    * and a recycled pid (alive, different process) keeps the tree — a
    * leak, never a live-dir delete. Returns the number of trees removed.
    * Run once at session startup ([[GraftSession.create]]). */
  def reapStale(tmpDir: java.io.File = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"))): Int = {
    val self = ProcessHandle.current().pid()
    val stale = Option(tmpDir.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter { f =>
        val name = f.getName
        name.startsWith("graft_") && {
          val suffix = name.substring(name.lastIndexOf('_') + 1)
          suffix.nonEmpty && suffix.forall(_.isDigit) &&
            suffix.length < 19 && { // Long-parseable
              val pid = suffix.toLong
              pid != self && {
                val ph = ProcessHandle.of(pid)
                !ph.isPresent || !ph.get.isAlive
              }
            }
        }
      }
    stale.foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    stale.length
  }
}
