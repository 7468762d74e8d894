package graft

/** Zero-overhead-when-off phase timer for dev profiling: wraps a block and
  * prints its wall time to stderr when `-Dgraft.debug.timing=1` (or
  * `GRAFT_DEBUG_TIMING=1`) is set. Production/bench runs leave it off —
  * the guard is a cached boolean, so a disabled timer costs one branch. */
private[graft] object Timing {
  val enabled: Boolean =
    sys.props.get("graft.debug.timing").orElse(sys.env.get("GRAFT_DEBUG_TIMING"))
      .contains("1")

  def apply[T](name: String)(f: => T): T =
    if (!enabled) f
    else {
      val t0 = System.nanoTime()
      try f
      finally System.err.println(
        f"[timing] $name%-40s ${(System.nanoTime() - t0) / 1e9}%7.3fs")
    }
}
