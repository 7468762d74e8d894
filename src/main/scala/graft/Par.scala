package graft

/** Run INDEPENDENT Spark actions from a few driver threads at once
  * (optimization guide §2.6: actions are only sequential because driver
  * code calls them sequentially; concurrent jobs are scheduled FIFO, so a
  * later job's tasks back-fill executors freed by the earlier job's tail).
  * The index/lifecycle writers use this for their per-generation relation
  * writes — bands/shingles/ids land in DISJOINT directories, so the only
  * thing sequencing them bought was idle cores between job tails.
  *
  * Contract:
  *  - thunks must have DISJOINT outputs and no shared mutable state;
  *  - thunks must not create [[graft.operators.Scratch]] checkpoints — the
  *    scratch registry is thread-confined, so a checkpoint created on a
  *    worker thread would register with no scope and leak until the
  *    ContextCleaner notices (writes of already-built frames are fine);
  *  - every thunk is run to completion (or failure) before control
  *    returns; the first failure is rethrown with later ones suppressed,
  *    so failure semantics match the sequential form (an uncommitted
  *    generation, never a half-observed one).
  *
  * Threads inherit the caller's job group/description (SparkContext
  * properties are InheritableThreadLocal), so UI labels stay correct. */
private[graft] object Par {

  /** [[run]] with a concurrency bound, for fan-outs whose width scales
    * with data (per-partition compaction rewrites: a history table can
    * have hundreds of date dirs). A few jobs in flight is enough to
    * back-fill stage tails; unbounded width would just contend. */
  def runBounded[A](items: Seq[A], maxConcurrent: Int)(f: A => Unit): Unit = {
    if (items.isEmpty) return
    val it = items.iterator
    val lock = new Object
    def next(): Option[A] = lock.synchronized {
      if (it.hasNext) Some(it.next()) else None
    }
    run(Seq.fill(math.min(maxConcurrent, items.size)) { () =>
      var cur = next()
      while (cur.isDefined) { f(cur.get); cur = next() }
    }: _*)
  }

  def run(thunks: (() => Unit)*): Unit = {
    if (thunks.sizeIs <= 1) { thunks.foreach(_.apply()); return }
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = thunks.zipWithIndex.map { case (t, i) =>
      val th = new Thread(() => {
        try t() catch { case e: Throwable => failures.add(e) }
      }, s"graft-par-$i")
      th.setDaemon(true)
      th.start()
      th
    }
    threads.foreach(_.join())
    val it = failures.iterator()
    if (it.hasNext) {
      val first = it.next()
      while (it.hasNext) first.addSuppressed(it.next())
      throw first
    }
  }
}
