package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Shared generation-directory machinery for persisted index layouts
  * (`Ann`'s IVF tree, `Dedup`'s MinHash index): each rebuild or online
  * compaction writes a fresh `gen_NNNNNN/` dir and commits it by creating
  * a `_COMMITTED` marker LAST, so readers — which always resolve the
  * latest COMMITTED generation — never observe a half-written layout.
  * The marker create is exclusive (no overwrite): two racing writers that
  * picked the same number fail loudly instead of interleaving. Superseded
  * generations are dropped by [[vacuum]]; `keep ≥ 2` protects a reader
  * that resolved the previous generation just before a commit landed. */
object Generations {

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def genDirs(spark: SparkSession, root: String): Seq[Path] = {
    val r = new Path(root)
    val f = fsOf(spark, r)
    if (!f.exists(r)) Nil
    else f.listStatus(r).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen_"))
      .map(_.getPath).sortBy(_.getName)
  }

  def isCommitted(spark: SparkSession, gen: Path): Boolean =
    fsOf(spark, gen).exists(new Path(gen, "_COMMITTED"))

  /** The latest COMMITTED generation — what readers resolve. Uncommitted
    * dirs (a write in flight, or a crashed one) are invisible. */
  def latestCommitted(spark: SparkSession, root: String): Option[Path] =
    genDirs(spark, root).filter(isCommitted(spark, _)).lastOption

  def requireCommitted(spark: SparkSession, root: String): Path =
    latestCommitted(spark, root).getOrElse(throw new java.io.FileNotFoundException(
      s"no committed generation under $root"))

  /** CLAIM the next generation path with an atomic exclusive `_CLAIM`
    * create before any data is written. Without the claim, two concurrent
    * writers could pick the same number and the second's
    * `mode("overwrite")` write would clobber the first's files BEFORE its
    * commit marker lands — corrupting a generation that then commits as
    * if whole. With it, the loser of the create race simply advances to
    * the next number. Numbering moves past every existing dir, committed
    * or not, so a crashed writer's stray is never reused. */
  def claimNextGen(spark: SparkSession, root: String): Path = {
    var n = genDirs(spark, root).lastOption
      .map(_.getName.drop(4).toInt + 1).getOrElse(0)
    val limit = n + 100 // a hundred simultaneous writers means something is wrong
    while (n < limit) {
      val gen = new Path(new Path(root), f"gen_$n%06d")
      val claim = new Path(gen, "_CLAIM")
      val f = fsOf(spark, gen)
      // Only "this number is already claimed" advances to the next number.
      // Any other IOException (permissions, quota, a network-FS hiccup) is a
      // real failure and must surface — swallowing it would silently skip
      // generation numbers or spin to the misleading could-not-claim error.
      // FileSystem.create(overwrite=false) is check-then-create on the local
      // filesystem (best-effort atomic there; truly atomic on HDFS), so the
      // race window is the create itself — which still lands in the
      // FileAlreadyExistsException arm.
      try {
        f.create(claim, false).close()
        return gen
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => n += 1
        case _: java.nio.file.FileAlreadyExistsException => n += 1
        case _: java.io.IOException if f.exists(claim) => n += 1
      }
    }
    throw new java.io.IOException(
      s"claimNextGen: could not claim a generation under $root after 100 attempts")
  }

  /** Commit a generation: exclusive `_COMMITTED` create, done LAST. */
  def commit(spark: SparkSession, gen: Path): Unit =
    fsOf(spark, gen).create(new Path(gen, "_COMMITTED"), false).close()

  /** Drop all but the newest `keep` committed generations, plus any
    * uncommitted strays older than the newest committed one. Run this from
    * the maintenance cycle only, never concurrently with a rebuild: an
    * in-flight writer that was overtaken by a faster-committing one is
    * indistinguishable from a crashed stray and would be deleted mid-write.
    * (Readers are unaffected either way — they resolve the newest
    * COMMITTED generation, which a deleted stray never becomes.) */
  def vacuum(spark: SparkSession, root: String, keep: Int = 2): Int = {
    require(keep >= 1, "keep must be >= 1")
    val committed = genDirs(spark, root).filter(isCommitted(spark, _))
    if (committed.isEmpty) return 0
    val keepNames = committed.takeRight(keep).map(_.getName).toSet
    val newest = committed.last.getName
    val drop = genDirs(spark, root).filter(g =>
      !keepNames(g.getName) && g.getName < newest)
    drop.foreach { g =>
      if (!fsOf(spark, g).delete(g, true))
        throw new java.io.IOException(
          s"Generations.vacuum: delete($g) failed (filesystem returned false)")
    }
    drop.size
  }
}
