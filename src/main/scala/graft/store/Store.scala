package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Merge

/** Parquet-backed keyed tables with upsert-merge semantics — the engine's
  * storage layer replacing the reference's Postgres ON CONFLICT writes
  * (SURVEY.md §2.1 S6–S9, §3.3).
  *
  * Layout: each table is a directory of parquet "generations". A write
  * produces a new generation = merge(current snapshot, batch) so reads are
  * always one `spark.read.parquet` of the latest generation (no log replay,
  * no small-file accumulation).
  *
  * Scale: the merge is a single key-partitioned shuffle of snapshot ∪ batch.
  * With `buckets > 0` each generation is written `bucketBy(keys)` +
  * `sortBy(keys)` through the session catalog, so the NEXT upsert's merge
  * join reads the snapshot bucket-aligned and shuffles ONLY the batch side
  * — at 100 TB that is the difference between re-shuffling the whole
  * catalog per run and shuffling the day's delta. (Bucket metadata lives in
  * the catalog; a fresh session without the metastore falls back to a plain
  * parquet read of the same files — correct, just unbucketed.) History
  * appends are date-partitioned and read through `history(table, since)`
  * so derivations prune to recent partitions, and `upsertLatest` maintains
  * a current-snapshot companion so CDC never replays the log at all. All
  * directory listing goes through the Hadoop FileSystem API — `root` may be
  * any Hadoop-supported URI (file:, hdfs:, s3a:, ...), never `java.io.File`.
  */
class Store(spark: SparkSession, root: String, buckets: Int = 0) {

  private def fs(p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def gens(table: String): Seq[String] = {
    val dir = new Path(s"$root/$table")
    val f = fs(dir)
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen_"))
      .map(_.getPath.getName).sorted
  }

  private def latestGen(table: String): Option[String] = gens(table).lastOption

  private def catalogName(table: String, gen: String): String =
    s"graft_${table}_$gen".replaceAll("[^a-zA-Z0-9_]", "_")

  private def writeGen(table: String, df: DataFrame, keys: Seq[String] = Nil): Unit = {
    val next = f"gen_${latestGen(table).map(_.drop(4).toInt + 1).getOrElse(0)}%06d"
    if (buckets > 0 && keys.nonEmpty) {
      df.write.mode("overwrite")
        .bucketBy(buckets, keys.head, keys.tail: _*)
        .sortBy(keys.head, keys.tail: _*)
        .option("path", s"$root/$table/$next")
        .saveAsTable(catalogName(table, next))
      // the previous generation's catalog entry is now dead weight — drop
      // the metadata only (files stay: snapshot() can still path-read them)
      latestGen(table).filter(_ != next).foreach { prev =>
        spark.sql(s"DROP TABLE IF EXISTS ${catalogName(table, prev)}")
      }
    } else df.write.mode("overwrite").parquet(s"$root/$table/$next")
  }

  /** Latest snapshot of a keyed table (empty option when never written).
    * Prefers the catalog entry (carries bucket metadata → bucket-aligned
    * joins); falls back to a plain parquet read of the generation path. */
  def snapshot(table: String): Option[DataFrame] =
    latestGen(table).map { g =>
      if (buckets > 0 && spark.catalog.tableExists(catalogName(table, g)))
        spark.table(catalogName(table, g))
      else spark.read.parquet(s"$root/$table/$g")
    }

  /** S6/S7/J6 — upsert a batch into a keyed table with the reference's
    * COALESCE(NULLIF(new,''), old) column semantics. */
  def upsert(table: String, batch: DataFrame, keys: Seq[String]): Unit = {
    val merged = snapshot(table) match {
      case Some(old) => Merge.upsertMerge(old, batch, keys)
      case None      => batch
    }
    writeGen(table, merged, keys)
  }

  /** S8 — append-only history, date-partitioned for pruning at scale. */
  def appendHistory(table: String, events: DataFrame, tsCol: String = "crawled_at"): Unit =
    events
      .withColumn("__date", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode("append").partitionBy("__date").parquet(s"$root/$table/append")

  /** Read the append-only history table. `since` (yyyy-MM-dd, inclusive)
    * prunes the scan to recent date partitions — the filter lands on the
    * `__date` PARTITION column, so old partitions are never opened
    * (`PartitionFilters` in the scan, not a post-read filter). Omitting it
    * scans the full log; derivations that only need the latest state per
    * key should use the `latest` companion instead. */
  def history(table: String, since: Option[String] = None): Option[DataFrame] = {
    val dir = new Path(s"$root/$table/append")
    if (!fs(dir).exists(dir)) None
    else {
      val df = spark.read.parquet(dir.toString)
      Some(since.fold(df)(d => df.filter(col("__date") >= d)).drop("__date"))
    }
  }

  /** Maintain the current-snapshot companion of an append-only history:
    * latest event per key, merged incrementally (max-by (ts, tieBreakers)
    * is associative, so batch-at-a-time upkeep equals a global
    * latest-per-key over the whole log). CDC derivations read THIS —
    * one small keyed table — instead of replaying the ever-growing log. */
  def upsertLatest(table: String, events: DataFrame, keys: Seq[String],
      tsCol: String = "crawled_at", tieBreakers: Seq[Column] = Nil): Unit = {
    val newLatest = Merge.latestPerKey(events, keys, tsCol, tieBreakers)
    val merged = snapshot(s"${table}_latest") match {
      case Some(old) => Merge.latestPerKey(old.unionByName(newLatest), keys, tsCol, tieBreakers)
      case None      => newLatest
    }
    writeGen(s"${table}_latest", merged, keys)
  }

  /** The current-snapshot companion maintained by [[upsertLatest]]. */
  def latest(table: String): Option[DataFrame] = snapshot(s"${table}_latest")

  /** S9 — archive history rows older than `cutoff` (yyyy-MM-dd): copy the
    * old partitions into `<table>_archive`, rewrite the source without them.
    * Partition-pruned on both sides — never scans live partitions. */
  def archiveHistory(table: String, cutoff: String, tsCol: String = "crawled_at"): Long = {
    history(table) match {
      case None => 0L
      case Some(h) =>
        val old = h.filter(date_format(col(tsCol), "yyyy-MM-dd") < cutoff)
        val n = old.count()
        if (n > 0) {
          appendHistory(s"${table}_archive", old, tsCol)
          val keep = h.filter(date_format(col(tsCol), "yyyy-MM-dd") >= cutoff).cache()
          keep.count()
          val dir = s"$root/$table/append"
          val tmp = s"$root/$table/append_tmp"
          keep.withColumn("__date", date_format(col(tsCol), "yyyy-MM-dd"))
            .write.mode("overwrite").partitionBy("__date").parquet(tmp)
          keep.unpersist()
          val f = fs(new Path(dir))
          f.delete(new Path(dir), true)
          f.rename(new Path(tmp), new Path(dir))
        }
        n
    }
  }
}
