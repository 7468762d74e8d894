package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * At 100 TB the snapshot should be written bucketed by the key so only the
  * batch side shuffles; history appends are date-partitioned so the CDC
  * derivation prunes to recent partitions.
  */
class Store(spark: SparkSession, root: String) {

  private def gens(table: String): Seq[String] = {
    val dir = new java.io.File(s"$root/$table")
    Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
      .filter(f => f.isDirectory && f.getName.startsWith("gen_"))
      .map(_.getName).sorted
  }

  private def latestGen(table: String): Option[String] = gens(table).lastOption

  /** Latest snapshot of a keyed table (empty option when never written). */
  def snapshot(table: String): Option[DataFrame] =
    latestGen(table).map(g => spark.read.parquet(s"$root/$table/$g"))

  /** S6/S7/J6 — upsert a batch into a keyed table with the reference's
    * COALESCE(NULLIF(new,''), old) column semantics. */
  def upsert(table: String, batch: DataFrame, keys: Seq[String]): Unit = {
    val merged = snapshot(table) match {
      case Some(old) => Merge.upsertMerge(old, batch, keys)
      case None      => batch
    }
    val next = f"gen_${latestGen(table).map(_.drop(4).toInt + 1).getOrElse(0)}%06d"
    merged.write.mode("overwrite").parquet(s"$root/$table/$next")
  }

  /** S8 — append-only history, date-partitioned for pruning at scale. */
  def appendHistory(table: String, events: DataFrame, tsCol: String = "crawled_at"): Unit =
    events
      .withColumn("__date", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode("append").partitionBy("__date").parquet(s"$root/$table/append")

  /** Read the append-only history table. */
  def history(table: String): Option[DataFrame] = {
    val dir = new java.io.File(s"$root/$table/append")
    if (dir.exists()) Some(spark.read.parquet(dir.toString).drop("__date")) else None
  }

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
          val fs = org.apache.hadoop.fs.FileSystem.get(
            java.net.URI.create(dir), spark.sparkContext.hadoopConfiguration)
          fs.delete(new org.apache.hadoop.fs.Path(dir), true)
          fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(dir))
        }
        n
    }
  }
}
