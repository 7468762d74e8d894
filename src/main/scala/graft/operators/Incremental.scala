package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental-crawl work selection (SURVEY.md §2.10, F5/J4/D4): which rows
  * still need processing this run. The reference keeps three skip tiers —
  * in-run progress set, already-complete rows in the store, and a recency
  * cache — plus a per-day quota (tasks/detail.py:88-385).
  *
  * Spark shape: the skip tiers are anti-joins / a staleness predicate over
  * the candidate set; the quota is an ordered limit. Everything is one
  * declarative plan — no driver-side set bookkeeping.
  */
object Incremental {

  /** Rows still to process: candidates minus the progress set (anti-join on
    * key), minus rows whose stored state is complete AND fresh.
    *
    * `completeCond` decides completeness on the stored row (e.g. non-blank
    * brand and seller); `freshCond` the staleness policy (e.g.
    * updated_at > now - 7d, expressed against a passed-in reference time
    * for determinism).
    */
  def pendingWork(
      candidates: DataFrame, key: String,
      progress: DataFrame,
      stored: DataFrame, completeCond: Column, freshCond: Column): DataFrame = {
    val done = stored.filter(completeCond && freshCond).select(col(key))
    candidates
      .join(progress.select(col(key)).distinct(), Seq(key), "left_anti")
      .join(done.distinct(), Seq(key), "left_anti")
  }

  /** D4/J8 priority order + daily-quota take: never-processed first, then
    * hottest (change count), then most-stale; cap at `quota`. */
  def prioritizedTake(pending: DataFrame, key: String,
      lastProcessed: Column, changeCount: Column, quota: Int): DataFrame =
    pending
      .withColumn("__prio",
        when(lastProcessed.isNull, 0L)
          .when(changeCount.isNotNull && changeCount > 0, 1L)
          .otherwise(2L))
      .orderBy(col("__prio").asc, changeCount.desc_nulls_last,
        lastProcessed.asc_nulls_first, col(key).asc)
      .limit(quota)
      .drop("__prio")
}
