package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ColumnOps._

/** Change-data-capture into a crawl-history time series (SURVEY.md §2.10,
  * X13–X15, J7). The reference compares the current batch against the latest
  * stored history row per key and emits typed change events; rows that
  * changed nothing are NOT logged.
  *
  * Ref: storage/postgres_storage.py:1250-1478 (`_log_batch_crawl_history`).
  *
  * Scale: one shuffle to compute latest-per-key over whatever `history`
  * relation the caller passes, then a key-partitioned join against the
  * batch. Callers must NOT pass the full log here: [[graft.store.Store]]
  * maintains a current-snapshot companion (`Store.latest`, kept by
  * `upsertLatest`) that [[graft.pipeline.Pipeline]] feeds in — O(keys)
  * rows, flat in history length — and `Store.history(table, since)`
  * partition-prunes on the `__date` partition column when a bounded
  * replay window is genuinely needed.
  */
object History {

  /** Derive history events for `batch` given the existing `history` table.
    *
    * @param batch    current crawl: product_id, price, original_price,
    *                 discount_percent, sales_count, brand, seller_name, crawled_at
    * @param history  existing crawl_history (may be empty, same cols as output)
    * @param previousState  optional product_id→(brand, seller_name) snapshot of
    *                       the products table, for data_improvement detection
    * @param staleHorizon  optional event-time staleness horizon (a Spark
    *                 interval body, e.g. `"30 DAYS"`). A key's previous state
    *                 older than `crawled_at - horizon` is treated as ABSENT:
    *                 the observation re-classifies as a first sighting (null
    *                 `previous_*`, no change deltas). This is the batch twin
    *                 of [[graft.streaming.Streams.statefulCdc]]'s TTL
    *                 eviction — the reference's recency policy ages out
    *                 products not crawled within the horizon
    *                 (tasks/detail.py:196-216), so a return after a long gap
    *                 is a fresh crawl, not a change against forgotten state;
    *                 both surfaces apply the same rule so a batch→streaming
    *                 migration preserves classification semantics. Decided
    *                 per row in EVENT time (deterministic, oracle-gateable
    *                 as q79) where the streaming form necessarily uses the
    *                 processing-time clock.
    */
  def deriveEvents(batch: DataFrame, history: DataFrame, previousState: Option[DataFrame],
      staleHorizon: Option[String] = None): DataFrame = {
    // F7 — only rows with a key and a price are logged
    val valid = batch.filter(col("product_id").isNotNull && col("price").isNotNull)

    // J7 — latest prior row per product (DISTINCT ON analogue)
    val prev = Merge.latestPerKey(
        history.select("product_id", "price", "original_price", "discount_percent", "sales_count", "crawled_at"),
        Seq("product_id"), "crawled_at", Seq(col("price").desc))
      .select(
        col("product_id"),
        col("price").as("previous_price"),
        col("original_price").as("previous_original_price"),
        col("discount_percent").as("previous_discount_percent"),
        col("sales_count").as("previous_sales_count"),
        col("crawled_at").as("__prev_ts"))

    val joined = valid.join(prev, Seq("product_id"), "left")
    val withPrev = staleHorizon match {
      case Some(h) =>
        // stale iff BOTH timestamps exist and the gap exceeds the horizon —
        // a null on either side keeps the fresh path (no surprise eviction
        // on rows the data cannot date)
        val stale = col("__prev_ts").isNotNull && col("crawled_at").isNotNull &&
          col("__prev_ts") < col("crawled_at") - expr(s"INTERVAL $h")
        Seq("previous_price", "previous_original_price",
            "previous_discount_percent", "previous_sales_count")
          .foldLeft(joined)((df, c) => df.withColumn(c, when(!stale, col(c))))
          .drop("__prev_ts")
      case None => joined.drop("__prev_ts")
    }

    val improved: Column = previousState match {
      case Some(st) => col("__old_brand").isNotNull || col("__old_seller").isNotNull
      case None     => lit(false)
    }
    val staged = previousState match {
      case Some(st) =>
        val s = st.select(
          col("product_id"),
          col("brand").as("__st_brand"),
          col("seller_name").as("__st_seller"))
        withPrev.join(s, Seq("product_id"), "left")
          .withColumn("__old_brand",
            when((col("__st_brand").isNull || col("__st_brand") === "") &&
                 col("brand").isNotNull && col("brand") =!= "", lit(true)))
          .withColumn("__old_seller",
            when((col("__st_seller").isNull || col("__st_seller") === "") &&
                 col("seller_name").isNotNull && col("seller_name") =!= "", lit(true)))
      case None => withPrev
    }

    val salesChange = when(col("previous_sales_count").isNotNull && col("sales_count").isNotNull,
      col("sales_count") - col("previous_sales_count"))

    val firstCrawl = col("previous_price").isNull && col("previous_original_price").isNull &&
      col("previous_discount_percent").isNull
    val events = staged
      .withColumn("sales_change", salesChange)
      .withColumn("crawl_type", crawlType(
        col("price"), col("previous_price"),
        col("original_price"), col("previous_original_price"),
        col("discount_percent"), col("previous_discount_percent"),
        col("sales_change"), improved))
      .withColumn("discount_amount", discountAmount(col("original_price"), col("price")))
      .withColumn("price_change",
        when(!firstCrawl && col("crawl_type") === "price_change",
          priceChange(col("price"), col("previous_price"))))
      .withColumn("price_change_percent",
        when(!firstCrawl && col("crawl_type") === "price_change",
          priceChangePercent(col("price"), col("previous_price"))))
      .withColumn("is_flash_sale", isFlashSale(col("discount_percent"), col("discount_amount")))

    events
      .filter(col("crawl_type") =!= "no_change") // should_log
      .select("product_id", "price", "original_price", "discount_percent", "discount_amount",
        "price_change", "price_change_percent",
        "previous_price", "previous_original_price", "previous_discount_percent",
        "sales_count", "sales_change", "is_flash_sale", "crawl_type", "crawled_at")
  }
}
