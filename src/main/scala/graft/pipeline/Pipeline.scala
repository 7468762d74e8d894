package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.Analytics
import graft.operators.History
import graft.store.Store
import graft.transform.Transform

/** The DAG-as-driver (SURVEY.md §3.1): the reference's six Airflow task
  * groups collapse into one lineage with parquet "checkpoints" only at the
  * points the reference semantically materializes
  * (products → details-merged → transformed → loaded).
  *
  * crawl stages are out of scope (network I/O) — input is the raw nested
  * product DataFrame that the crawl would produce.
  */
object Pipeline {

  case class PipelineResult(
      transformStats: Transform.RunStats,
      loadedCount: Long,
      historyEvents: Long,
      summary: DataFrame)

  /** transform → upsert-load → CDC history → summary, against a Store.
    *
    * One run == one DAG execution of the reference: the batch is validated
    * and deduplicated, merged into the `products` table (new non-empty
    * values win), typed change events derived against prior history and
    * appended, and the aggregate summary computed from the fresh snapshot.
    */
  def run(spark: SparkSession, raw: DataFrame, store: Store,
      withShortName: Boolean = false): PipelineResult = {

    // §3.1 stage 5a — transform (P1/P2/F1/F2/D1 + stats)
    val t = Transform.run(raw, withShortName)

    // §3.1 stage 5b — CDC history BEFORE the merge (delta vs prior state).
    // Prior state comes from the `latest` companion snapshot, NOT a replay
    // of the full history log — per-run CDC cost is O(batch + keys), flat
    // in history length. (deriveEvents' internal latest-per-key over the
    // 1-row-per-key companion is a cheap idempotent window.)
    val batchForHistory = t.products.select(
      "product_id", "price", "original_price", "discount_percent",
      "sales_count", "crawled_at")
    val priorHistory = store.latest("crawl_history").map(_.select(
        "product_id", "price", "original_price", "discount_percent",
        "sales_count", "crawled_at"))
      .getOrElse(spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        batchForHistory.schema))
    val events = History.deriveEvents(batchForHistory, priorHistory, None).cache()
    val nEvents = events.count()
    if (nEvents > 0) {
      store.appendHistory("crawl_history", events)
      // the same tie-break deriveEvents uses (price desc) keeps the
      // incremental companion identical to a global latest-per-key
      store.upsertLatest("crawl_history", events, Seq("product_id"),
        "crawled_at", Seq(org.apache.spark.sql.functions.col("price").desc))
    }
    events.unpersist()

    // §3.1 stage 5c — upsert-load (J6 semantics)
    store.upsert("products", t.products, Seq("product_id"))
    val snapshot = store.snapshot("products").get
    val loaded = snapshot.count()

    // §3.1 stage 6 — analytics summary (A1)
    val summary = Analytics.summary(snapshot)

    PipelineResult(t.stats, loaded, nEvents, summary)
  }
}
