package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{ColumnOps, NameCleaner}
import graft.operators.Scratch.Ops

/** The transform stage (SURVEY.md §2.2 P1/P2, §2.3 F1/F2, §2.6 D1, §2.5
  * A6/A8): nested crawl shape → flat validated deduplicated products, with a
  * rejects channel and deterministic stats — the Spark re-expression of the
  * reference's `DataTransformer` (transformer.py:101-451).
  *
  * Everything is column expressions (codegen'd) except the name-shortening
  * UDFs; stats are derived set-theoretically from DataFrame counts, not
  * accumulators, so they are deterministic under retries/partitioning.
  */
object Transform {

  /** §2.8 stats contract (transformer.py:113-119). */
  case class RunStats(
      total: Long, valid: Long, invalid: Long, duplicatesRemoved: Long)

  case class TransformResult(products: DataFrame, rejects: DataFrame, stats: RunStats)

  /** P1 — nested→flat projection with the reference's defaults
    * (category_path→[], sales_count→0, seller_is_official→false;
    * transformer.py:294-399). Input follows the RawProduct fixture schema
    * (FIXTURES.md §A1). */
  def flatten(raw: DataFrame): DataFrame =
    raw.select(
      col("product_id"),
      col("name"),
      col("brand"),
      col("url"),
      coalesce(col("category_path"), array().cast(ArrayType(StringType))).as("category_path"),
      col("price.current_price").cast(DoubleType).as("price"),
      col("price.original_price").cast(DoubleType).as("original_price"),
      col("price.discount_percent").cast(DoubleType).as("discount_percent"),
      col("rating.average").cast(DoubleType).as("rating_average"),
      col("rating.total_reviews").cast(LongType).as("rating_count"),
      col("seller.name").as("seller_name"),
      coalesce(col("seller.is_official"), lit(false)).as("seller_is_official"),
      coalesce(col("stock.available"), lit(false)).as("stock_available"),
      coalesce(ColumnOps.parseSalesCount(col("sales_count")), lit(0L)).as("sales_count"),
      ColumnOps.parseDatetimeMulti(col("crawled_at")).as("crawled_at"))

  /** P2 — normalization: trim ids, collapse name whitespace, strip
    * "Thương hiệu: " brand prefix, null junk sellers, recompute discount
    * (transformer.py:218-292). */
  def normalize(flat: DataFrame): DataFrame =
    flat
      .withColumn("product_id", trim(col("product_id")))
      .withColumn("name", ColumnOps.normalizeText(col("name")))
      .withColumn("brand",
        ColumnOps.normalizeText(regexp_replace(col("brand"), "^Thương hiệu:\\s*", "")))
      .withColumn("seller_name", ColumnOps.validSellerName(col("seller_name")))
      .withColumn("discount_percent",
        coalesce(
          ColumnOps.discountPercent(col("original_price"), col("price")),
          col("discount_percent")))

  /** F1 — validity predicate (transformer.py:401-451). TOTAL, never NULL:
    * an unguarded nullable term (`url.rlike(...)` on a null url was one)
    * makes the predicate NULL, and a NULL-validity row fails BOTH
    * `filter(validity)` and `filter(!validity)` — silently dropped from
    * the products AND the rejects channel, so the §2.8 ledger stopped
    * adding up (valid + rejects < total). Every nullable column is
    * explicitly guarded so each row is exactly valid or rejected. */
  def validity: Column =
    col("product_id").isNotNull && col("product_id").rlike("^[0-9]+$") &&
      col("name").isNotNull && length(col("name")) > 0 &&
      col("url").isNotNull && col("url").rlike("^https?://") &&
      (col("price").isNull || (col("price") >= 0 &&
        (col("original_price").isNull || col("price") <= col("original_price")))) &&
      (col("rating_average").isNull ||
        (col("rating_average") >= 0 && col("rating_average") <= 5)) &&
      (col("sales_count").isNull || col("sales_count") >= 0)

  /** First failing-reason label for the rejects channel (§2.8). */
  def rejectReason: Column =
    when(col("product_id").isNull || !col("product_id").rlike("^[0-9]+$"), "bad_product_id")
      .when(col("name").isNull || length(col("name")) === 0, "missing_name")
      // isNull explicitly: rlike(NULL) is NULL, which silently skipped the
      // branch and mislabeled null-url rejects "unknown"
      .when(col("url").isNull || !col("url").rlike("^https?://"), "bad_url")
      .when(col("price") < 0 || col("price") > col("original_price"), "bad_price")
      .when(col("rating_average") < 0 || col("rating_average") > 5, "bad_rating")
      .when(col("sales_count") < 0, "bad_sales_count")
      .otherwise("unknown")

  /** D1 — order-stable dedup: first-wins by (crawled_at asc, product_id)
    * using a deterministic ordering instead of the reference's thread-order
    * seen-set (transformer.py:126-155). */
  def dedup(valid: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("product_id")
      .orderBy(col("crawled_at").asc_nulls_last, col("name").asc)
    valid.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Full stage: flatten → normalize → validate(+rejects) → dedup → stats.
    * Optionally adds `short_name` via the X10 UDF.
    *
    * `materialize = false` skips the checkpoint: the stats aggregate is then
    * ONE streaming pass over the projection with nothing stored — the right
    * mode for stats-only callers (audits, the q60 ledger query); callers
    * that consume `products`/`rejects` should keep the default so the
    * flatten+normalize projection runs once, not once per consumer. */
  def run(raw: DataFrame, withShortName: Boolean = false,
      materialize: Boolean = true): TransformResult = {
    // localCheckpoint: the stats aggregate and both returned frames would
    // otherwise each re-run the flatten+normalize projection over the raw
    // input — one materialization feeds all three consumers
    val flat0 = normalize(flatten(raw))
    val flat = if (materialize) flat0.scratchCheckpoint() else flat0
    val validDf = flat.filter(validity)
    val rejects = flat.filter(!validity).withColumn("reject_reason", rejectReason)
    val deduped0 = dedup(validDf)
    val deduped = if (withShortName)
      deduped0.withColumn("short_name", NameCleaner.shortNameUdf(col("name")))
    else deduped0

    // all four stats in ONE aggregation pass over the checkpoint: the
    // dedup survivor count equals countDistinct(product_id) over valid rows
    // (the window keeps exactly one row per key), so no separate action per
    // stat — 2 jobs total (checkpoint + agg) instead of 4
    val statsRow = flat.agg(
      count(lit(1)).as("total"),
      count(when(validity, 1)).as("valid"),
      countDistinct(when(validity, col("product_id"))).as("kept")).head
    val (total, nValid, nDedup) =
      (statsRow.getLong(0), statsRow.getLong(1), statsRow.getLong(2))
    TransformResult(deduped, rejects,
      RunStats(total = total, valid = nValid,
        invalid = total - nValid, duplicatesRemoved = nValid - nDedup))
  }
}
