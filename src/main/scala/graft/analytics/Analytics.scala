package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.ColumnOps

/** Analytics query pack (SURVEY.md §2.5 A1–A8, §2.6 D3–D6, doc-layer A7
  * queries A–E + KPI row). Each query is a named `DataFrame => DataFrame`
  * over a flat products table (the post-transform shape:
  * product_id, name, price, original_price, discount_percent,
  * rating_average, sales_count, seller_name, seller_is_official,
  * category_url, category_path, brand, crawled_at).
  *
  * All money aggregates run in DECIMAL(18,2) (exact, associative) so
  * results are engine- and partitioning-order-independent.
  */
object Analytics {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** A1 — the DataAggregator summary: one aggregate row with min/max/avg of
    * price/discount/rating and with-value counts
    * (ref: src/common/analytics/aggregator.py:112-195). */
  def summary(products: DataFrame): DataFrame =
    products.agg(
      count(lit(1)).cast(LongType).as("total_products"),
      min("price").as("min_price"), max("price").as("max_price"),
      round(sum(dec(col("price"))).cast(DoubleType) / count("price"), 4).as("avg_price"),
      count("price").cast(LongType).as("products_with_price"),
      min("discount_percent").as("min_discount"), max("discount_percent").as("max_discount"),
      round(sum(dec(col("discount_percent"))).cast(DoubleType) / count("discount_percent"), 4).as("avg_discount"),
      min("rating_average").as("min_rating"), max("rating_average").as("max_rating"),
      round(sum(dec(col("rating_average"))).cast(DoubleType) / count("rating_average"), 4).as("avg_rating"),
      count("rating_average").cast(LongType).as("products_with_rating"))

  /** A1/D5 — top-N groups by count (categories or sellers). */
  def topGroups(products: DataFrame, groupCol: String, n: Int = 10): DataFrame =
    products.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast(LongType).as("n"))
      .orderBy(col("n").desc, col(groupCol).asc)
      .limit(n)

  /** A7-A — average rating / discount per price category. */
  def byPriceCategory(products: DataFrame): DataFrame =
    products
      .withColumn("price_category", ColumnOps.priceCategory(col("price")))
      .groupBy("price_category")
      .agg(count(lit(1)).cast(LongType).as("n"),
        round(sum(dec(col("rating_average"))).cast(DoubleType) / count("rating_average"), 4).as("avg_rating"),
        round(sum(dec(col("discount_percent"))).cast(DoubleType) / count("discount_percent"), 4).as("avg_discount"))

  /** A7-B — revenue (price × sales) rolled up by category-path levels 1–2.
    * Level access is `get` (NULL out of bounds), not `element_at`: the
    * transform stage defaults a missing category_path to an EMPTY array,
    * and element_at throws INVALID_ARRAY_INDEX on it under ANSI — one
    * uncategorized product would kill the whole rollup. Short/empty paths
    * group under NULL levels instead. */
  def revenueByCategoryLevels(products: DataFrame): DataFrame =
    products
      .withColumn("level_1", get(col("category_path"), lit(0)))
      .withColumn("level_2", get(col("category_path"), lit(1)))
      .groupBy("level_1", "level_2")
      .agg(sum(dec(col("price")) * dec(col("sales_count"))).cast(DoubleType).as("revenue"),
        count(lit(1)).cast(LongType).as("n"))

  /** A7-C — brand performance, HAVING count >= minProducts. */
  def brandPerformance(products: DataFrame, minProducts: Int = 5): DataFrame =
    products.filter(col("brand").isNotNull && col("brand") =!= "")
      .groupBy("brand")
      .agg(count(lit(1)).cast(LongType).as("n"),
        round(sum(dec(col("rating_average"))).cast(DoubleType) / count("rating_average"), 4).as("avg_rating"),
        sum(dec(col("price")) * dec(col("sales_count"))).cast(DoubleType).as("revenue"))
      .filter(col("n") >= minProducts)

  /** A7-D — discount-range bucketing with per-bucket average sales. */
  def discountBuckets(products: DataFrame): DataFrame =
    products
      .withColumn("discount_range",
        when(col("discount_percent").isNull, "unknown")
          .when(col("discount_percent") < 10, "0-10")
          .when(col("discount_percent") < 30, "10-30")
          .when(col("discount_percent") < 50, "30-50")
          .otherwise("50+"))
      .groupBy("discount_range")
      .agg(count(lit(1)).cast(LongType).as("n"),
        round(sum(dec(col("sales_count"))).cast(DoubleType) / count("sales_count"), 4).as("avg_sales"))

  /** A7-KPI — single KPI row with COUNT-FILTER percentages
    * (ref: TIKI_WAREHOUSE_DATABASE_SCHEMA_VI.md:1112-1121). */
  def kpiRow(products: DataFrame): DataFrame =
    products.agg(
      count(lit(1)).cast(LongType).as("total"),
      round(count(when(col("seller_is_official"), 1)).cast(DoubleType) / count(lit(1)) * 100, 2).as("pct_official"),
      round(count(when(col("discount_percent") >= 30, 1)).cast(DoubleType) / count(lit(1)) * 100, 2).as("pct_deep_discount"),
      round(count(when(col("rating_average") >= 4.5, 1)).cast(DoubleType) / count(lit(1)) * 100, 2).as("pct_top_rated"),
      round(count(when(col("sales_count") > 0, 1)).cast(DoubleType) / count(lit(1)) * 100, 2).as("pct_with_sales"))

  /** A3/F4-stats — per-cause missing-data counts
    * (ref: postgres_storage.py:1718-1726). */
  def missingDataStats(products: DataFrame): DataFrame =
    products.agg(
      count(when(col("seller_name").isNull || col("seller_name") === "", 1)).cast(LongType).as("missing_seller"),
      count(when(col("brand").isNull || col("brand") === "", 1)).cast(LongType).as("missing_brand"),
      count(when((col("seller_name").isNull || col("seller_name") === "") &&
        (col("brand").isNull || col("brand") === ""), 1)).cast(LongType).as("missing_both"),
      count(when(col("rating_average").isNull, 1)).cast(LongType).as("missing_rating"))

  /** D3 — top-N products per category by sales (window). */
  def topPerCategory(products: DataFrame, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("category_url")
      .orderBy(col("sales_count").desc_nulls_last, col("crawled_at").desc, col("product_id").asc)
    products.withColumn("rank", row_number().over(w)).filter(col("rank") <= n)
  }

  /** J8/D4 — incremental-crawl scheduler: priority = never-crawled → hot
    * (recent price changes) → stale; top-k
    * (ref: incremental_crawler.py:32-69). */
  def schedulerTopK(products: DataFrame, recentChanges: DataFrame, k: Int): DataFrame = {
    val hot = recentChanges
      .filter(col("crawl_type") === "price_change")
      .groupBy(col("product_id").as("hp_id"))
      .agg(count(lit(1)).as("price_change_count"))
    products
      .join(hot, col("product_id") === col("hp_id"), "left")
      .withColumn("priority",
        when(col("crawled_at").isNull, 0L)
          .when(col("price_change_count").isNotNull, 1L)
          .otherwise(2L))
      .orderBy(col("priority").asc,
        col("price_change_count").desc_nulls_last,
        col("crawled_at").asc_nulls_first,
        col("product_id").asc)
      .limit(k)
      .drop("hp_id")
  }
}
