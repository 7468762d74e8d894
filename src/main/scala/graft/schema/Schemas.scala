package graft.schema

import org.apache.spark.sql.types._

/** Typed data model (SURVEY.md §1, §7.1 #1): case classes + `StructType`s
  * for the engine's entities. The at-rest schema is fixed (mirrors the
  * reference DDLs, `airflow/setup/init-crawl-db.sh:32-143`); the in-flight
  * nested product mirrors the crawl fixture
  * (`tests/test_transform_load.py:29-139`).
  *
  * Decimal columns keep the reference's precision (DECIMAL(12,2) money,
  * (3,2) rating, (5,2) change-percent) so price math matches Postgres.
  */
object Schemas {

  // --- nested in-flight product (pre-transform) ----------------------------

  case class RawPrice(current_price: Option[Double], original_price: Option[Double],
      discount_percent: Option[Double], currency: Option[String])
  case class RawRating(average: Option[Double], total_reviews: Option[Long])
  case class RawSeller(name: Option[String], is_official: Option[Boolean], seller_id: Option[String])
  case class RawStock(available: Option[Boolean], quantity: Option[Long], stock_status: Option[String])
  case class RawShipping(free_shipping: Option[Boolean], fast_delivery: Option[Boolean],
      delivery_time: Option[String])
  case class RawProduct(
      product_id: String, name: String, brand: Option[String], url: String,
      category_path: Option[Seq[String]],
      price: Option[RawPrice], rating: Option[RawRating], seller: Option[RawSeller],
      stock: Option[RawStock], shipping: Option[RawShipping],
      specifications: Option[Map[String, String]], images: Option[Seq[String]],
      sales_count: Option[String], crawled_at: Option[String])

  /** The nested in-flight schema (ref fixture `tests/test_transform_load.py:29-139`). */
  val rawProduct: StructType = StructType(Seq(
    StructField("product_id", StringType),
    StructField("name", StringType),
    StructField("brand", StringType),
    StructField("url", StringType),
    StructField("category_path", ArrayType(StringType)),
    StructField("price", StructType(Seq(
      StructField("current_price", DoubleType),
      StructField("original_price", DoubleType),
      StructField("discount_percent", DoubleType),
      StructField("currency", StringType)))),
    StructField("rating", StructType(Seq(
      StructField("average", DoubleType),
      StructField("total_reviews", LongType)))),
    StructField("seller", StructType(Seq(
      StructField("name", StringType),
      StructField("is_official", BooleanType),
      StructField("seller_id", StringType)))),
    StructField("stock", StructType(Seq(
      StructField("available", BooleanType),
      StructField("quantity", LongType),
      StructField("stock_status", StringType)))),
    StructField("shipping", StructType(Seq(
      StructField("free_shipping", BooleanType),
      StructField("fast_delivery", BooleanType),
      StructField("delivery_time", StringType)))),
    StructField("specifications", MapType(StringType, StringType)),
    StructField("images", ArrayType(StringType)),
    StructField("sales_count", StringType),
    StructField("crawled_at", StringType)))

  /** S1 — the crawl-result file envelope
    * (ref `src/common/analytics/aggregator.py:27-49`). */
  val envelope: StructType = StructType(Seq(
    StructField("crawled_at", StringType),
    StructField("total_products", LongType),
    StructField("stats", MapType(StringType, StringType)),
    StructField("products", ArrayType(rawProduct))))

  // --- flat at-rest tables -------------------------------------------------

  /** products (ref DDL `init-crawl-db.sh:71-93`, 18-column sink list
    * `postgres_storage.py:1911-1930`). */
  val product: StructType = StructType(Seq(
    StructField("product_id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("short_name", StringType),
    StructField("brand", StringType),
    StructField("url", StringType),
    StructField("category_url", StringType),
    StructField("category_id", StringType),
    StructField("category_path", ArrayType(StringType)),
    StructField("price", DecimalType(12, 2)),
    StructField("original_price", DecimalType(12, 2)),
    StructField("discount_percent", DecimalType(5, 2)),
    StructField("rating_average", DecimalType(3, 2)),
    StructField("rating_count", IntegerType),
    StructField("sales_count", IntegerType),
    StructField("seller_name", StringType),
    StructField("seller_is_official", BooleanType),
    StructField("stock_available", BooleanType),
    StructField("crawled_at", TimestampType),
    StructField("updated_at", TimestampType)))

  /** categories (ref DDL `init-crawl-db.sh:32-55`). */
  val category: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("name", StringType),
    StructField("parent_url", StringType),
    StructField("category_id", StringType),
    StructField("category_path", ArrayType(StringType)),
    StructField("level", IntegerType),
    StructField("level_1", StringType),
    StructField("level_2", StringType),
    StructField("level_3", StringType),
    StructField("level_4", StringType),
    StructField("level_5", StringType),
    StructField("is_leaf", BooleanType),
    StructField("product_count", IntegerType),
    StructField("updated_at", TimestampType)))

  /** crawl_history change events (ref DDL `init-crawl-db.sh:107-135`). */
  val crawlHistory: StructType = StructType(Seq(
    StructField("product_id", StringType, nullable = false),
    StructField("crawl_type", StringType),
    StructField("price", DecimalType(12, 2)),
    StructField("previous_price", DecimalType(12, 2)),
    StructField("price_change", DecimalType(12, 2)),
    StructField("price_change_percent", DecimalType(5, 2)),
    StructField("sales_count", IntegerType),
    StructField("previous_sales_count", IntegerType),
    StructField("sales_change", IntegerType),
    StructField("is_flash_sale", BooleanType),
    StructField("crawled_at", TimestampType)))

  case class CrawlEvent(
      product_id: String, crawl_type: String,
      price: Option[BigDecimal], previous_price: Option[BigDecimal],
      price_change: Option[BigDecimal], price_change_percent: Option[BigDecimal],
      sales_count: Option[Int], previous_sales_count: Option[Int],
      sales_change: Option[Int], is_flash_sale: Boolean,
      crawled_at: java.sql.Timestamp)
}
