package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.ColumnOps

/** Star-schema warehouse builder (SURVEY.md §2.4 J9, §7.1 #7): dimension
  * dedup + surrogate-key assignment, `dim_date` generation, fixed
  * price-segment dimension, and fact assembly via FK joins — the documented
  * warehouse layer of the reference
  * (`docs/04-CONFIGURATION/TIKI_WAREHOUSE_DATABASE_SCHEMA_VI.md:1168-1319`).
  *
  * Surrogate keys are `row_number` over the natural-key order —
  * deterministic (equal to SQL `ROW_NUMBER() OVER (ORDER BY key)`), so
  * rebuilds are reproducible and oracle-checkable. The SK window is a
  * single-partition sort of the DIMENSION only (dims are small by
  * definition; for a billion-row dim switch to `zipWithIndex` — the fact
  * table never sorts globally).
  *
  * Fact assembly broadcasts every dim: at 100 TB the fact is the only big
  * relation and the joins stay map-side.
  */
object StarSchema {

  /** Dimension from distinct natural-key tuples + dense surrogate key. */
  def dim(src: DataFrame, naturalKey: Seq[String], skName: String): DataFrame = {
    val w = Window.orderBy(naturalKey.map(col): _*)
    src.select(naturalKey.map(col): _*).distinct()
      .withColumn(skName, row_number().over(w).cast(LongType))
  }

  /** dim_date: distinct dates split into year/month/day (X20)
    * (ref `TIKI_WAREHOUSE_DATABASE_SCHEMA_VI.md:1194-1200`). */
  def dimDate(src: DataFrame, dateCol: String): DataFrame = {
    val w = Window.orderBy(col("date"))
    src.select(col(dateCol).cast(DateType).as("date")).where(col("date").isNotNull).distinct()
      .withColumn("date_sk", row_number().over(w).cast(LongType))
      .withColumn("year", year(col("date")))
      .withColumn("month", month(col("date")))
      .withColumn("day", dayofmonth(col("date")))
  }

  /** dim_price_segment: the 6 fixed buckets of the reference
    * (`TIKI_WAREHOUSE_DATABASE_SCHEMA_VI.md:1180-1186`), plus "unknown". */
  def dimPriceSegment(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "under_100k", 0d, 100000d),
      (2L, "100k_500k", 100000d, 500000d),
      (3L, "500k_1m", 500000d, 1000000d),
      (4L, "1m_3m", 1000000d, 3000000d),
      (5L, "3m_5m", 3000000d, 5000000d),
      (6L, "over_5m", 5000000d, Double.MaxValue),
      (0L, "unknown", Double.NaN, Double.NaN)
    ).toDF("segment_sk", "segment", "min_price", "max_price")
  }

  /** Segment SK assignment as a codegen'd `when` ladder (6 fixed buckets —
    * cheaper than a range join; ref §2.4 J9 note). */
  def priceSegmentSk(price: Column): Column =
    when(price.isNull, 0L)
      .when(price < 100000, 1L)
      .when(price < 500000, 2L)
      .when(price < 1000000, 3L)
      .when(price < 3000000, 4L)
      .when(price < 5000000, 5L)
      .otherwise(6L)

  /** Human label twin of [[priceSegmentSk]] (X21). */
  def priceSegmentLabel(price: Column): Column = ColumnOps.priceSegment(price)

  /** Assemble a fact table: join `src` to each (dim, joinKeys) pair with a
    * broadcast hash join and keep `keep` + every dim's SK columns. */
  def fact(src: DataFrame, dims: Seq[(DataFrame, Seq[String])], keep: Seq[Column]): DataFrame = {
    val joined = dims.foldLeft(src) { case (acc, (d, keys)) =>
      acc.join(broadcast(d), keys, "left")
    }
    val skCols = dims.flatMap(_._1.columns.filter(_.endsWith("_sk"))).distinct.map(col)
    joined.select(keep ++ skCols: _*)
  }
}
