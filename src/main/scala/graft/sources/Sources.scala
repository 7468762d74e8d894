package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.Schemas

/** Sources & sinks (SURVEY.md §2.1).
  *
  *  - S1/S2: schema-first JSON reads — `spark.read.schema(...).json` so the
  *    scan never pays schema inference. Malformed lines parse to all-null
  *    rows (PERMISSIVE mode): the envelope read sheds them naturally
  *    (explode of a null products array emits nothing), the category read
  *    drops keyless rows explicitly, and raw-product payloads flow into
  *    the transform stage's REJECTS channel (null product_id) — nothing
  *    silently poisons types, nothing phantom survives.
  *  - S3: compression is a parquet codec concern (zstd by default here) —
  *    the reference's zlib JSON wrapper disappears.
  *  - S4: atomic file sinks are the output committer's job — `df.write`
  *    commits via temp + rename already.
  *  - S5: the raw→typed boundary: `from_json` over a payload string column
  *    (the crawl's HTML/`__NEXT_DATA__` extraction re-expressed as a parsing
  *    stage over fixture payloads).
  */
object Sources {

  /** S1 — read crawl-envelope JSON files `{crawled_at, total_products,
    * stats, products:[...]}` and explode to one row per nested product,
    * carrying the envelope timestamp. */
  def readEnvelope(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.envelope).json(path)
      .select(col("crawled_at").as("envelope_crawled_at"), explode(col("products")).as("p"))
      .select(col("envelope_crawled_at"), col("p.*"))

  /** S2 — flat category-list JSON. A malformed line parses to an all-null
    * row; `url` is the category key everywhere downstream (hierarchy walks,
    * is_leaf anti-joins, product-count matches), so keyless rows are
    * dropped here rather than walking a phantom null-url category through
    * the tree operators. */
  def readCategories(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.category).json(path)
      .filter(col("url").isNotNull)

  /** S5 — parse a raw JSON payload column into the nested product struct:
    * the typed boundary for anything upstream that produces strings. */
  def parseRawProducts(raw: DataFrame, payloadCol: String): DataFrame =
    raw.withColumn("p", from_json(col(payloadCol), Schemas.rawProduct))
      .select(col("p.*"))

  /** S4 — overwrite sink (atomic via the parquet output committer),
    * optionally date-partitioned (the 100 TB layout for history-like data). */
  def writeAtomic(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }
}
