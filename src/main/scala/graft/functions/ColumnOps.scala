package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-expression library for the reference's scalar functions
  * (SURVEY.md §2.7, X1–X21). Everything here is a pure
  * `org.apache.spark.sql.functions._` composition — no UDFs — so the whole
  * surface stays inside whole-stage codegen and survives predicate pushdown.
  *
  * Reference semantics cited per function (paths relative to /root/reference/).
  */
object ColumnOps {

  /** X1 — parse_price: strip every non-digit, then cast.
    * "389.000₫" → 389000; empty/garbage → null.
    * Ref: src/pipelines/crawl/utils.py:417-434.
    */
  def parsePrice(c: Column): Column = {
    val digits = regexp_replace(c.cast(StringType), "[^0-9]", "")
    // >18 digits cannot be a price and would overflow the ANSI BIGINT cast
    // (found by PropertySpec's generated-garbage batch) -> null
    when(digits === "" || length(digits) > 18, lit(null).cast(LongType))
      .otherwise(digits.cast(LongType))
  }

  /** X2 — parse_sales_count: "2k"→2000, "1.5k"→1500, "3m"→3000000,
    * "389.000"→389 (float parse + int truncation — NOT digit-strip),
    * digit-strip only when the number regex finds nothing.
    * Ref: src/pipelines/crawl/utils.py:365-411 (`([\d.]+)\s*([km]?)`,
    * then `int(num)`).
    */
  def parseSalesCount(c: Column): Column = {
    val s    = lower(trim(c.cast(StringType)))
    // the number group must be a strictly-valid numeral (not "[0-9.]+")
    // so the later double cast is total under ANSI mode — a bare "." or
    // "1..2" matched the loose pattern and killed the job (found by
    // PropertySpec's generated-garbage batch)
    val numRe = "([0-9]+(?:\\.[0-9]+)?)\\s*([km]?)"
    val num  = regexp_extract(s, numRe, 1)
    val unit = regexp_extract(s, numRe, 2)
    val base = num.cast(DoubleType)
    // length guard: a 20+-digit "count" is garbage and the double->long
    // ANSI cast would throw on overflow
    when(num === "" || length(num) > 15 || s.isNull, lit(null).cast(LongType))
      .otherwise(
        when(unit === "k", (base * 1000).cast(LongType))
          .when(unit === "m", (base * 1000000).cast(LongType))
          .otherwise(base.cast(LongType)))
  }

  /** X3 — extract product id from URL: handles `/p/123`, `-p123.html`,
    * `/p123` ( `[\/-]p[/-]?(\d+)` ).
    * Ref: src/pipelines/crawl/utils.py:554-568. */
  def extractProductId(url: Column): Column = {
    val id = regexp_extract(url, "[/-]p[/-]?([0-9]+)", 1)
    when(id === "", lit(null).cast(StringType)).otherwise(id)
  }

  /** X4 — extract category id from URL: /c(\d+) → "c"+digits.
    * Ref: src/pipelines/crawl/utils.py:570-586. */
  def extractCategoryId(url: Column): Column = {
    val id = regexp_extract(url, "/c(\\d+)", 1)
    when(id === "", lit(null).cast(StringType)).otherwise(concat(lit("c"), id))
  }

  /** X5 — normalize_category_id: any of "1234", "c1234", " C1234 " → "c1234";
    * anything else → null. Ref: storage/postgres_storage.py:23-54. */
  def normalizeCategoryId(c: Column): Column = {
    val t      = lower(trim(c.cast(StringType)))
    val digits = when(t.rlike("^c?[0-9]+$"), regexp_replace(t, "^c", ""))
    when(digits.isNotNull && digits =!= "", concat(lit("c"), digits))
      .otherwise(lit(null).cast(StringType))
  }

  /** X6 — URL canonicalization: trim + drop tracking params (spid, src, utm_*)
    * + sort remaining query params + drop fragment.
    * Ref: src/pipelines/crawl/utils.py:588-620; redis_cache.py:83-137. */
  def normalizeUrl(c: Column): Column = {
    val trimmed  = trim(c)
    val noFrag   = regexp_replace(trimmed, "#.*$", "")
    val base     = regexp_extract(noFrag, "^([^?]*)", 1)
    val query    = regexp_extract(noFrag, "\\?(.*)$", 1)
    val params   = filter(
      split(query, "&"),
      p => !(p.startsWith("utm_") || p.startsWith("spid=") || p.startsWith("src=") || p === ""))
    val sortedQ  = array_join(array_sort(params), "&")
    when(query === "" || size(params) === 0, base)
      .otherwise(concat(base, lit("?"), sortedQ))
  }

  /** X7 — normalize_text: collapse whitespace runs, trim.
    * Ref: src/pipelines/transform/transformer.py:453-461. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** X11 — category name from slug: .../<slug>/c123 → "Slug Words".
    * Ref: storage/postgres_storage.py:1174-1176. */
  def nameFromSlug(url: Column): Column =
    initcap(regexp_replace(regexp_extract(url, "/([^/]+)/c\\d+", 1), "-", " "))

  /** X12 — multi-format timestamp parse (5 formats, first hit wins).
    * Ref: src/pipelines/transform/transformer.py:576-598. */
  def parseDatetimeMulti(c: Column): Column = coalesce(
    try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss")),
    try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss")),
    try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")),
    try_to_timestamp(c, lit("yyyy-MM-dd")),
    try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss.SSSSSS")))

  /** X13 — discount math. Ref: transformer.py:264-274; postgres_storage.py:1344-1373. */
  def discountPercent(original: Column, current: Column): Column =
    when(original.isNotNull && current.isNotNull && original > 0,
      round((original - current) / original * 100, 2))

  def discountAmount(original: Column, current: Column): Column =
    when(original.isNotNull && current.isNotNull, original - current)

  def priceChange(current: Column, previous: Column): Column =
    when(current.isNotNull && previous.isNotNull, current - previous)

  def priceChangePercent(current: Column, previous: Column): Column =
    when(current.isNotNull && previous.isNotNull && previous > 0,
      round((current - previous) / previous * 100, 2))

  /** X14 — flash-sale flag: discount ≥ 30% OR amount ≥ 100k VND.
    * Ref: postgres_storage.py:1375-1380. */
  def isFlashSale(discountPct: Column, discountAmt: Column): Column =
    (coalesce(discountPct, lit(0)) >= 30) || (coalesce(discountAmt, lit(0)) >= 100000)

  /** X15 — crawl_type classifier over current vs previous (as-of) values.
    * first crawl → price_change; any of price/original/discount changed →
    * price_change; else sales changed → sales_change; else brand/seller
    * null→value → data_improvement; else no_change (callers filter those out).
    * Ref: postgres_storage.py:1319-1413.
    */
  def crawlType(
      price: Column, prevPrice: Column,
      original: Column, prevOriginal: Column,
      discount: Column, prevDiscount: Column,
      salesChange: Column, dataImproved: Column): Column = {
    val firstCrawl   = prevPrice.isNull && prevOriginal.isNull && prevDiscount.isNull
    val priceChanged = !(price <=> prevPrice) || !(original <=> prevOriginal) || !(discount <=> prevDiscount)
    when(firstCrawl, "price_change")
      .when(priceChanged, "price_change")
      .when(salesChange.isNotNull && salesChange =!= 0, "sales_change")
      .when(dataImproved, "data_improvement")
      .otherwise("no_change")
  }

  /** X16 helpers — category-path array ops. Ref: postgres_storage.py:726-734. */
  def pathLevel(path: Column, i: Int): Column =
    when(size(path) >= i, element_at(path, i))
  def pathDepth(path: Column): Column = size(path)
  // guarded like pathLevel: bare element_at(path, 1) throws
  // INVALID_ARRAY_INDEX on an empty path under ANSI
  def pathRoot(path: Column): Column  = pathLevel(path, 1)
  def pathTruncate(path: Column, maxLevels: Int = 5): Column = slice(path, 1, maxLevels)

  /** X19 — official-seller derivation from name.
    * Ref: crawl_products_detail.py:981-989. */
  def isOfficialSeller(name: Column): Column = {
    val l = lower(coalesce(name, lit("")))
    l.contains("official") || l.contains("chính hãng") || l.contains("tiki")
  }

  /** X21 / J9 — price-segment bucketing: 6 fixed VND ranges + unknown.
    * Ref: docs/04-CONFIGURATION/TIKI_WAREHOUSE_DATABASE_SCHEMA_VI.md:1180-1186. */
  def priceSegment(price: Column): Column =
    when(price.isNull, "unknown")
      .when(price < 100000, "under_100k")
      .when(price < 500000, "100k_500k")
      .when(price < 1000000, "500k_1m")
      .when(price < 5000000, "1m_5m")
      .when(price < 20000000, "5m_20m")
      .otherwise("over_20m")

  /** price_category labels used by doc queries (budget…luxury).
    * Ref: TIKI_WAREHOUSE_DATABASE_SCHEMA_VI.md:242. */
  def priceCategory(price: Column): Column =
    when(price.isNull, "unknown")
      .when(price < 100000, "budget")
      .when(price < 1000000, "mid-range")
      .when(price < 10000000, "premium")
      .otherwise("luxury")

  /** A8 — completeness score: 0.5·critical + 0.35·important + 0.15·optional,
    * zero if any critical field missing. Ref: data_validator.py:89-123.
    * Fields are passed as presence flags (already-booleans). */
  def completenessScore(critical: Seq[Column], important: Seq[Column], optional: Seq[Column]): Column = {
    def ratio(cols: Seq[Column]): Column =
      if (cols.isEmpty) lit(1.0)
      else cols.map(c => when(c, 1.0).otherwise(0.0)).reduce(_ + _) / lit(cols.size.toDouble)
    val anyCriticalMissing = critical.map(c => when(c, 0).otherwise(1)).reduce(_ + _) > 0
    when(anyCriticalMissing, 0.0)
      .otherwise(round(ratio(critical) * 0.5 + ratio(important) * 0.35 + ratio(optional) * 0.15, 4))
  }

  /** P6 — names of missing fields as array<string>, in declaration order.
    * A field is "present" when its flag column is true (callers encode the
    * reference's truthiness — non-null/non-empty — per field).
    * Ref: data_validator.py:28-88 (`get_missing_fields`). */
  def missingFields(presence: Seq[(String, Column)]): Column =
    array_compact(array(presence.map { case (name, ok) =>
      when(ok, lit(null).cast(StringType)).otherwise(lit(name))
    }: _*))

  /** P6 — data-quality label ladder: every important field present →
    * `complete`; else score ≥ minScore → `partial`; else `incomplete`.
    * Ref: data_validator.py:211-217. */
  def dataQualityLabel(missingImportant: Column, score: Column,
      minScore: Double = 0.7): Column =
    when(size(missingImportant) === 0, "complete")
      .when(score >= minScore, "partial")
      .otherwise("incomplete")

  /** P6 — the full `_metadata` enrichment struct:
    * {missing_fields, data_completeness_score, retry_count, data_quality,
    * crawl_status}. Presence flags are passed per tier; the score is A8's
    * weighted formula over the same flags.
    * Ref: data_validator.py:185-227 (`enrich_product_metadata`). */
  def enrichMetadata(
      critical: Seq[(String, Column)], important: Seq[(String, Column)],
      optional: Seq[(String, Column)],
      retryCount: Column, crawlStatus: Column): Column = {
    val score = completenessScore(critical.map(_._2), important.map(_._2), optional.map(_._2))
    val missing = missingFields(important)
    struct(
      missing.as("missing_fields"),
      score.as("data_completeness_score"),
      retryCount.as("retry_count"),
      dataQualityLabel(missing, score).as("data_quality"),
      crawlStatus.as("crawl_status"))
  }

  /** F2 — seller-name garbage filter: null out names that are too short/long,
    * contain a junk pattern, are digits-only, punctuation-only, or start with
    * "<digits> ". Ref: transformer.py:474-544.
    */
  val invalidSellerPatterns: Seq[String] = Seq(
    "đã mua", "đã bán", "sold", "bought", "mua", "bán", "xem thêm",
    "more info", "chi tiết", "loading", "đang tải", "đã mua hàng")

  def validSellerName(c: Column): Column = {
    val s = trim(c)
    val l = lower(s)
    val containsJunk = invalidSellerPatterns.map(p => l.contains(p)).reduce(_ || _)
    when(
      s.isNull || length(s) < 2 || length(s) > 100 || containsJunk ||
        s.rlike("^[0-9]+$") || s.rlike("^[^\\p{L}\\p{N}_]+$") || s.rlike("^[0-9]+\\s"),
      lit(null).cast(StringType)
    ).otherwise(s)
  }
}
