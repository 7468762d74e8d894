package graft

import org.apache.spark.sql.functions._

import graft.analytics.Analytics
import graft.operators.Hierarchy
import graft.sources.Sources
import graft.streaming.Streams

/** Exercises the Analytics query pack and the remaining operator surface
  * (H5 path fix, H2 tree grouping, stream dedup, category source, atomic
  * sink) against directly-computed expectations on the test tables. */
class AnalyticsSpec extends SparkSpec {

  /** products-shaped frame derived from testdata (stable, deterministic). */
  private lazy val products = {
    val c = Tables.customer(spark, sfDir)
    c.select(
      col("c_custkey").cast("string").as("product_id"),
      concat(lit("Product "), col("c_name")).as("name"),
      (col("c_acctbal") * 1000).as("price"),
      (col("c_acctbal") * 1200).as("original_price"),
      (pmod(col("c_custkey"), lit(60))).cast("double").as("discount_percent"),
      (pmod(col("c_custkey"), lit(6)).cast("double") * lit(0.9)).as("rating_average"),
      pmod(col("c_custkey"), lit(100)).cast("long").as("sales_count"),
      col("c_mktsegment").as("seller_name"),
      (pmod(col("c_custkey"), lit(3)) === 0).as("seller_is_official"),
      col("c_mktsegment").as("category_url"),
      array(col("c_mktsegment"), col("c_name")).as("category_path"),
      concat(lit("B"), pmod(col("c_custkey"), lit(7))).as("brand"),
      to_timestamp(lit("2024-01-01 00:00:00")).as("crawled_at"))
  }

  test("summary aggregates match directly-computed values") {
    val row = Analytics.summary(products).head()
    assert(row.getAs[Long]("total_products") === products.count())
    assert(row.getAs[Long]("products_with_price") === products.filter(col("price").isNotNull).count())
    val maxPrice = products.agg(max("price")).head().getDouble(0)
    assert(row.getAs[Double]("max_price") === maxPrice)
  }

  test("topGroups returns n biggest groups in deterministic order") {
    val top = Analytics.topGroups(products, "seller_name", 3).collect()
    assert(top.length === 3)
    assert(top.map(_.getLong(1)).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("OLAP pack: price categories, revenue rollup, brands, discount buckets, KPIs, missing stats") {
    val pc = Analytics.byPriceCategory(products)
    assert(pc.select("price_category").distinct().count() === pc.count())
    val rev = Analytics.revenueByCategoryLevels(products)
    assert(rev.agg(sum("n")).head().getLong(0) === products.count())
    // an uncategorized product (the transform stage defaults category_path
    // to an EMPTY array) must roll up under NULL levels, not throw
    // INVALID_ARRAY_INDEX from element_at under ANSI
    val withEmpty = products.withColumn("category_path",
      when(col("product_id").cast("long") % 7 === 0, array().cast("array<string>"))
        .otherwise(col("category_path")))
    val rev2 = Analytics.revenueByCategoryLevels(withEmpty)
    assert(rev2.agg(sum("n")).head().getLong(0) === products.count())
    assert(rev2.filter(col("level_1").isNull).count() >= 1)
    val brands = Analytics.brandPerformance(products, minProducts = 5)
    assert(brands.filter(col("n") < 5).count() === 0)
    val db = Analytics.discountBuckets(products)
    assert(db.agg(sum("n")).head().getLong(0) === products.count())
    val kpi = Analytics.kpiRow(products).head()
    assert(kpi.getAs[Long]("total") === products.count())
    val officialPct = kpi.getAs[Double]("pct_official")
    assert(officialPct > 0 && officialPct < 100)
    val miss = Analytics.missingDataStats(products).head()
    assert(miss.getAs[Long]("missing_seller") === 0L)
  }

  test("topPerCategory and schedulerTopK rank deterministically") {
    val top2 = Analytics.topPerCategory(products, 2)
    val worst = top2.groupBy("category_url").agg(count(lit(1)).as("n"))
      .agg(max("n")).head().getLong(0)
    assert(worst <= 2)
    import spark.implicits._
    val changes = Seq(("1", "price_change"), ("1", "price_change"), ("2", "sales_change"))
      .toDF("product_id", "crawl_type")
    val sched = Analytics.schedulerTopK(
      products.limit(50), changes, k = 10).collect()
    assert(sched.length === 10)
  }

  test("fixPathRoot prepends the root exactly once; childrenByParent sorts children") {
    import spark.implicits._
    val df = Seq(
      (Seq("Root", "A"), "ok"),
      (Seq("A", "Root"), "misplaced"),
      (Seq("B"), "missing")
    ).toDF("path", "tag")
    val fixed = Hierarchy.fixPathRoot(df, "path", "Root")
      .select(col("tag"), array_join(col("path"), ">").as("p"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fixed("ok") === "Root>A")
    assert(fixed("misplaced") === "Root>A")
    assert(fixed("missing") === "Root>B")

    val cats = Seq(("Zeta", "/z", "/r"), ("Alpha", "/a", "/r")).toDF("name", "url", "parent_url")
    val kids = Hierarchy.childrenByParent(cats)
      .filter(col("parent_url") === "/r")
      .select(expr("transform(children, c -> c.name)")).head().getSeq[String](0)
    assert(kids === Seq("Alpha", "Zeta"))
  }

  test("dedupStream drops repeated keys within the watermark; sources round-trip") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, java.sql.Timestamp)]
    val q = Streams.dedupStream(mem.toDF.toDF("k", "ts"), Seq("k"), "ts", "1 hour")
      .writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    val t = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    mem.addData(("a", t), ("a", t), ("b", t))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup_stream").count() === 2)

    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    Sources.writeAtomic(products.limit(10), s"$dir/p")
    assert(spark.read.parquet(s"$dir/p").count() === 10)
    // one good line, one malformed, one keyless: schema-first PERMISSIVE
    // parses garbage to an all-null row — readCategories must not emit a
    // phantom null-url category into the tree operators
    val catJson = """{"url":"/a","name":"A","parent_url":null,"level":1}
this line is not json
{"name":"keyless","level":9}"""
    java.nio.file.Files.writeString(java.nio.file.Path.of(dir, "cats.json"), catJson)
    val cats = Sources.readCategories(spark, s"$dir/cats.json")
    assert(cats.count() === 1)
    assert(cats.filter(col("url") === "/a").count() === 1)
  }
}
