package graft

import org.apache.spark.sql.functions._

import graft.operators.Hierarchy
import graft.quality.Checks
import graft.schema.Schemas
import graft.sources.Sources
import graft.warehouse.StarSchema

/** Star-schema builder (J9), quality checker (§5c), JSON sources (S1/S5)
  * and tree flatten (H3). */
class WarehouseSpec extends SparkSpec {

  test("dim assigns dense surrogate keys in natural-key order") {
    import spark.implicits._
    val src = Seq("b", "a", "c", "a", "b").toDF("k")
    val d = StarSchema.dim(src, Seq("k"), "sk").orderBy("sk")
      .as[(String, Long)].collect().toSeq
    assert(d === Seq(("a", 1L), ("b", 2L), ("c", 3L)))
  }

  test("dimDate splits dates and fact wires SKs via broadcast joins") {
    val orders = Tables.orders(spark, sfDir)
    val dd = StarSchema.dimDate(orders, "o_orderdate")
    val row = dd.orderBy("date_sk").head()
    assert(row.getAs[Long]("date_sk") === 1L)
    assert(row.getAs[Int]("year") === row.getDate(dd.columns.indexOf("date")).toLocalDate.getYear)
    // every order resolves a date_sk
    val withDate = orders.select(col("o_orderkey"), col("o_orderdate").cast("date").as("date"))
    val fact = StarSchema.fact(withDate, Seq(dd -> Seq("date")), keep = Seq(col("o_orderkey")))
    assert(fact.filter(col("date_sk").isNull).count() === 0)
    val plan = fact.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dim join should broadcast:\n$plan")
  }

  test("priceSegmentSk ladder matches dimPriceSegment ranges") {
    import spark.implicits._
    val prices = Seq(50000d, 250000d, 750000d, 2000000d, 4000000d, 9000000d).toDF("p")
    val sks = prices.select(StarSchema.priceSegmentSk(col("p")).as("sk"))
      .as[Long].collect().toSeq
    assert(sks === Seq(1L, 2L, 3L, 4L, 5L, 6L))
    assert(StarSchema.dimPriceSegment(spark).count() === 7)
  }

  test("quality report counts violations in one pass; orphans and dups empty on clean data") {
    val li = Tables.lineitem(spark, sfDir)
    val rules = Seq(Checks.inRange("l_quantity", 1, 50), Checks.required("l_returnflag"))
    val rep = Checks.report(li, rules).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("range_l_quantity") === 0L)
    assert(rep("required_l_returnflag") === 0L)
    // FK integrity holds in the synthetic data: anti-join and semi-join
    // partition the table
    val orders = Tables.orders(spark, sfDir)
    val orphans = Checks.fkOrphans(li, orders, "l_orderkey", "o_orderkey").count()
    val joined = li.join(orders, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(orphans === li.count() - joined)
    // the synthetic lineitem DOES carry duplicate (orderkey, linenumber)
    // pairs — assert the checker agrees with independent group arithmetic
    val dupGroups = Checks.duplicates(li, Seq("l_orderkey", "l_linenumber")).count()
    val totalKeys = li.select("l_orderkey", "l_linenumber").distinct().count()
    val singleKeys = li.groupBy("l_orderkey", "l_linenumber").count()
      .filter(col("count") === 1).count()
    assert(dupGroups === totalKeys - singleKeys)
    assert(dupGroups > 0)
  }

  test("envelope JSON source explodes nested products with the declared schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_env").toString
    val json =
      """{"crawled_at":"2024-01-01T00:00:00","total_products":2,"stats":{"ok":"2"},
        |"products":[
        | {"product_id":"1","name":"A","url":"https://x/p/1","price":{"current_price":100.0,"original_price":200.0},"seller":{"name":"S","is_official":true}},
        | {"product_id":"2","name":"B","url":"https://x/p/2","price":{"current_price":50.0},"sales_count":"2k"}
        |]}""".stripMargin.replace("\n", "")
    java.nio.file.Files.writeString(java.nio.file.Path.of(dir, "run1.json"), json)
    val df = Sources.readEnvelope(spark, dir)
    assert(df.count() === 2)
    val a = df.filter(col("product_id") === "1").head()
    assert(a.getAs[org.apache.spark.sql.Row]("price").getAs[Double]("current_price") === 100.0)
    assert(a.getAs[String]("envelope_crawled_at") === "2024-01-01T00:00:00")
    // S5: payload-string parse hits the same schema
    import spark.implicits._
    val raw = Seq("""{"product_id":"9","name":"Z","url":"https://x/p/9"}""").toDF("payload")
    assert(Sources.parseRawProducts(raw, "payload").head().getAs[String]("product_id") === "9")
    assert(Schemas.envelope.fieldNames.contains("products"))
  }

  test("repairParents pulls absent parents from the reference dim and placeholders the rest") {
    import spark.implicits._
    val cats = Seq(
      ("/a/x", "X", "/a"),          // parent /a missing, present in reference
      ("/b/y", "Y", "/b")           // parent /b missing everywhere -> placeholder
    ).toDF("url", "name", "parent_url")
    val ref = Seq(("/a", "A", null: String)).toDF("url", "name", "parent_url")
    val repaired = Hierarchy.repairParents(cats, ref)
    val rows = repaired.select("url", "name", "is_leaf")
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSet
    assert(rows === Set(
      ("/a/x", "X", true), ("/b/y", "Y", true),
      ("/a", "A", false), ("/b", "B", false)))
    val pathOfX = repaired.filter(col("url") === "/a/x")
      .select(array_join(col("category_path"), ">")).head().getString(0)
    assert(pathOfX === "A>X")
  }

  test("flattenTree unrolls a nested category tree to (name,url,parent,level)") {
    import spark.implicits._
    val tree =
      """{"name":"Root","url":"/r","children":[
        | {"name":"A","url":"/r/a","children":[{"name":"A1","url":"/r/a/1"}]},
        | {"name":"B","url":"/r/b"}
        |]}""".stripMargin.replace("\n", "")
    val flat = Hierarchy.flattenTree(Seq(tree).toDF("j"), "j", maxDepth = 4)
      .orderBy("level", "url")
      .select("name", "url", "parent_url", "level")
      .as[(String, String, Option[String], Int)].collect().toSeq
    assert(flat === Seq(
      ("Root", "/r", None, 1),
      ("A", "/r/a", Some("/r"), 2),
      ("B", "/r/b", Some("/r"), 2),
      ("A1", "/r/a/1", Some("/r/a"), 3)))
  }
}
