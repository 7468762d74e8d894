package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Hierarchy, History, Merge}

/** Behavioral specs for the merge/as-of/dedup/hierarchy/history operators
  * against hand-computed expectations. */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("upsertMerge: new non-empty wins, empty string keeps old, new keys inserted (J6)") {
    val old  = Seq(("1", "a", 10), ("2", "b", 20)).toDF("k", "s", "n")
    val newD = Seq(("2", "", 99), ("3", "c", 30)).toDF("k", "s", "n")
    val got = Merge.upsertMerge(old, newD, Seq("k")).orderBy("k")
      .as[(String, String, Int)].collect().toSeq
    assert(got == Seq(("1", "a", 10), ("2", "b", 99), ("3", "c", 30)))
  }

  test("latestPerKey picks max-ts row with deterministic tie-break (J7)") {
    val df = Seq(
      ("u1", ts("2024-01-01 10:00:00"), 1L, "old"),
      ("u1", ts("2024-01-01 11:00:00"), 2L, "new"),
      ("u1", ts("2024-01-01 11:00:00"), 3L, "tie-wins"),
      ("u2", ts("2024-01-01 09:00:00"), 4L, "only")).toDF("k", "t", "id", "v")
    val got = Merge.latestPerKey(df, Seq("k"), "t", Seq(col("id").desc))
      .orderBy("k").select("v").as[String].collect().toSeq
    assert(got == Seq("tie-wins", "only"))
  }

  test("asofJoin: latest right row at or before left time, null when none") {
    val left = Seq(
      ("u1", ts("2024-01-01 10:00:00"), "p1"),
      ("u1", ts("2024-01-01 12:00:00"), "p2"),
      ("u2", ts("2024-01-01 08:00:00"), "p3")).toDF("k", "t", "ev")
    val right = Seq(
      ("u1", ts("2024-01-01 09:00:00"), 1.0),
      ("u1", ts("2024-01-01 11:00:00"), 2.0),
      ("u2", ts("2024-01-01 09:00:00"), 3.0)).toDF("k", "t", "price")
    val got = Merge.asofJoin(left, right, "k", "t", "t", Seq("price"))
      .orderBy("ev").select("ev", "price").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getDouble(1))).toSeq
    assert(got == Seq(("p1", 1.0), ("p2", 2.0), ("p3", null)))
  }

  test("asofJoin equal timestamps: right row at same instant is visible (<=)") {
    val left  = Seq(("u", ts("2024-01-01 10:00:00"), "e")).toDF("k", "t", "ev")
    val right = Seq(("u", ts("2024-01-01 10:00:00"), 7.0)).toDF("k", "t", "price")
    val got = Merge.asofJoin(left, right, "k", "t", "t", Seq("price")).collect()(0)
    assert(got.getDouble(got.fieldIndex("price")) == 7.0)
  }

  test("exactDedup keeps min-id row per normalized text (D1)") {
    val docs = Seq(
      (3L, "Hello  World"), (1L, "hello world"), (2L, "other")).toDF("doc_id", "text")
    val got = Dedup.exactDedup(docs, "doc_id", "text").orderBy("doc_id")
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L))
  }

  test("minhashDedupPairs finds identical docs, skips unrelated (near-dup family)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words appear here with nothing shared at all")).toDF("doc_id", "text")
    val got = Dedup.minhashDedupPairs(docs, "doc_id", "text", 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)))
  }

  test("hierarchy resolvePaths builds root-first paths with cycle guard (H1)") {
    val cats = Seq(
      ("r", "Root", null.asInstanceOf[String]),
      ("a", "Mid", "r"),
      ("b", "Leaf", "a"),
      ("c1", "CycleA", "c2"), ("c2", "CycleB", "c1")).toDF("url", "name", "parent_url")
    val got = Hierarchy.resolvePaths(cats, maxDepth = 4)
      .select("url", "category_path", "level").orderBy("url")
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toList, r.getInt(2))).toSeq
    assert(got.find(_._1 == "b").get._2 == List("Root", "Mid", "Leaf"))
    assert(got.find(_._1 == "r").get._2 == List("Root"))
    // cycle terminates with both names, no infinite loop
    assert(got.find(_._1 == "c1").get._3 == 2)
  }

  test("withIsLeaf + missingParents (H4/H6)") {
    val cats = Seq(
      ("r", "Root", null.asInstanceOf[String]),
      ("a", "Mid", "r"),
      ("b", "Leaf", "a"),
      ("orphan", "X", "ghost")).toDF("url", "name", "parent_url")
    val leaves = Hierarchy.withIsLeaf(cats).filter(col("is_leaf"))
      .select("url").as[String].collect().toSet
    assert(leaves == Set("b", "orphan"))
    val missing = Hierarchy.missingParents(cats).as[String].collect().toSeq
    assert(missing == Seq("ghost"))
  }

  test("history deriveEvents classifies first crawl, price change, sales change, no-change filter (X15)") {
    val hist = Seq(
      ("p1", 100.0, 120.0, null.asInstanceOf[java.lang.Double], 5L, ts("2024-01-01 00:00:00")),
      ("p2", 50.0, 60.0, null.asInstanceOf[java.lang.Double], 9L, ts("2024-01-01 00:00:00")),
      ("p3", 70.0, 80.0, null.asInstanceOf[java.lang.Double], 3L, ts("2024-01-01 00:00:00")))
      .toDF("product_id", "price", "original_price", "discount_percent", "sales_count", "crawled_at")
    val batch = Seq(
      ("p1", 110.0, 120.0, null.asInstanceOf[java.lang.Double], 5L, ts("2024-01-02 00:00:00")), // price_change
      ("p2", 50.0, 60.0, null.asInstanceOf[java.lang.Double], 12L, ts("2024-01-02 00:00:00")),  // sales_change
      ("p3", 70.0, 80.0, null.asInstanceOf[java.lang.Double], 3L, ts("2024-01-02 00:00:00")),   // no_change → dropped
      ("p4", 30.0, 40.0, null.asInstanceOf[java.lang.Double], 1L, ts("2024-01-02 00:00:00")))   // first crawl
      .toDF("product_id", "price", "original_price", "discount_percent", "sales_count", "crawled_at")
    val got = History.deriveEvents(batch, hist, None)
      .select("product_id", "crawl_type").as[(String, String)].collect().toMap
    assert(got == Map("p1" -> "price_change", "p2" -> "sales_change", "p4" -> "price_change"))
  }

  test("ngramJaccard inverted and dense strategies produce identical pairs") {
    val docs = Tables.documents(spark, sfDir).limit(300)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // denseVocabBits = 0 forces the inverted-index path on the same input
    val dense = canon(graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 0.5))
    val inverted = canon(graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 0.5,
      denseVocabBits = 0))
    assert(dense.nonEmpty)
    assert(dense === inverted)
  }
}
