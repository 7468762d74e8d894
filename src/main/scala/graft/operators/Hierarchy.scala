package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hierarchy / graph-ish operators (SURVEY.md §2.9, H1–H6, D2).
  *
  * The reference walks `parent_url` chains row-at-a-time with a visited-set
  * cycle guard and a depth cap of 10 (`postgres_storage.py:487-562`). The
  * Spark shape is a bounded iterative self-join: each round extends every
  * node's ancestor path by one hop; nodes whose parent is missing or already
  * in the path (cycle) stop extending. Depth is bounded (≤5 levels in the
  * reference, `MAX_CATEGORY_LEVELS`), so this is a fixed small number of
  * broadcast joins — no GraphX, no driver loop over rows.
  *
  * Scale: the parent table is a dim (≈1k rows in the reference); we
  * `broadcast` it every round so path materialization over N rows is N×depth
  * map-side work with zero shuffles.
  */
object Hierarchy {

  /** H1 — materialize root-first name paths for every node.
    * Input: url, name, parent_url. Output: adds `category_path`
    * (array<string>, root first, ≤ maxDepth) and `level` (= size(path)).
    *
    * Deliberately ONE lazy plan, no mid-loop materialization: an r19
    * experiment checkpointed the frontier every 3 rounds to cap the plan
    * the driver optimizes (the un-cut chain re-plans as 110 broadcast
    * joins through repairParents' consumers), and a clean-window
    * same-session A/B measured it ~1 s SLOWER warm (q59 2.2–3.4 s plain
    * vs 3.5–3.6 s checkpointed): the extra materialization jobs' fixed
    * cost exceeds the planning they save — CollapseProject's
    * duplication guard keeps the mega-plan's optimizer cost linear, and
    * the storm-window measurement that motivated the change did not
    * reproduce. Reverted; recorded here so the next optimizer does not
    * re-try it without new evidence. */
  def resolvePaths(categories: DataFrame, maxDepth: Int = 10, maxLevels: Int = 5): DataFrame = {
    val parents = categories.select(
      col("url").as("__p_url"), col("name").as("__p_name"),
      col("parent_url").as("__p_parent"))
    var cur = categories
      .withColumn("category_path", array(col("name")))
      .withColumn("__cursor", col("parent_url"))
      .withColumn("__seen", array(col("url")))
    var i = 0
    while (i < maxDepth) {
      cur = cur
        .join(broadcast(parents), col("__cursor") === col("__p_url"), "left")
        .withColumn("__cycle", array_contains(col("__seen"), col("__cursor")))
        .withColumn("category_path",
          when(col("__p_name").isNotNull && !col("__cycle"),
            concat(array(col("__p_name")), col("category_path")))
            .otherwise(col("category_path")))
        .withColumn("__seen",
          when(col("__p_name").isNotNull && !col("__cycle"),
            concat(col("__seen"), array(col("__cursor"))))
            .otherwise(col("__seen")))
        .withColumn("__cursor",
          when(col("__p_name").isNotNull && !col("__cycle"), col("__p_parent"))
            .otherwise(lit(null)))
        .drop("__p_url", "__p_name", "__p_parent", "__cycle")
      i += 1
    }
    cur.drop("__cursor", "__seen")
      .withColumn("category_path", slice(col("category_path"), 1, maxLevels))
      .withColumn("level", size(col("category_path")))
  }

  /** H4 — is_leaf: url never appears as someone's parent_url.
    * Ref: postgres_storage.py:481,588,714. */
  def withIsLeaf(categories: DataFrame): DataFrame = {
    val parentUrls = categories.select(col("parent_url").as("__pu")).where(col("__pu").isNotNull).distinct()
    categories.join(broadcast(parentUrls), col("url") === col("__pu"), "left")
      .withColumn("is_leaf", col("__pu").isNull)
      .drop("__pu")
  }

  /** D2 — dedup by category_id, best-wins: shortest URL, tie → longer name.
    * Ref: postgres_storage.py:772-800. */
  def dedupBestWins(categories: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("category_id"))
      .orderBy(length(col("url")).asc, length(col("name")).desc, col("url").asc)
    categories.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** U2/H6 — parent URLs referenced but absent from the table (to repair).
    * Ref: postgres_storage.py:836-854; tasks/loader.py:62-75. */
  def missingParents(categories: DataFrame): DataFrame =
    categories.select(col("parent_url").as("url")).where(col("url").isNotNull).distinct()
      .join(categories.select("url"), Seq("url"), "left_anti")

  /** H6 — full missing-parent repair: pull absent parents from a reference
    * dimension (precedence: existing table wins), union them in, re-derive
    * paths and is_leaf. Parents absent from the reference too are created
    * as placeholder roots named from their URL slug (the reference's
    * auto-create default, postgres_storage.py:836-854).
    * Ref flow: tasks/loader.py:21-219. */
  def repairParents(categories: DataFrame, referenceDim: DataFrame,
      maxLevels: Int = 5): DataFrame = {
    val missing = missingParents(categories)
    val fromRef = missing.join(referenceDim, Seq("url"), "inner")
      .select(col("url"), col("name"), col("parent_url"))
    val placeholders = missing.join(referenceDim.select("url"), Seq("url"), "left_anti")
      .select(col("url"),
        initcap(regexp_replace(regexp_extract(col("url"), "/([^/]+)/?$", 1), "-", " ")).as("name"),
        lit(null).cast("string").as("parent_url"))
    val repaired = categories.select("url", "name", "parent_url")
      .unionByName(fromRef).unionByName(placeholders)
    withIsLeaf(resolvePaths(repaired, maxLevels = maxLevels))
  }

  /** H5 — ensure the root name sits at index 1 of every path.
    * Ref: validate_category_path.py:24-124.
    *
    * The head probe is `get(path, 0)`, not `element_at(path, 1)`:
    * element_at THROWS INVALID_ARRAY_INDEX_IN_ELEMENT_AT on an empty
    * array under ANSI mode (on by default in Spark 4), so one
    * empty-path row — upstream of the resolver this normally follows —
    * would kill the whole job from deep inside the plan. `get` returns
    * NULL out of bounds; a NULL/empty path passes through unchanged. */
  def fixPathRoot(df: DataFrame, pathCol: String, rootName: String): DataFrame =
    df.withColumn(pathCol,
      when(get(col(pathCol), lit(0)) =!= rootName,
        concat(array(lit(rootName)), array_remove(col(pathCol), rootName)))
        .otherwise(col(pathCol)))

  /** J3 — category product-count update: count DISTINCT products per LEAF
    * category where the product matches by `category_url = url` OR (category
    * has a non-null id AND `product.category_id = category_id`), then write
    * the count back onto the leaf rows (non-leaf rows keep their old value;
    * leaves with no products get 0 — the reference's LEFT JOIN).
    *
    * Ref: postgres_storage.py:1526-1539 (`update_category_product_counts`).
    *
    * The Postgres OR-join would plan a nested loop on Spark; here it is a
    * UNION of two equi-joins (url-match ∪ id-match) feeding one
    * `countDistinct` — each join hashes on its own key, the union is narrow
    * (url, product_id) rows, and `countDistinct` dedups products that match
    * the same category through both arms. The category dim is small →
    * broadcast on both arms; the products side never shuffles. */
  def categoryProductCounts(
      categories: DataFrame, products: DataFrame,
      countCol: String = "product_count"): DataFrame = {
    val leaf = categories.filter(col("is_leaf"))
    val byUrl = products
      .select(col("category_url").as("__curl"), col("product_id").as("__pid"))
      .join(broadcast(leaf.select(col("url").as("__curl"))), Seq("__curl"))
      .select(col("__curl").as("__url"), col("__pid"))
    val byId = products
      .filter(col("category_id").isNotNull)
      .select(col("category_id").as("__cid"), col("product_id").as("__pid"))
      .join(broadcast(leaf.filter(col("category_id").isNotNull)
        .select(col("category_id").as("__cid"), col("url").as("__url"))), Seq("__cid"))
      .select(col("__url"), col("__pid"))
    val counts = byUrl.unionByName(byId)
      .groupBy(col("__url")).agg(countDistinct(col("__pid")).as("__cnt"))
    // counts has at most one row per leaf category — always dim-sized, so
    // the update-back join broadcasts instead of shuffling the category table
    categories
      .join(broadcast(counts.withColumnRenamed("__url", "url")), Seq("url"), "left")
      .withColumn(countCol,
        when(col("is_leaf"), coalesce(col("__cnt"), lit(0L)))
          .otherwise(col(countCol)))
      .drop("__cnt")
  }

  /** H2 — nested tree assembly (small-data, driver-bound by design: the
    * category dim is ≈1k rows). Children grouped and name-sorted (K1). */
  def childrenByParent(categories: DataFrame): DataFrame =
    categories
      .groupBy(col("parent_url"))
      .agg(sort_array(collect_list(struct(col("name"), col("url")))).as("children"))

  /** H3 — flatten a recursive `{name,url,children:[...]}` JSON tree into
    * (name, url, parent_url, level) rows. Spark has no recursive types, so
    * the schema is depth-unrolled to `maxDepth` and the descent is a bounded
    * loop of explodes — one narrow Generate per level, no driver recursion.
    * Ref: extract_categories.py:30-74. */
  def flattenTree(trees: DataFrame, jsonCol: String, maxDepth: Int = 5): DataFrame = {
    import org.apache.spark.sql.types._
    def nodeSchema(d: Int): StructType = {
      val base = Seq(StructField("name", StringType), StructField("url", StringType))
      if (d <= 1) StructType(base)
      else StructType(base :+ StructField("children", ArrayType(nodeSchema(d - 1))))
    }
    var cur = trees
      .select(from_json(col(jsonCol), nodeSchema(maxDepth)).as("node"))
      // from_json is lenient: malformed tree JSON parses to an all-null
      // struct (PERMISSIVE mode), which would surface as a phantom
      // (null, null, null, 1) row in the flattened output. A real node
      // carries at least one of name/url by the tree contract.
      .filter(col("node").isNotNull &&
        (col("node.name").isNotNull || col("node.url").isNotNull))
      .select(lit(null).cast(StringType).as("parent_url"), col("node"), lit(1).as("level"))
    val levels = Seq.newBuilder[DataFrame]
    for (d <- 1 to maxDepth) {
      levels += cur.select(col("node.name").as("name"), col("node.url").as("url"),
        col("parent_url"), col("level"))
      if (d < maxDepth)
        cur = cur.filter(col("node.children").isNotNull)
          .select(col("node.url").as("parent_url"),
            explode(col("node.children")).as("node"), (col("level") + 1).as("level"))
    }
    levels.result().reduce(_ unionByName _)
  }
}
