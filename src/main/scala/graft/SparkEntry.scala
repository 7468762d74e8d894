package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.ColumnOps
import graft.functions.TextAnalysis
import graft.operators.{Dedup, Hierarchy, History, Merge, Similarity}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with a DuckDB oracle in `oracleSql` where ANSI-SQL
  * expressible.
  *
  * Conventions that keep the Spark↔DuckDB hash compare stable:
  *  - money/quantity aggregates run in DECIMAL(18,2) (exact, associative —
  *    identical in any execution order/engine), outputs cast to DOUBLE;
  *  - counts cast to BIGINT explicitly on both sides;
  *  - every result carries a total ORDER BY with tie-breakers;
  *  - the `events.ts` column is nanosecond-precision parquet; Spark reads
  *    µs — we never output a raw ts, only date_trunc'd values.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  /** exact decimal sum, exported as double */
  private def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)
  /** portable average: exact decimal sum / count, rounded, as double */
  private def davg(c: Column): Column =
    round(sum(dec(c)).cast(DoubleType) / count(c), 4)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  // ==========================================================================
  // Queries
  // ==========================================================================

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- A1/A7: single-pass pricing summary (grouped min/max/avg/count) -----
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
            .cast(DoubleType).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).cast(LongType).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // --- A2: global scalar stats row ----------------------------------------
    "q02_global_stats" -> ((s, dir) => {
      t(s, dir, "orders").agg(
        count(lit(1)).cast(LongType).as("n_orders"),
        countDistinct(col("o_custkey")).cast(LongType).as("n_customers"),
        dsum(col("o_totalprice")).as("sum_total"),
        davg(col("o_totalprice")).as("avg_total"),
        date_trunc("second", max(col("o_orderdate"))).as("max_orderdate"))
    }),

    // --- A3: conditional counts (COUNT FILTER) ------------------------------
    "q03_conditional_counts" -> ((s, dir) => {
      t(s, dir, "orders").agg(
        count(when(col("o_orderstatus") === "F", 1)).cast(LongType).as("n_f"),
        count(when(col("o_orderstatus") === "O", 1)).cast(LongType).as("n_o"),
        count(when(col("o_orderpriority") === "1-URGENT", 1)).cast(LongType).as("n_urgent"),
        count(when(col("o_totalprice") > 100000, 1)).cast(LongType).as("n_big"))
    }),

    // --- A5/D5: grouped count + top-10 --------------------------------------
    "q04_top_groups" -> ((s, dir) => {
      t(s, dir, "part")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).cast(LongType).as("n"))
        .orderBy(col("n").desc, col("p_brand").asc)
        .limit(10)
    }),

    // --- J1/J2/P5: fact enriched by two broadcast dim joins ------------------
    "q05_enrich_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p  = broadcast(t(s, dir, "part"))
      val su = broadcast(t(s, dir, "supplier"))
      li.join(p, li("l_partkey") === p("p_partkey"))
        .join(su, li("l_suppkey") === su("s_suppkey"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("p_name"), col("p_brand"), col("s_name"),
          (dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
            .cast(DoubleType).as("revenue"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(1000)
    }),

    // --- J6: upsert merge with COALESCE(NULLIF(new,''), old) semantics ------
    "q06_upsert_merge" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val oldDf = orders.select("o_orderkey", "o_totalprice", "o_orderpriority", "o_orderstatus")
      val newDf = orders.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"),
          (col("o_totalprice") + 1000.0).as("o_totalprice"),
          lit("").as("o_orderpriority"),
          lit("U").as("o_orderstatus"))
      Merge.upsertMerge(oldDf, newDf, Seq("o_orderkey"))
        .orderBy(col("o_orderkey"))
    }),

    // --- J7: latest-per-key (DISTINCT ON analogue) ---------------------------
    "q07_latest_per_key" -> ((s, dir) => {
      Merge.latestPerKey(t(s, dir, "events"), Seq("user_id"), "ts", Seq(col("event_id").desc))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value").cast(DoubleType).as("value"))
        .orderBy(col("user_id"))
    }),

    // --- as-of join: latest prior 'click' for each 'purchase' ---------------
    "q08_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value").as("click_value"))
      Merge.asofJoin(purchases, clicks, "user_id", "ts", "ts", Seq("click_value"))
        .select(col("event_id"), col("user_id"),
          col("value").cast(DoubleType).as("value"),
          col("click_value").cast(DoubleType).as("click_value"))
        .orderBy(col("event_id"))
    }),

    // --- sessionization: 30-minute inactivity gap (batch shape of the
    //     streaming session-window; SURVEY.md §2.10) -------------------------
    "q09_sessionize" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev.withColumn("prev_ts", lag(col("ts"), 1).over(wOrd))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            col("ts").cast(DoubleType) - col("prev_ts").cast(DoubleType) > 1800, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_session")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).cast(LongType).as("n_events"),
          dsum(col("value")).as("sum_value"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // --- tumbling time-window aggregation (streaming batch analogue) --------
    "q10_window_hourly" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour_start"),
          col("event_type"))
        .agg(count(lit(1)).cast(LongType).as("n"),
          dsum(col("value")).as("sum_value"))
        .orderBy(col("hour_start"), col("event_type"))
    }),

    // --- J4: anti join (cleanup / not-exists) --------------------------------
    "q11_anti_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem").select(col("l_orderkey"))
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti")
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy(col("o_orderkey"))
    }),

    // --- F5: semi join (exists / skip-set) ------------------------------------
    "q12_semi_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy(col("c_custkey"))
    }),

    // --- U2: set difference ----------------------------------------------------
    "q13_set_except" -> ((s, dir) => {
      t(s, dir, "orders").select(col("o_orderkey"))
        .except(t(s, dir, "lineitem").select(col("l_orderkey").as("o_orderkey")))
        .orderBy(col("o_orderkey"))
    }),

    // --- U1/D1: union + order-insensitive dedup -------------------------------
    "q14_union_dedup" -> ((s, dir) => {
      val o = t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_orderstatus")
      o.filter(col("o_orderkey") % 3 === 0)
        .unionByName(o.filter(col("o_orderkey") % 2 === 0))
        .distinct()
        .orderBy(col("o_orderkey"))
    }),

    // --- D3: top-N per group (window) ------------------------------------------
    "q15_topn_per_group" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val joined = o.join(c, o("o_custkey") === c("c_custkey"))
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      joined.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("c_mktsegment"), col("rank").cast(LongType).as("rank"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("c_mktsegment"), col("rank"))
    }),

    // --- D4: priority-ordered top-k (scheduler query) ---------------------------
    "q16_priority_topk" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("priority",
          when(col("event_type") === "error", 0L)
            .when(col("event_type") === "purchase", 1L)
            .otherwise(2L))
        .orderBy(col("priority").asc, col("value").desc, col("event_id").asc)
        .select(col("event_id"), col("user_id"), col("event_type"), col("priority"),
          col("value").cast(DoubleType).as("value"))
        .limit(50)
    }),

    // --- A7/rollup: hierarchical subtotals --------------------------------------
    "q17_rollup" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region"))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).cast(LongType).as("n_customers"),
          dsum(col("c_acctbal")).as("sum_acctbal"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    }),

    // --- A7-C: HAVING --------------------------------------------------------
    "q18_having" -> ((s, dir) => {
      t(s, dir, "part")
        .groupBy(col("p_type"))
        .agg(count(lit(1)).cast(LongType).as("n"),
          davg(col("p_retailprice")).as("avg_price"))
        .filter(col("n") >= 50)
        .orderBy(col("p_type"))
    }),

    // --- X21/A7-D: CASE bucketing + per-bucket aggregates ----------------------
    "q19_bucket_case" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("bucket",
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 150000, "medium")
            .when(col("o_totalprice") < 300000, "large")
            .otherwise("jumbo"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).cast(LongType).as("n"),
          davg(col("o_totalprice")).as("avg_price"))
        .orderBy(col("bucket"))
    }),

    // --- X13/X14: discount math + flash-sale flag per row ----------------------
    "q20_discount_math" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 100 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          ColumnOps.discountAmount(dec(col("l_extendedprice")),
            dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
            .cast(DoubleType).as("discount_amount"),
          ColumnOps.discountPercent(dec(col("l_extendedprice")),
            dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
            .cast(DoubleType).as("discount_percent"),
          (dec(col("l_extendedprice")) * dec(col("l_discount")) >= 2000).as("is_flash_sale"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    })
  )

  // ==========================================================================
  // Oracle SQL (DuckDB, same parquet tables registered by name)
  // ==========================================================================

  def oracleSql: Map[String, String] = Map(

    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity), 4) AS avg_qty,
        |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount), 4) AS avg_disc,
        |  CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_global_stats" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
        |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice), 4) AS avg_total,
        |  date_trunc('second', MAX(o_orderdate)) AS max_orderdate
        |FROM orders""".stripMargin,

    "q03_conditional_counts" ->
      """SELECT
        |  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
        |  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
        |  CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
        |  CAST(COUNT(*) FILTER (WHERE o_totalprice > 100000) AS BIGINT) AS n_big
        |FROM orders""".stripMargin,

    "q04_top_groups" ->
      """SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n
        |FROM part GROUP BY p_brand
        |ORDER BY n DESC, p_brand ASC LIMIT 10""".stripMargin,

    "q05_enrich_join" ->
      """SELECT l_orderkey, l_linenumber, p_name, p_brand, s_name,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY l_orderkey, l_linenumber LIMIT 1000""".stripMargin,

    "q06_upsert_merge" ->
      """WITH new_rows AS (
        |  SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice,
        |         '' AS o_orderpriority, 'U' AS o_orderstatus
        |  FROM orders WHERE o_orderkey % 10 = 0
        |), old_rows AS (
        |  SELECT o_orderkey, o_totalprice, o_orderpriority, o_orderstatus FROM orders
        |)
        |SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
        |  COALESCE(n.o_totalprice, o.o_totalprice) AS o_totalprice,
        |  COALESCE(NULLIF(n.o_orderpriority, ''), o.o_orderpriority) AS o_orderpriority,
        |  COALESCE(NULLIF(n.o_orderstatus, ''), o.o_orderstatus) AS o_orderstatus
        |FROM new_rows n FULL OUTER JOIN old_rows o ON n.o_orderkey = o.o_orderkey
        |ORDER BY o_orderkey""".stripMargin,

    "q07_latest_per_key" ->
      """SELECT user_id, event_id, event_type, CAST(value AS DOUBLE) AS value
        |FROM events
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,

    "q08_asof_join" ->
      """WITH purchases AS (
        |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
        |), clicks AS (
        |  SELECT user_id, ts, value AS click_value FROM events WHERE event_type = 'click'
        |)
        |SELECT p.event_id, p.user_id, CAST(p.value AS DOUBLE) AS value,
        |       CAST(c.click_value AS DOUBLE) AS click_value
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,

    "q09_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |           OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id, value,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q10_window_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q11_anti_join" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q12_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,

    "q13_set_except" ->
      """SELECT o_orderkey FROM orders
        |EXCEPT
        |SELECT l_orderkey AS o_orderkey FROM lineitem
        |ORDER BY o_orderkey""".stripMargin,

    "q14_union_dedup" ->
      """SELECT DISTINCT o_orderkey, o_custkey, o_orderstatus FROM (
        |  SELECT o_orderkey, o_custkey, o_orderstatus FROM orders WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus FROM orders WHERE o_orderkey % 2 = 0
        |) ORDER BY o_orderkey""".stripMargin,

    "q15_topn_per_group" ->
      """SELECT c_mktsegment, CAST(rank AS BIGINT) AS rank, o_orderkey, o_totalprice FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |) WHERE rank <= 3
        |ORDER BY c_mktsegment, rank""".stripMargin,

    "q16_priority_topk" ->
      """SELECT event_id, user_id, event_type,
        |  CAST(CASE event_type WHEN 'error' THEN 0 WHEN 'purchase' THEN 1 ELSE 2 END AS BIGINT) AS priority,
        |  CAST(value AS DOUBLE) AS value
        |FROM events
        |ORDER BY priority ASC, value DESC, event_id ASC
        |LIMIT 50""".stripMargin,

    "q17_rollup" ->
      """SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "q18_having" ->
      """SELECT p_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(p_retailprice), 4) AS avg_price
        |FROM part GROUP BY p_type HAVING COUNT(*) >= 50
        |ORDER BY p_type""".stripMargin,

    "q19_bucket_case" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |            WHEN o_totalprice < 150000 THEN 'medium'
        |            WHEN o_totalprice < 300000 THEN 'large'
        |            ELSE 'jumbo' END AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice), 4) AS avg_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q20_discount_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) - CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS discount_amount,
        |  CAST(ROUND((CAST(l_extendedprice AS DECIMAL(18,2)) - CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) / CAST(l_extendedprice AS DECIMAL(18,2)) * 100, 2) AS DOUBLE) AS discount_percent,
  |  (CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) >= 2000) AS is_flash_sale
        |FROM lineitem WHERE l_orderkey % 100 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
