object Q25Probe {
  def main(a: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.quality.Checks
    import graft.warehouse.StarSchema
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    // test 1: dim
    val src = Seq("b", "a", "c", "a", "b").toDF("k")
    println("PROBE dim=" + StarSchema.dim(src, Seq("k"), "sk").orderBy("sk").collect().toSeq)
    // test 2: dimDate + fact
    val orders0 = graft.Tables.orders(spark, sfDir)
    val dd = StarSchema.dimDate(orders0, "o_orderdate")
    println("PROBE ddhead=" + dd.orderBy("date_sk").head())
    val withDate = orders0.select(col("o_orderkey"), col("o_orderdate").cast("date").as("date"))
    val fact = StarSchema.fact(withDate, Seq(dd -> Seq("date")), keep = Seq(col("o_orderkey")))
    println("PROBE fact_null_sk=" + fact.filter(col("date_sk").isNull).count())
    // test 3: segment ladder
    val prices = Seq(50000d, 250000d, 750000d, 2000000d, 4000000d, 9000000d).toDF("p")
    println("PROBE seg=" + prices.select(StarSchema.priceSegmentSk(col("p")).as("sk")).as[Long].collect().toSeq)
    println("PROBE segdim=" + StarSchema.dimPriceSegment(spark).count())
    // test 4: quality — exact statements
    val li = graft.Tables.lineitem(spark, sfDir)
    val rules = Seq(Checks.inRange("l_quantity", 1, 50), Checks.required("l_returnflag"))
    val rep = Checks.report(li, rules).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    println("PROBE rep=" + rep)
    val orders = graft.Tables.orders(spark, sfDir)
    val orphans = Checks.fkOrphans(li, orders, "l_orderkey", "o_orderkey").count()
    val joined = li.join(orders, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    println("PROBE orphans=" + orphans + " li=" + li.count() + " joined=" + joined)
    spark.stop()
  }
}
