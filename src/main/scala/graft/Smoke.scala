package graft
/** entry() smoke: the driver's rows>0 check at sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"SMOKE entry rows=$n " + (if (n > 0) "PASS" else "FAIL"))
    spark.stop()
  }
}
