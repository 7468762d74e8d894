package graft
/** entry() smoke: the driver's rows>0 check at sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("local[4]", 4)
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"SMOKE entry rows=$n " + (if (n > 0) "PASS" else "FAIL"))
    spark.stop()
  }
}
