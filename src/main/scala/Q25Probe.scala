object Q25Probe {
  def main(a: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (a.nonEmpty) a.toSeq else Seq("q26_ngram_jaccard", "q25_minhash_pairs")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.1").count()
      println(f"PROBE $name: rows=$n time=${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    spark.stop()
  }
}
