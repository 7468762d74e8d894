package graft.tools

/** Dev probe: time individual SparkEntry queries at sf0.1 (repeat a name to
  * measure warm timings). Usage: runMain graft.tools.QueryProbe q25_... */
object QueryProbe {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (a.nonEmpty) a.toSeq
      else Seq("q25_minhash_pairs", "q26_ngram_jaccard", "q27_simhash_pairs")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.1").count()
      println(f"PROBE $name: rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
