/** Dev probe: stage timings for q25 at sf0.1. */
package graft.tools

object QueryProbe {
  def main(a: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions.TextAnalysis._
    import graft.expressions.HashExpressions
    val spark = graft.GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name: rows=$n time=${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    time("warm")(docs.count())
    val numHashes = 12; val bands = 4; val rows = 3
    val sig = docs.select(col("doc_id").as("id"), col("text").as("__text"))
      .repartition(col("id"))
      .select(col("id"), HashExpressions.minhashSignature(wordShingles(col("__text"), 3), numHashes).as("sig"))
    time("sig_forced")(sig.filter(size(col("sig")) > 0).count())
    val bandCols = (0 until bands).map { b =>
      concat(lit(s"$b:"),
        md5(concat_ws(",", (b * rows until (b + 1) * rows).map(i => element_at(col("sig"), i + 1)): _*)))
    }
    val wbPlain = sig.select(col("id"), explode(array(bandCols: _*)).as("bandkey"))
    time("bands_nockpt")(wbPlain.count())
    wbPlain.explain("formatted")
    val t0 = System.nanoTime()
    val withBands = wbPlain.localCheckpoint()
    println(f"PROBE bands_ckpt: time=${(System.nanoTime()-t0)/1e9}%.2fs")
    time("q25_full")(graft.SparkEntry.queries("q25_minhash_pairs")(spark, "/root/testdata/sf0.1").count())
    time("q27_full")(graft.SparkEntry.queries("q27_simhash_pairs")(spark, "/root/testdata/sf0.1").count())
    spark.stop()
  }
}
