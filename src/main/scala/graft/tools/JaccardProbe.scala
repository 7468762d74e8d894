package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis._

/** Dev probe: per-stage wall time of the q26 dense n-gram-Jaccard path. */
object JaccardProbe {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[jprobe] $label%-18s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    val sh = time("ckpt shingles") {
      docs.select(col("doc_id").as("id"), tokens(col("text")).as("__toks"))
        .repartition(col("id"))
        .select(col("id"), explode(shinglesFromTokens(col("__toks"), 2)).as("s"))
        .localCheckpoint()
    }
    val sh2 = time("ckpt shingles v2") {
      docs.select(col("doc_id").as("id"), tokens(col("text")).as("__toks"))
        .repartition(col("id"))
        .select(col("id"), explode(rawNgrams(col("__toks"), 2)).as("s"))
        .distinct()
        .localCheckpoint()
    }
    println(s"[jprobe] v1 rows=${sh.count()} v2 rows=${sh2.count()}")
    val vocabSize = time("count distinct")(sh.agg(count_distinct(col("s"))).head.getLong(0))
    println(s"[jprobe] vocabSize=$vocabSize words=${(vocabSize + 63) / 64}")
    val n = time("full query") {
      graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 0.5).count()
    }
    println(s"[jprobe] pairs=$n")
    val n2 = time("full query warm") {
      graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 0.5).count()
    }
    spark.stop()
  }
}
