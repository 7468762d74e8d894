package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.Dedup

/** Dev probe: curation pipeline at sf0.1 — per-stage wall time of the
  * current (narrow-checkpoint) shape plus two warm end-to-end runs of
  * `Curation.curate` for an apples-to-apples bench comparison. */
object CurationProbe {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cprobe] $label%-16s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    val total = time("total")(docs.count())
    val scored = time("ckpt scored")(docs
      .select(col("doc_id"),
        TextAnalysis.langPredict(TextAnalysis.tokens(col("text"))).as("__lang"),
        TextAnalysis.qualityScore(col("text")).as("__q"))
      .localCheckpoint())
    val keepIds = scored.filter(col("__lang").isin("en", "vi") && col("__q") >= 0.5)
      .select("doc_id")
    val gated = docs.join(keepIds, Seq("doc_id"), "left_semi")
    val nGated = time("count gated")(gated.count())
    val exact = time("ckpt exact")(Dedup.exactDedup(gated, "doc_id", "text").localCheckpoint())
    val nExact = time("count exact")(exact.count())
    val pairs = Dedup.minhashDedupPairs(exact, "doc_id", "text", 0.7, shingleN = 3)
    val losers = time("ckpt losers")(pairs.select(col("id_b").as("doc_id")).distinct().localCheckpoint())
    val kept = exact.join(losers, Seq("doc_id"), "left_anti")
    val nKept = time("count kept")(kept.count())
    println(s"[cprobe] counts: $total $nGated $nExact $nKept")
    // end-to-end, as the bench sees it (run 2 is the warm number)
    for (i <- 1 to 3) time(s"curate e2e #$i") {
      val r = graft.pipeline.Curation.curate(docs, "doc_id", "text",
        allowedLangs = Seq("en", "vi"), minQuality = 0.5,
        nearDupThreshold = 0.7, shingleN = 3)
      r.kept.count()
    }
    spark.stop()
  }
}
