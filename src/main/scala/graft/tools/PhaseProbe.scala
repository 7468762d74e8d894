package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev probe: phase-level wall-time breakdown of the q73 lifecycle shape
  * (build → write → ingest → compact → ingest → compact → probe) at sf0.1,
  * run twice (cold + warm). Pinpoints which lifecycle phase owns the
  * seconds the bench's single number reports. */
object PhaseProbe {
  def main(a: Array[String]): Unit = {
    val s = graft.GraftSession.create("local[32]", 32)
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  PHASE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    (1 to 2).foreach { rep =>
      val scratchDir = java.nio.file.Files.createTempDirectory("phaseprobe").toString
      val docs = graft.Tables.load(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 5 >= 3)
      val b1 = docs.filter(col("doc_id") % 5 === 0)
      val b2 = docs.filter(col("doc_id") % 5 === 1)
      val b3 = docs.filter(col("doc_id") % 5 === 2)
      val t0 = System.nanoTime()
      phase("build+write")(Dedup.writeMinhashIndex(
        Dedup.buildMinhashIndex(corpus, "doc_id", "text"), scratchDir))
      phase("ingest b1")(Dedup.ingestCycle(b1, scratchDir, "doc_id", "text", threshold = 0.3))
      phase("compact 1")(Dedup.compactMinhashIndex(s, scratchDir))
      phase("ingest b2")(Dedup.ingestCycle(b2, scratchDir, "doc_id", "text", threshold = 0.3))
      phase("compact 2")(Dedup.compactMinhashIndex(s, scratchDir))
      val n = phase("probe b3 + orderBy + count")(
        Dedup.dedupAgainstIndex(b3, Dedup.readMinhashIndex(s, scratchDir),
          "doc_id", "text", threshold = 0.3)
          .select(col("id").as("doc_id"), col("is_dup"), col("dup_of"), col("jaccard"))
          .orderBy(col("doc_id")).count())
      println(f"PROBE rep$rep rows=$n total=${(System.nanoTime() - t0) / 1e9}%.2fs")
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(scratchDir))
    }
    s.stop()
  }
}
