package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{Ann, Dedup}

/** Dev probe: quantify the small-files degradation the compaction
  * operators exist for, and that compacting restores the baseline.
  *
  * Simulates sustained ingest at sf0.1: a MinHash index and an IVF layout
  * each absorb many tiny appended batches (one part-file set per append —
  * exactly what `appendToMinhashIndex`/`appendToIvf` do in production),
  * then the probe measures the incremental-dedup / ANN probe time against
  * the fragmented tree, compacts, and re-measures. Results feed
  * docs/SCALE.md and BENCH_NOTES. */
object CompactProbe {
  def main(a: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches = if (a.nonEmpty) a(0).toInt else 48
    val spark = graft.GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    def timed(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def warmMin(f: => Long): Double = math.min(timed(f), timed(f))
    // drop the probes' internal localCheckpoint blocks between timings (the
    // bench-hygiene rule); the probe's OWN frames are plain filters over
    // parquet, so nothing long-lived is checkpoint-backed
    def cleanup(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))

    // ---- MinHash index under sustained ingest --------------------------
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") % 5 >= 2)
    val probeBatch = docs.filter(col("doc_id") % 5 === 1)
    val mhPath = java.nio.file.Files.createTempDirectory("graft_cprobe_mh").toString
    Dedup.writeMinhashIndex(Dedup.buildMinhashIndex(corpus, "doc_id", "text"), mhPath)
    // the %5==0 slice arrives as nBatches tiny appends
    val ingest = docs.filter(col("doc_id") % 5 === 0)
    for (b <- 0 until nBatches)
      Dedup.appendToMinhashIndex(ingest.filter(pmod(col("doc_id"), lit(5L * nBatches)) === b * 5L),
        mhPath, "doc_id", "text")
    def mhProbe(): Long = Dedup.dedupAgainstIndex(probeBatch,
      Dedup.readMinhashIndex(spark, mhPath), "doc_id", "text", threshold = 0.3).count()
    val mhFilesBefore = { val (b, h) = Dedup.minhashFileCounts(spark, mhPath); b + h }
    val mhBefore = warmMin(mhProbe()); cleanup()
    Dedup.compactMinhashIndex(spark, mhPath)
    val mhFilesAfter = { val (b, h) = Dedup.minhashFileCounts(spark, mhPath); b + h }
    val mhAfter = warmMin(mhProbe()); cleanup()
    println(f"PROBE minhash: $nBatches appends -> $mhFilesBefore files, probe $mhBefore%.2fs; " +
      f"compacted -> $mhFilesAfter files, probe $mhAfter%.2fs")

    // ---- IVF layout under sustained ingest ------------------------------
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val ivfPath = java.nio.file.Files.createTempDirectory("graft_cprobe_ivf").toString
    Ann.writeIvf(Ann.buildIvf(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", nlist = 16), ivfPath)
    val ivfIngest = emb.filter(col("vec_id") % 2 === 1)
    for (b <- 0 until nBatches)
      Ann.appendToIvf(ivfIngest.filter(pmod(col("vec_id"), lit(2L * nBatches)) === b * 2L + 1),
        ivfPath, "vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 50)
    def ivfProbe(): Long = Ann.ivfTopK(queries, Ann.readIvf(spark, ivfPath),
      "vec_id", "embedding", k = 10, nprobe = 4).count()
    def ivfFiles(): Int = Ann.ivfFileCounts(spark, ivfPath).values.sum
    val ivfFilesBefore = ivfFiles()
    val ivfBefore = warmMin(ivfProbe()); cleanup()
    Ann.compactIvf(spark, ivfPath)
    val ivfFilesAfter = ivfFiles()
    val ivfAfter = warmMin(ivfProbe()); cleanup()
    println(f"PROBE ivf: $nBatches appends -> $ivfFilesBefore files, probe $ivfBefore%.2fs; " +
      f"compacted -> $ivfFilesAfter files, probe $ivfAfter%.2fs")
    spark.stop()
  }
}
