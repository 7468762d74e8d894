package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Measures what the r7 ingest-loop hardening buys per micro-batch against
  * a persisted MinHash index: (a) candidate-probe time with the bands
  * relation partition-pruned to the batch's `__bkt` buckets vs the same
  * probe forced to scan the whole relation (the pre-r7 shape, simulated by
  * dropping the partition column), and (b) replay-guard time reading the
  * compact id manifest vs a `distinct` over the corpus-sized bands
  * relation (the pre-r7 guard). Corpus generator shared with
  * [[ScaleProbe]]'s deterministic shape (no RNG). Results go in
  * docs/BENCH_NOTES_r7.md; the r12 append-tier leg (tombstone-free vs
  * disjoint vs heal-hit append cost) in docs/SCALE.md's re-ingest
  * section. */
object IngestProbe {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    def corpus(n: Long, off: Long): DataFrame = {
      val id = col("id") + off
      val len = (lit(40) + pmod(id, lit(80))).cast("int")
      spark.range(n).select(
        id.as("doc_id"),
        array_join(transform(sequence(lit(1), len),
          j => md5(concat(id.cast("string"), lit("-"), j.cast("string")))
            .substr(lit(1), lit(6))), " ").as("text"))
        .localCheckpoint()
    }

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // window instrumentation (r16 verdict): one io-canary reading before
    // leg 1 and one per corpus-size leg so a leg's window is adjudicable
    // from its own output — see ScaleProbe's note. Outside the timers.
    // Warmup rep first: the first canary call pays codegen/JIT.
    graft.IoCanary.sample(spark)
    val (ioLead, _) = graft.IoCanary.sample(spark)
    println(f"[ingestprobe] io_canary_leading=$ioLead%.2fs")

    for (n <- Seq(80000L, 320000L)) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_ingestprobe").toString
      val docs = corpus(n, 0); docs.count()
      val (_, tBuild) = time(
        Dedup.writeMinhashIndex(Dedup.buildMinhashIndex(docs, "doc_id", "text"), dir))
      val idx = Dedup.readMinhashIndex(spark, dir)
      // pre-r7 probe shape: same data, partition column dropped => no prune
      val flat = Dedup.MinhashIndex(idx.bands.drop("__bkt"), idx.shingles)
      // a micro-batch (4 docs = ~16 band keys -> prunes to ~1/4 of the
      // buckets) and a saturating batch (256 docs = ~1024 keys -> all 64
      // buckets hit, pruning is a no-op by design at that size)
      for (batchRows <- Seq(4L, 256L)) {
        val batch = corpus(batchRows, 10_000_000L); batch.count()
        def run(i: Dedup.MinhashIndex) =
          Dedup.dedupAgainstIndex(batch, i, "doc_id", "text", threshold = 0.7).count()
        val (_, tFlatCold) = time(run(flat));   val (_, tFlat) = time(run(flat))
        val (_, tPrunedCold) = time(run(idx));  val (_, tPruned) = time(run(idx))
        println(f"[ingestprobe] n=$n%7d batch=$batchRows%5d build=$tBuild%6.2fs  " +
          f"probe_flat=$tFlat%6.2fs (cold $tFlatCold%6.2fs)  " +
          f"probe_pruned=$tPruned%6.2fs (cold $tPrunedCold%6.2fs)")
        org.apache.spark.sql.graftx.Bridge.unpersistCheckpoint(batch)
      }
      // replay guard: manifest read vs distinct over bands
      val (nIds, tManifest) = time(Dedup.minhashIndexIds(spark, dir).count())
      val (_, tGuardOld) = time(
        idx.bands.select(col("id")).distinct().count())
      println(f"[ingestprobe] n=$n%7d guard_manifest=$tManifest%6.2fs ($nIds%d ids)  " +
        f"guard_distinct=$tGuardOld%6.2fs")
      // r12 heal tiers: the same append under the three tombstone states.
      // The DISJOINT tier must sit ~at the tombstone-free cost — its only
      // addition is a checkpoint of the batch's id projection (the full
      // batch stays lazy, the fix the r12 self-review forced); the HIT
      // tier pays the owed physical rewrite by design, which is the point
      // of reporting it next to the others
      import spark.implicits._
      def appendLeg(off: Long): Double = {
        val ab = corpus(1024L, off); ab.count()
        val (_, t) = time(Dedup.appendToMinhashIndex(
          ab, dir, "doc_id", "text", docsHint = 1024L))
        org.apache.spark.sql.graftx.Bridge.unpersistCheckpoint(ab)
        t
      }
      val tFree = appendLeg(20_000_000L)
      Dedup.deleteFromMinhashIndex(spark, dir,
        Seq(1L, 2L, 3L).toDF("id")) // live tombstones, disjoint from the next batch
      val tDisjoint = appendLeg(30_000_000L)
      // EXACTLY the tombstoned ids: a batch that also carried a live id
      // (e.g. id 0) would violate the append contract (batch disjoint from
      // live corpus ids) and write duplicate rows post-heal — the heal cost
      // measured is identical, the index stays well-formed
      val hitBatch = corpus(3L, 1L); hitBatch.count() // ids 1-3 = tombstoned → heal
      val (_, tHit) = time(Dedup.appendToMinhashIndex(
        hitBatch, dir, "doc_id", "text", docsHint = 3L))
      org.apache.spark.sql.graftx.Bridge.unpersistCheckpoint(hitBatch)
      val (ioLeg, _) = graft.IoCanary.sample(spark)
      println(f"[ingestprobe] n=$n%7d append_free=$tFree%6.2fs  " +
        f"append_disjoint=$tDisjoint%6.2fs  append_hit(heal)=$tHit%6.2fs  " +
        f"io_canary=$ioLeg%.2fs")
      org.apache.spark.sql.graftx.Bridge.unpersistCheckpoint(docs)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      System.gc()
    }
    spark.stop()
  }
}
