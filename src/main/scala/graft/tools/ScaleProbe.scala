package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scaling-shape measurement for the dedup family: corpora of n, 4n, 16n
  * synthetic documents (deterministic md5-derived tokens — no RNG), with a
  * planted trio per 10 docs: base, an EXACT duplicate, and a NEAR
  * duplicate (3 extra tokens ⇒ Jaccard ≈ L/(L+3) ≥ 0.93). Duplicate
  * structure therefore grows LINEARLY — no cliques — and everything else
  * is unique content. Embedding components are centered so sign-LSH
  * buckets actually split. The claim under test (docs/SCALE.md): candidate
  * generation is banded/bucketed, so wall time grows ~linearly with corpus
  * size. Results recorded in docs/SCALE.md §Measured scaling.
  */
object ScaleProbe {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    def corpus(n: Long): DataFrame = {
      val m = col("id") % 10
      val base = col("id") - m // integer arithmetic (Column./ is DOUBLE division)
      val cid = when(m === 1 || m === 2, base).otherwise(col("id"))
      val extra = when(m === 2, lit(3)).otherwise(lit(0))
      val len = (lit(40) + pmod(cid, lit(80)) + extra).cast("int")
      spark.range(n).select(
        col("id").as("doc_id"),
        array_join(transform(sequence(lit(1), len),
          j => md5(concat(cid.cast("string"), lit("-"), j.cast("string")))
            .substr(lit(1), lit(6))), " ").as("text"),
        transform(sequence(lit(1), lit(32)),
          j => pmod(hash(cid * j + j), lit(1000)).cast("double") / 1000.0 - 0.5)
          .as("embedding"))
        .localCheckpoint()
    }

    def time(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // window instrumentation (r16 verdict): one io-canary reading before
    // the first leg and one after each leg's timers, printed with the leg
    // — the r16 320k-leg scare (112 s vs a same-window 54 s) took a
    // nine-leg hand-interleaved rerun to adjudicate as window variance;
    // with these readings the leg's window is adjudicable from its own
    // line. The reading runs OUTSIDE the timers and syncs its writes.
    // A throwaway warmup rep first: the session's first canary call pays
    // the write pipeline's codegen/JIT (~1.7s vs ~0.95s warm).
    graft.IoCanary.sample(spark)
    val (ioLead, _) = graft.IoCanary.sample(spark)
    println(f"[scale] io_canary_leading=$ioLead%.2fs")

    for (n <- Seq(20000L, 80000L, 320000L)) {
      val docs = corpus(n)
      docs.count() // materialize outside the timers
      val (nExact, tExact) = time(Dedup.exactDedup(docs, "doc_id", "text").count())
      val (nPairs, tMh) = time(
        Dedup.minhashDedupPairs(docs, "doc_id", "text", threshold = 0.7).count())
      // planes grows with log2(n): bucket population is ~n/2^planes per
      // band, so fixed planes turns quadratic as the corpus grows — the
      // operator's key tuning knob at scale (see SCALE.md)
      val (nEmb, tEmb) = time(
        Dedup.embeddingNearDupPairs(docs, "doc_id", "embedding", threshold = 0.99,
          planes = 16, bands = 2).count()) // bands x planes must fit the 32 dims
      // connected components over the near-dup pairs: validates the label
      // propagation + checkpoint rotation at n-proportional pair counts
      val pairs = Dedup.minhashDedupPairs(docs, "doc_id", "text", threshold = 0.7)
        .localCheckpoint()
      val before = spark.sparkContext.getPersistentRDDs.size
      val (nCc, tCc) = time(
        Dedup.clusterNearDups(pairs).select(countDistinct(col("cluster_id"))).head.getLong(0))
      val leaked = spark.sparkContext.getPersistentRDDs.size - before
      val (ioLeg, _) = graft.IoCanary.sample(spark)
      println(f"[scale] n=$n%7d exact=$tExact%6.2fs ($nExact%d kept)  " +
        f"minhash=$tMh%6.2fs ($nPairs%d pairs)  embed=$tEmb%6.2fs ($nEmb%d pairs)  " +
        f"cc=$tCc%6.2fs ($nCc%d clusters, +$leaked%d live RDDs)  io_canary=$ioLeg%.2fs")
      // release this size's corpus checkpoint and nudge ContextCleaner to
      // reap the operators' internal (now-unreferenced) checkpoints before
      // the next, 4x larger, corpus
      org.apache.spark.sql.graftx.Bridge.unpersistCheckpoint(docs)
      System.gc()
    }
    spark.stop()
  }
}
