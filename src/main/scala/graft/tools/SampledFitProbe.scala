package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Dev probe: the KMeans fit cost behind [[graft.operators.Ann
  * .buildIvfSampled]] — O(sample) vs [[graft.operators.Ann.buildIvf]]'s
  * O(corpus) per iteration, on a corpus large enough for the difference
  * to dominate (the spec gates the RECALL of the sampled fit; this
  * measures the COST, docs/SCALE.md r11 section).
  *
  * The build calls are timed directly: `KMeans.fit` runs eagerly inside
  * them, so the measured time is the fit (plus one sample scan for the
  * sampled legs); the full-corpus assignment both shapes share is timed
  * separately once. Sampled centroids differ from full-fit centroids by
  * construction — routing quality, not equality, is the contract
  * (AnnSpec's recall gate). */
object SampledFitProbe {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val dim = 64
    val n = sys.env.getOrElse("FITPROBE_N", "400000").toInt
    val nlist = 256
    // diversity matters here: a small-modulus lattice (the other probes'
    // generator) yields only ~97 DISTINCT vectors and KMeans collapses
    // below k — mix a large prime so ~100k distinct vectors exist
    val corpus = spark.range(n).repartition(32)
      .select(col("id").as("vec_id"),
        array((0 until dim).map(j =>
          ((col("id") * 2654435761L + j * 40503) % 100003 - 50001).cast("double")
            .divide(lit(50001.0)).cast("float")): _*).as("embedding"))
      .localCheckpoint()
    println(s"[fitprobe] corpus rows=${corpus.count()} dim=$dim nlist=$nlist")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[fitprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    // warmup: one tiny fit absorbs MLlib's first-job/codegen cost
    Ann.buildIvf(corpus.limit(2000), "vec_id", "embedding", nlist = 8)
    val full = time("full fit (buildIvf)")(
      Ann.buildIvf(corpus, "vec_id", "embedding", nlist))
    for (frac <- Seq(0.10, 0.02)) {
      val sampleRows = math.round(n * frac)
      val idx = time(f"sampled fit frac=$frac%.2f (~${sampleRows / 1000}k rows)")(
        Ann.buildIvfSampled(corpus, "vec_id", "embedding", nlist, fitFraction = frac))
      require(idx.centroids.length == nlist)
    }
    // the assignment both shapes share — for scale context, not comparison
    time("assign full corpus")(
      full.assigned.agg(sum("list")).head.getLong(0): Unit)
    spark.stop()
  }
}
