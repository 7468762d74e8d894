package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Dev probe: IVF centroid-ranking formulations at production-ish nlist —
  * the evidence behind making [[graft.expressions.NearestCentroidsExpr]]
  * the production centroid-ranking path at every nlist (docs/SCALE.md r10
  * section).
  *
  * Three formulations of "assign each vector to its nearest of nlist
  * centroids", timed end-to-end (plan + codegen + execute) on a 100k x
  * dim-64 synthetic corpus:
  *  - literal:  the nlist x dim expression tree (array_sort over per-
  *              centroid structs) — the small-nlist oracle-parity path
  *  - native:   [[graft.expressions.NearestCentroidsExpr]] — one codegen'd
  *              node, centroid matrix as a reference object
  *  - bjoin:    corpus x broadcast(centroids) equi-join fan-out + min_by
  *              aggregate — the "join a centroids relation" alternative;
  *              pays an N x nlist row fan-out, an interpreted HOF distance
  *              (stock Spark has no codegen'd two-array-column L2), and a
  *              corpus-wide aggregate exchange
  */
object IvfPathProbe {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dim = 64
    val n = 100000
    val corpus = spark.range(n).select(col("id").as("vec_id"),
      array((0 until dim).map(j =>
        ((col("id") * 31 + j * 17) % 97 - 48).cast("double").divide(lit(48.0))
          .cast("float")): _*).as("embedding"))
      .localCheckpoint()
    println(s"[ivfprobe] corpus rows=${corpus.count()} dim=$dim")
    // session warmup so the first timed leg doesn't absorb first-job cost
    corpus.agg(sum(element_at(col("embedding"), 1))).head
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ivfprobe] $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs  (sum=$r)")
    }
    def viaRank(cents: Array[Array[Double]], literal: Boolean): Long =
      corpus.select(
          element_at(Ann.rankCentroids(col("embedding"), cents, 1, literal = literal), 1)
            .getField("list").as("list"))
        .agg(sum("list")).head.getLong(0)
    def viaJoin(cents: Array[Array[Double]]): Long = {
      val cdf = cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("list", "centroid").withColumn("__k", lit(1))
      val d = aggregate(
        zip_with(col("embedding"), col("centroid"),
          (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
        lit(0.0), (acc, v) => acc + v)
      corpus.withColumn("__k", lit(1))
        .join(broadcast(cdf), Seq("__k"))
        .select(col("vec_id"), d.as("__d"), col("list"))
        .groupBy("vec_id")
        .agg(min(struct(col("__d"), col("list"))).getField("list").cast("long").as("list"))
        .agg(sum("list")).head.getLong(0)
    }
    for (nlist <- Seq(16, 64, 256, 1024)) {
      val cents = Array.tabulate(nlist)(c =>
        Array.tabulate(dim)(j => (((c * 13 + j * 7) % 89) - 44) / 44.0))
      // literal capped at 64: at 256 the optimizer OOMs a default-heap
      // driver on the 49k-node tree — the cliff this probe documents
      if (nlist <= 64) time(f"literal nlist=$nlist%-5d")(viaRank(cents, literal = true))
      time(f"native  nlist=$nlist%-5d")(viaRank(cents, literal = false))
      // join fan-out capped where its N x nlist row count stays sane
      if (nlist <= 256) time(f"bjoin   nlist=$nlist%-5d")(viaJoin(cents))
    }
    spark.stop()
  }
}
