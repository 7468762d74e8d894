package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, Similarity}

/** IVF ANN: structure + recall vs the brute-force oracle. */
class AnnSpec extends SparkSpec {

  test("ivfTopK probes only nprobe lists and reaches recall >= 0.7 vs brute force") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    val index = Ann.buildIvf(emb, "vec_id", "embedding", nlist = 8)
    assert(index.centroids.length === 8)
    // every corpus row belongs to exactly one list
    assert(index.assigned.filter(col("list").isNull || col("list") < 0 || col("list") >= 8).count() === 0)

    val approx = Ann.ivfTopK(queries, index, "vec_id", "embedding", k = 10, nprobe = 4)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    info(f"recall@10 nprobe=4/8: $recall%.3f")
    assert(recall >= 0.7, f"recall too low: $recall%.3f")
    // probing fewer lists cannot return MORE than k per query
    val counts = approx.groupBy(_._1).map(_._2.size)
    assert(counts.forall(_ <= 10))
  }
}
