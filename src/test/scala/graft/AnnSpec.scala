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

  test("buildIvf handles a corpus smaller than nlist") {
    import spark.implicits._
    val tiny = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)), (3L, Array(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val idx = Ann.buildIvf(tiny, "vec_id", "embedding", nlist = 8)
    // every vector still lands in exactly one (possibly degenerate) list
    assert(idx.assigned.count() === 3)
    assert(idx.assigned.filter(col("list").isNull).count() === 0)
    val got = Ann.ivfTopK(tiny, idx, "vec_id", "embedding", k = 2,
      nprobe = math.min(4, idx.centroids.length))
    assert(got.count() > 0)
  }

  test("persisted IVF index: identical probe results, corpus scan partition-pruned on list") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    val index = Ann.buildIvf(emb, "vec_id", "embedding", nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    Ann.writeIvf(index, dir)
    val disk = Ann.readIvf(spark, dir)
    assert(disk.centroids.map(_.toSeq).toSeq == index.centroids.map(_.toSeq).toSeq)

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val mem = rows(Ann.ivfTopK(queries, index, "vec_id", "embedding", k = 10, nprobe = 4))
    val dsk = Ann.ivfTopK(queries, disk, "vec_id", "embedding", k = 10, nprobe = 4)
    // the probe's list filter must land on the PARTITION column of the
    // persisted layout — directory pruning, not a post-read filter: at
    // 100 TB this is what makes a probe read nprobe/nlist of the corpus
    val plan = dsk.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*list".r.findFirstIn(plan).isDefined,
      s"corpus scan is not partition-pruned on list:\n${plan.take(4000)}")
    assert(rows(dsk) == mem)
  }

  test("appendToIvf: incremental ingest assigns nearest centroid, no rebuild, probes see new rows") {
    val emb = Tables.embeddings(spark, sfDir)
    val initial = emb.filter(col("vec_id") % 2 === 0)
    val batch = emb.filter(col("vec_id") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_app").toString
    Ann.writeIvf(Ann.buildIvf(initial, "vec_id", "embedding", nlist = 8), dir)
    Ann.appendToIvf(batch, dir, "vec_id", "embedding")
    val updated = Ann.readIvf(spark, dir)
    // nothing lost, nothing duplicated
    assert(updated.assigned.count() === emb.count())
    assert(updated.assigned.select("vec_id").distinct().count() === emb.count())
    // every appended vector sits in its true nearest existing centroid list
    val cents = updated.centroids
    val appended = updated.assigned
      .join(batch.select(col("vec_id")), Seq("vec_id"), "left_semi")
      .select("vec_id", "embedding", "list")
      .collect()
    appended.foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      val best = cents.indices.minBy(i =>
        cents(i).indices.map(j => { val d = v(j) - cents(i)(j); d * d }).sum)
      assert(r.getInt(2) === best, s"vec ${r.getLong(0)} assigned ${r.getInt(2)}, nearest $best")
    }
    // a probe against the updated layout returns appended ids as neighbors
    val probeRes = Ann.ivfTopK(emb.filter(col("vec_id") < 10), updated,
      "vec_id", "embedding", k = 10, nprobe = 8)
    assert(probeRes.join(batch.select(col("vec_id").as("neighbor_id")),
      Seq("neighbor_id"), "left_semi").count() > 0,
      "no appended vector ever surfaced as a neighbor")
    // the id manifest is maintained through write + append, and reads its
    // own compact relation — never a distinct over the assigned tree
    // (what the streaming replay guard anti-joins per micro-batch)
    val ids = Ann.ivfIds(spark, dir)
    assert(ids.inputFiles.nonEmpty && ids.inputFiles.forall(_.contains("/ids/")),
      s"manifest should be backed by the ids relation, got ${ids.inputFiles.toSeq}")
    assert(ids.count() === emb.count())
    assert(ids.select("id").distinct().count() === emb.count())
  }
}
