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

  test("q45 self-anchor: the seeded KMeans fit reproduces the checked-in golden top-k (sf0.001)") {
    // q45 is rows-only at the driver gate because DuckDB cannot KMeans;
    // q74 oracles every OTHER link of the IVF chain with injected
    // centroids, leaving exactly the seeded fit uncovered. This pins it:
    // same seed + same corpus ⇒ bit-identical centroids ⇒ the q45-shaped
    // top-k matches a checked-in golden. Empirically stable across JVMs
    // on this host/session-config (generated once, re-run in fresh JVMs —
    // the fit's float reductions follow a fixed partition order at the
    // spec session's local[4]/4-shuffle-partitions layout). Regenerate
    // after an INTENTIONAL fit change with -Dgraft.test.writeGolden=1;
    // an unexplained mismatch means the fit silently stopped reproducing.
    val emb = Tables.embeddings(spark, sfDir)
    val idx = Ann.buildIvf(emb, "vec_id", "embedding", nlist = 16)
    // in-session determinism — two independent fits, bitwise equal
    val idx2 = Ann.buildIvf(emb, "vec_id", "embedding", nlist = 16)
    assert(idx.centroids.map(_.toSeq).toSeq === idx2.centroids.map(_.toSeq).toSeq)
    val got = Ann.ivfTopK(emb.filter(col("vec_id") < 20), idx,
        "vec_id", "embedding", k = 10, nprobe = 4)
      .orderBy(col("query_id"), col("rank"))
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .collect()
      .map(r => s"${r.getLong(0)},${r.getInt(1)},${r.getLong(2)},${r.getDouble(3)}")
      .mkString("\n")
    if (sys.props.get("graft.test.writeGolden").contains("1")) {
      // regeneration writes the SOURCE tree (CWD-relative by design —
      // only ever run from the repo root, by a human changing the fit)
      // plus the live test classpath, so a same-session re-run compares
      // against the fresh golden (r17 advice)
      GoldenResource.write("/q45_golden_sf0.001.txt",
        "src/test/resources/q45_golden_sf0.001.txt", got + "\n")
      info("golden regenerated (source tree + test classpath)")
    } else {
      // reads go through the test CLASSPATH (r16 advice): the only
      // CWD-relative read in the suite would break under forked tests
      // with a different working directory
      val golden = GoldenResource.read("/q45_golden_sf0.001.txt")
      assert(got === golden,
        "seeded IVF top-k diverged from the checked-in golden: either the fit " +
          "changed intentionally (regenerate with -Dgraft.test.writeGolden=1) " +
          "or the seeded KMeans fit is no longer reproducible")
    }
  }

  test("centroid ranking: native expression path == literal tree at nlist=256, ties included") {
    // the production path (one reference-object expression) must be
    // arithmetic-identical to the literal expression tree it replaced —
    // same squared-L2 accumulation order, same (dist asc, list asc)
    // tie-break; the tree survives as this independent reference
    // implementation. Duplicate vectors AND duplicate centroids force
    // exact distance ties on both axes.
    import spark.implicits._
    val dim = 16
    val corpus = (0 until 400).map { i =>
      val base = i % 200 // rows 200..399 duplicate 0..199
      (i.toLong, Array.tabulate(dim)(j => (((base * 31 + j * 17) % 97) - 48) / 48.0f))
    }.toDF("vec_id", "embedding")
    val cents: Array[Array[Double]] = Array.tabulate(256) { c =>
      val b = c % 128 // centroids 128..255 duplicate 0..127 -> exact dist ties
      Array.tabulate(dim)(j => (((b * 13 + j * 7) % 89) - 44) / 44.0)
    }
    def canonCol(rank: org.apache.spark.sql.Column): Map[Long, Seq[(Double, Int)]] = corpus
      .select(col("vec_id"), rank.as("r"))
      .collect().map { r =>
        r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(s => (s.getDouble(0), s.getInt(1)))
      }.toMap
    def canon(literal: Boolean): Map[Long, Seq[(Double, Int)]] =
      canonCol(Ann.rankCentroids(col("embedding"), cents, k = 5, literal = literal))
    val viaTree = canon(literal = true)
    val viaExpr = canon(literal = false)
    assert(viaExpr.size === 400)
    assert(viaExpr === viaTree)
    // the Broadcast-handle variant (the plan-weight scale path) runs the
    // SAME kernel and must match the literal tree bit-for-bit too
    val bc = spark.sparkContext.broadcast(cents)
    try assert(canonCol(graft.expressions.VectorExpressions
      .nearestCentroidsBcast(col("embedding"), bc, k = 5)) === viaTree)
    finally bc.destroy()
    // the duplicate-centroid ties actually materialized AND broke low-first
    val sawTie = viaExpr.values.exists(r => r.map(_._1).distinct.size < r.size)
    assert(sawTie, "fixture produced no distance ties — tie-break untested")
    viaExpr.values.foreach { r =>
      r.groupBy(_._1).values.foreach { same =>
        assert(same.map(_._2) === same.map(_._2).sorted, s"tie order not list-asc: $r")
      }
    }
    // assignToCentroids itself routes to the expression path at 256 lists
    // and must agree with a literal-tree assignment
    val assigned = Ann.assignToCentroids(corpus, "vec_id", "embedding", cents)
      .select("vec_id", "list").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(assigned === viaTree.view.mapValues(_.head._2).toMap)
  }

  test("native centroid ranking: O(1) plan size, survives CODEGEN_ONLY at nlist=1024") {
    // the literal tree's failure mode at production nlist is generated-code
    // size (64KB method limit -> silent interpreted fallback) and plan-tree
    // blowup. The native path must keep the plan O(1) in nlist and compile
    // under CODEGEN_ONLY (which turns any codegen fallback into a failure).
    // spark.range source (NOT a local Seq: ConvertToLocalRelation would
    // eagerly eval the projection and leave nothing codegen'd to assert on)
    val dim = 64
    // plain array(...) construction, not a transform() lambda — HOFs are
    // CodegenFallback and would break the projection out of WSCG on their
    // own, masking what this test asserts about nearest_centroids
    val corpus = spark.range(500).select(col("id").as("vec_id"),
      array((0 until dim).map(j =>
        ((col("id") * 31 + j * 17) % 97 - 48).cast("double").divide(lit(48.0))
          .cast("float")): _*).as("embedding"))
    val cents = Array.tabulate(1024)(c =>
      Array.tabulate(dim)(j => (((c * 13 + j * 7) % 89) - 44) / 44.0))
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val ranked = corpus.select(col("vec_id"),
        Ann.rankCentroids(col("embedding"), cents, k = 4, literal = false).as("r"))
      val plan = ranked.queryExecution.executedPlan.toString
      // "*(n) Project" = the projection runs INSIDE whole-stage codegen
      assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined,
        s"projection not inside WholeStageCodegen:\n${plan.take(2000)}")
      // the 1024x64 centroid matrix prints as a bare reference ([[D@...)
      // — expression STATE, not expression TREE
      assert(plan.contains("[[D@"),
        s"centroid matrix expanded into the plan:\n${plan.take(2000)}")
      assert(plan.length < 20000,
        s"plan grew with nlist (len=${plan.length}) — the literal-tree cliff is back")
      assert(ranked.count() === 500) // executes with codegen mandatory
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("buildIvfSampled: sampled fit is deterministic, assigns the full corpus, recall holds") {
    val emb = Tables.embeddings(spark, sfDir)
    val idx = Ann.buildIvfSampled(emb, "vec_id", "embedding", nlist = 8, fitFraction = 0.5)
    assert(idx.centroids.length === 8)
    // the FULL corpus is assigned even though only the sample was fitted
    assert(idx.assigned.count() === emb.count())
    assert(idx.assigned.filter(col("list").isNull || col("list") < 0 || col("list") >= 8).count() === 0)
    // the md5-threshold sample makes rebuilds reproduce exactly
    val idx2 = Ann.buildIvfSampled(emb, "vec_id", "embedding", nlist = 8, fitFraction = 0.5)
    assert(idx.centroids.map(_.toSeq).toSeq === idx2.centroids.map(_.toSeq).toSeq)
    // routing quality: same recall bar as the full-fit spec
    val queries = emb.filter(col("vec_id") < 10)
    val approx = Ann.ivfTopK(queries, idx, "vec_id", "embedding", k = 10, nprobe = 4)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    info(f"sampled-fit recall@10 nprobe=4/8: $recall%.3f")
    assert(recall >= 0.7, f"recall too low: $recall%.3f")
  }

  test("centroid broadcast cache: identity-keyed, bounded LRU, eviction re-broadcasts") {
    def mat(seed: Int): Array[Array[Double]] =
      Array.tabulate(4)(c => Array.tabulate(4)(j => (seed * 17 + c * 5 + j).toDouble))
    val m0 = mat(0)
    val b0 = Ann.centroidBcast(spark, m0)
    // same matrix identity -> the SAME broadcast (no re-broadcast per probe)
    assert(Ann.centroidBcast(spark, m0) eq b0)
    // equal CONTENT but different identity is a different index -> new broadcast
    assert(!(Ann.centroidBcast(spark, mat(0)) eq b0))
    // churn more distinct matrices than the cache holds: m0 (the eldest,
    // untouched since) is evicted, and re-requesting it re-broadcasts —
    // bounded degradation, never unbounded growth
    (1 to Ann.CentroidBcastCacheSize + 1).foreach(i => Ann.centroidBcast(spark, mat(i)))
    assert(!(Ann.centroidBcast(spark, m0) eq b0))
  }

  test("buildIvfSampled: a sample smaller than nlist falls back to the full-corpus fit") {
    val emb = Tables.embeddings(spark, sfDir)
    val total = emb.count()
    // a fraction that can only yield a handful of rows — far below nlist=8:
    // the documented requirement is now ENFORCED by falling back to the
    // full fit instead of reaching KMeans with fewer points than k
    val idx = Ann.buildIvfSampled(emb, "vec_id", "embedding",
      nlist = 8, fitFraction = 1.0 / total)
    assert(idx.centroids.length === 8)
    assert(idx.assigned.count() === total)
    // the fallback IS the full fit — same seed, same centroids as buildIvf
    val full = Ann.buildIvf(emb, "vec_id", "embedding", nlist = 8)
    assert(idx.centroids.map(_.toSeq).toSeq === full.centroids.map(_.toSeq).toSeq)
  }

  test("buildIvfSampled: a duplicate-heavy sample with too few DISTINCT vectors falls back") {
    import spark.implicits._
    // 200 rows but only 3 distinct vectors: a raw row-count guard would
    // wave this through to KMeans with fewer points than k — the guard
    // must count distinct vectors
    val dup = spark.range(200).select(col("id").as("vec_id"),
      array((col("id") % 3).cast("float"), lit(1.0f)).as("embedding"))
    val idx = Ann.buildIvfSampled(dup, "vec_id", "embedding",
      nlist = 8, fitFraction = 0.9)
    // the full-corpus fallback fired and buildIvf's corpus<nlist handling
    // took over: every row assigned, no crash, no null lists
    assert(idx.assigned.count() === 200)
    assert(idx.assigned.filter(col("list").isNull).count() === 0)
    val full = Ann.buildIvf(dup, "vec_id", "embedding", nlist = 8)
    assert(idx.centroids.map(_.toSeq).toSeq === full.centroids.map(_.toSeq).toSeq)
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
