package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Scratch}
import graft.operators.Scratch.Ops

/** Dev probe: measure the candidate fan-out of every guarded candidate join —
  * MinHash LSH self-join, sign-LSH embedding self-join, lshTopK's
  * query×corpus bucket join, the persisted-index probe join, and the n-gram
  * Jaccard inverted self-join (KEYED on the shingle, not banded) — over the
  * operators' OWN banding relations (`minhashBandKeys`, `embeddingBanded`,
  * `bandFanoutStats`/`joinFanoutStats` — the exact code each guard runs; a
  * probe carrying its own copy of a banding measures a dead layout the day
  * the banding changes: the SimhashProbe lesson).
  *
  * Corpus shapes, chosen to separate the two distinct hazards:
  *   - sf0.1 bench fixture (5k docs / ~1k vectors) — the healthy shape;
  *   - PERTURBED ×200 replicas (~1M docs, one unique token each) — a
  *     near-dup-heavy corpus. Its fan-out is the work LSH exists to DO
  *     (those pairs are real near-dups), so it should measure large but
  *     under the cap at 1M;
  *   - IDENTICAL ×N replicas — an exact-dup-heavy corpus, the shape the
  *     guard's "run exactDedup first" guidance targets: the fan-out is
  *     pure waste (exact dups don't need LSH), grows as N² per group, and
  *     crosses the default cap on its own at a few million rows;
  *   - the IDENTICAL corpus after exactDedup — demonstrating the guidance
  *     actually restores the healthy fan-out.
  * Numbers land in docs/SCALE.md. Usage: runMain graft.tools.FanoutProbe */
object FanoutProbe {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    def replicate(df: org.apache.spark.sql.DataFrame, idCol: String, n: Int,
        perturb: Boolean): org.apache.spark.sql.DataFrame = {
      val rep = df.crossJoin(spark.range(n.toLong).select(col("id").as("rep")))
      val out =
        if (perturb) rep.select((col(idCol) * n + col("rep")).as(idCol),
          concat(col("text"), lit(" rep"), col("rep")).as("text"))
        else rep.select(((col(idCol) * n + col("rep")).as(idCol) +:
          df.columns.filter(_ != idCol).map(col).toIndexedSeq): _*)
      out.localCheckpoint()
    }

    val docs0 = graft.Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text").localCheckpoint()
    val emb0 = graft.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
      .select("vec_id", "embedding").localCheckpoint()
    val perturbed1M = replicate(docs0, "doc_id", 200, perturb = true)
    val identical1M = replicate(docs0, "doc_id", 200, perturb = false)
    val identicalVec1M = replicate(emb0, "vec_id", 200, perturb = false)

    def report(route: String, corpus: String, st: Dedup.BandFanoutStats): Unit =
      println(f"FANOUT route=$route corpus=$corpus " +
        f"candidatePairs=${st.candidatePairs}%.4g maxBucket=${st.maxBucket} " +
        f"distinctKeys=${st.distinctBands}")

    // ---- Route 1: MinHash LSH self-join (minhashLshCandidates, defaults) ----
    for ((name, d) <- Seq(("sf0.1-5k", docs0), ("perturbed-1M", perturbed1M),
        ("identical-1M", identical1M))) Scratch.scoped {
      report("minhashLsh", name, Dedup.bandFanoutStats(
        Dedup.minhashBandKeys(d, "doc_id", "text").scratchCheckpoint(), "bandkey"))
    }
    Scratch.scoped {
      val deduped = Dedup.exactDedup(identical1M, "doc_id", "text").localCheckpoint()
      println(s"exactDedup survivors of identical-1M: ${deduped.count()}")
      report("minhashLsh", "identical-1M-after-exactDedup", Dedup.bandFanoutStats(
        Dedup.minhashBandKeys(deduped, "doc_id", "text").scratchCheckpoint(), "bandkey"))
    }

    // ---- Route 2: sign-LSH embedding self-join (embeddingNearDupPairs) ----
    for ((name, e) <- Seq(("sf0.1-1k", emb0), ("identical-1M", identicalVec1M)))
      Scratch.scoped {
        report("signLsh", name, Dedup.bandFanoutStats(
          Dedup.embeddingBanded(e, "vec_id", "embedding", planes = 8, bands = 4), "band"))
      }

    // ---- Route 3: lshTopK query×corpus bucket join (corpus as its own queries) ----
    for ((name, e) <- Seq(("sf0.1-1k", emb0), ("identical-1M", identicalVec1M)))
      Scratch.scoped {
        val b = e.select(graft.operators.Similarity.signBucket(col("embedding"), 8).as("bucket"))
        report("lshTopK-allq", name, Dedup.joinFanoutStats(b, b, "bucket"))
      }

    // ---- Route 4: persisted-index probe join (dedupAgainstIndex) ----
    Scratch.scoped {
      val idx = Dedup.buildMinhashIndex(docs0, "doc_id", "text")
      val batchSane = docs0.select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      report("indexProbe", "5k-batch-vs-5k-index", Dedup.joinFanoutStats(
        Dedup.minhashBandKeys(batchSane, "doc_id", "text").scratchCheckpoint(),
        idx.bands, "bandkey"))
      report("indexProbe", "perturbed-1M-batch-vs-5k-index", Dedup.joinFanoutStats(
        Dedup.minhashBandKeys(perturbed1M, "doc_id", "text").scratchCheckpoint(),
        idx.bands, "bandkey"))
      // the never-exact-deduped index: every band key is 200 docs hot
      val hotIdx = Dedup.buildMinhashIndex(identical1M, "doc_id", "text")
      report("indexProbe", "5k-batch-vs-identical-1M-index", Dedup.joinFanoutStats(
        Dedup.minhashBandKeys(batchSane, "doc_id", "text").scratchCheckpoint(),
        hotIdx.bands, "bandkey"))
    }

    // ---- Route 5: n-gram Jaccard inverted self-join (KEYED on the shingle,
    // not banded — the fan-out is Σ_s df(s)², and a boilerplate shingle
    // shared by every similar-length document makes one key emit nC2 rows
    // the length filter cannot drop). Measured over the operator's own
    // distinct shingle relation, the exact relation the guard aggregates.
    val withFooter = docs0.select(col("doc_id"),
      concat(col("text"), lit(" all rights reserved contact us terms of service"))
        .as("text")).localCheckpoint()
    for ((name, d) <- Seq(("sf0.1-5k", docs0), ("boilerplate-footer-5k", withFooter)))
      Scratch.scoped {
        report("jaccardInverted", name, Dedup.bandFanoutStats(
          Dedup.shingleRows(d, "doc_id", "text", 3).scratchCheckpoint(), "s"))
      }

    // ---- The guards tripping at their DEFAULT caps on realistic shapes ----
    def expectTrip(name: String)(body: => Long): Unit =
      try { val n = body; println(s"GUARD $name: NOT TRIPPED (rows=$n)") }
      catch { case e: IllegalArgumentException =>
        println(s"GUARD $name tripped as designed: ${e.getMessage.take(160)}") }
    // identical ×500 (2.5M docs): per-group nC2 alone is 5000·C(500,2)·4
    // bands ≈ 2.5e9 > the 2e9 default — an exact-dup-heavy corpus crosses
    // the cap with NO parameter override, and the message names exactDedup
    Scratch.scoped {
      val identical2M5 = replicate(docs0, "doc_id", 500, perturb = false)
      expectTrip("minhashLsh identical-2.5M @ default cap")(
        Dedup.minhashLshCandidates(identical2M5, "doc_id", "text").count())
    }
    // ×500 identical vector replicas (~2.6M): Σ nC2 scales with the square
    // of the replica count (measured 1.405e9 at ×200 ⇒ ≈ 8.8e9 at ×500),
    // over the 2e9 default — the exact-dup-heavy embedding corpus crosses
    // the cap with no override
    Scratch.scoped {
      val identicalVec2M5 = replicate(emb0, "vec_id", 500, perturb = false)
      expectTrip("signLsh identical-2.6M @ default cap")(
        Dedup.embeddingNearDupPairs(identicalVec2M5, "vec_id", "embedding", 0.95).count())
    }
    // 1M unique docs sharing a 7-token boilerplate tail: each pure-boilerplate
    // trigram has df = 1e6 ⇒ Σ nC2 ≈ 5·C(1e6,2) ≈ 2.5e12 ≫ the 2e9 default —
    // the inverted route refuses with guidance instead of emitting the rows
    Scratch.scoped {
      val boiler1M = spark.range(1000000L).select(col("id").as("doc_id"),
        concat(lit("doc"), col("id").cast("string"),
          lit(" all rights reserved terms of service apply")).as("text"))
        .localCheckpoint()
      expectTrip("jaccardInverted boilerplate-1M @ default cap")(
        Dedup.ngramJaccardPairs(boiler1M, "doc_id", "text", shingleN = 3,
          threshold = 0.8, forceInverted = true).count())
    }
    spark.stop()
  }
}
