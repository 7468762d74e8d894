package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Scratch}

/** Dev probe: quantify the SimHash band fan-out of `simhashPairs`' ACTUAL
  * maxDist+1 pigeonhole banding (it calls `Dedup.simhashBanded` /
  * `Dedup.simhashBandStats`, the same code the operator's guard runs — a
  * previous probe carried its own copy of the banding and went stale when
  * the banding was fixed). Two corpus shapes:
  *   - sf0.1 documents (5k docs) — the bench fixture;
  *   - a replicated ~1M-doc shape (each replica's text perturbed by one
  *     unique token, so fingerprints stay diverse — the saturation being
  *     measured is KEYSPACE saturation, not duplicate pileup);
  * for bits ∈ {16, 32, 64}, printing the exact candidate-pair count the
  * banded self-join would emit, the largest band bucket, and the distinct
  * key count. Then times full simhashPairs runs where the fan-out is sane
  * and demonstrates the guard where it is not. Numbers land in
  * docs/SCALE.md. Usage: runMain graft.tools.SimhashProbe */
object SimhashProbe {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs0 = graft.Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text").localCheckpoint()
    val reps = 200
    val big = docs0.crossJoin(spark.range(reps.toLong).select(col("id").as("rep")))
      .select((col("doc_id") * reps + col("rep")).as("doc_id"),
        concat(col("text"), lit(" rep"), col("rep")).as("text"))
      .localCheckpoint()
    val maxDist = 2
    for ((name, d) <- Seq(("sf0.1-5k", docs0), ("replicated-1M", big));
         bits <- Seq(16, 32, 64)) Scratch.scoped {
      val st = Dedup.simhashBandStats(
        Dedup.simhashBanded(d, "doc_id", "text", bits, maxDist))
      println(f"FANOUT corpus=$name bits=$bits maxDist=$maxDist " +
        f"candidatePairs=${st.candidatePairs}%.4g maxBucket=${st.maxBucket} " +
        f"distinctBands=${st.distinctBands}")
    }
    // timed full runs where the fan-out is sane; bits=16 at 1M docs is the
    // saturation case — the operator's guard must refuse it loudly
    def timed(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"TIMED $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    for (bits <- Seq(16, 64)) Scratch.scoped {
      timed(s"sf0.1-5k bits=$bits")(
        Dedup.simhashPairs(docs0, "doc_id", "text", bits = bits, maxDist = maxDist).count())
    }
    Scratch.scoped {
      timed("replicated-1M bits=64")(
        Dedup.simhashPairs(big, "doc_id", "text", bits = 64, maxDist = maxDist).count())
    }
    Scratch.scoped {
      try {
        Dedup.simhashPairs(big, "doc_id", "text", bits = 16, maxDist = maxDist).count()
        println("GUARD bits=16 1M: NOT TRIPPED (unexpected)")
      } catch {
        case e: IllegalArgumentException =>
          println(s"GUARD bits=16 1M tripped as designed: ${e.getMessage.take(200)}")
      }
    }
    spark.stop()
  }
}
