package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.Dedup

/** Corpus curation — the training-data pipeline composed end-to-end over a
  * documents table: language/quality gates (pure expressions), exact
  * dedup, MinHash near-dup removal, and a per-reason drop ledger.
  *
  * Near-dup resolution keeps the SMALLEST doc id of each verified pair and
  * drops the other side (single-link-lite: one pass over pairs, no
  * connected-components iteration — at 100 TB a full CC would be an
  * iterative join; one pass removes ≥ half of every duplicate cluster per
  * run and converges over recurring runs, which is the standard
  * curation-cadence trade-off).
  *
  * Every stage is one declarative plan over the previous stage's output;
  * `curate` returns the kept corpus plus a (reason, n) ledger derived
  * set-theoretically (counts of stage inputs/outputs — deterministic under
  * retries and partitioning).
  */
object Curation {

  case class CurationResult(kept: DataFrame, ledger: DataFrame)

  def curate(
      docs: DataFrame, idCol: String, textCol: String,
      allowedLangs: Seq[String] = Seq("en", "de", "es", "fr", "vi"),
      minQuality: Double = 0.5,
      nearDupThreshold: Double = 0.7,
      shingleN: Int = 3): CurationResult = {
    val spark = docs.sparkSession
    import spark.implicits._

    val total = docs.count()

    // stage 1: language + quality gates (one scan, both expressions).
    // localCheckpoint BEFORE the filter, for two reasons: (a) `gated` is
    // read by the exact-dedup stage, the MinHash pass AND the ledger
    // counts — without a checkpoint each action re-runs the gate
    // expressions over the full corpus; (b) the checkpoint pins the gate
    // expressions inside a PROJECTION, where codegen subexpression
    // elimination applies — otherwise the optimizer substitutes them into
    // the Filter condition (predicate pushdown through project), which
    // evaluates the raw duplicated tree per row (measured ~6× slower).
    // withColumn (not select) — callers keep their payload columns.
    val scored = docs
      .withColumn("__lang", TextAnalysis.langPredict(TextAnalysis.tokens(col(textCol))))
      .withColumn("__q", TextAnalysis.qualityScore(col(textCol)))
      .localCheckpoint()
    val gated = scored
      .filter(col("__lang").isin(allowedLangs: _*) && col("__q") >= minQuality)
      .drop("__lang", "__q")
    val nGated = gated.count()

    // stage 2: exact dedup (normalized-text fingerprint, min-id wins);
    // checkpointed for the same reason — near-dup pairing and the kept
    // anti-join both re-read it
    val exact = Dedup.exactDedup(gated, idCol, textCol).localCheckpoint()
    val nExact = exact.count()

    // stage 3: near-dup removal — drop the larger id of each verified pair.
    // `losers` is checkpointed (it's tiny — one id per dropped doc) so the
    // ledger's count AND the caller's materialization of `kept` don't each
    // re-run the whole MinHash+verify pass.
    val pairs = Dedup.minhashDedupPairs(exact, idCol, textCol, nearDupThreshold,
      shingleN = shingleN)
    val losers = pairs.select(col("id_b").as(idCol)).distinct().localCheckpoint()
    val kept = exact.join(losers, Seq(idCol), "left_anti")
    val nKept = kept.count()

    val ledger = Seq(
      ("input", total),
      ("dropped_lang_or_quality", total - nGated),
      ("dropped_exact_dup", nGated - nExact),
      ("dropped_near_dup", nExact - nKept),
      ("kept", nKept)
    ).toDF("reason", "n")
    CurationResult(kept, ledger)
  }
}
