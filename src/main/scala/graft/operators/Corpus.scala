package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Corpus-preparation operators for training-data pipelines, beyond the
  * reference's own surface: deterministic stratified sampling, per-group
  * token-budget packing (data mixing), and fixed-size token chunking with
  * overlap (context-window prep).
  *
  * All three are single-window or single-explode shapes: one hash-partition
  * shuffle on the group key (sampling/packing) or a narrow per-row Generate
  * (chunking). No driver-side state, no sort of the full corpus — the
  * windows order WITHIN groups only.
  */
object Corpus {

  /** Deterministic stratified sample: `n` rows per group, selected by a
    * pseudo-random-but-stable order (md5 of the id, tie-broken by id).
    * Reruns and engine changes pick the SAME sample — the property that
    * matters for reproducible training mixes; `rand()`-based sampling
    * can't give it. One shuffle on the group key; `WindowGroupLimit`
    * prunes per-partition before the final window. */
  def stratifiedSample(df: DataFrame, groupCol: String, idCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Per-group token-budget packing: walk each group in `orderCol` order,
    * keep rows while the RUNNING token total stays within `budget` — the
    * standard "mix K tokens of each source/language" primitive. The running
    * sum is a single window aggregate; rows are kept iff their inclusive
    * prefix sum fits (so a row that overflows the budget is dropped, as are
    * all rows after it in that group). */
  def tokenBudgetPack(df: DataFrame, groupCol: String, orderCol: String,
      textCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // a NULL text counts 0 tokens, explicitly: window sum SKIPS nulls, so
    // an uncoalesced count made the running total NULL (row dropped) when
    // the group's FIRST row had null text but free (row kept) anywhere
    // else — order-dependent treatment of the same garbage row
    df.withColumn("__ntok",
        coalesce(TextAnalysis.tokenCount(col(textCol)).cast("long"), lit(0L)))
      .withColumn("__cum", sum(col("__ntok")).over(w))
      .filter(col("__cum") <= budget)
      .drop("__ntok", "__cum")
  }

  /** Benchmark decontamination: drop corpus documents sharing ANY word
    * `shingleN`-gram with the evaluation set — the standard guard against
    * test-set leakage into training data. The eval shingle set is tiny
    * relative to the corpus (a benchmark, not a crawl), so it broadcasts:
    * the check is a map-side LeftSemi probe per corpus shingle followed by
    * one distinct on contaminated ids — the corpus never shuffles its
    * text, only narrow (id, shingle) rows of matching docs. */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 5): DataFrame = {
    def shingles(df: DataFrame) = df
      .withColumn("__tk", TextAnalysis.tokens(col(textCol)))
      .select(col(idCol), explode(TextAnalysis.shinglesFromTokens(col("__tk"), shingleN)).as("__s"))
    val evalShingles = shingles(evalSet).select("__s").distinct()
    val contaminated = shingles(corpus)
      .join(broadcast(evalShingles), Seq("__s"), "left_semi")
      .select(idCol).distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Deterministic hash-threshold mixture sampling: keep a ~`weight`
    * fraction of each group (language/source), selecting rows whose
    * `md5(id)` prefix falls below a per-group threshold. This is the
    * 100 TB shape for data mixing: a pure stateless filter — no shuffle,
    * no window, and crucially no per-group ranking (rank-based fractional
    * sampling funnels each group through ONE task; a whole language of a
    * web corpus in one partition is a scale-killer). The kept SET is
    * deterministic under any partitioning, engine, or rerun — the
    * reproducible-training-mix property — at the cost of the kept COUNT
    * being binomial around weight·n rather than exact (the standard
    * trade; exact counts need [[stratifiedSample]]'s ranked form).
    * Groups absent from `weights` are dropped (weight 0); weight ≥ 1
    * keeps the whole group.
    *
    * The hash is domain-separated from [[assignSplits]] (and salted by
    * `salt`): each operator hashes `"<domain>|<salt>|<id>"`, so composing
    * mix-then-split keeps the two decisions independent. Without that,
    * every row surviving weight w would satisfy hash < hex(w) and a
    * subsequent 0.8/0.1/0.1 split would assign ALL of them 'train'. */
  def mixtureSample(df: DataFrame, groupCol: String, idCol: String,
      weights: Map[String, Double], salt: String = ""): DataFrame = {
    // '|' is the domain-separator — a salt containing it could alias another
    // (salt, id) pair's hash input (e.g. ("a|b","c") vs ("a","b|c"))
    require(!salt.contains("|"), "salt must not contain '|'")
    // threshold = weight mapped onto the first 8 hex chars of md5:
    // fixed-width lowercase hex compares lexicographically as numerically
    val hashCol = substring(md5(concat(lit(s"mix|$salt|"), col(idCol).cast("string"))), 1, 8)
    val keep = weights.foldLeft(lit(false)) { case (acc, (g, w)) =>
      val cond =
        if (w >= 1.0) lit(true)
        else if (w <= 0.0) lit(false)
        else hashCol < lit(f"${(w * 4294967296.0).toLong}%08x")
      when(col(groupCol) === g, cond).otherwise(acc)
    }
    df.filter(keep)
  }

  /** Deterministic train/val/test split assignment: each row gets the first
    * label whose cumulative hash range contains its `md5(id)` prefix — the
    * standard leakage-safe split (a document's split never depends on the
    * rest of the corpus, survives reruns, engine changes, and corpus
    * growth). Same stateless no-shuffle shape as [[mixtureSample]]; the
    * last label absorbs rounding, so weights should sum to ~1. The hash is
    * domain-separated from [[mixtureSample]] (prefix `"split|<salt>|"`) so
    * the standard mix-then-split composition keeps the sample decision and
    * the split label statistically independent. */
  def assignSplits(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], splitCol: String = "split",
      salt: String = ""): DataFrame = {
    require(splits.nonEmpty, "assignSplits needs at least one label")
    require(!salt.contains("|"), "salt must not contain '|'")
    val hashCol = substring(md5(concat(lit(s"split|$salt|"), col(idCol).cast("string"))), 1, 8)
    val cums = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val label = splits.zip(cums).init.foldRight(lit(splits.last._1): Column) {
      case (((name, _), cum), acc) =>
        // a cumulative weight >= 1 catches everything (an 8-hex-digit hash
        // cannot compare below a 9-digit literal lexicographically)
        if (cum >= 1.0) when(lit(true), name).otherwise(acc)
        else when(hashCol < lit(f"${(math.max(cum, 0.0) * 4294967296.0).toLong}%08x"), name)
          .otherwise(acc)
    }
    df.withColumn(splitCol, label)
  }

  /** Corpus vocabulary: the `k` most frequent tokens with a deterministic
    * tie-break — the counting primitive behind tokenizer/BPE training and
    * stop-word derivation. One explode + one hash-partitioned aggregate
    * with map-side partial counts; the top-k is a TakeOrderedAndProject
    * (per-partition heaps, no global sort of the vocabulary). */
  def topTokens(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).cast("long").as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)

  /** Split each document into fixed-size token chunks with overlap:
    * chunk i covers tokens [i·stride, i·stride + chunkTokens) where
    * stride = chunkTokens − overlap. Documents shorter than one chunk
    * yield exactly one chunk (possibly empty). Pure per-row explode —
    * embarrassingly parallel, no shuffle.
    *
    * Output: input columns + (chunk_id, chunk_text, chunk_tokens). */
  def chunkDocs(df: DataFrame, textCol: String,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(overlap < chunkTokens, "overlap must be < chunkTokens")
    val stride = chunkTokens - overlap
    // stage the token array in its own projection: referencing tokens()
    // inside the transform lambda would re-tokenize per chunk
    val toks = df.withColumn("__tk", TextAnalysis.tokens(col(textCol)))
    val nChunks = greatest(lit(1),
      ceil((size(col("__tk")) - lit(overlap)).cast("double") / stride).cast("int"))
    toks
      .withColumn("chunk_id", explode(sequence(lit(0), nChunks - 1)))
      .withColumn("__chunk", slice(col("__tk"), col("chunk_id") * stride + 1, lit(chunkTokens)))
      .withColumn("chunk_text", array_join(col("__chunk"), " "))
      .withColumn("chunk_tokens", size(col("__chunk")).cast("long"))
      .drop("__tk", "__chunk")
  }
}
