package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup (builder-prompt
  * first-class extensions; SURVEY.md §7.1 #10).
  *
  * Scale notes (the whole point of these shapes):
  *  - exact dedup: one hash-partitioned shuffle on the fingerprint.
  *  - MinHash+LSH: signatures/bands are map-side expressions; the only
  *    shuffle is the explode+self-join on band keys, whose fan-out is
  *    controlled by (numHashes, bands). Never an O(n²) cross join.
  *  - n-gram Jaccard is evaluated ONLY on candidate pairs that already share
  *    a shingle (inverted-index join), not all pairs.
  *  - embedding near-dup goes through sign-LSH buckets first.
  */
object Dedup {

  /** Exact dedup on normalized-text fingerprint, keep min(id) — deterministic
    * first-wins (D1's order-stable analogue). */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol).asc)
    docs.withColumn("__fp", fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  /** Candidate near-dup pairs via MinHash + LSH banding.
    * Returns (id_a, id_b) with id_a < id_b, distinct.
    */
  def minhashLshCandidates(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 12, bands: Int = 4): DataFrame = {
    val withBands = docs
      .select(col(idCol).as("id"),
        lshBandKeys(minhashSignature(wordShingles(col(textCol), shingleN), numHashes), bands).as("bandkeys"))
      .select(col("id"), explode(col("bandkeys")).as("bandkey"))
    val a = withBands.select(col("bandkey"), col("id").as("id_a"))
    val b = withBands.select(col("bandkey"), col("id").as("id_b"))
    a.join(b, Seq("bandkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Verified near-dup pairs: LSH candidates filtered by true shingle-set
    * Jaccard ≥ threshold. */
  def minhashDedupPairs(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3, numHashes: Int = 12, bands: Int = 4): DataFrame = {
    val cands = minhashLshCandidates(docs, idCol, textCol, shingleN, numHashes, bands)
    val sh = docs.select(col(idCol).as("id"), wordShingles(col(textCol), shingleN).as("sh"))
    cands
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** All-pairs n-gram Jaccard ≥ threshold via inverted-index self-join
    * (pairs must share ≥1 shingle; grouped count gives |A∩B| in one
    * shuffle — no cross join). */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), wordShingles(col(textCol), shingleN).as("sh"))
      .withColumn("n", size(col("sh")))
    val inv = sh.select(col("id"), col("n"), explode(col("sh")).as("s"))
    val pairs = inv.as("x").join(inv.as("y"), col("x.s") === col("y.s") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.n").as("n_a"), col("y.n").as("n_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash near-dup candidates: same fingerprint (or join on rotated bands
    * for hamming>0 tolerance — here exact-bucket, hamming ≤ maxDist verify). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      bits: Int = 16, maxDist: Int = 2): DataFrame = {
    val fp = docs.select(col(idCol).as("id"), simhash(tokens(col(textCol)), bits).as("fp"))
    // band on upper/lower half: pairs within hamming maxDist share ≥1 half when maxDist < bits/2 buckets apart
    val banded = fp
      .withColumn("b0", concat(lit("lo:"), (col("fp").bitwiseAND(lit((1L << (bits / 2)) - 1))).cast("string")))
      .withColumn("b1", concat(lit("hi:"), shiftright(col("fp"), bits / 2).cast("string")))
      .select(col("id"), col("fp"), explode(array(col("b0"), col("b1"))).as("band"))
    banded.as("x").join(banded.as("y"), col("x.band") === col("y.band") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        hammingDistance(col("x.fp"), col("y.fp")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Embedding-cosine near-dup pairs: sign-LSH bucket (first `planes` dims'
    * signs) then exact cosine within bucket. */
  def embeddingNearDupPairs(
      emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 8): DataFrame = {
    val bucketed = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      Similarity.signBucket(col(vecCol), planes).as("bucket"))
    // threshold compares the 6-dp-rounded cosine so the boundary decision is
    // identical across engines regardless of FP summation order
    bucketed.as("x").join(bucketed.as("y"), col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .withColumn("cosine", round(Similarity.cosine(col("x.v"), col("y.v")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"), col("cosine"))
  }
}
