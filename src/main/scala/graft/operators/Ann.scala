package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour — the scale path for
  * similarity search beyond [[Similarity.lshTopK]]'s sign buckets.
  *
  * Build: KMeans (seeded, deterministic per partitioning) learns `nlist`
  * centroids on the corpus; every corpus vector is assigned to its nearest
  * centroid's list. At 100 TB the assigned corpus is written partitioned by
  * `list` so a probe reads only `nprobe`/`nlist` of the data.
  *
  * Query: each query ranks centroids by distance, probes its top `nprobe`
  * lists (an equi-join on list id — hash-partition-local), scores exact
  * cosine inside them, and takes the top k. Recall is tunable via `nprobe`
  * (spec asserts ≥ 0.7 @ nprobe=4/nlist=16 on the synthetic embeddings vs
  * the brute-force oracle).
  */
object Ann {

  /** Corpus side of the index: input + `list` (centroid id) column, plus
    * the fitted centroid vectors as a plain Array for the query side. */
  case class IvfIndex(assigned: DataFrame, centroids: Array[Array[Double]])

  def buildIvf(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, seed: Long = 42L): IvfIndex = {
    val feat = corpus.select(col(idCol), col(vecCol),
      array_to_vector(col(vecCol)).as("__features"))
    // 10 iterations is plenty for routing-quality centroids (IVF recall is
    // governed by nprobe, not centroid convergence)
    val model = new KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("__features").setPredictionCol("list")
      .fit(feat)
    val assigned = model.transform(feat).drop("__features")
    IvfIndex(assigned, model.clusterCenters.map(_.toArray))
  }

  /** Build-once cache keyed by corpus identity (the sf dir in this repo's
    * drivers). In production the IVF index is built offline and amortized
    * over many probe batches — a benchmark of the probe path must not
    * re-pay the KMeans build per query, so the first call materializes the
    * assigned corpus (localCheckpoint) and later calls reuse it. */
  private val ivfCache = scala.collection.concurrent.TrieMap[String, IvfIndex]()
  def buildIvfCached(key: String, corpus: => DataFrame, idCol: String, vecCol: String,
      nlist: Int, seed: Long = 42L): IvfIndex =
    ivfCache.getOrElseUpdate(key, {
      val idx = buildIvf(corpus, idCol, vecCol, nlist, seed)
      val mat = idx.assigned.localCheckpoint()
      mat.count()
      IvfIndex(mat, idx.centroids)
    })

  /** Build-once cache serving the PERSISTED layout: first call builds the
    * index, writes it via [[writeIvf]] to a fixed scratch dir keyed by the
    * corpus identity, and re-reads it via [[readIvf]]; later calls reuse the
    * loaded index. Probes served from THIS cache run against the
    * `list`-partitioned parquet layout — the documented 100 TB path — so a
    * benchmarked probe includes the partition-pruned scan
    * (`PartitionFilters` on `list`), not a localCheckpoint shortcut. */
  private val ivfDiskCache = scala.collection.concurrent.TrieMap[String, IvfIndex]()
  def persistedIvfCached(key: String, corpus: => DataFrame, idCol: String, vecCol: String,
      nlist: Int, seed: Long = 42L): IvfIndex =
    ivfDiskCache.getOrElseUpdate(key, {
      val df = corpus
      val path = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"),
        "graft_ivf_" + key.replaceAll("[^a-zA-Z0-9._-]", "_")).toString
      writeIvf(buildIvf(df, idCol, vecCol, nlist, seed), path)
      readIvf(df.sparkSession, path)
    })

  /** Persist an index: the assigned corpus written PARTITIONED BY `list`
    * plus the centroid vectors as a tiny companion table. This is the
    * documented 100 TB layout — a probe's list filter lands on the `list`
    * PARTITION column, so directory pruning skips everything outside the
    * query batch's nprobe lists (`PartitionFilters` in the scan, asserted
    * by AnnSpec), instead of scanning the full corpus. */
  def writeIvf(index: IvfIndex, path: String): Unit = {
    index.assigned.write.mode("overwrite").partitionBy("list")
      .parquet(s"$path/assigned")
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Load a persisted index. The corpus side is a lazy partitioned scan —
    * pruning happens per probe inside [[ivfTopK]]. */
  def readIvf(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .orderBy("list").collect()
      .map(_.getSeq[Double](1).toArray)
    IvfIndex(spark.read.parquet(s"$path/assigned"), centroids)
  }

  /** Per-centroid (squared-L2-distance, list-id) structs against `vec` —
    * the small flat expression tree (nlist × dim nodes) shared by the
    * probe side and the incremental-append assignment. */
  private def centroidDistStructs(centroids: Array[Array[Double]],
      vec: org.apache.spark.sql.Column): Array[org.apache.spark.sql.Column] =
    centroids.zipWithIndex.map { case (c, i) =>
      val d = c.indices.map { j =>
        val diff = element_at(vec, j + 1).cast("double") - lit(c(j))
        diff * diff
      }.reduce(_ + _)
      struct(d.as("dist"), lit(i).as("list"))
    }

  /** Incrementally add a batch to a [[writeIvf]] layout WITHOUT a rebuild:
    * each new vector is assigned to its nearest EXISTING centroid (same
    * expression tree the probe side ranks with) and the assigned rows are
    * appended into the `list`-partitioned directory tree. This is the
    * 100 TB ingest path — per-batch cost ∝ batch × nlist, the corpus is
    * never re-read, and probes see the new vectors immediately through the
    * same partition-pruned scan. Centroid drift under sustained ingest is
    * handled by periodic offline rebuilds (standard IVF practice); recall
    * degrades gracefully, never correctness (assignment stays
    * nearest-centroid by construction). Parquet part-file names carry task
    * UUIDs, so appends never collide with existing generation files. */
  def appendToIvf(batch: DataFrame, path: String, idCol: String, vecCol: String): Unit = {
    val spark = batch.sparkSession
    val centroids = spark.read.parquet(s"$path/centroids")
      .orderBy("list").collect().map(_.getSeq[Double](1).toArray)
    val dist = centroidDistStructs(centroids, col(vecCol))
    batch
      .select(col(idCol), col(vecCol),
        element_at(array_sort(array(dist.toIndexedSeq: _*)), 1).getField("list").as("list"))
      .write.mode("append").partitionBy("list").parquet(s"$path/assigned")
  }

  /** Probe the index: exact cosine inside the query's `nprobe` nearest
    * lists, top-k per query (ties broken by neighbour id).
    *
    * The query batch's distinct probe lists (≤ nlist small integers) are
    * collected and applied to the corpus side as a LITERAL `isin` filter
    * before the join: against a [[writeIvf]] layout that is static
    * partition pruning (only nprobe/nlist of the corpus directories are
    * even listed), and it costs one driver-side collect of at most nlist
    * ints — the deliberate exception to the no-collect rule. */
  def ivfTopK(queries: DataFrame, index: IvfIndex, idCol: String, vecCol: String,
      k: Int, nprobe: Int): DataFrame = {
    // rank centroids per query by squared L2 distance
    val distCols = centroidDistStructs(index.centroids, col("qv"))
    // localCheckpoint: the centroid-ranking tree is nlist × dim expression
    // nodes — planning/codegen it is the expensive part at small batch
    // sizes, and BOTH the probe-list collect and the join side would
    // otherwise re-plan it. The checkpointed relation is batch-sized
    // (queries × nprobe rows), never corpus-sized.
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        Similarity.norm(col(vecCol)).as("qn"))
      .withColumn("probe", explode(slice(array_sort(array(distCols: _*)), 1, nprobe)))
      .select(col("query_id"), col("qv"), col("qn"), col("probe.list").as("list"))
      .localCheckpoint()
    val probeLists = probes.select("list").distinct()
      .collect().map(_.getInt(0)).toSeq
    val corpus = index.assigned
      .filter(col("list").isin(probeLists: _*))
      .select(col(idCol).as("neighbor_id"), col("list"),
        col(vecCol).as("cv"), Similarity.norm(col(vecCol)).as("cn"))
    val scored = probes.join(corpus, Seq("list"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(
        Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }
}
