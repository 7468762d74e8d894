package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
import graft.operators.Scratch.Ops

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
  *
  * Persisted layout is GENERATIONAL: each rebuild writes a fresh
  * `gen_NNNNNN/` dir (assigned + centroids) and commits it with a
  * `_COMMITTED` marker created last; readers resolve the latest COMMITTED
  * generation, so an offline rebuild never races a concurrent probe with a
  * half-written layout (the same swap discipline as `Store`'s keyed
  * tables). [[appendToIvf]] and [[compactIvf]] operate inside the latest
  * committed generation; [[vacuumIvf]] drops superseded ones.
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

  /** [[buildIvf]] with the KMeans fit run on a deterministic
    * hash-threshold SAMPLE of the corpus while the FULL corpus is still
    * assigned to the fitted centroids — the corpus-scale build shape.
    * [[buildIvf]]'s fit iterates over the whole corpus (maxIter × full
    * passes); production IVF practice fits centroids on a bounded sample,
    * because routing quality converges long before the sample does —
    * recall is governed by `nprobe`, not centroid optimality, and a
    * uniform sample preserves the density the centroids follow. The
    * sample is [[Corpus.mixtureSample]]'s stateless md5-threshold filter
    * (salted by the seed, no shuffle, no rand()): the fit set is
    * DETERMINISTIC under any partitioning or rerun, so rebuilds
    * reproduce. `fitFraction` must leave at least `nlist` DISTINCT
    * vectors (KMeans needs k distinct points — enforced below, with a
    * full-corpus fallback); size it to O(100·nlist) rows — centroid quality
    * plateaus there while the fit cost drops from O(corpus) to O(sample)
    * per iteration. Assignment routes through [[assignToCentroids]], so a
    * corpus-scale `nlist` takes the O(1)-plan expression path
    * automatically. */
  def buildIvfSampled(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, fitFraction: Double, seed: Long = 42L): IvfIndex = {
    require(fitFraction > 0.0 && fitFraction <= 1.0,
      s"fitFraction must be in (0, 1], got $fitFraction")
    val sampled = Corpus.mixtureSample(
      corpus.withColumn("__g", lit("all")), "__g", idCol,
      Map("all" -> fitFraction), salt = s"ivf-fit-$seed")
      .scratchCheckpoint() // the fit iterates maxIter times over this set
    // the documented "must leave at least nlist rows" requirement, ENFORCED
    // on DISTINCT vectors, not raw rows: a duplicate-heavy sample could
    // clear a row-count guard with >= nlist rows yet still reach KMeans.fit
    // with fewer distinct points than k and fail opaquely (or fit
    // degenerate duplicate centroids) — fall back to the full-corpus fit,
    // which buildIvf is already tested to survive at corpus < nlist. The
    // distinct is one shuffle over the already-checkpointed O(100·nlist)
    // sample, noise next to the fit's maxIter passes over the same set
    val fitSet =
      if (sampled.select(vecCol).distinct().count() >= nlist) sampled
      else { Bridge.unpersistCheckpoint(sampled); corpus }
    val feat = fitSet.select(array_to_vector(col(vecCol)).as("__features"))
    val model = new KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("__features").setPredictionCol("list")
      .fit(feat)
    // the fit is done with the sample — drop its checkpoint blocks NOW
    // (at O(100·nlist) sample rows they would otherwise squeeze storage
    // memory under the full-corpus assignment until a GC notices)
    Bridge.unpersistCheckpoint(sampled)
    buildIvfFixed(corpus, idCol, vecCol, model.clusterCenters.map(_.toArray))
  }

  /** Build an index from INJECTED centroids — no KMeans. This is (a) the
    * rebuild-from-known-centroids path and (b) what makes the IVF math
    * oracle-gateable: with fixed centroids, assignment and probe are pure
    * deterministic arithmetic a SQL engine can reproduce (q74), leaving
    * only the KMeans fit itself spec-gated. */
  def buildIvfFixed(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): IvfIndex =
    IvfIndex(assignToCentroids(corpus, idCol, vecCol, centroids), centroids)

  /** Assign each row to its nearest centroid by squared L2 distance (ties →
    * lower list id) — the same centroid ranking the probe side uses
    * ([[rankCentroids]], native formulation), shared by [[buildIvfFixed]]
    * and [[appendToIvf]]. */
  def assignToCentroids(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame =
    df.select(col(idCol), col(vecCol),
      element_at(centroidRank(df, col(vecCol), centroids, 1), 1)
        .getField("list").as("list"))

  /** The `k` nearest (dist, list) structs per row, ascending (dist, list).
    * `literal = true` is the original nlist × dim expression-tree
    * formulation (per-centroid `(element_at(v,j) − c_j)²` chains,
    * array_sorted); `literal = false` is
    * [[graft.expressions.VectorExpressions.nearestCentroids]] — the same
    * arithmetic and tie order as ONE codegen'd node whose centroid matrix
    * is a reference object. The native form is the production path at
    * EVERY nlist: the tree's cost is in planning/codegen, not arithmetic —
    * IvfPathProbe (100k × dim-64) measures 26.7 s at nlist=64 against
    * 0.13 s native with an optimizer OOM at nlist=256 (the scale cliff),
    * and even at the oracle-gated sizes (nlist 8–16) the tree's planning
    * tax is measurable: q86 8.4 → 4.8 s, q45 1.2 → 0.5 s, q90 7.3 → 4.5 s
    * warm when routed native (QueryProbe, sf0.1). The literal formulation
    * survives as the INDEPENDENT REFERENCE IMPLEMENTATION AnnSpec pins the
    * native path against — equality including exact distance ties — on top
    * of the DuckDB oracle gating the same math end-to-end (q74/q86/q90).
    * docs/SCALE.md r10 has the full measurements, including the
    * broadcast-join alternative both formulations beat. */
  private[graft] def rankCentroids(vec: org.apache.spark.sql.Column,
      centroids: Array[Array[Double]], k: Int, literal: Boolean): org.apache.spark.sql.Column =
    if (literal)
      slice(array_sort(array(centroidDistStructs(centroids, vec).toIndexedSeq: _*)), 1, k)
    else graft.expressions.VectorExpressions.nearestCentroids(vec, centroids, k)

  /** Centroid-matrix size (cells = nlist × dim) past which the ranking
    * expression carries the matrix behind a `Broadcast` handle instead of
    * a codegen reference object. A reference object re-serializes inside
    * EVERY stage's task binary and re-deserializes per task; the broadcast
    * crosses the wire once per executor and is reused across stages and
    * queries — the win appears once the matrix is tens of MB
    * (IvfPathProbe's dim-768 leg). 2²⁰ cells ≈ 8 MB of doubles: below it
    * the handle's indirection buys nothing, above it the per-stage
    * serialization tax grows linearly while the broadcast's is one-time. */
  private[graft] val BcastCentroidCells: Long = 1L << 20

  /** Broadcast-per-matrix cache, keyed by the matrix's IDENTITY (arrays
    * compare by reference): a long-lived index ([[readIvf]] result,
    * [[persistedIvfCached]]) ranks with the SAME broadcast across all its
    * probe batches instead of re-broadcasting per call. BOUNDED, not
    * weak: a weak-keyed map cannot evict here — the broadcast VALUE pins
    * its own key (the matrix also lives in the driver block manager), so
    * under sustained generation turnover (each [[readIvf]] builds a fresh
    * matrix) entries would accumulate forever. Instead an access-order
    * LRU keeps the last [[CentroidBcastCacheSize]] matrices and
    * `unpersist(blocking=false)`s evicted broadcasts — executors drop
    * their copies, an in-flight stage can still refetch from the driver,
    * and the dropped Broadcast object is reclaimed by ContextCleaner once
    * unreferenced. Concurrent probes of up to that many distinct indexes
    * stay cached; the pathological many-index driver degrades to
    * re-broadcasting, never to a leak. */
  private[graft] val CentroidBcastCacheSize = 4
  private final case class CachedBcast(
      sc: org.apache.spark.SparkContext,
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]])
  private val centroidBcasts =
    new java.util.LinkedHashMap[Array[Array[Double]], CachedBcast](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Array[Array[Double]], CachedBcast]): Boolean = {
        val evict = size() > CentroidBcastCacheSize
        if (evict && !e.getValue.sc.isStopped) e.getValue.bc.unpersist(false)
        evict
      }
    }
  private[graft] def centroidBcast(spark: SparkSession, cents: Array[Array[Double]])
      : org.apache.spark.broadcast.Broadcast[Array[Array[Double]]] =
    centroidBcasts.synchronized {
      val sc = spark.sparkContext
      val ex = centroidBcasts.get(cents)
      // a hit from a STOPPED context (session restart in the same JVM,
      // matrix retained by the caller) must re-broadcast, not hand back a
      // dead handle that fails at evaluation
      if (ex != null && (ex.sc eq sc)) ex.bc
      else {
        val b = sc.broadcast(cents)
        centroidBcasts.put(cents, CachedBcast(sc, b))
        b
      }
    }

  private def centroidRank(df: DataFrame, vec: org.apache.spark.sql.Column,
      centroids: Array[Array[Double]], k: Int): org.apache.spark.sql.Column = {
    val cells = centroids.length.toLong *
      (if (centroids.isEmpty) 0L else centroids(0).length.toLong)
    if (cells >= BcastCentroidCells)
      graft.expressions.VectorExpressions.nearestCentroidsBcast(
        vec, centroidBcast(df.sparkSession, centroids), k)
    else rankCentroids(vec, centroids, k, literal = false)
  }

  /** Build-once cache keyed by corpus identity (the sf dir in this repo's
    * drivers). In production the IVF index is built offline and amortized
    * over many probe batches — a benchmark of the probe path must not
    * re-pay the KMeans build per query, so the first call materializes the
    * assigned corpus (localCheckpoint) and later calls reuse it.
    *
    * NOT bench-safe: the cached index holds localCheckpointed blocks, and
    * Bench's deterministic per-query unpersist would destroy their only
    * copy (later references fail with lost-checkpoint errors, they do not
    * recompute). Bench-reachable queries must use [[persistedIvfCached]];
    * Bench asserts this cache stays empty ([[memIvfCacheEmpty]]). */
  private val ivfCache = scala.collection.concurrent.TrieMap[String, IvfIndex]()
  def buildIvfCached(key: String, corpus: => DataFrame, idCol: String, vecCol: String,
      nlist: Int, seed: Long = 42L): IvfIndex =
    ivfCache.getOrElseUpdate(key, {
      val idx = buildIvf(corpus, idCol, vecCol, nlist, seed)
      val mat = idx.assigned.localCheckpoint()
      mat.count()
      IvfIndex(mat, idx.centroids)
    })

  /** True iff no localCheckpoint-backed index is cached — the invariant
    * Bench enforces after its per-query unpersist (see [[buildIvfCached]]). */
  private[graft] def memIvfCacheEmpty: Boolean = ivfCache.isEmpty

  /** Build-once cache serving the PERSISTED layout: first call builds the
    * index, writes it via [[writeIvf]] to a fixed scratch dir keyed by the
    * corpus identity AND the JVM pid (two concurrent graft JVMs — a Bench
    * beside a Verify spot-check — must not overwrite each other's live
    * layout), and re-reads it via [[readIvf]]; later calls reuse the loaded
    * index. Probes served from THIS cache run against the
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
        "graft_ivf_" + key.replaceAll("[^a-zA-Z0-9._-]", "_") +
          "_" + ProcessHandle.current().pid()).toString
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
      graft.ScratchJanitor.register(new java.io.File(path))
      writeIvf(buildIvf(df, idCol, vecCol, nlist, seed), path)
      readIvf(df.sparkSession, path)
    })

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The type with every nullability flag forced true — for comparisons
    * that must ignore nullability (Spark's `sameType` is private). */
  private def asNullable(dt: DataType): DataType = dt match {
    case ArrayType(e, _) => ArrayType(asNullable(e), containsNull = true)
    case MapType(k, v, _) => MapType(asNullable(k), asNullable(v), valueContainsNull = true)
    case StructType(fs) => StructType(fs.map(f =>
      f.copy(dataType = asNullable(f.dataType), nullable = true)))
    case other => other
  }

  /** The latest COMMITTED generation dir — what probes, appends, and
    * compaction resolve. Uncommitted dirs (a rebuild in flight, or a
    * crashed one) are invisible. */
  def latestIvfGen(spark: SparkSession, path: String): Option[Path] =
    graft.store.Generations.latestCommitted(spark, path)

  /** Persist an index: the assigned corpus written PARTITIONED BY `list`
    * plus the centroid vectors as a tiny companion table, under a fresh
    * `gen_NNNNNN/` committed by a `_COMMITTED` marker created LAST. A
    * rebuild therefore never disturbs concurrent probes of the previous
    * generation — they keep resolving it until the marker lands. The
    * generation number is CLAIMED with an exclusive create before any data
    * is written ([[graft.store.Generations.claimNextGen]]), so two racing
    * rebuilds land in different directories instead of interleaving.
    * Returns the committed generation path. A probe's list filter lands on
    * the `list` PARTITION column, so directory pruning skips everything
    * outside the query batch's nprobe lists (`PartitionFilters` in the
    * scan, asserted by AnnSpec). */
  def writeIvf(index: IvfIndex, path: String, idsFrom: Option[DataFrame] = None): String = {
    val spark = index.assigned.sparkSession
    val gen = graft.store.Generations.claimNextGen(spark, path)
    // the three relations land in DISJOINT dirs of an UNCOMMITTED
    // generation (readers resolve nothing until the _COMMITTED marker
    // lands below), so they write concurrently (guide §2.6); the id
    // manifest — derived by re-reading the written tree (a pruned
    // id-column scan), not by recomputing the assignment, unless a caller
    // whose id set is unchanged (compaction) passed it via `idsFrom` —
    // stays sequential behind the assigned write within its thread
    val idCol = index.assigned.columns.head
    import spark.implicits._
    val writeAssigned = () =>
      index.assigned.write.mode("overwrite").partitionBy("list")
        .parquet(new Path(gen, "assigned").toString)
    val writeIds = (ids: DataFrame) => ids.select("id")
      .write.mode("overwrite").parquet(new Path(gen, "ids").toString)
    val writeCentroids = () => index.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(new Path(gen, "centroids").toString)
    idsFrom match {
      case Some(df) =>
        graft.Par.run(writeAssigned, () => writeIds(df), writeCentroids)
      case None =>
        graft.Par.run(
          () => {
            writeAssigned()
            writeIds(spark.read.parquet(new Path(gen, "assigned").toString)
              .select(col(idCol).as("id")).distinct())
          },
          writeCentroids)
    }
    graft.store.Generations.commit(spark, gen)
    gen.toString
  }

  /** The id manifest of the latest committed generation: one narrow `id`
    * row per indexed vector — what the streaming replay guard anti-joins
    * against, instead of `distinct`-scanning the whole assigned tree per
    * micro-batch. Falls back to that scan for legacy layouts without a
    * manifest. Tombstoned ids ([[deleteFromIvf]]) are excluded — the
    * manifest view agrees with the probe view. */
  def ivfIds(spark: SparkSession, path: String): DataFrame = {
    val gen = requireGen(spark, path)
    val ids = new Path(gen, "ids")
    val base =
      if (fsOf(spark, ids).exists(ids)) spark.read.parquet(ids.toString)
      else {
        val assigned = spark.read.parquet(new Path(gen, "assigned").toString)
        assigned.select(col(assigned.columns.head).as("id")).distinct()
      }
    ivfTombstonesOf(spark, gen) match {
      case None => base
      case Some(ts) => base.join(broadcast(ts), Seq("id"), "left_anti")
    }
  }

  /** DELETION TIER for a persisted IVF layout — [[graft.operators.Dedup
    * .deleteFromMinhashIndex]]'s twin, same contract: the ids land in a
    * tombstone relation inside the live generation, [[readIvf]] and
    * [[ivfIds]] anti-join them out immediately (O(tombstones) per probe,
    * broadcast — the relation is at most manifest-sized), and the next
    * [[compactIvfOnline]] (or an offline rebuild) drops the rows
    * PHYSICALLY and clears the tombstones, since both read the corpus
    * through the filtered [[readIvf]]. The partition-local [[compactIvf]]
    * pass rewrites raw files and deliberately does NOT resolve
    * tombstones — physical removal rides the reader-atomic generation
    * swap, where result-invisibility is already the discipline. Same
    * enforced re-ingest contract: [[appendToIvf]] semi-joins the batch's
    * ids against live tombstones and on a hit runs [[compactIvfOnline]]
    * inline (purging the old vectors, clearing the tombstones) before
    * appending — delete-then-re-add works, and the old rows can never
    * resurface beside the new ones as duplicate neighbors. Idempotent.
    * The tombstone relation is file-bounded the same way as the MinHash
    * twin's ([[Dedup.TombstoneCompactFiles]]): a call that pushes it to
    * the bound runs [[compactIvfOnline]] immediately — the reader-atomic
    * swap the live tombstones had already scheduled — never an in-place
    * rewrite. Returns the count of distinct ids tombstoned in this
    * call. */
  def deleteFromIvf(spark: SparkSession, path: String, ids: DataFrame): Long = {
    val gen = requireGen(spark, path)
    graft.store.Tombstones.delete(spark, gen.toString, ids)(
      () => compactIvfOnline(spark, path)) // forced purge + clear, new generation
  }

  private def ivfTombstonesOf(spark: SparkSession, gen: Path): Option[DataFrame] =
    graft.store.Tombstones.of(spark, gen.toString)

  /** Per-generation centroid memo: a committed generation's `centroids`
    * relation is immutable (appends only touch `assigned`/`ids`; rewrites
    * commit a NEW generation), yet every [[readIvf]] and [[appendToIvf]]
    * paid a parquet read + collect JOB for the same few-KB matrix. Keyed by
    * (gen path, `_COMMITTED` mtime) — the same validator discipline as
    * Dedup's marker memo: a scratch tree wiped and rebuilt at the same path
    * commits with a new mtime, so a stale hit is impossible. Bounded LRU. */
  private val centroidsMemo = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, Long), Array[Array[Double]]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long), Array[Array[Double]]]): Boolean =
        size() > 256
    })

  private def ivfCentroids(spark: SparkSession, gen: Path): Array[Array[Double]] = {
    val commit = new Path(gen, "_COMMITTED")
    val key = scala.util.Try(
      (gen.toString, fsOf(spark, gen).getFileStatus(commit).getModificationTime)).toOption
    key.flatMap(k => Option(centroidsMemo.get(k))).getOrElse {
      val cents = spark.read.parquet(new Path(gen, "centroids").toString)
        .select("list", "centroid").orderBy("list").collect()
        .map(_.getSeq[Double](1).toArray)
      key.foreach(k => centroidsMemo.put(k, cents))
      cents
    }
  }

  private def requireGen(spark: SparkSession, path: String): Path =
    graft.store.Generations.requireCommitted(spark, path)

  /** Load the latest committed generation. The corpus side is a lazy
    * partitioned scan — pruning happens per probe inside [[ivfTopK]].
    * Tombstoned vectors ([[deleteFromIvf]]) are anti-joined out, so they
    * can never surface as neighbors; the `list` partition filter pushes
    * through the anti-join's left side, keeping the probe's directory
    * pruning intact (AnnSpec asserts both on a tombstoned layout). */
  def readIvf(spark: SparkSession, path: String): IvfIndex = {
    val gen = requireGen(spark, path)
    val centroids = ivfCentroids(spark, gen)
    val assigned = spark.read.parquet(new Path(gen, "assigned").toString)
    val live = graft.store.Tombstones.minus(assigned,
      ivfTombstonesOf(spark, gen), assigned.columns.head)
    IvfIndex(live, centroids)
  }

  /** Drop all but the newest `keep` committed generations (plus any
    * uncommitted strays older than the newest committed one — debris from
    * crashed rebuilds). `keep ≥ 2` protects a reader that resolved the
    * previous generation just before a rebuild committed. */
  def vacuumIvf(spark: SparkSession, path: String, keep: Int = 2): Int =
    graft.store.Generations.vacuum(spark, path, keep)

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
    * appended into the latest committed generation's `list`-partitioned
    * directory tree. This is the 100 TB ingest path — per-batch cost ∝
    * batch × nlist, the corpus is never re-read, and probes see the new
    * vectors immediately through the same partition-pruned scan. Centroid
    * drift under sustained ingest is handled by periodic offline rebuilds
    * (standard IVF practice); recall degrades gracefully, never
    * correctness (assignment stays nearest-centroid by construction).
    * Parquet part-file names carry task UUIDs, so appends never collide
    * with existing generation files; accumulated small files are
    * [[compactIvf]]'s job.
    *
    * The batch schema is validated against the persisted corpus schema
    * first — same column names, same id/vector types — so a mismatched
    * caller fails here with a clear message instead of poisoning the
    * directory with mixed-schema parquet that only breaks a later read.
    *
    * RE-INGEST of a tombstoned id ([[deleteFromIvf]]'s contract,
    * [[Dedup.appendToMinhashIndex]]'s twin): with live tombstones the
    * batch's ids are semi-joined against them (tombstone-free fast path
    * costs one existence check); a hit runs [[compactIvfOnline]] inline —
    * the reader-atomic rewrite live tombstones had already scheduled —
    * purging the old vectors and clearing the tombstones, then the append
    * lands in the fresh generation. Delete-then-re-add therefore works,
    * and a re-added vector's stale rows can never pair with its new ones
    * as duplicate neighbor candidates. */
  def appendToIvf(batch: DataFrame, path: String, idCol: String, vecCol: String): Unit = {
    val spark = batch.sparkSession
    val gen0 = requireGen(spark, path)
    val existing = spark.read.parquet(new Path(gen0, "assigned").toString).schema
    for (c <- Seq(idCol, vecCol)) {
      require(existing.fieldNames.contains(c),
        s"appendToIvf: persisted layout at $gen0 has columns " +
          s"${existing.fieldNames.mkString("[", ", ", "]")} — no '$c'; " +
          "pass the same idCol/vecCol the index was built with")
      // nullability-insensitive — an encoder-built batch carries
      // containsNull=false where parquet reads back nullable, and that
      // difference cannot poison the layout; an element-type difference can
      require(asNullable(batch.schema(c).dataType) == asNullable(existing(c).dataType),
        s"appendToIvf: column '$c' is ${batch.schema(c).dataType.simpleString} " +
          s"in the batch but ${existing(c).dataType.simpleString} in the persisted " +
          s"layout at $gen0 — vector element types must match exactly")
    }
    // the heal check, the manifest write, and the data write must not
    // disagree on the batch's ids — [[TombstoneHeal.resolve]] decides what
    // each write derives from (and what to checkpoint) per tombstone state
    val (src, ids, pinned) = TombstoneHeal.resolve(batch,
      batch.select(col(idCol).as("id")).distinct(), idCol,
      ivfTombstonesOf(spark, gen0))(
      () => compactIvfOnline(spark, path)) // forced purge + tombstone clear, new generation
    // re-resolve: the inline compaction (if any) committed a new generation
    val gen = requireGen(spark, path)
    val centroids = ivfCentroids(spark, gen)
    // manifest FIRST (mirrors appendToMinhashIndex's ordering rationale):
    // manifest-without-data means a replay merely skips the batch (vectors
    // lost softly); data-without-manifest means a replay re-appends and
    // duplicates vectors
    try {
      ids.coalesce(1)
        .write.mode("append").parquet(new Path(gen, "ids").toString)
      assignToCentroids(src, idCol, vecCol, centroids)
        .write.mode("append").partitionBy("list")
        .parquet(new Path(gen, "assigned").toString)
    } finally pinned.foreach(Bridge.unpersistCheckpoint)
  }

  /** Data-file count per `list=` dir of the latest committed generation —
    * the [[compactIvf]] trigger signal (the IVF side of the ingest ledger:
    * every [[appendToIvf]] adds one part-file set per touched list).
    * Driver-side directory metadata only, no data read. */
  def ivfFileCounts(spark: SparkSession, path: String): Map[Int, Int] =
    latestIvfGen(spark, path) match {
      case None => Map.empty
      case Some(gen) =>
        val assigned = new Path(gen, "assigned")
        fsOf(spark, assigned).listStatus(assigned).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("list="))
          .map(st => st.getPath.getName.stripPrefix("list=").toInt ->
            graft.store.Compact.dataFileCount(spark, st.getPath.toString))
          .toMap
    }

  /** Compact the latest committed generation's `list=` partition dirs —
    * the maintenance pass that keeps sustained [[appendToIvf]] ingest from
    * degrading the probe scan into millions of tiny file opens.
    * Partition-local IN-PLACE rewrite: only lists that accumulated files
    * are touched, each independently — the cheapest form, but the per-dir
    * swap is not atomic for a concurrent reader, so run it from the ingest
    * owner between batches ([[Compact]]'s single-writer contract). For
    * compaction that must not pause probes, use [[compactIvfOnline]].
    * Result-identical (q74 probes a compacted layout; CompactSpec asserts
    * rows and file counts). Returns the number of list dirs rewritten. */
  def compactIvf(spark: SparkSession, path: String,
      targetFiles: Int = 0, minFiles: Int = 1): Int =
    latestIvfGen(spark, path) match {
      case None => 0
      case Some(gen) =>
        // the id manifest accumulates one file per append too — same
        // maintenance pass, same in-place leaf rewrite. Disjoint trees,
        // so the two passes overlap (guide §2.6).
        var rewritten = 0
        graft.Par.run(
          () => graft.store.Compact.leafDir(spark, new Path(gen, "ids").toString,
            targetFiles, minFiles),
          () => rewritten = graft.store.Compact.partitionedDir(
            spark, new Path(gen, "assigned").toString, "list", targetFiles, minFiles))
        rewritten
    }

  /** Reader-atomic compaction: rewrite the CURRENT generation's corpus,
    * repartitioned by list, into a NEW committed generation, then vacuum
    * superseded ones (`keep ≥ 2` keeps the generation an in-flight probe
    * may have resolved). Concurrent probes never see a mid-rewrite state —
    * they read the old generation until the `_COMMITTED` marker lands,
    * exactly like an offline rebuild, but without re-running KMeans. Costs
    * a full read+write of the layout (vs [[compactIvf]]'s partition-local
    * pass); after sustained ingest most lists are fragmented anyway, so
    * the difference is small. Returns the new generation path.
    *
    * Files per list auto-size from the layout's bytes: a plain
    * `repartition(list)` would give exactly one file per list — a hot
    * list at corpus scale then becomes one multi-GB file written by one
    * task — so when the average list exceeds `maxFileBytes` the shuffle
    * key gains a deterministic per-row salt (`hash(id) mod filesPerList`),
    * splitting each list's write across that many tasks/files. At test
    * scale this resolves to 1 and the plain one-file-per-list layout is
    * unchanged. */
  def compactIvfOnline(spark: SparkSession, path: String, keep: Int = 2,
      maxFileBytes: Long = graft.store.Compact.DefaultMaxFileBytes): String = {
    val idx = readIvf(spark, path)
    val gen0 = requireGen(spark, path)
    val assigned = new Path(gen0, "assigned")
    val bytes = fsOf(spark, assigned).getContentSummary(assigned).getLength
    val perList = bytes / math.max(1, idx.centroids.length)
    val filesPerList = math.max(1L, (perList + maxFileBytes - 1) / maxFileBytes).toInt
    val idCol = col(idx.assigned.columns.head)
    val re =
      if (filesPerList == 1) idx.assigned.repartition(col("list"))
      else idx.assigned.repartition(col("list"), pmod(hash(idCol), lit(filesPerList)))
    // the id set is unchanged by compaction — carry the manifest over,
    // coalesced from its accumulated append files to a byte-sized target
    // (coalesce(1) would cap the rewrite at one task at corpus scale)
    val idsTarget = graft.store.Compact.resolveTarget(0,
      graft.store.Compact.dataSizeBytes(spark, new Path(gen0, "ids").toString), maxFileBytes)
    val gen = writeIvf(IvfIndex(re, idx.centroids), path,
      idsFrom = Some(ivfIds(spark, path).coalesce(idsTarget)))
    vacuumIvf(spark, path, keep)
    gen
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
    // localCheckpoint: the centroid ranking (literal tree at small nlist —
    // planning/codegen it is the expensive part at small batch sizes — or
    // the O(1)-plan native expression above the cutoff) would otherwise be
    // re-planned by BOTH the probe-list collect and the join side. The
    // checkpointed relation is batch-sized (queries × nprobe rows), never
    // corpus-sized.
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        Similarity.norm(col(vecCol)).as("qn"))
      .withColumn("probe", explode(centroidRank(queries, col("qv"), index.centroids, nprobe)))
      .select(col("query_id"), col("qv"), col("qn"), col("probe.list").as("list"))
      .scratchCheckpoint()
    val probeLists = probes.select("list").distinct()
      .collect().map(_.getInt(0)).toSeq
    val corpus = index.assigned
      .filter(col("list").isin(probeLists: _*))
      .select(col(idCol).as("neighbor_id"), col("list"),
        col(vecCol).as("cv"), Similarity.norm(col(vecCol)).as("cn"))
    val scored = probes.join(corpus, Seq("list"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(Similarity.cosineFromNorms(
        Similarity.dot(col("qv"), col("cv")), col("qn"), col("cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }
}
