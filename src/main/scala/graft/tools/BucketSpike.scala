package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Merge

/** Design spike (round-3 directive #9): would a BUCKET-PRUNED upsert rewrite
  * — rewrite only the buckets containing batch keys, stitch the rest from
  * the previous generation — beat [[graft.store.Store]]'s full-snapshot
  * generation write?
  *
  * Layout prototyped here: the snapshot partitioned by a derived
  * `__b = pmod(hash(key), nb)` column (PARTITION dirs, so the selective
  * write is expressible with `partitionOverwriteMode=dynamic` and the
  * pruned read is a static PartitionFilter — no manual bucket-file
  * management). Measures, for several batch sizes:
  *   - how many of the nb buckets the batch actually touches (the whole
  *     game: untouched buckets are the only savings), and
  *   - wall time of the full merge+write vs the pruned merge+overwrite.
  *
  * Result recorded in docs/UPSERT_SPIKE.md. Spoiler: with murmur-hash
  * bucketing a uniformly-drawn batch of k keys touches ≈ nb·(1−(1−1/nb)^k)
  * buckets — k ≥ a few hundred touches ~every bucket, so pruning only wins
  * for tiny or key-clustered batches, and winning at realistic batch sizes
  * needs nb ≫ k (a small-files explosion at 100 TB).
  */
object BucketSpike {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("local[8]", 32)
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    import spark.implicits._

    val nb = 64
    val nRows = 2000000L
    val root = java.nio.file.Files.createTempDirectory("bucket_spike").toString

    def withBucket(df: DataFrame): DataFrame =
      df.withColumn("__b", pmod(hash(col("k")), lit(nb)))

    // snapshot: nRows keyed rows, partitioned by derived bucket
    val snap0 = spark.range(nRows)
      .select(col("id").cast("string").as("k"),
        (col("id") * 7 % 1000000).as("v"))
    withBucket(snap0).write.mode("overwrite").partitionBy("__b")
      .parquet(s"$root/snap")
    val snap = () => spark.read.parquet(s"$root/snap")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    for (batchK <- Seq(100, 1000, 10000, 100000)) {
      // batch: uniformly-spread existing keys with new values
      val batch = spark.range(batchK.toLong)
        .select((col("id") * (nRows / batchK)).cast("string").as("k"),
          lit(-1L).as("v"))
      val touched = withBucket(batch).select("__b").distinct().count()

      // A: full-snapshot generation write (Store's current path)
      val (_, tFull) = time {
        Merge.upsertMerge(snap().drop("__b"), batch, Seq("k"))
          .write.mode("overwrite").parquet(s"$root/gen_full")
      }

      // B: bucket-pruned — read ONLY touched partitions, merge, dynamic
      // partition overwrite writes ONLY those partitions back in place
      val (_, tPruned) = time {
        val buckets = withBucket(batch).select("__b").distinct()
          .as[Int].collect().toSeq
        val affected = snap().filter(col("__b").isin(buckets: _*)).drop("__b")
        withBucket(Merge.upsertMerge(affected, batch, Seq("k")))
          .write.mode("overwrite").partitionBy("__b").parquet(s"$root/snap")
      }
      println(f"[spike] batch=$batchK%7d touched=$touched%3d/$nb buckets  " +
        f"full=$tFull%6.2fs  pruned=$tPruned%6.2fs  speedup=${tFull / tPruned}%5.2fx")
    }
    spark.stop()
  }
}
