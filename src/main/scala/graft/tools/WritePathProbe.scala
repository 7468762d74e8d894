package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: isolate the cost anatomy of the small partitioned append
  * (the ingest loop's bands write — ~4k rows into ≤64 `__bkt=` dirs).
  * Times compute-only, flat append, and partitioned append variants. */
object WritePathProbe {
  def main(a: Array[String]): Unit = {
    val s = graft.GraftSession.create("local[32]", 32)
    s.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("writeprobe").toString
    val df = s.range(4000).select(
      col("id"),
      md5(col("id").cast("string")).as("bandkey"))
      .withColumn("__bkt", pmod(hash(col("bandkey")), lit(64)))
      .localCheckpoint()
    def t[T](name: String)(f: => T): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"  WP $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.3fs")
    }
    (1 to 3).foreach { rep =>
      println(s"rep $rep")
      t("count")(df.repartition(1).count())
      t("flat append")(df.repartition(1).write.mode("append").parquet(s"$base/flat"))
      t("partitioned append (1 task)")(df.repartition(1).write.mode("append")
        .partitionBy("__bkt").parquet(s"$base/part1"))
      t("partitioned append (bkt shuffle)")(df.repartition(col("__bkt")).write.mode("append")
        .partitionBy("__bkt").parquet(s"$base/part2"))
      t("partitioned append (v2 commit)")(df.repartition(1).write.mode("append")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .partitionBy("__bkt").parquet(s"$base/part3"))
      t("partitioned append (16 bkt)")(df.withColumn("__bkt", pmod(hash(col("bandkey")), lit(16)))
        .repartition(1).write.mode("append")
        .partitionBy("__bkt").parquet(s"$base/part4"))
      t("partitioned append (snappy)")(df.repartition(1).write.mode("append")
        .option("compression", "snappy")
        .partitionBy("__bkt").parquet(s"$base/part5"))
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    s.stop()
  }
}
