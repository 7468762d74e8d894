package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, TimestampType}

/** Dev probe: per-restart phase breakdown of the q84 streaming shape at
  * sf0.1 — slice write, query start, drain (processAllAvailable), stop —
  * run twice (cold + warm). The bench's single number and JobProbe's
  * job/gap split cannot say WHERE a restart's fixed cost lives; this can.
  * Usage: runMain graft.tools.StreamProbe [statePartitions] */
object StreamProbe {
  def main(a: Array[String]): Unit = {
    val s = graft.GraftSession.create("local[32]", 32)
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val stateParts = a.headOption.map(_.toInt).getOrElse(1)
    def ms[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e6)
    }
    (1 to 2).foreach { rep =>
      val root = java.nio.file.Files.createTempDirectory("streamprobe").toString
      val srcDir = s"$root/src"; val outDir = s"$root/out"; val ckpt = s"$root/ckpt"
      val obs = graft.Tables.load(s, dir, "events")
        .filter(col("user_id") % 3 === 0 && col("event_id") % 8 === 0).select(
          concat(lit("u"), col("user_id").cast(StringType)).as("product_id"),
          col("value").as("price"),
          (col("event_id") % 100).cast(LongType).as("sales_count"),
          col("ts").as("crawled_at"),
          col("event_id")).localCheckpoint()
      val cuts = Seq("2024-01-06", "2024-01-11", "2024-01-16", "2024-01-21", "2024-01-26")
        .map(c => lit(s"$c 00:00:00").cast(TimestampType))
      val slices = Seq(
        obs.filter(col("crawled_at") < cuts(0)),
        obs.filter(col("crawled_at") >= cuts(0) && col("crawled_at") < cuts(1)),
        obs.filter(col("crawled_at") >= cuts(1) && col("crawled_at") < cuts(2)),
        obs.filter(col("crawled_at") >= cuts(2) && col("crawled_at") < cuts(3)),
        obs.filter(col("crawled_at") >= cuts(3) && col("crawled_at") < cuts(4)),
        obs.filter(col("crawled_at") >= cuts(4)))
      val t0 = System.nanoTime()
      slices.zipWithIndex.foreach { case (sl, i) =>
        val (_, wMs) = ms(graft.operators.Merge.latestPerKey(sl, Seq("product_id"),
          "crawled_at", Seq(col("event_id").desc)).drop("event_id")
          .write.mode("append").parquet(srcDir))
        val before = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", stateParts.toString)
        try {
          val (q, startMs) = ms(graft.streaming.Streams
            .dedupStream(s.readStream
              .schema("product_id STRING, price DOUBLE, sales_count BIGINT, crawled_at TIMESTAMP")
              .parquet(srcDir), Seq("product_id"), "crawled_at", "4 days")
            .writeStream
            .option("checkpointLocation", ckpt)
            .format("parquet").option("path", outDir).outputMode("append").start())
          val (_, drainMs) = ms(q.processAllAvailable())
          val (_, stopMs) = ms(q.stop())
          println(f"  restart $i: write=$wMs%6.0fms start=$startMs%6.0fms drain=$drainMs%6.0fms stop=$stopMs%6.0fms")
        } finally s.conf.set("spark.sql.shuffle.partitions", before)
      }
      val n = s.read.parquet(outDir).count()
      println(f"PROBE rep$rep stateParts=$stateParts rows=$n total=${(System.nanoTime() - t0) / 1e9}%.2fs")
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
    s.stop()
  }
}
