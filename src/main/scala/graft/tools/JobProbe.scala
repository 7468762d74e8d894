package graft.tools

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev probe: per-Spark-job wall-time breakdown of individual SparkEntry
  * queries at sf0.1. Attaches a listener, runs each named query once
  * (cold) or twice (repeat the name for warm numbers), and prints every
  * job's duration, task count and callsite — the "where do the seconds of
  * a 15-job lifecycle query actually go" view the bench's single number
  * cannot give. Usage: runMain graft.tools.JobProbe q73_compacted_ingest */
object JobProbe {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    final case class Job(id: Int, t0: Long, desc: String, nTasks: Int)
    val open = mutable.Map.empty[Int, Job]
    val done = mutable.ArrayBuffer.empty[(Job, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = synchronized {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        open(js.jobId) = Job(js.jobId, System.nanoTime(),
          desc, js.stageInfos.map(_.numTasks).sum)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = synchronized {
        open.remove(je.jobId).foreach(j => done += ((j, System.nanoTime())))
      }
    })
    val names = if (a.nonEmpty) a.toSeq else Seq("q73_compacted_ingest")
    names.foreach { name =>
      done.clear()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.1").count()
      val total = (System.nanoTime() - t0) / 1e9
      // listener bus is async — give it a beat to drain before reading
      Thread.sleep(300)
      val jobs = done.sortBy(_._1.id)
      val jobSum = jobs.map { case (j, t1) => (t1 - j.t0) / 1e9 }.sum
      println(f"PROBE $name rows=$n total=$total%.2fs jobs=${jobs.size} jobSum=$jobSum%.2fs gap=${total - jobSum}%.2fs")
      jobs.foreach { case (j, t1) =>
        println(f"  job ${j.id}%4d ${(t1 - j.t0) / 1e9}%7.3fs tasks=${j.nTasks}%4d  ${j.desc.take(110)}")
      }
    }
    spark.stop()
  }
}
