/** Dev audit: physical-plan smells across every SparkEntry query —
  * cartesian products, nested-loop joins, and full-column parquet scans. */
package graft.tools

object PlanAudit {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, "/root/testdata/sf0.001")
        val plan = df.queryExecution.executedPlan.toString
        val smells = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin")
        ).filter(_._2).map(_._1)
        val scans = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan)
          .map(_.group(1).count(_ == ':')).toSeq
        val wideScan = scans.exists(_ > 12)
        println(s"AUDIT $name: " +
          (if (smells.isEmpty && !wideScan) "clean"
           else (smells ++ (if (wideScan) Seq(s"wide-scan(${scans.max} cols)") else Nil)).mkString(",")))
      } catch { case e: Throwable => println(s"AUDIT $name: ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
