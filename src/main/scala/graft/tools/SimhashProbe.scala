package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: quantify the SimHash band fan-out at sf0.1 — raw banded-join
  * candidates vs hamming-verified pairs, and the largest band buckets.
  * Usage: runMain graft.tools.SimhashProbe */
object SimhashProbe {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val bits = 16
    val fp = docs.select(col("doc_id").as("id"),
        graft.functions.TextAnalysis.tokens(col("text")).as("__toks"))
      .select(col("id"),
        graft.expressions.HashExpressions.simhash64(col("__toks"), bits).as("fp"))
    val banded = fp
      .withColumn("b0", concat(lit("lo:"), (col("fp").bitwiseAND(lit((1L << (bits / 2)) - 1))).cast("string")))
      .withColumn("b1", concat(lit("hi:"), shiftright(col("fp"), bits / 2).cast("string")))
      .select(col("id"), col("fp"), explode(array(col("b0"), col("b1"))).as("band"))
      .localCheckpoint()
    val bucketSizes = banded.groupBy("band").count().orderBy(col("count").desc)
    println("top band buckets:")
    bucketSizes.show(10, truncate = false)
    val fanout = bucketSizes.agg(sum((col("count") * (col("count") - 1) / 2).cast("long"))).collect()(0).getLong(0)
    println(s"raw candidate pairs (sum nC2 over buckets) = $fanout")
    val joined = banded.as("x").join(banded.as("y"),
      col("x.band") === col("y.band") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        graft.functions.TextAnalysis.hammingDistance(col("x.fp"), col("y.fp")).as("hamming"))
    val t0 = System.nanoTime()
    val nVerified = joined.filter(col("hamming") <= 2).distinct().count()
    val tFiltFirst = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val nOld = joined.distinct().filter(col("hamming") <= 2).count()
    val tDistFirst = (System.nanoTime() - t1) / 1e9
    println(f"verified pairs filter-then-distinct = $nVerified ($tFiltFirst%.2fs)")
    println(f"verified pairs distinct-then-filter = $nOld ($tDistFirst%.2fs)")
    spark.stop()
  }
}
