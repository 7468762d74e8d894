package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Dev probe: native [[graft.expressions.DotProductExpr]] vs the
  * interpreted `aggregate(zip_with(...))` HOF formulation, at a
  * corpus-shaped workload — many scored pairs × realistic embedding dim
  * (the gated sf0.1 queries score too few pairs at dim 64 for the
  * difference to surface; this probe is the evidence the swap is about
  * the 100 TB shape, docs/SCALE.md r10). */
object DotProbe {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[dotprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }
    def hofDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast(DoubleType) * q.cast(DoubleType)),
        lit(0.0), (acc, v) => acc + v)
    for (dim <- Seq(64, 256, 768)) {
      // 2M pairs: each of 2M rows carries two synthetic float vectors
      val pairs = spark.range(2000000).select(col("id"),
          array((0 until dim).map(j =>
            ((col("id") * 31 + j * 17) % 97 - 48).cast("double").divide(lit(48.0))
              .cast("float")): _*).as("a"),
          array((0 until dim).map(j =>
            ((col("id") * 13 + j * 7) % 89 - 44).cast("double").divide(lit(44.0))
              .cast("float")): _*).as("b"))
        .localCheckpoint()
      pairs.count() // warm
      time(f"hof    dim=$dim%-4d 2M pairs")(
        pairs.agg(sum(hofDot(col("a"), col("b")))).head)
      time(f"native dim=$dim%-4d 2M pairs")(
        pairs.agg(sum(graft.expressions.VectorExpressions.dot(col("a"), col("b")))).head)
      org.apache.spark.sql.graftx.Bridge.unpersistCheckpoint(pairs)
    }
    spark.stop()
  }
}
