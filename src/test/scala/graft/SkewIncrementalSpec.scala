package graft

import org.apache.spark.sql.functions._

import graft.operators.{Incremental, SkewJoin}

/** Salted skew operators are result-equivalent to their unsalted twins;
  * incremental work selection composes the three skip tiers. */
class SkewIncrementalSpec extends SparkSpec {

  test("saltedSumCount equals plain groupBy sum/count on a skewed key") {
    val li = Tables.lineitem(spark, sfDir)
    val salted = SkewJoin.saltedSumCount(li, "l_returnflag", "l_quantity",
        buckets = 8, saltFrom = Seq("l_orderkey", "l_linenumber"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val plain = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("s"), count(lit(1)).as("n"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(salted.map(_._1) === plain.map(_._1))
    salted.zip(plain).foreach { case ((_, s1, n1), (_, s2, n2)) =>
      assert(n1 === n2)
      assert(math.abs(s1 - s2) < 1e-6)
    }
  }

  test("saltedJoin equals the plain join, spreading the hot key over buckets") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
    val part = Tables.part(spark, sfDir).select(col("p_partkey").as("l_partkey"), col("p_brand"))
    val salted = SkewJoin.saltedJoin(li, part, "l_partkey",
      buckets = 4, saltFrom = Seq("l_orderkey", "l_linenumber"))
    val plain = li.join(part, Seq("l_partkey"))
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("pendingWork applies progress, completeness and staleness tiers; prioritizedTake caps") {
    import spark.implicits._
    val cands = Seq("a", "b", "c", "d", "e").toDF("id")
    val progress = Seq("a").toDF("id")
    val stored = Seq(
      ("b", "ok", "2024-01-09"),   // complete + fresh -> skipped
      ("c", "ok", "2023-12-01"),   // complete but stale -> pending
      ("d", "", "2024-01-09")      // fresh but incomplete -> pending
    ).toDF("id", "brand", "updated")
    val ref = lit("2024-01-03")
    val pending = Incremental.pendingWork(cands, "id", progress, stored,
      completeCond = col("brand") =!= "", freshCond = col("updated") >= ref)
    assert(pending.select("id").as[String].collect().toSet === Set("c", "d", "e"))

    val withMeta = pending
      .join(Seq(("c", "2024-01-01", 5L), ("d", "2024-01-02", 0L))
        .toDF("id", "last", "changes"), Seq("id"), "left")
    val took = Incremental.prioritizedTake(withMeta, "id",
      lastProcessed = col("last"), changeCount = col("changes"), quota = 2)
      .select("id").as[String].collect().toSeq
    // never-processed e first, then hot c
    assert(took === Seq("e", "c"))
  }
}
