package graft

import org.apache.spark.sql.functions._

import graft.expressions.HashExpressions
import graft.functions.TextAnalysis._

/** Native sketch expressions: differential-tested against the pure
  * `functions._` formulations they replace, plus the SQL registration. */
class ExpressionsSpec extends SparkSpec {

  test("MinHashSignatureExpr equals the higher-order-function formulation") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val both = docs.select(col("doc_id"), wordShingles(col("text"), 3).as("sh"))
      .select(col("doc_id"),
        HashExpressions.minhashSignature(col("sh"), 12).as("native"),
        minhashSignature(col("sh"), 12).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
    assert(both.count() === 200)
  }

  test("SimHashExpr equals the vote-sum formulation, including empty input") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val both = docs.select(tokens(col("text")).as("toks"))
      .select(
        HashExpressions.simhash64(col("toks"), 16).as("native"),
        simhash(col("toks"), 16).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
    import spark.implicits._
    val empty = Seq("").toDF("t")
      .select(HashExpressions.simhash64(tokens(col("t")), 16).as("fp"))
    assert(empty.head().getLong(0) === 0L)
  }

  test("expressions are registered as SQL functions on a live session") {
    GraftSession.registerOn(spark)
    val r = spark.sql(
      "SELECT simhash64(array('a','b'), 16) fp, minhash_signature(array('a','b'), 4) sig")
      .head()
    assert(r.getSeq[String](1).length === 4)
    // SQL surface agrees with the Column surface
    import spark.implicits._
    val viaCol = Seq(("a b")).toDF("t")
      .select(HashExpressions.simhash64(tokens(col("t")), 16)).head().getLong(0)
    val viaSql = spark.sql("SELECT simhash64(array('a','b'), 16)").head().getLong(0)
    assert(viaCol === viaSql)
  }
}
