package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-handling operators. AQE's skew-join splitting (enabled in
  * [[graft.GraftSession]]) handles sort-merge skew at runtime; these are
  * the DETERMINISTIC plan-level forms for when the skew is known up front
  * (a handful of mega-keys in a 100 TB fact):
  *
  *  - salted aggregation: two-phase groupBy via a salt column so one hot
  *    key's rows spread over `salt` reducers before the final combine;
  *  - salted join: the big side gets a deterministic salt, the small side
  *    is replicated `salt` times, and the join key becomes (key, salt) —
  *    the hot key's partitions shrink by the salt factor.
  *
  * Both are exactly result-equivalent to their unsalted forms (specs
  * assert it); the salt is derived from stable row content, never rand().
  */
object SkewJoin {

  /** Deterministic salt in [0, buckets): hash of the given columns. */
  private def saltCol(buckets: Int, from: Seq[Column]): Column =
    pmod(hash(from: _*), lit(buckets))

  /** Two-phase aggregation: sum-like partial aggs per (key, salt), then the
    * final combine per key. `aggs` maps output column name → (partial agg
    * of the input column, final agg of the partial column). */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      buckets: Int, saltFrom: Seq[String]): DataFrame =
    df.withColumn("__salt", saltCol(buckets, saltFrom.map(col)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).cast("long").as("n"))

  /** Salted equi-join of a skewed big side against a small dim: big rows get
    * `salt = hash(content) % buckets`; the dim is exploded `buckets` ways so
    * every (key, salt) bucket finds its match. Inner or left joins only
    * (right/full would duplicate unmatched dim rows per salt). */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String,
      buckets: Int, saltFrom: Seq[String], joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left", s"unsupported: $joinType")
    val saltedBig = big.withColumn("__salt", saltCol(buckets, saltFrom.map(col)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(replicatedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
