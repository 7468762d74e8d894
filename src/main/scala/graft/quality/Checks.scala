package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset invariant checker (SURVEY.md §5c — the `tests/verify.py`
  * equivalent as a library): declarative rules evaluated in ONE aggregate
  * pass over the table (`count(when(violated))` per rule — no per-rule
  * scans), plus relational checks (duplicates, FK orphans) that need their
  * own shuffles.
  *
  * Output contract: a (rule, violations) report DataFrame — the shape the
  * reference prints (`tests/verify.py:276-356`), but derived
  * deterministically and cheap enough to run after every load.
  */
object Checks {

  /** A named invariant; `violated` is TRUE on bad rows. */
  case class Rule(name: String, violated: Column)

  /** Required non-null, non-blank field (verify.py:87-119). */
  def required(c: String): Rule =
    Rule(s"required_$c", col(c).isNull || trim(col(c).cast(StringType)) === "")

  /** Closed numeric range (verify.py:120-172). */
  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"range_$c", col(c).isNotNull && (col(c) < lo || col(c) > hi))

  /** All expression rules in one aggregate pass → (rule, violations). */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = rules.map(r => count(when(r.violated, 1)).cast(LongType).as(r.name))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single row to (rule, violations)
    wide.select(explode(map(
      rules.flatMap(r => Seq(lit(r.name), col(r.name))): _*)).as(Seq("rule", "violations")))
  }

  /** Duplicate natural keys → (key cols..., n) for groups with n > 1
    * (verify.py:173-203). */
  def duplicates(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).cast(LongType).as("n"))
      .filter(col("n") > 1)

  /** FK orphans: child rows whose key has no parent (verify.py:230-275). */
  def fkOrphans(child: DataFrame, parent: DataFrame, childKey: String, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey).as(childKey)).distinct(),
      Seq(childKey), "left_anti")

  /** Hierarchy-level consistency: `level` must equal size(path)
    * (verify.py:204-229). */
  def levelConsistency(df: DataFrame, pathCol: String, levelCol: String): Rule =
    Rule("level_matches_path", col(levelCol) =!= size(col(pathCol)))
}
