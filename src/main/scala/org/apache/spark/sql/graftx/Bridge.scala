package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge. Spark 4 hides the classic Column
  * internals behind `private[sql]`; third-party Catalyst expressions need a
  * shim inside the `org.apache.spark.sql` package tree to expose them (the
  * standard pattern for Spark-native libraries). Only this file lives in
  * Spark's namespace; everything else is `graft.*`. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function builder on a LIVE session (extensions only apply
    * at session construction; `getOrCreate` on an existing session ignores
    * them — this covers that path). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Drain the async listener bus — lets tests observe every
    * QueryExecutionListener event fired so far (`listenerBus` is
    * `private[spark]`, hence the shim). */
  def drainListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Release the storage blocks behind a `localCheckpoint()`ed Dataset.
    * The checkpoint lives as a persisted RDD inside the plan's `LogicalRDD`
    * (`private[sql]`, hence the shim); iterative algorithms that checkpoint
    * per round MUST free superseded generations or executor storage grows
    * linearly with iteration count. Safe on any plan: non-LogicalRDD nodes
    * are ignored. */
  def unpersistCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }

  /** True iff the frame IS a concrete checkpoint — its analyzed plan is
    * exactly the `LogicalRDD` leaf a `(local)Checkpoint()` returns, backed
    * by a checkpointed RDD. Every action on such a frame replays the same
    * stored rows (block loss fails loudly instead of recomputing), so a
    * consistency checkpoint on top of it would duplicate the data for zero
    * determinism gain. Derived plans — even ones rooted at a checkpointed
    * leaf — return false: re-evaluation is plan replay, and whether that is
    * acceptable is the caller's call. (`LogicalRDD` is `private[sql]`,
    * hence the shim.) */
  def isCheckpointBacked(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed match {
      // isCheckpointed is true for BOTH reliable and (materialized) local
      // checkpoints — and Dataset.localCheckpoint() is eager by default,
      // so a checkpointed frame handed in by a caller always reports true
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.isCheckpointed
      case _ => false
    }
}
