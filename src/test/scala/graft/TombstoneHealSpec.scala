package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.Bridge

import graft.operators.TombstoneHeal

/** Pins [[TombstoneHeal.resolve]]'s tiering contract directly (the append
  * paths exercise it end-to-end via q89–q92 and CompactSpec; this spec pins
  * the block-manager discipline those gates cannot see): which frames get
  * checkpointed per tier, checkpoint reuse for pre-materialized batches,
  * and release of the id checkpoint when the forced compaction throws. */
class TombstoneHealSpec extends SparkSpec {
  import spark.implicits._

  private def batchOf(ids: Long*) =
    ids.toDF("doc_id").withColumn("text", concat(lit("doc "), col("doc_id")))
  private def idsOf(b: org.apache.spark.sql.DataFrame) =
    b.select(col("doc_id").as("id")).distinct()
  // id-SET diffs, not size compares: suites share one session, and another
  // suite's unpersist(blocking = false) can land asynchronously mid-test —
  // what must hold is that THIS test's new ids are gone, not a global count
  private def persistedIds = spark.sparkContext.getPersistentRDDs.keySet

  test("no live tombstones: everything stays lazy, nothing pinned") {
    val before = persistedIds
    val b = batchOf(1L, 2L)
    val (src, ids, pinned) = TombstoneHeal.resolve(b, idsOf(b), "doc_id", None)(() =>
      fail("compaction must not run without tombstones"))
    assert(src eq b)
    assert(pinned.isEmpty)
    assert((persistedIds -- before).isEmpty) // not even the ids were materialized
    assert(ids.as[Long].collect().sorted === Array(1L, 2L))
  }

  test("disjoint tombstones: ids checkpointed and pinned, batch stays lazy") {
    val before = persistedIds
    val b = batchOf(10L, 11L)
    val ts = Seq(1L).toDF("id")
    val (src, ids, pinned) = TombstoneHeal.resolve(b, idsOf(b), "doc_id", Some(ts))(() =>
      fail("compaction must not run on a disjoint batch"))
    assert(src eq b) // the full batch must NOT have been materialized
    assert(pinned.size === 1)
    assert(Bridge.isCheckpointBacked(ids))
    pinned.foreach(Bridge.unpersistCheckpoint)
    assert((persistedIds -- before).isEmpty)
  }

  test("tombstone hit: compaction fires, batch checkpointed, ids re-derived from it") {
    val before = persistedIds
    val b = batchOf(5L, 6L)
    val ts = Seq(5L).toDF("id")
    var compacted = false
    val (src, ids, pinned) =
      TombstoneHeal.resolve(b, idsOf(b), "doc_id", Some(ts))(() => compacted = true)
    assert(compacted)
    assert(src ne b)
    assert(Bridge.isCheckpointBacked(src))
    assert(pinned.size === 1)
    assert(ids.as[Long].collect().sorted === Array(5L, 6L))
    pinned.foreach(Bridge.unpersistCheckpoint)
    assert((persistedIds -- before).isEmpty) // the superseded id checkpoint was released too
  }

  test("tombstone hit on a checkpoint-backed batch: reused, no second copy") {
    val before = persistedIds
    val b = batchOf(7L, 8L).localCheckpoint()
    val ts = Seq(7L).toDF("id")
    val (src, ids, pinned) =
      TombstoneHeal.resolve(b, idsOf(b), "doc_id", Some(ts))(() => ())
    assert(src eq b) // the caller's checkpoint IS the materialization
    assert(pinned.isEmpty) // nothing of resolve's own left pinned
    assert(ids.as[Long].collect().sorted === Array(7L, 8L))
    assert((persistedIds -- before).size === 1) // only the caller's own checkpoint
    Bridge.unpersistCheckpoint(b)
  }

  test("a throwing forced compaction releases the id checkpoint before propagating") {
    val before = persistedIds
    val b = batchOf(9L)
    val ts = Seq(9L).toDF("id")
    val boom = intercept[RuntimeException] {
      TombstoneHeal.resolve(b, idsOf(b), "doc_id", Some(ts))(() =>
        throw new RuntimeException("rewrite died"))
    }
    assert(boom.getMessage === "rewrite died")
    assert((persistedIds -- before).isEmpty) // no orphaned checkpoint blocks
  }
}
