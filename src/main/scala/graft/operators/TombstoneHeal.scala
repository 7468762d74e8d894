package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.graftx.Bridge
import graft.operators.Scratch.Ops

/** The tombstone-heal idiom shared by the twin index append paths
  * ([[Dedup.appendToMinhashIndex]], [[Ann.appendToIvf]]) — kept in ONE
  * place so the twins cannot silently diverge when the heal contract
  * changes. See the append paths' scaladoc for the re-ingest contract
  * itself (delete-then-re-add works; the purge-first ordering is
  * load-bearing) and docs/SCALE.md for the cost adjudication.
  */
private[graft] object TombstoneHeal {

  /** Resolve what an append must write from, given the generation's live
    * tombstones. Returns `(src, ids, pinned)`: every DATA write must
    * derive from `src`, the id-manifest write from `ids`, and the caller
    * must unpersist each frame in `pinned` (in a `finally`) once the
    * appends land — a failed write must not pin checkpoint blocks in the
    * block manager until ContextCleaner notices.
    *
    * Three cases:
    *  - no live tombstones (the hot path): everything stays lazy — one
    *    driver-side existence check was the whole cost.
    *  - tombstones live but DISJOINT from the batch: the id projection is
    *    checkpointed once so the heal check and the manifest write see the
    *    same id set, but the batch itself stays lazy — a sustained ingest
    *    loop running between a takedown and its compaction must not pay a
    *    full-batch materialization per append.
    *  - tombstone HIT (a deleted id coming back): `forceCompact` runs the
    *    physical rewrite live tombstones had already scheduled (purge +
    *    tombstone clear, new generation), then the BATCH is checkpointed
    *    and ids re-derived from it, so the manifest and every data write
    *    come from ONE materialization. On this path consistency is
    *    absolute even for a nondeterministic batch; the batch-sized
    *    checkpoint is paid only here, where the owed index rewrite
    *    dominates it — and not at all when the caller already handed in a
    *    checkpoint-backed frame (the streaming sinks do), which replays
    *    identically without a second copy in the block manager.
    *
    * Residual window, accepted and documented: on the lazy paths a
    * CONTRACT-VIOLATING nondeterministic batch can still write data rows
    * whose ids diverge from the manifest (each Spark action re-evaluates
    * the plan). Batches are deterministic by contract — closing the window
    * for violators would tax every hot-path append with a full-batch
    * materialization. */
  def resolve(batch: DataFrame, ids0: DataFrame, idCol: String,
      tombstones: Option[DataFrame])(forceCompact: () => Unit)
      : (DataFrame, DataFrame, Seq[DataFrame]) =
    tombstones match {
      case None => (batch, ids0, Nil)
      case Some(ts) =>
        val ckIds = ids0.scratchCheckpoint()
        // from here ckIds pins blocks, and the caller's `finally` can only
        // release what resolve RETURNS — a throw anywhere in between (the
        // forced compaction, a full-index rewrite, is the failure-prone
        // step) must release them here or a retrying ingest loop
        // accumulates orphaned checkpoint blocks per failed heal
        try {
          if (!ckIds.join(broadcast(ts), Seq("id"), "left_semi").isEmpty) {
            forceCompact()
            // a batch that already IS a concrete checkpoint (the streaming
            // sinks hand their checkpointed frame straight in) replays the
            // same stored rows on every action — a second copy of it in
            // the block manager would buy zero determinism, so reuse it
            val preMaterialized = Bridge.isCheckpointBacked(batch)
            val ck = if (preMaterialized) batch else batch.scratchCheckpoint()
            Bridge.unpersistCheckpoint(ckIds) // superseded by the re-derivation
            (ck, ck.select(col(idCol).as("id")).distinct(),
              if (preMaterialized) Nil else Seq(ck))
          } else (batch, ckIds, Seq(ckIds))
        } catch {
          case t: Throwable => Bridge.unpersistCheckpoint(ckIds); throw t
        }
    }
}
