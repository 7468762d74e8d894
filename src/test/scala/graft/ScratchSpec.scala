package graft

import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.graftx.Bridge

import graft.operators.Scratch

/** Pins [[Scratch]]'s thread-confined release contract — the property the
  * pre-r12 context-global `getPersistentRDDs` diff violated: one streaming
  * sink's per-batch cleanup could unpersist a CONCURRENT sink's in-flight
  * checkpoint, whose truncated lineage makes the loss unrecoverable. */
class ScratchSpec extends SparkSpec {

  // id-SET diffs, not size compares: suites share one session, and another
  // suite's unpersist(blocking = false) can land asynchronously mid-test
  private def persistedIds = spark.sparkContext.getPersistentRDDs.keySet

  test("a scope releases exactly its own registrations; unscoped frames are caller-managed") {
    val before = persistedIds
    val unscoped = Scratch.checkpoint(spark.range(5).toDF)
    assert((persistedIds -- before).size === 1)
    Scratch.scoped {
      Scratch.checkpoint(spark.range(7).toDF)
      assert((persistedIds -- before).size === 2)
    }
    // the scope released its frame; the unscoped one is untouched
    assert((persistedIds -- before).size === 1)
    assert(unscoped.count() === 5) // and still usable
    Bridge.unpersistCheckpoint(unscoped)
    assert((persistedIds -- before).isEmpty)
  }

  test("scopes nest: the inner scope releases its own frames at its own exit") {
    val before = persistedIds
    Scratch.scoped {
      val outer = Scratch.checkpoint(spark.range(3).toDF)
      Scratch.scoped {
        Scratch.checkpoint(spark.range(4).toDF)
        assert((persistedIds -- before).size === 2)
      }
      assert((persistedIds -- before).size === 1) // inner frame gone
      assert(outer.count() === 3) // outer frame must have survived
    }
    assert((persistedIds -- before).isEmpty)
  }

  test("a concurrent scope on another thread cannot destroy this sink's in-flight checkpoint") {
    // the exact interleaving that killed a query under the global diff:
    // sink B checkpoints mid-batch; sink A's batch finishes and sweeps;
    // B then acts on its frame — with truncated lineage, a swept frame
    // would throw, not recompute
    val bCheckpointed = new CountDownLatch(1)
    val aSwept = new CountDownLatch(1)
    @volatile var bFailure: Throwable = null
    val sinkB = new Thread(() => {
      try Scratch.scoped {
        val frame = Scratch.checkpoint(spark.range(100).toDF)
        bCheckpointed.countDown()
        aSwept.await() // sink A's scope has exited (and swept) by now
        assert(frame.count() === 100) // the old sweep made this throw
      } catch { case t: Throwable => bFailure = t }
    })
    val sinkA = new Thread(() => {
      Scratch.scoped {
        bCheckpointed.await() // B's frame is live inside A's scope window
        Scratch.checkpoint(spark.range(10).toDF)
      }
      aSwept.countDown()
    })
    sinkB.start(); sinkA.start()
    sinkB.join(60000); sinkA.join(60000)
    assert(bFailure == null, s"concurrent scope destroyed a live checkpoint: $bFailure")
  }
}
