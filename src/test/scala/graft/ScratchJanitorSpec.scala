package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Startup reaping of scratch trees left by dead processes (the shutdown
  * hook covers clean exits only). */
class ScratchJanitorSpec extends AnyFunSuite {

  test("reapStale deletes dead-pid graft trees, keeps live ones and foreign names") {
    val tmp = Files.createTempDirectory("graft_reap_test").toFile
    val self = ProcessHandle.current().pid()
    // a pid that cannot be alive: above the kernel's pid_max (2^22) but a
    // valid Long suffix
    val dead = new java.io.File(tmp, "graft_q99_sf0.01_99999999")
    val live = new java.io.File(tmp, s"graft_q99_sf0.01_$self")
    val foreign = new java.io.File(tmp, "graft_no_pid_suffix")
    val unrelated = new java.io.File(tmp, "somethingelse_12345")
    Seq(dead, live, foreign, unrelated).foreach { d =>
      assert(d.mkdirs()); assert(new java.io.File(d, "part-0000").createNewFile())
    }
    val n = ScratchJanitor.reapStale(tmp)
    assert(n === 1)
    assert(!dead.exists(), "dead-pid tree should be reaped")
    assert(live.exists(), "own-pid tree must survive")
    assert(foreign.exists(), "no parseable pid suffix -> untouched")
    assert(unrelated.exists(), "non-graft entries untouched")
  }
}
