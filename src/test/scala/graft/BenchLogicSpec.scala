package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-logic specs for Bench.main's artifact aggregation — no Spark
  * session. The bench binary itself only runs under the driver, so the
  * pieces that decide what the artifact SAYS are pinned here. */
class BenchLogicSpec extends AnyFunSuite {

  test("perQueryOutliers flags the r13 q83 shape: one query stalls inside an env-clean pass") {
    // pass 1 clean-looking, pass 2 has q83 at 79.2s vs a 17.3s sibling —
    // the exact case the env thresholds missed in BENCH_r13.json
    val p1 = Map("q83" -> 17.3, "q84" -> 12.0, "q01" -> 0.4)
    val p2 = Map("q83" -> 79.2, "q84" -> 12.5, "q01" -> 0.5)
    val got = Bench.perQueryOutliers(Seq(p1, p2), k = 3.0, minExcessSec = 5.0)
    assert(got.map(t => (t._1, t._2)) === Seq((1, "q83")))
    assert(math.abs(got.head._3 - 79.2 / 17.3) < 1e-9)
  }

  test("perQueryOutliers ignores sub-threshold jitter and single-pass runs") {
    // a 0.2s query tripling on a GC pause is noise, not a stall: the
    // absolute-excess floor keeps it out even though the ratio is over k
    val p1 = Map("q01" -> 0.2, "q02" -> 10.0)
    val p2 = Map("q01" -> 0.9, "q02" -> 24.0) // q02 ×2.4 — under k
    assert(Bench.perQueryOutliers(Seq(p1, p2), 3.0, 5.0).isEmpty)
    // one pass: every query is its own minimum — nothing to compare against
    assert(Bench.perQueryOutliers(Seq(p2), 3.0, 5.0).isEmpty)
    assert(Bench.perQueryOutliers(Nil, 3.0, 5.0).isEmpty)
  }

  test("perQueryOutliers tolerates a query missing from pass 1 (mins over the key union)") {
    // a pass-1 crash path (or a mid-run query-set change) can leave a
    // query out of the first pass's map; mins built from pass 1's keys
    // alone threw NoSuchElementException on the later pass's entry
    val p1 = Map("qa" -> 1.0)
    val p2 = Map("qa" -> 1.1, "qb" -> 10.0)
    val p3 = Map("qa" -> 1.0, "qb" -> 60.0)
    val got = Bench.perQueryOutliers(Seq(p1, p2, p3), 3.0, 5.0)
    assert(got.map(t => (t._1, t._2)) === Seq((2, "qb")))
    assert(math.abs(got.head._3 - 6.0) < 1e-9)
  }

  test("perQueryOutliers can flag more than one pass and orders by pass then query") {
    val p1 = Map("qa" -> 50.0, "qb" -> 10.0)
    val p2 = Map("qa" -> 10.0, "qb" -> 40.0)
    val p3 = Map("qa" -> 11.0, "qb" -> 41.0)
    val got = Bench.perQueryOutliers(Seq(p1, p2, p3), 3.0, 5.0)
    assert(got.map(t => (t._1, t._2)) === Seq((0, "qa"), (1, "qb"), (2, "qb")))
  }

  test("headlineMin takes the min over clean passes and ignores dirty values") {
    val clean = Seq(Map("qa" -> 2.0, "qb" -> 5.0), Map("qa" -> 1.5, "qb" -> 6.0))
    val all = Map("qa" -> 0.1, "qb" -> 0.1) +: clean // dirty pass had faster times
    assert(Bench.headlineMin(clean, all, "qa") === 1.5)
    assert(Bench.headlineMin(clean, all, "qb") === 5.0)
  }

  test("headlineMin survives a query missing from a clean pass (the pass-1-crash shape)") {
    // the r15-advice scenario: pass 1 crashes mid-run so its map lacks a
    // query; the headline used direct Map.apply over pass-1 keys and threw
    val clean = Seq(Map("qa" -> 2.0), Map("qa" -> 2.1, "qb" -> 7.0))
    assert(Bench.headlineMin(clean, clean, "qb") === 7.0)
  }

  test("headlineMin falls back to dirty passes for a query only they measured") {
    // present in NO clean pass (clean-pass crash path): fall back to the
    // contaminated passes rather than min on an empty list
    val clean = Seq(Map("qa" -> 2.0))
    val all = clean :+ Map("qa" -> 2.5, "qb" -> 9.0)
    assert(Bench.headlineMin(clean, all, "qb") === 9.0)
  }

  test("dirtyFallbackQueries names exactly the queries headlineMin falls back on") {
    // qb is measured ONLY by the excluded pass — the artifact must name
    // it so its headline value is not read as a clean-window number
    val clean = Seq(Map("qa" -> 2.0), Map("qa" -> 2.1))
    val all = clean :+ Map("qa" -> 2.5, "qb" -> 9.0, "qc" -> 1.0)
    assert(Bench.dirtyFallbackQueries(clean, all) === Seq("qb", "qc"))
    // every query clean-measured -> nothing to name
    assert(Bench.dirtyFallbackQueries(all, all) === Nil)
    // the all-contaminated run passes usable == all passes: per-query
    // fallback is meaningless there (all_passes_contaminated carries the
    // verdict), and the helper naturally returns empty
    val dirtyOnly = Seq(Map("qa" -> 2.0, "qb" -> 3.0))
    assert(Bench.dirtyFallbackQueries(dirtyOnly, dirtyOnly) === Nil)
  }

  test("ioFlags: absolute ceiling flags a reading on any host") {
    // two clean readings, one over the 1.3s ceiling
    assert(Bench.ioFlags(Seq(1.0, 1.05, 1.45), 1.3, 1.25, 0.1) ===
      Seq(false, false, true))
  }

  test("ioFlags: relative bound self-calibrates on a faster-disk host") {
    // the r16 verdict's silent failure mode: on a host whose clean io
    // reads ~0.5s, a 0.8s storm pass sails under the 1.3s absolute
    // ceiling — the relative bound (1.25x the run's own under-ceiling
    // median) must flag it
    assert(Bench.ioFlags(Seq(0.50, 0.52, 0.80), 1.3, 1.25, 0.1) ===
      Seq(false, false, true))
    // and ordinary jitter within the band stays clean
    assert(Bench.ioFlags(Seq(0.50, 0.55, 0.60), 1.3, 1.25, 0.1) ===
      Seq(false, false, false))
  }

  test("ioFlags: a single reading is never relatively flagged (it is its own median)") {
    assert(Bench.ioFlags(Seq(0.9), 1.3, 1.25, 0.1) === Seq(false))
    assert(Bench.ioFlags(Seq(2.0), 1.3, 1.25, 0.1) === Seq(true)) // absolute still applies
    assert(Bench.ioFlags(Nil, 1.3, 1.25, 0.1) === Nil)
  }

  test("ioFlags: slower host where every reading tops the ceiling — all flagged, no crash") {
    // the reference pool (readings under the ceiling) is empty: the
    // median falls back to all readings rather than dividing by nothing;
    // the absolute ceiling flags every pass, and Bench.main then reports
    // all_passes_contaminated=true instead of a silent dirty headline
    assert(Bench.ioFlags(Seq(2.0, 2.1, 2.05), 1.3, 1.25, 0.1) ===
      Seq(true, true, true))
  }

  test("ioFlags: re-adjudication can flag an early pass once later evidence lowers the median") {
    // pass 1 reads 1.1s — clean alone; two later 0.6s readings reveal the
    // host's actual clean band and re-flag it (flags are re-derived over
    // the full list at every decision point, Pass stores no frozen flag)
    assert(Bench.ioFlags(Seq(1.1), 1.3, 1.25, 0.1) === Seq(false))
    assert(Bench.ioFlags(Seq(1.1, 0.6, 0.62), 1.3, 1.25, 0.1) ===
      Seq(true, false, false))
  }

  test("median: odd, even, and two-element lists") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) === 2.0)
    assert(Bench.median(Seq(4.0, 1.0, 2.0, 3.0)) === 2.5)
    assert(Bench.median(Seq(1.0, 2.0)) === 1.5)
    assert(Bench.median(Seq(7.0)) === 7.0)
  }

  test("ioFlags: absolute-excess floor keeps fast-host jitter out of the relative bound (r17 advice)") {
    // a fast-disk host with ~0.2s readings: 0.27 is x1.29 the median —
    // over the relative band — but only 0.06s of excess; without the
    // floor this ordinary jitter would burn the retry budget and could
    // report all_passes_contaminated on a clean host
    assert(Bench.ioFlags(Seq(0.20, 0.21, 0.27), 1.3, 1.25, 0.1) ===
      Seq(false, false, false))
    // same ratio with real excess (the r16-verdict slow-host shape,
    // scaled): still flagged — the floor only suppresses tiny excess
    assert(Bench.ioFlags(Seq(0.50, 0.52, 0.80), 1.3, 1.25, 0.1) ===
      Seq(false, false, true))
    // the absolute ceiling ignores the floor entirely
    assert(Bench.ioFlags(Seq(0.20, 1.35), 1.3, 1.25, 0.1) ===
      Seq(false, true))
  }

  test("ioFlagsLoo: flags the 2-pass dilution shape the in-pool median cannot (BENCH_NOTES_r17 run 5)") {
    // two under-ceiling readings, one x1.5 the other: the gate's in-pool
    // median is their midpoint (1.0), so 1.2 reads x1.2 — under relMax
    // 1.25, unflagged (a 2-pass storm must read >~1.67x its sibling to
    // trip the in-pool bound); leave-one-out compares directly against
    // the 0.8 sibling and trips at 1.4
    assert(Bench.ioFlags(Seq(0.8, 1.2), 1.3, 1.25, 0.1) ===
      Seq(false, false))
    assert(Bench.ioFlagsLoo(Seq(0.8, 1.2), 1.3, 1.4, 0.1) ===
      Seq(false, true))
  }

  test("ioFlagsLoo: threshold 1.4 spares the adjudicated-clean r16 x1.32 drift pair") {
    // the r16 campaign's run-wide-drift pass pair sits at x1.32 — clean
    // by adjudication; at the gate's 1.25 LOO would false-flag it, which
    // is exactly why the record-only threshold is 1.4 on this host's data
    assert(Bench.ioFlagsLoo(Seq(1.0, 1.32), 1.3, 1.4, 0.1) ===
      Seq(false, false))
  }

  test("ioFlagsLoo: no baseline cases — single reading, and siblings all over the ceiling") {
    // one reading: no OTHER reading to reference — never flagged
    assert(Bench.ioFlagsLoo(Seq(1.2), 1.3, 1.4, 0.1) === Seq(false))
    assert(Bench.ioFlagsLoo(Nil, 1.3, 1.4, 0.1) === Nil)
    // 0.9's every sibling is over the absolute ceiling — no under-ceiling
    // baseline, quiet; 2.0/2.1 are over the ceiling themselves and are
    // never LOO-flagged (ioFlags already owns them — the fields are
    // deliberately disjoint so io_rel_loo_flagged isolates the new signal)
    assert(Bench.ioFlagsLoo(Seq(0.9, 2.0, 2.1), 1.3, 1.4, 0.1) ===
      Seq(false, false, false))
    // excess floor applies to LOO too: x1.5 on a 0.1s-scale host is
    // 0.05s of excess — under the floor, unflagged
    assert(Bench.ioFlagsLoo(Seq(0.10, 0.15), 1.3, 1.4, 0.1) ===
      Seq(false, false))
  }

  test("ioSpreadFlagged: majority-contamination tell (r17 advice) — spread over the band flags the run") {
    // a storm inflating MOST readings while all stay under the 1.3s
    // ceiling raises the in-pool median to storm level (no per-reading
    // flag fires), but the clean minority drags the spread open
    assert(Bench.ioSpreadFlagged(Seq(0.9, 1.25, 1.28, 1.27), 1.3, 1.25, 0.1))
    // per-reading gate indeed blind here: median 1.26, 1.28/1.26 < 1.25x
    assert(Bench.ioFlags(Seq(0.9, 1.25, 1.28, 1.27), 1.3, 1.25, 0.1) ===
      Seq(false, false, false, false))
    // ordinary jitter: spread x1.18 (the observed clean band) — quiet
    assert(!Bench.ioSpreadFlagged(Seq(0.85, 0.95, 1.0), 1.3, 1.25, 0.1))
    // excess floor: wide RATIO on a fast host but 0.06s of spread — quiet
    assert(!Bench.ioSpreadFlagged(Seq(0.04, 0.10), 1.3, 1.25, 0.1))
    // under-ceiling pool smaller than 2: nothing to spread
    assert(!Bench.ioSpreadFlagged(Seq(0.9), 1.3, 1.25, 0.1))
    assert(!Bench.ioSpreadFlagged(Seq(2.0, 2.5), 1.3, 1.25, 0.1))
  }

  test("compactLine: headline fields present, no per-query payload, always under the driver's 2000-char tail") {
    val line = Bench.compactLine(215.337, "/root/testdata/sf0.1", 3, 2,
      allContaminated = false, fallbackQs = Nil, canaryMinSec = 0.852,
      ioReadings = Seq(1.012, 0.94, 1.418), ioSpreadFlagged = false,
      artifactPath = "target/bench_last.json")
    assert(line.length < 2000)
    assert(line.startsWith("{") && line.endsWith("}"))
    // the driver's contract fields plus every loud verdict
    Seq("\"metric\":\"total\"", "\"value\":215.337", "\"unit\":\"sec\"",
      "\"runs\":3", "\"clean_passes\":2",
      "\"all_passes_contaminated\":false", "\"dirty_fallback_count\":0",
      "\"dirty_fallback_queries\":[]", "\"canary_min_sec\":0.852",
      "\"io_band\":{\"min\":0.940,\"median\":1.012,\"max\":1.418}",
      "\"io_spread_flagged\":false",
      "\"artifact\":\"target/bench_last.json\"")
      .foreach(f => assert(line.contains(f), s"missing $f in $line"))
    // the ~10kB killers stay in the file: no per-query map, no per_run
    assert(!line.contains("\"queries\""))
    assert(!line.contains("\"per_run\""))
  }

  test("compactLine: pathological all-fallback run stays under the tail (list capped, count exact)") {
    // 92 long query names would alone overflow 2000 chars; the cap keeps
    // the loud verdict readable and the full list lives in the artifact
    val qs = (1 to 92).map(i => f"q$i%02d_some_rather_long_query_name")
    val line = Bench.compactLine(999.0, "/root/testdata/sf0.1", 4, 0,
      allContaminated = true, fallbackQs = qs, canaryMinSec = 0.9,
      ioReadings = Seq(2.0, 2.1, 2.2, 2.3), ioSpreadFlagged = false,
      artifactPath = "target/bench_last.json")
    assert(line.length < 2000)
    assert(line.contains("\"all_passes_contaminated\":true"))
    assert(line.contains("\"dirty_fallback_count\":92"))
    // exactly 8 names listed
    assert(line.split("q\\d\\d_some_rather_long_query_name").length - 1 === 8)
    // io band survives even when every reading is contaminated
    assert(line.contains("\"io_band\":{\"min\":2.000"))
  }

  test("compactLine: empty reading list yields a null io band, not a crash") {
    val line = Bench.compactLine(1.0, "sf", 0, 0, allContaminated = true,
      fallbackQs = Nil, canaryMinSec = 0.9, ioReadings = Nil,
      ioSpreadFlagged = false, artifactPath = "p")
    assert(line.contains("\"io_band\":null"))
  }
}
