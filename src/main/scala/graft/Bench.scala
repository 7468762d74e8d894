package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Locale-independent fixed-point format: the f-interpolator uses the JVM
    * default locale, and a comma-decimal locale (de_DE) would emit invalid
    * JSON and break the driver's tail-parse. */
  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** A contamination threshold, overridable per host: system property
    * first (`-Dgraft.bench.<name>=`), then env (`GRAFT_BENCH_<NAME>`), then
    * the r7-calibrated default. The defaults were calibrated on the round-7
    * sandbox's host/storage (docs/evidence/bench_r7_*.json) and will
    * misclassify passes on a machine with a different idle load or write
    * pattern — the emitted JSON records the thresholds used so any
    * consumer can re-adjudicate from per_run. */
  private def threshold(name: String, default: Double): Double =
    sys.props.get(s"graft.bench.$name")
      .orElse(sys.env.get("GRAFT_BENCH_" + name.toUpperCase(java.util.Locale.ROOT)))
      .flatMap(_.toDoubleOption).getOrElse(default)

  /** One measured pass plus everything needed to adjudicate its window:
    * per-query seconds, the env-snapshot JSON fragment, the combined
    * contamination verdict (env flags OR the io-canary gate), both canary
    * readings, the io gate's own flag, and the canary's post-sync sector
    * delta. */
  private[graft] final case class Pass(
      q: Map[String, Double], env: String, dirty: Boolean,
      canary: Double, ioCanary: Double, ioFlagged: Boolean, ioWrDelta: Long)

  /** Headline min for one query, missing-key-safe: min over the usable
    * (clean) passes that measured it; a query present ONLY in excluded
    * passes (a clean-pass crash path, or a mid-run query-set change) falls
    * back to the min over every pass that has it rather than throwing —
    * the headline must survive exactly the pass-crash scenario
    * [[perQueryOutliers]]' key-union defends (r15 advice: the old direct
    * Map.apply here threw in that case). */
  private[graft] def headlineMin(
      usable: Seq[Map[String, Double]], all: Seq[Map[String, Double]],
      name: String): Double = {
    val vs = usable.flatMap(_.get(name))
    (if (vs.nonEmpty) vs else all.flatMap(_.get(name))).min
  }

  /** Per-query outlier detection over a run's passes: (passIdx, query,
    * ratio) for every pass/query time exceeding k× that query's minimum
    * across the run's passes AND at least `minExcessSec` above it. The env
    * flags (loadavg, sector writes) adjudicate the WINDOW; a transient I/O
    * stall that hits exactly one shuffle-heavy query can slip past all of
    * them (r13: q83 at 79 s inside a "clean" pass vs a 17 s sibling), so
    * the artifact names such queries itself. The absolute-excess floor
    * keeps sub-second queries — which jitter ×3 on a GC pause alone — out
    * of the flag; the min-over-passes headline already absorbs them.
    * Needs ≥ 2 passes: with one pass every query is its own minimum. */
  private[graft] def perQueryOutliers(
      perPass: Seq[Map[String, Double]], k: Double,
      minExcessSec: Double): Seq[(Int, String, Double)] =
    if (perPass.size < 2) Nil
    else {
      // mins over the UNION of all passes' keys: a query present only in a
      // later pass (a pass-1 crash path, or a mid-run query-set change)
      // would otherwise throw on mins(q) — the rest of this file defends
      // missing keys with flatMap(_.get(q)); keep that symmetric here
      val mins = perPass.flatMap(_.keys).distinct
        .map(q => q -> perPass.flatMap(_.get(q)).min).toMap
      for {
        (p, i) <- perPass.toSeq.zipWithIndex
        (q, v) <- p.toSeq.sortBy(_._1)
        m = mins(q)
        if v > k * m && v - m > minExcessSec
      } yield (i, q, v / m)
    }

  /** Fixed deterministic CPU canary: a single-threaded LCG+xorshift loop
    * with PINNED iteration count, timed. The sandbox's speed shifts
    * between rounds (r8 measured ×1.36 vs r7) and single-number totals are
    * ±30% between runs, so cross-round adjudication needs a unit of "this
    * host's CPU second" embedded in the artifact itself: the canary's
    * seconds scale with host slowness exactly like a pure-CPU query's, and
    * `sec / canary_sec` is a host-normalized query time comparable across
    * rounds. Iterations are a constant — never tuned per host — and the
    * result is folded into a sink check so the loop cannot be
    * dead-code-eliminated. Run min-of-2 after one warmup rep: the JIT
    * compiles the loop on rep 1, reps 2-3 measure steady state. */
  val CanaryIters = 400000000L

  private def canaryRep(): Double = {
    var h = 0x9E3779B97F4A7C15L
    var i = 0L
    val t0 = System.nanoTime()
    while (i < CanaryIters) {
      h = h * 6364136223846793005L + 1442695040888963407L
      h ^= (h >>> 33)
      i += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    if (h == 42L) System.err.println("canary sink") // defeat DCE; never true
    sec
  }

  private def canarySec(): Double = {
    canaryRep() // warmup: JIT-compile the loop
    math.min(canaryRep(), canaryRep())
  }

  /** Fixed-size I/O canary: write a pinned ~70 MB parquet table (2M rows,
    * an incompressible md5 payload), read it back through one shuffle
    * aggregate, report the seconds. Same rationale as the CPU canary but
    * for the dimension three rounds of drift adjudication could not see:
    * co-tenant I/O churn taxes parquet scan + shuffle work while the
    * CPU canary (and often loadavg) measure clean — r12–r14's "host"
    * verdicts all rested on per-query A/Bs plus a CPU-only unit. The
    * workload is pinned (row count, partitioning, payload) and runs
    * OUTSIDE every measured window — after the pass's closing env
    * snapshot — so its own ~140k written sectors never contaminate the
    * pass's write-delta flags. One rep per pass: unlike the JIT-sensitive
    * CPU loop there is no warmup cliff, and the per-pass sample IS the
    * signal (a storm that hits pass 2 should show in pass 2's number).
    *
    * Isolation against the page cache (r15 advice): the canary writes
    * under the REPO's `target/` — explicitly disk-backed — never
    * `java.io.tmpdir`, which on some hosts is tmpfs and would bypass
    * block devices entirely (override: `-Dgraft.bench.io_canary_dir=` /
    * `GRAFT_BENCH_IO_CANARY_DIR`). After cleanup a best-effort `sync`
    * flushes the canary's deferred writeback BEFORE the next pass's
    * opening diskstats snapshot (the canary's ~140k dirty sectors would
    * otherwise land inside that pass's wrDelta window, whose pass-2
    * threshold is only 250k), and the canary's own post-sync sector
    * delta is returned for the artifact so a reading can be adjudicated
    * against what it actually pushed to disk. */
  private def ioCanarySec(spark: SparkSession): (Double, Long) = {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Paths.get(sys.props.get("graft.bench.io_canary_dir")
      .orElse(sys.env.get("GRAFT_BENCH_IO_CANARY_DIR"))
      .getOrElse("target/io_canary"))
    java.nio.file.Files.createDirectories(base)
    val dir = java.nio.file.Files.createTempDirectory(base, "rep")
    val (_, _, wr0) = envSnapshot()
    val sec =
      try {
        val t = dir.resolve("t").toString
        val t0 = System.nanoTime()
        spark.range(0L, 2000000L, 1L, 8)
          .select(col("id"), pmod(col("id"), lit(9973L)).as("k"),
            md5(col("id").cast("string")).as("payload"))
          .write.mode("overwrite").parquet(t)
        val n = spark.read.parquet(t).groupBy("k").agg(count(lit(1)).as("c")).count()
        val s = (System.nanoTime() - t0) / 1e9
        if (n != 9973L) System.err.println(s"[bench] io canary unexpected key count: $n")
        s
      } finally {
        scala.util.Using(java.nio.file.Files.walk(dir)) { stream =>
          import scala.jdk.CollectionConverters._
          stream.iterator().asScala.toSeq.reverse.foreach(p =>
            try java.nio.file.Files.deleteIfExists(p) catch { case _: Throwable => () })
        }
        try new ProcessBuilder("sync").start().waitFor()
        catch { case _: Throwable => () }
      }
    val (_, _, wr1) = envSnapshot()
    (sec, wr1 - wr0)
  }

  /** One machine-environment snapshot: the 3 loadavg fields plus total
    * sectors read/written summed over physical block devices (loop/ram
    * excluded). Deltas across a pass make an environmentally contaminated
    * window — a co-tenant I/O storm inflating scan-heavy queries while
    * CPU-bound ones measure clean — adjudicable from the bench artifact
    * alone, with no re-run (this was needed in rounds 3, 4 and 5). */
  private def envSnapshot(): (String, Long, Long) = {
    def slurp(p: String): String =
      try new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
      catch { case _: Throwable => "" }
    val load = slurp("/proc/loadavg").trim.split("\\s+").take(3).mkString(" ")
    var rd = 0L; var wr = 0L
    slurp("/proc/diskstats").split("\n").foreach { line =>
      val t = line.trim.split("\\s+")
      // fields: major minor name reads .. sectors_read(6) .. sectors_written(10)
      // partitions double-count their parent device, but the sum is taken
      // identically before and after, so the DELTA stays a proportional
      // I/O-pressure signal — good enough to adjudicate a window
      if (t.length > 10 && !t(2).startsWith("loop") && !t(2).startsWith("ram")) {
        rd += t(5).toLong; wr += t(9).toLong
      }
    }
    (load, rd, wr)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.create(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    // warm up the session (codegen compiler, parquet reader, shuffle infra)
    // so the first measured query reports its own cost, not JVM init
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    // pre-build the IVF index (an offline artifact in production) so
    // q45's bench number reflects the probe path — against the persisted
    // list-partitioned layout, not a localCheckpoint — not the KMeans build
    graft.operators.Ann.persistedIvfCached(sfDir,
      Tables.load(spark, sfDir, "embeddings"), "vec_id", "embedding", nlist = 16)
    // two passes per query, report the min — bounds the localCheckpoint/GC
    // run-to-run variance (measured 35-57s spread on identical code) so the
    // number tracks the plan, not the JVM's mood. Both totals are recorded.
    def pass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val sec = (System.nanoTime() - t0) / 1e9
        // drop the query's localCheckpoint blocks NOW (outside its timing):
        // cleanup otherwise rides on GC-triggered weak refs (ContextCleaner),
        // so with a large heap dead blocks from 70 queries accumulate in the
        // block manager and later queries pay eviction churn (measured: q26
        // 10.5s -> 120s+ min-of-2 at -Xmx24g without this). No cross-query
        // cache may survive — q45 reads the disk-persisted IVF layout, and
        // the require below enforces that no query ever repopulates the
        // localCheckpoint-backed buildIvfCached (whose blocks this unpersist
        // would destroy, with lost-checkpoint errors later instead of a
        // recompute).
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        require(graft.operators.Ann.memIvfCacheEmpty,
          s"$name populated Ann.buildIvfCached: localCheckpoint-backed caches " +
            "must not cross bench queries (use persistedIvfCached)")
        name -> sec
      }
    def timedPass(passIdx: Int): Pass = {
      val canary = canarySec()
      val (load0, rd0, wr0) = envSnapshot()
      val r = pass().toMap
      val (load1, rd1, wr1) = envSnapshot()
      // SELF-ADJUDICATION: was this pass's window environmentally clean?
      // Calibrated from the six checked-in r7 sf0.1 runs
      // (docs/evidence/bench_r7_*.json): clean pass-1 1-min loadavg_before
      // 0.62-2.10 (the r7 driver's contaminated window started at 2.49);
      // clean self sector-writes ≈ 850 k (pass 1, scratch index builds)
      // vs ≈ 25-70 k (pass 2, everything already laid out). Pass 2's
      // loadavg_before is SELF-inflated by pass 1's 32-thread burst
      // (observed up to 4.59 in clean runs), so for pass 2 the write
      // delta — far above the pass's own write pattern means a co-tenant
      // I/O storm — is the only usable signal.
      val load1m = load0.split("\\s+").headOption.flatMap(_.toDoubleOption).getOrElse(0.0)
      val wrDelta = wr1 - wr0
      val envDirty =
        if (passIdx == 0) load1m > threshold("load1m_max", 2.25) ||
          wrDelta > threshold("pass1_wr_max", 1400000.0)
        else wrDelta > threshold("pass2_wr_max", 250000.0)
      // the I/O canary runs AFTER the closing snapshot: its writes land
      // between measured windows, not inside this pass's wrDelta. Since
      // r16 it is also a GATE, not just adjudication data: r15's nine
      // runs showed io_canary_sec — not loadavg, not wrDelta, not the CPU
      // canary — is the variable that tracks the totals (io 0.99–1.14 s
      // ⇒ 196–211u; io 1.18–1.28 s ⇒ 220–251u on identical code, CPU
      // canary flat at 0.85–0.91). A reading above io_canary_max flags
      // the pass the same way the env thresholds do — excluded from the
      // headline, retried — with the proviso that the canary samples the
      // window right AFTER the pass, so it is a storm-persistence proxy,
      // not an in-window measurement; the 1.3 s default is the boundary
      // the r15 artifacts drew between their fast and slow windows.
      val (ioCanary, ioWr) = ioCanarySec(spark)
      val ioFlagged = ioCanary > threshold("io_canary_max", 1.3)
      val dirty = envDirty || ioFlagged
      val env = s"""{"loadavg_before":"$load0","loadavg_after":"$load1"""" +
        s""","sectors_read_delta":${rd1 - rd0},"sectors_written_delta":$wrDelta""" +
        s""","canary_sec":${fmt(canary)},"io_canary_sec":${fmt(ioCanary)}""" +
        s""","io_canary_wr_delta":$ioWr,"io_flagged":$ioFlagged""" +
        s""","contaminated":$dirty}"""
      Pass(r, env, dirty, canary, ioCanary, ioFlagged, ioWr)
    }
    // RETRY-UNTIL-CLEAN: a contaminated pass is EXCLUDED from the min-of-N
    // headline (its numbers stay in per_run for adjudication) — and, new
    // in r13, it is also RETRIED: three rounds running, the single
    // driver-facing artifact landed on a co-tenant I/O storm while the
    // checked-in evidence runs prove clean windows exist on this host
    // within minutes. Keep running passes until TWO are clean or the
    // attempt budget is spent (each pass is minutes, so the budget bounds
    // a storm that outlives the bench at ~2× the clean wall time). Every
    // pass — clean or not — is recorded in the artifact's arrays.
    // clamped: the override can only EXTEND the budget — a 0/negative value
    // would run zero passes (passes.head throws), and 1 would silently turn
    // the min-of-2-clean headline into a single-pass number with no flag
    val maxPasses = math.max(2, threshold("max_passes", 4.0).toInt)
    val passes = scala.collection.mutable.ArrayBuffer.empty[Pass]
    while (passes.size < maxPasses && passes.count(p => !p.dirty) < 2) {
      val p = timedPass(passes.size)
      passes += p
      if (p.dirty && passes.size < maxPasses)
        System.err.println(s"[bench] pass ${passes.size} contaminated" +
          (if (p.ioFlagged) s" (io canary ${fmt(p.ioCanary)}s over gate)" else "") +
          s"; retrying (${passes.count(x => !x.dirty)}/2 clean, budget $maxPasses)")
    }
    val clean = passes.filterNot(_.dirty)
    val usable = if (clean.nonEmpty) clean else passes
    val use: String => Double =
      headlineMin(usable.map(_.q).toSeq, passes.map(_.q).toSeq, _)
    val nDirty = passes.count(_.dirty)
    // the per-query outlier sweep runs over ALL passes (clean or not): a
    // flagged query inside an env-clean pass is exactly the case the env
    // thresholds cannot see; inside a contaminated pass it just names the
    // victim. The headline already takes min-over-passes — this is the
    // artifact describing its own variance, not a correction.
    val outliers = perQueryOutliers(passes.map(_.q).toSeq,
      threshold("outlier_k", 3.0), threshold("outlier_min_excess_sec", 5.0))
    val outlierNote =
      if (outliers.isEmpty) ""
      else outliers.map { case (i, q, r) =>
        f"$q pass${i + 1} ×$r%.1f" }.mkString("; per-query outliers: ", ", ", "")
    val note =
      (if (clean.isEmpty) s"all ${passes.size} passes contaminated; min reported, unreliable"
       else if (nDirty > 0) s"$nDirty contaminated pass(es) excluded; " +
         s"headline is min over ${clean.size} clean pass(es)"
       else "clean") + outlierNote
    val results = passes.flatMap(_.q.keys).distinct.sorted.map { name =>
      val sec = use(name)
      val all = passes.map(_.q.get(name).map(v => f"$v%.2f").getOrElse("-")).mkString(" ")
      System.err.println(f"[bench] $name%-26s $sec%8.2fs  (passes: $all)")
      name -> sec
    }.toSeq
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // host-normalized per-query times: seconds divided by the best canary
    // rep of the run — "query time in canary units", comparable across
    // rounds on shifting sandbox hosts (a ×1.4 slower host inflates the
    // canary and the query alike, so the ratio holds still). The raw
    // numbers stay the headline; these are the cross-round signal.
    val canMin = passes.map(_.canary).min
    val qsNorm = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v / canMin) }
      .mkString("{", ",", "}")
    // per-run per-query values go INTO the JSON (not just stderr) so a
    // run-to-run anomaly on one query can be adjudicated from the artifact
    val runs = passes.map { p =>
      p.q.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
    }.mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val thresholds = s"""{"load1m_max":${fmt(threshold("load1m_max", 2.25))}""" +
      s""","pass1_wr_max":${fmt(threshold("pass1_wr_max", 1400000.0))}""" +
      s""","pass2_wr_max":${fmt(threshold("pass2_wr_max", 250000.0))}""" +
      s""","max_passes":$maxPasses""" +
      s""","outlier_k":${fmt(threshold("outlier_k", 3.0))}""" +
      s""","outlier_min_excess_sec":${fmt(threshold("outlier_min_excess_sec", 5.0))}""" +
      s""","io_canary_max":${fmt(threshold("io_canary_max", 1.3))}""" +
      s""","calibrated_on":"r7 sandbox host (docs/evidence/bench_r7_*.json); io gate r15 (docs/BENCH_NOTES_r15.md)"}"""
    val runTotals = passes.map(p => fmt(p.q.values.sum)).mkString("[", ",", "]")
    val contamArr = passes.map(_.dirty).mkString("[", ",", "]")
    val canaryArr = passes.map(p => fmt(p.canary)).mkString("[", ",", "]")
    val ioCanaryArr = passes.map(p => fmt(p.ioCanary)).mkString("[", ",", "]")
    val ioFlaggedArr = passes.map(_.ioFlagged).mkString("[", ",", "]")
    val ioWrArr = passes.map(_.ioWrDelta).mkString("[", ",", "]")
    val envArr = passes.map(_.env).mkString("[", ",", "]")
    val outliersJson = outliers.map { case (i, q, r) =>
      s"""{"pass":${i + 1},"query":"$q","ratio":${fmt(r)}}""" }.mkString("[", ",", "]")
    val json = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","runs":${passes.size},"clean_passes":${clean.size},"run_totals":$runTotals,"contaminated":$contamArr,"contamination_note":"$note","query_outliers":$outliersJson,"canary_sec":$canaryArr,"io_canary_sec":$ioCanaryArr,"io_flagged":$ioFlaggedArr,"io_canary_wr_delta":$ioWrArr,"canary_iters":$CanaryIters,"queries_per_canary":$qsNorm,"contamination_thresholds":$thresholds,"per_run":$runs,"env":$envArr}"""
    // stop Spark BEFORE emitting the JSON line, then quiesce both streams:
    // sbt reads stdout and stderr on separate threads and interleaves them
    // by arrival, so a JSON line printed while per-query stderr lines are
    // still queued can land mid-log and fall outside the captured tail
    // (this lost the round-3 bench line). Flush stderr first and pause so
    // the stdout JSON line is the last line of the combined log. The JSON
    // is emitted on stdout ONLY — a duplicate stderr copy would double-count
    // in any consumer that greps all JSON lines rather than taking the last.
    spark.stop()
    System.err.flush(); System.out.flush()
    Thread.sleep(2000)
    println(json)
    System.out.flush()
  }
}
