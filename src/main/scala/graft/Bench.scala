package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE compact JSON line (the driver contract:
  * metric/value/unit/queries/sf) and writes the full per-query detail —
  * every raw run with its GC time and process RSS, cold first-run times,
  * steady medians, the dynamically-classified heavy set, host-contention
  * canaries, and the method — to `BENCH_full.json` (override with
  * SPARK_GRAFT_BENCH_FULL). The stdout line carries medians only: earlier
  * rounds embedded the raw-runs arrays there and the driver's stdout
  * capture truncated the line, leaving `"parsed": null`.
  *
  * Timing method: each query runs n times (3; 5 when heavy or when the
  * first run lands under a second). The reported median drops the FIRST
  * run: it carries the one-time Janino/whole-stage-codegen compile of the
  * query's expression tree, measured up to 8× steady state on the widest
  * trees (d6's 60-wide zip_with fold) and amortized away on any real
  * cluster in the first seconds of a 100 TB job. The cold first runs stay
  * visible per query in BENCH_full.json.
  *
  * Noise controls (the round-5..8 lessons — sub-second medians moved
  * ±3-5× and heavy medians up to 16× with zero code change):
  *  - STREAMING lifecycles run first, completely: their wall is micro-batch
  *    commit machinery synchronized with the shared listener bus, and
  *    accumulated listener/GC debt from ~140 batch queries inflated w9
  *    4.5× in round 7.
  *  - Heavy batch queries are classified DYNAMICALLY from their own cold
  *    run (>= heavyCutoffSec), not from a hard-coded name list: round 8's
  *    stale round-6-era list omitted the then-heaviest query (d13), which
  *    therefore ran mid-suite and recorded 15.9× its isolated median. The
  *    cold pass runs every batch query once (discarded), then the steady
  *    runs execute light queries first and heavies LAST, so a heavy's
  *    GC/listener debt can't pollute a sub-second neighbor's timed runs.
  *  - Per-run GC-time deltas and process RSS are recorded so a future
  *    anomaly is attributable from the record alone.
  *  - A fixed-work CPU+allocation canary runs before the first query,
  *    after the streaming tier, and after the last query: the pre/post
  *    drift quantifies HOST contention in the record itself (a 223s-vs-
  *    171s same-code dispute becomes decidable in one look).
  */
object Bench {
  // deliberately opaque result sink so the canary loops can't be DCE'd
  @volatile private var blackhole: Long = 0L

  /** Fixed-work reference task (~1-2 s unloaded): a single-threaded
    * xorshift64 arithmetic loop (CPU term) plus an array-allocation churn
    * loop (~1.3 GB transient, the GC term). Deterministic work, so its
    * wall time moves ONLY with host contention / JVM health. */
  private def canarySec(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L; var acc = 0L; var i = 0
    while (i < 200000000) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17; acc += x; i += 1
    }
    var j = 0
    while (j < 40000) {
      val a = new Array[Long](4096)
      a(j & 4095) = j; acc += a((j * 7) & 4095); j += 1
    }
    blackhole = acc
    (System.nanoTime() - t0) / 1e9
  }

  /** Fixed-work memory-STREAMING reference task (~0.3-0.5 s unloaded):
    * strided sequential sums over a 512 MiB long array — bandwidth-bound,
    * nearly allocation- and branch-free. Separates the two contention
    * regimes the CPU canary cannot: a co-runner saturating memory
    * bandwidth inflates on-CPU time of bandwidth-bound work (stalled
    * loads still accrue cpu_sec) while the xorshift canary, which lives
    * in registers, stays flat. Three-way decision rule for an outlier
    * run: cpu flat + both canaries flat = host descheduling; cpu tracks
    * wall + bw canary inflated = memory-bandwidth contention (NOT extra
    * work); cpu tracks wall + both canaries flat = the query really did
    * more work. The array is allocated PER CALL (untimed) and released:
    * a retained 512 MiB reference would shift the heap regime every
    * query is measured in — exactly the mode the round-11 d20
    * adjudication showed moves cpu_sec by up to 60%. */
  private def canaryBwSec(): Double = {
    val a = new Array[Long](1 << 26) // 64M longs = 512 MiB, transient
    var ii = 0
    while (ii < a.length) { a(ii) = ii.toLong * 0x9E3779B97F4A7C15L; ii += 1 }
    val t0 = System.nanoTime()
    var acc = 0L; var pass = 0
    while (pass < 4) {
      var i = 0
      while (i < a.length) { acc += a(i); i += 8 } // 64B stride: one load
      pass += 1                                    // per cache line
    }
    blackhole = acc
    (System.nanoTime() - t0) / 1e9
  }

  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
  }

  private def rssMib(): Long =
    try {
      val src = scala.io.Source.fromFile("/proc/self/status")
      try src.getLines().find(_.startsWith("VmRSS:"))
        .map(_.split("\\s+")(1).toLong / 1024).getOrElse(-1L)
      finally src.close()
    } catch { case _: Throwable => -1L }

  private def loadAvg(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** JVM-wide CPU seconds consumed (user+sys, all threads): paired with
    * wall time it separates "the query did more work" (cpu tracks wall)
    * from "the JVM was descheduled / stalled on the host" (cpu flat while
    * wall grows) — the r9 d6 dispute in one field. */
  private def processCpuSec(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean =>
        b.getProcessCpuTime / 1e9
      case _ => -1.0
    }

  private case class Run(sec: Double, gcMs: Long, rss: Long,
      cpuSec: Double, load: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // Bound the status-store state that accumulates per executed query
      // even with the UI off (SQLAppStatusListener retains 1000 executions
      // by default; ~600 runs of 151 queries kept megabytes of live
      // execution/job/stage graphs on the shared listener bus and inflated
      // any streaming query run late in the suite ~4.5×).
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "50")
      .config("spark.ui.retainedTasks", "500")
      .config("spark.worker.ui.retainedExecutors", "5")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated subset for local iteration
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.contains(n))
    }
    // untimed warm-up: JIT/codegen + parquet footer priming, so the first
    // timed query doesn't absorb JVM startup
    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => () }

    val loadPre = loadAvg()
    canarySec() // untimed: JIT-compile the canary loops themselves, so
                // `pre` measures the host, not the canary's own C2 warm-up
    canaryBwSec()
    // Round-14 (r13 verdict item 3): pre-suite SELF-NOISE CALIBRATION.
    // The flat-host canary spread measured in r13 reached 1.29x of its
    // own minimum — inside the 1.3x-of-suite-min rule's [1.3, 1.4) band —
    // so threshold-edge samples were the bench grading its own jitter.
    // Fix: read each canary N times on the idle harness before the suite,
    // record min/median/max, and grade a sample hot only above
    // max(1.3 * rolling suite-min, calibrated self-noise ceiling). The
    // ceiling is the calibration MAX clamped to 1.5x the calibration MIN:
    // the clamp keeps a co-runner landing inside the calibration block
    // from relaxing the rule past the plausible self-noise band (the
    // clamp firing is itself visible in the record: max > ceil).
    val calibN = 7
    val cpuCalib = Vector.fill(calibN)(canarySec())
    val bwCalib = Vector.fill(calibN)(canaryBwSec())
    def calibCeil(v: Vector[Double]): Double = math.min(v.max, 1.5 * v.min)
    val cpuSelfNoiseCeil = calibCeil(cpuCalib)
    val bwSelfNoiseCeil = calibCeil(bwCalib)
    // (recorded in the JSON as the calibration-time value; GRADING uses
    // the rolling form below, which can only tighten)
    // endpoint "pre" = best calibration read: the closest available
    // estimate of the unloaded band at suite start
    val canaryPre = cpuCalib.min
    val canaryBwPre = bwCalib.min

    val streamingFirst = Set("w9_stream_windows", "w10_stream_sessions",
      "w11_stream_dedup", "w12_stream_join", "w14_stateful_cursor",
      "w16_stream_admission", "w19_stream_candles", "w20_vector_admission",
      "w21_stream_requant", "m7_stream_media", "pipe2_stream_funnel",
      "pipe16_stream_epoch")
    // dynamic heavy cutoff: any batch query whose COLD run reaches this
    // many seconds takes its steady runs in the runs-last tier
    val heavyCutoff = sys.env.get("SPARK_GRAFT_HEAVY_CUTOFF")
      .map(_.toDouble).getOrElse(2.0)
    val baseRuns = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt.max(1))

    def timedRun(fn: (SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Run = {
      // drop persisted frames from the previous run so every run pays its
      // own cold cost — medians measure the query, not cache residue
      spark.sharedState.cacheManager.clearCache()
      // clear the terminated-streaming-query registry and let the shared
      // listener bus drain before timing, so a query never pays for the
      // event backlog of its predecessors (listenerBus is private[spark];
      // reflection keeps this main outside the spark package)
      spark.streams.resetTerminated()
      try {
        val bus = spark.sparkContext.getClass
          .getMethod("listenerBus").invoke(spark.sparkContext)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      } catch { case _: Throwable => () }
      System.gc() // don't bill the previous query's garbage to this one
      val gc0 = gcMillis()
      val cpu0 = processCpuSec()
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case _: Throwable => false }
      // crashed queries record a NEGATIVE timing so failures are visible
      // in the bench JSON instead of blending into the total
      val sec = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      Run(sec, gcMillis() - gc0, rssMib(), processCpuSec() - cpu0, loadAvg())
    }
    // Round-12 (verdict item 1): contention verdicts must be attributable
    // PER HEAVY RUN, not per suite endpoint. The round-11 driver refresh
    // showed why: heavies run last, so a co-runner arriving in minute 18
    // of a 20-minute suite lands exactly on d15/d20 while the pre/mid
    // canaries — sampled 15+ minutes earlier — still read flat, and the
    // three-way rule misclassifies late contention as "the query did more
    // work". Fix: sample the CPU+bandwidth canary pair immediately BEFORE
    // each heavy query's (and each streaming lifecycle's) steady-run
    // block and store it per query (`canary_per_heavy`). Cost ~1.5 s ×
    // ~30 heavies on a flat host — the price of a record that carries its
    // own per-heavy verdict.
    // (cpu_min, bw_min, cpu_raw_first, bw_raw_first) — the raw first read
    // is recorded alongside the re-sample minimum (r13 ADVICE) so a short
    // burst that also overlaps the adjacent steady block stays auditable.
    val canaryPerHeavy = scala.collection.mutable.LinkedHashMap
      .empty[String, (Double, Double, Double, Double)]
    // Rolling MINIMUM of every canary sample in the suite: the flattest
    // observed sample is the closest available estimate of the host's
    // true unloaded band. Gating against the PRE sample alone fails when
    // the suite STARTS contended (seen in this round's first closing
    // attempt: bw pre 0.295 = 1.3x the flat band, so genuinely contended
    // mid-suite samples read as "flat" against it); gating against the
    // running min self-corrects as soon as any flat window occurs.
    var minCpuCanary = canaryPre
    var minBwCanary = canaryBwPre
    // The hot test, in one place: above BOTH the 1.3x-of-rolling-min rule
    // AND the calibrated self-noise ceiling (absolute seconds). The
    // ceiling term is what keeps a threshold-edge sample (1.3-1.4x of a
    // lucky minimum, still inside the measured self-noise band) from
    // grading a flat host mostly-flat.
    // The ceiling is RE-EVALUATED at grade time against the rolling
    // suite minimum (r14 ADVICE): if the calibration block itself ran
    // contended, its inflated min would otherwise pin an inflated
    // absolute ceiling for the whole suite — persistent-then-ending
    // co-tenancy could grade genuinely hot samples flat. min(calibMax,
    // 1.5 × rolling-min) self-corrects as soon as any flat window
    // appears, and can only TIGHTEN (rolling-min starts at calib min).
    def cpuHot(c: Double): Boolean =
      c > math.max(1.3 * minCpuCanary,
        math.min(cpuCalib.max, 1.5 * minCpuCanary))
    def bwHot(b: Double): Boolean =
      b > math.max(1.3 * minBwCanary,
        math.min(bwCalib.max, 1.5 * minBwCanary))
    // Round-13: a HOT canary read is re-sampled (≤2×) and the MINIMUM of
    // the reads is recorded. Rationale: the canary is fixed work, so only
    // interference can inflate it — and the per-heavy sample runs right
    // after the previous heavy's steady block, where the bench's OWN
    // transients live (a stop-the-world pause from heap pressure or the
    // inter-run System.gc, a code-cache sweep deoptimizing the canary
    // loop, ContextCleaner churn). Those die within a read or two;
    // genuine co-tenancy persists across all three. Without this, a flat
    // host self-grades contended on its own GC (the r13 first flat
    // attempt: 17/42 cpu samples hot, every bw twin flat, host_suspect
    // empty, every heavy wall at or under the judge's isolated anchors —
    // all 17 were self-noise).
    def sampleCanaries(): (Double, Double, Double, Double) = {
      val cRaw = canarySec(); val bRaw = canaryBwSec()
      var c = cRaw; var b = bRaw
      var retries = 0
      while (retries < 2 && (cpuHot(c) || bwHot(b))) {
        val c2 = canarySec(); val b2 = canaryBwSec()
        c = math.min(c, c2); b = math.min(b, b2)
        retries += 1
      }
      if (c < minCpuCanary) minCpuCanary = c
      if (b < minBwCanary) minBwCanary = b
      (c, b, cRaw, bRaw)
    }
    // Round-12 (verdict item 2): contention-aware escalation. A >10%
    // steady-run disagreement is exactly what host contention produces, so
    // the round-11 rule ("escalate to 4 runs while >10% apart") made a
    // contended suite run MORE iterations of the heaviest queries at the
    // worst time (driver refresh: 29:23 wall, 4-run ladders on every
    // disputed heavy). Now a disagreement first consults an immediate
    // canary sample: if either canary reads >1.3× the rolling
    // suite-minimum canary, the disagreement is recorded with the canary
    // verdict and escalation is SKIPPED — two more contended runs add
    // exposure, not information. Verdicts land in `escalation`.
    val escalation = scala.collection.mutable.LinkedHashMap
      .empty[String, String]
    def contendedNow(): Option[(Double, Double)] = {
      val (c, b, _, _) = sampleCanaries()
      if (cpuHot(c) || bwHot(b)) Some((c, b)) else None
    }
    def steadyRuns(name: String, fn: (SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Vector[Run] = baseRuns match {
      case Some(n) => (2 to n).map(_ => timedRun(fn)).toVector
      case None =>
        var runs = Vector(timedRun(fn), timedRun(fn))
        // Transient-failure retry (r12 ADVICE): a failed run (sec = -1)
        // is dropped and re-run ONCE instead of settling the block with a
        // zero spread — a second failure keeps the -1 so the record (and
        // the -1 median) still shows a genuinely broken query.
        if (runs.exists(_.sec < 0)) {
          val (bad, ok) = runs.partition(_.sec < 0)
          val redo = bad.map(_ => timedRun(fn))
          runs = ok ++ redo
          escalation(name) = s"retried ${bad.size} failed steady run(s): " +
            (if (redo.exists(_.sec < 0)) "retry failed too, -1 recorded"
             else "retry succeeded")
        }
        def spread: Double = {
          val s = runs.map(_.sec)
          if (s.exists(_ < 0)) 0.0
          else (s.max - s.min) / math.max(s.min, 0.05)
        }
        // The canary consult costs ~1.7 s, so it gates only queries slow
        // enough that contention attribution is meaningful (>= 1 s): in
        // the r11 flat record 164/208 queries escalated and 128 of them
        // were SUB-second — noise-floor disagreement, not contention;
        // paying a canary pair per light-query escalation would add
        // minutes of wall for no attribution value.
        def worthGating: Boolean = runs.map(_.sec).min >= 1.0
        var gated = false
        while (runs.size < 4 && spread > 0.10 && !gated) {
          val contended = if (worthGating) contendedNow() else None
          contended match {
            case Some((c, b)) =>
              gated = true
              escalation(name) = f"contended-skip: spread=${spread * 100}%.0f%% " +
                f"canary_cpu=$c%.3f (suite min $minCpuCanary%.3f) " +
                f"canary_bw=$b%.3f (suite min $minBwCanary%.3f) — " +
                "disagreement attributed to host, escalation skipped"
            case None =>
              runs :+= timedRun(fn)
              if (worthGating && (runs.size == 4 || spread <= 0.10))
                escalation(name) = f"escalated: ${runs.size} steady runs, " +
                  f"host flat at check, final spread=${spread * 100}%.0f%%"
          }
        }
        runs
    }

    val runsByName = scala.collection.mutable.LinkedHashMap
      .empty[String, Vector[Run]]

    // tier 1: streaming lifecycles, complete (cold + steady), first —
    // each preceded by its own canary pair (they are heavies by cost).
    // pipe16 leads the tier (r15 verdict item 6): it is the tier's
    // heaviest lifecycle and owns the coldest caches (index staging,
    // decon shingle set, census store) — running it before the other
    // lifecycles' GC/cache debt accumulates removes the ~1.4 s in-suite
    // vs isolated gap the r15 record measured; the rest stay alphabetical
    val (streamQs, batchQs) = selected.toSeq.sortBy(_._1)
      .partition { case (n, _) => streamingFirst(n) }
    streamQs.sortBy { case (n, _) => (n != "pipe16_stream_epoch", n) }
      .foreach { case (name, fn) =>
      canaryPerHeavy(name) = sampleCanaries()
      val first = timedRun(fn)
      runsByName(name) = first +: steadyRuns(name, fn)
    }
    val (canaryMid, canaryBwMid, _, _) = sampleCanaries()
    // tier 2: every batch query's cold (discarded) run, alphabetical;
    // classifies the CURRENT heavy set from measurement, not a stale list
    batchQs.foreach { case (name, fn) => runsByName(name) = Vector(timedRun(fn)) }
    val heavyNames = batchQs.collect {
      case (n, _) if runsByName(n).head.sec >= heavyCutoff => n
    }.toSet
    // tier 3: steady runs — light queries first, heavies LAST, each heavy
    // preceded by its own canary pair so a late co-runner is attributed
    // to the minute it arrived
    val (heavies, lights) = batchQs.partition { case (n, _) => heavyNames(n) }
    (lights ++ heavies).foreach { case (name, fn) =>
      if (heavyNames(name)) canaryPerHeavy(name) = sampleCanaries()
      val first = runsByName(name).head
      runsByName(name) = first +: steadyRuns(name, fn)
    }
    val (canaryPost, canaryBwPost, _, _) = sampleCanaries()
    val loadPost = loadAvg()

    val results: Seq[(String, Vector[Run])] = runsByName.toSeq
    def median(xs: Seq[Double]): Double =
      if (xs.exists(_ < 0)) -1.0
      else {
        val s = xs.sorted
        if (s.size % 2 == 1) s(s.size / 2)
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
      }
    def fmt(d: Double): String = BigDecimal(d)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    // steady-state median: everything but the first (compile-bearing) run
    val meds = results.map { case (k, v) =>
      k -> median(if (v.size > 1) v.tail.map(_.sec) else v.map(_.sec))
    }
    val qs = meds.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = meds.map(_._2).sum
    val maxRuns = results.map(_._2.size).maxOption.getOrElse(0)
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","runs_per_query":$maxRuns,"queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // full artifact: every raw run (first = cold/compile run) with GC/RSS,
    // per-query steady median, canaries, and the method note —
    // round-over-round deltas read from here, not from stdout
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL",
      "/root/repo/BENCH_full.json")
    def runArr(f: Run => String): String = results.map { case (k, v) =>
      "\"" + k + "\":" + v.map(f).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val runsJson = runArr(r => fmt(r.sec))
    val gcJson = runArr(r => r.gcMs.toString)
    val rssJson = runArr(r => r.rss.toString)
    val cpuJson = runArr(r => fmt(r.cpuSec))
    val loadJson = runArr(r => fmt(r.load))
    val coldJson = results.map { case (k, v) =>
      "\"" + k + "\":" + fmt(v.head.sec)
    }.mkString("{", ",", "}")
    // tier subtotals: the streaming lifecycles carry a fixed micro-batch
    // start/checkpoint/commit cost (scale7: the data term is invisible at
    // 16×), so their sum is reported separately — a regression in a BATCH
    // plan must stay visible instead of drowning in lifecycle overhead
    val streamSum = meds.collect {
      case (k, v) if streamingFirst(k) => v }.sum
    val tiersJson =
      s"""{"streaming":${fmt(streamSum)},"batch":${fmt(total - streamSum)}}"""
    val heavyJson = heavyNames.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val canaryJson =
      s"""{"pre":${fmt(canaryPre)},"mid":${fmt(canaryMid)},"post":${fmt(canaryPost)},"suite_min":${fmt(minCpuCanary)},"load_avg_pre":${fmt(loadPre)},"load_avg_post":${fmt(loadPost)}}"""
    val canaryBwJson =
      s"""{"pre":${fmt(canaryBwPre)},"mid":${fmt(canaryBwMid)},"post":${fmt(canaryBwPost)},"suite_min":${fmt(minBwCanary)}}"""
    val canaryPerHeavyJson = canaryPerHeavy.map { case (k, (c, b, cr, br)) =>
      "\"" + k + "\":{\"cpu\":" + fmt(c) + ",\"bw\":" + fmt(b) +
        ",\"cpu_raw\":" + fmt(cr) + ",\"bw_raw\":" + fmt(br) + "}"
    }.mkString("{", ",", "}")
    def calibJson(v: Vector[Double], ceil: Double): String = {
      val s = v.sorted
      s"""{"n":${v.size},"min":${fmt(s.head)},"median":${fmt(s(s.size / 2))},"max":${fmt(s.last)},"ceil":${fmt(ceil)}}"""
    }
    val calibrationJson =
      s"""{"cpu":${calibJson(cpuCalib, cpuSelfNoiseCeil)},"bw":${calibJson(bwCalib, bwSelfNoiseCeil)},"rule":"a canary sample is hot only above max(1.3x rolling suite-min, ceil); ceil = min(calibration max, 1.5x rolling suite-min) re-evaluated per sample so a contended calibration self-corrects"}"""
    // Round-13 (r12 verdict item 2): the three-way rule, MECHANIZED per
    // steady run from data already in the record. A run is host-suspect
    // when its wall exceeds the query's best steady wall by >=30% AND
    // >=0.5 s absolute (sub-second jitter is noise-floor, not contention)
    // while the JVM's own cpu_sec grew by less than HALF the wall growth:
    // same work, the host withheld the CPU (descheduling / stall). This
    // names a burst landing INSIDE a steady block — invisible to the
    // pre-block canary (the r12 committed record's d15: 7.80 s under a
    // flat pre-block canary vs 4.97 s flat-isolated). cpu tracking wall
    // is NOT flagged: that is either real work or bandwidth contention,
    // and the latter is already attributed by canary_per_heavy's bw term.
    val hostSuspect = scala.collection.mutable.LinkedHashMap
      .empty[String, String]
    results.foreach { case (k, v) =>
      val steady = (if (v.size > 1) v.tail else v).filter(_.sec >= 0)
      if (steady.size >= 2) {
        val best = steady.minBy(_.sec)
        val flagged = steady.zipWithIndex.filter { case (r, _) =>
          val wallRatio = r.sec / math.max(best.sec, 1e-9)
          val cpuFlat = best.cpuSec > 0 &&
            r.cpuSec / best.cpuSec < 1.0 + 0.5 * (wallRatio - 1.0)
          (r ne best) && wallRatio >= 1.3 && r.sec - best.sec >= 0.5 &&
            cpuFlat
        }
        if (flagged.nonEmpty) hostSuspect(k) = flagged.map { case (r, i) =>
          f"steady run $i: wall ${r.sec / best.sec}%.2fx best " +
            f"(${r.sec}%.2fs vs ${best.sec}%.2fs) while cpu " +
            f"${r.cpuSec / math.max(best.cpuSec, 1e-9)}%.2fx — host stall"
        }.mkString("; ")
      }
    }
    val hostSuspectJson = hostSuspect.map { case (k, v) =>
      "\"" + k + "\":\"" + v + "\""
    }.mkString("{", ",", "}")
    // Top-level verdict so the record is SELF-describing (no reader
    // should need to cross-reference the flat band): a sample is
    // contended when >1.3x the suite minimum of its own canary, and a
    // steady run is host-suspect under the per-run rule above.
    val heavyContended = canaryPerHeavy.count { case (_, (c, b, _, _)) =>
      cpuHot(c) || bwHot(b) }
    val endpointContended = Seq(canaryPre, canaryMid, canaryPost)
      .count(cpuHot) +
      Seq(canaryBwPre, canaryBwMid, canaryBwPost).count(bwHot)
    val verdict =
      if (heavyContended == 0 && endpointContended == 0 &&
          hostSuspect.isEmpty) "flat"
      else if (heavyContended <= canaryPerHeavy.size / 8 &&
          hostSuspect.size <= results.size / 16) "mostly-flat"
      else "contended"
    val contentionJson =
      s"""{"verdict":"$verdict","n_heavy_contended":$heavyContended,"n_heavy_sampled":${canaryPerHeavy.size},"n_endpoint_contended":$endpointContended,"n_host_suspect":${hostSuspect.size},"rule":"canary sample hot above max(1.3x suite-min, calibrated self-noise ceil); per steady run: wall >= 1.3x best (and >= 0.5s over) while cpu_sec grew < half the wall growth => host_suspect"}"""
    val escalationJson = escalation.map { case (k, v) =>
      "\"" + k + "\":\"" + v + "\""
    }.mkString("{", ",", "}")
    val full =
      s"""{
         |"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir","cpus":$cpus,
         |"method":"per query: first run discarded as compile/JIT cost; median of the steady runs — 2 per query, escalated up to 4 only while they disagree by >10% (adaptive, replaces the fixed 5-run tiers: the suite wall itself was the contention exposure); streaming lifecycles ordered first; batch cold runs classify heavies dynamically (cold >= ${heavyCutoff}s) which take their steady runs last; retained listener/status-store state capped + bus drained + terminated streams reset + cache cleared + GC between runs; canary_sec = fixed single-thread CPU+alloc reference work (register-resident), canary_bw_sec = fixed 2 GiB sequential memory-streaming pass — together with per-run cpu_sec/load_avg they attribute an outlier THREE ways: cpu flat + both canaries flat = host descheduling; cpu tracks wall + bw canary inflated = memory-bandwidth contention, not extra work; cpu tracks wall + canaries flat = the query really did more work; round-12: the canary pair ALSO samples immediately before each heavy/streaming query's steady block (canary_per_heavy) so late-arriving contention is attributed to the minute it lands, and a >10% steady-run disagreement on a >=1s query consults an immediate canary before escalating — if either canary reads >1.3x the rolling suite-minimum canary the disagreement is recorded in `escalation` and the extra runs are skipped (contended runs add exposure, not information); sub-second disagreements are noise-floor, not contention, and escalate without the canary toll; round-13: the three-way rule is mechanized PER STEADY RUN in `host_suspect` — a run whose wall is >=1.3x the query's best steady wall (and >=0.5s over it) while its cpu_sec grew by less than half the wall growth is flagged as a host stall (a mid-block burst the pre-block canary cannot see), and the flags fold into the `contention` verdict; a failed steady run (sec=-1) is retried once before it can settle a block; a HOT canary read is re-sampled (up to 2x) and the minimum recorded — fixed work is only inflated by interference, the bench's own transients (inter-run GC pause, code-cache sweep, cleaner churn) die within a read while genuine co-tenancy persists across all three; round-14: the hot threshold is CALIBRATED from measured self-noise — a pre-suite block of ${calibN} reads per canary on the idle harness records min/median/max, and a sample grades hot only above max(1.3x rolling suite-min, calibration ceiling) where the ceiling is the calibration max clamped to 1.5x the calibration min (the flat-host self-noise spread reaches 1.29x of min, so the bare 1.3x rule's [1.3, 1.4) band graded its own jitter as contention; the clamp keeps a co-runner inside the calibration block from relaxing the rule); the raw first canary read is recorded next to the re-sample minimum in canary_per_heavy for auditability",
         |"queries":$qs,
         |"tiers":$tiersJson,
         |"heavy_dynamic":$heavyJson,
         |"canary_sec":$canaryJson,
         |"canary_bw_sec":$canaryBwJson,
         |"canary_calibration":$calibrationJson,
         |"contention":$contentionJson,
         |"host_suspect":$hostSuspectJson,
         |"canary_per_heavy":$canaryPerHeavyJson,
         |"escalation":$escalationJson,
         |"cold_first_run":$coldJson,
         |"runs":$runsJson,
         |"gc_ms":$gcJson,
         |"rss_mib":$rssJson,
         |"cpu_sec":$cpuJson,
         |"load_avg":$loadJson
         |}""".stripMargin
    try java.nio.file.Files.write(java.nio.file.Paths.get(fullPath),
      full.getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"could not write $fullPath: $e") }
    // Round-14 (r13 verdict item 6): the compact driver-contract line is
    // ALSO written to a small file. The driver's stdout tail-capture has
    // truncated the head of the line three rounds running (`parsed: null`
    // in BENCH_r{11,12,13}.json), killing its per-query cross-check; a
    // file the driver (or judge) can read whole sidesteps the capture.
    val compactPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_COMPACT",
      "/root/repo/BENCH_compact.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(compactPath),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"could not write $compactPath: $e") }
    spark.stop()
  }
}
