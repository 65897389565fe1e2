package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry — driver runs this per-round at sf0.1 and parses the
  * single JSON line from stdout (build.sbt sets StdoutOutput so sbt does
  * not prefix it).
  *
  * Timing uses a noop-format full materialization (not `count()`, which
  * lets Catalyst drop every projected column and short-circuit the real
  * work — VERDICT r1). Failures are reported per-query under "errors"
  * instead of polluting the seconds map with sentinels.
  */
object Bench {
  /** Fresh-page fault throughput in MB/s: this VM's host is memory-
    * oversubscribed, and under host pressure first-touch faults cost
    * 0.1-1 ms EACH (measured: 1 GiB took 158 s to touch vs ~0.3 s
    * quiet), making allocation-heavy queries randomly 10-100x slower.
    * Recording the rate alongside the timings lets a reader judge
    * whether a capture is trustworthy (tools/hostcheck.py is the
    * standalone form; >=1000 MB/s = quiet).
    */
  private def touchRateMbS(): Double = {
    val mb = 128
    val buf = new Array[Byte](mb << 20)
    val t0 = System.nanoTime()
    var i = 0
    while (i < buf.length) { buf(i) = 1; i += 4096 }
    mb / ((System.nanoTime() - t0) / 1e9)
  }

  /** (busy, steal) jiffies from the aggregate /proc/stat line; steal
    * rising in step with busy means the hypervisor is taking cycles.
    * Busy = user nice system irq softirq. iowait is excluded like idle:
    * proc(5) describes it as time the CPU was IDLE waiting on I/O, and
    * counting it as busy would deflate steal% = steal/(busy+steal)
    * exactly on I/O-bound hosts, making the quiet-host gate more
    * permissive where it should be wary (review r11). Only the first 8
    * columns enter the sum: proc(5) documents guest/guest_nice (cols
    * 8-9) as ALREADY INCLUDED in user/nice, so summing them would
    * double-count guest time and understate steal% exactly when the
    * host is busiest (review r10).
    */
  private def cpuJiffies(): (Long, Long) =
    try {
      val f = scala.io.Source.fromFile("/proc/stat")
      val cols = try f.getLines().next().trim.split("\\s+") finally f.close()
      val v = cols.drop(1).map(_.toLong)
      val idle = if (v.length > 3) v(3) else 0L
      val iowait = if (v.length > 4) v(4) else 0L
      val steal = if (v.length > 7) v(7) else 0L
      (v.take(8).sum - idle - iowait - steal, steal)
    } catch { case _: Throwable => (0L, 0L) }

  /** The tools/hostcheck.py quiet threshold, wired into the bench
    * itself (VERDICT r13 item 1): a fresh-touch rate under this is a
    * pressured host whose timings are not trustworthy. */
  private val QuietMbS = 1000.0

  /** A quiet host also means the hypervisor is not stealing cycles:
    * the r14 official capture passed the touch-rate gate yet ran under
    * 5.2% steal and shipped 7 false >2× flags, so the quiet probe now
    * samples steal% over a short window too (VERDICT r14 item 3a). */
  private val QuietStealPct = 3.0

  /** One quiet-host probe: fresh-touch rate plus steal% over the probe
    * window (~0.6 s — coarse at 10 ms jiffies, but a 5%+ storm is
    * visible). */
  private def probeHost(): (Double, Double) = {
    val (b0, s0) = cpuJiffies()
    val rate = touchRateMbS()
    Thread.sleep(500)
    val (b1, s1) = cpuJiffies()
    val db = b1 - b0; val ds = s1 - s0
    val stealPct = if (db + ds <= 0) 0.0 else 100.0 * ds / (db + ds)
    (rate, stealPct)
  }

  /** Wait (bounded) for the host to go quiet: re-probe the fresh-
    * touch rate AND the steal share every `stepMs` until both clear
    * ([[QuietMbS]], [[QuietStealPct]]) or the budget runs out. Returns
    * (lastRate, lastStealPct, waitedMs) — the caller annotates rather
    * than aborts on a never-quiet host (the driver cannot re-run a
    * refused bench, so a loudly-annotated capture beats none). */
  private def awaitQuietHost(maxWaitMs: Long, stepMs: Long = 10000L)
      : (Double, Double, Long) = {
    var waited = 0L
    var (rate, stealPct) = probeHost()
    while ((rate < QuietMbS || stealPct > QuietStealPct) && waited < maxWaitMs) {
      System.err.println(
        f"[bench] host pressured (fresh-touch $rate%.0f MB/s, steal $stealPct%.1f%%) — waiting ${stepMs / 1000}%d s")
      Thread.sleep(stepMs)
      waited += stepMs
      val p = probeHost(); rate = p._1; stealPct = p._2
    }
    (rate, stealPct, waited)
  }

  /** Re-probe `names` in a FRESH forked JVM (the pin methodology:
    * BASELINE_LOCAL.md's pins are minima over fresh-JVM runs, so a
    * flag that only reproduces inside a long-lived heap is not a
    * regression). Reconstructs the launch command from this JVM's own
    * classpath; returns the child's per-query seconds, or empty on any
    * failure (the caller keeps its own numbers — the re-probe can only
    * clear flags, never hide a slow query). */
  private def freshJvmProbe(names: Seq[String], sfDir: String,
      cpus: String): Map[String, Double] = try {
    val outFile = java.nio.file.Files.createTempFile("bench_reprobe", ".json")
    val addOpens = Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
      "java.io", "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq("-Xmx8g",
      "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"), "graft.Bench")).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
    pb.environment().put("SPARK_GRAFT_CPUS", cpus)
    pb.environment().put("SPARK_GRAFT_REPS", "3")
    pb.environment().put("SPARK_GRAFT_ONLY", names.mkString(","))
    pb.environment().put("SPARK_GRAFT_BENCH_OUT", outFile.toString)
    // the child must not recurse into its own requiet / fresh-JVM pass
    pb.environment().put("SPARK_GRAFT_SUBPROBE", "1")
    pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
    pb.redirectErrorStream(false)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    val proc = pb.start()
    // bounded: a wedged child must not hang the official capture
    // (a Scala `return` here would throw through the enclosing catch,
    // so the timeout path is an if/else expression instead)
    if (!proc.waitFor(20, java.util.concurrent.TimeUnit.MINUTES)) {
      proc.destroyForcibly()
      System.err.println("[bench] fresh-JVM reprobe timed out")
      Map.empty
    } else {
      val txt = new String(java.nio.file.Files.readAllBytes(outFile),
        java.nio.charset.StandardCharsets.UTF_8)
      java.nio.file.Files.deleteIfExists(outFile)
      // query names are [\w]+ and values plain decimals, so a regex over
      // the "queries" object is a safe parse with no JSON library
      val qObj = """"queries":\{([^}]*)\}""".r.findFirstMatchIn(txt)
        .map(_.group(1)).getOrElse("")
      """"([\w]+)":([0-9.Ee+-]+)""".r.findAllMatchIn(qObj)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
  } catch { case e: Throwable =>
    System.err.println(s"[bench] fresh-JVM reprobe failed: $e"); Map.empty }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // refuse-to-start-dirty, bounded: give a pressured host up to 2
    // minutes to clear BEFORE any timing begins, so the official
    // capture doesn't need a quiet-evidence appeal (VERDICT r13)
    val (touchBefore, stealStart, waitedStartMs) =
      awaitQuietHost(maxWaitMs = 120000L)
    val (busy0, steal0) = cpuJiffies()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up codegen / parquet readers / shuffle machinery once so the
    // alphabetically-first query doesn't absorb session start-up cost —
    // against the SAME sfDir the bench runs on, so the warm-up can't
    // silently no-op on hosts without the default test data. One real
    // query for the join/agg machinery, plus a first touch of every
    // table family (documents/embeddings/events readers initialize on
    // first contact and would otherwise bill the first dedup/ANN/ETL
    // query for it).
    try {
      SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      Seq(Tables.documents(spark, sfDir), Tables.embeddings(spark, sfDir),
        Tables.events(spark, sfDir))
        .foreach(_.limit(32).write.format("noop").mode("overwrite").save())
    } catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }
    var times = Vector.empty[(String, Double)]
    // every rep's raw time per query, in run order — an inflated
    // capture self-identifies WHICH rep a host-pressure storm hit
    // (min-of-reps hides it; VERDICT r11 asked for exactly this)
    var repTimes = Vector.empty[(String, Seq[Double])]
    var errors = Vector.empty[(String, String)]
    // local-iteration escape hatch: SPARK_GRAFT_ONLY=q_a,q_b times just
    // those queries (the driver never sets it, so round benches run all)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // SPARK_GRAFT_REPS=N runs each query N times and records the MINIMUM —
    // the steady-state number (first rep absorbs plan compilation + codegen
    // + any cold file-system cache; a host-interference spike inflates any
    // single rep). The DEFAULT is 3 because the driver can't be asked to
    // set env vars and the 2× gate is defined over steady-state pins
    // (BASELINE_LOCAL.md pins rep minima): round 10's single-rep capture
    // read 2.2× at face value purely from cold-start + host pressure while
    // five quiet-host captures sat at baseline (VERDICT r10 item 1); the
    // r13 official capture still carried storm-only outliers at REPS=2,
    // so the official record now holds three chances per query to catch
    // a quiet window (VERDICT r13 item 1).
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(3).max(1)
    def runReps(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        n: Int): Vector[Double] = {
      var rs = Vector.empty[Double]
      (1 to n).foreach { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        rs :+= (System.nanoTime() - t0) / 1e9
        // operators may persist() staging frames (e.g. shingle sets);
        // dropping them between reps/queries keeps each timing
        // self-contained and stops storage memory leaking forward
        spark.catalog.clearCache()
      }
      rs
    }
    val queryFns = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    queryFns.foreach { case (name, fn) =>
      try {
        val rs = runReps(fn, reps)
        times :+= name -> rs.min
        repTimes :+= name -> rs
      } catch {
        case e: Throwable =>
          errors :+= name -> Option(e.getMessage).getOrElse(e.getClass.getName)
          spark.catalog.clearCache()
      }
    }
    // self-adjudication pins, loaded once: BASELINE_LOCAL.md's sf0.1
    // steady-state table (absent/unparseable pins → empty map, never
    // a failure; non-sf0.1 runs are never adjudicated — the flags
    // would be meaningless)
    val pinned: Map[String, Double] = try {
      if (!sfDir.stripSuffix("/").endsWith("sf0.1")) throw new Exception
      val pinRe = """\|\s*(q[\w]+)\s*\|\s*([0-9.]+)\s*\|""".r
      // explicit UTF-8: the pins file carries multiplication signs and
      // em dashes, and the forked JVM's default charset may be POSIX
      val pins = scala.io.Source.fromFile("BASELINE_LOCAL.md")(scala.io.Codec.UTF8)
      try pinRe.findAllMatchIn(pins.mkString)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
      finally pins.close()
    } catch { case _: Throwable => Map.empty }
    def flagOver2x(ts: Seq[(String, Double)]): Seq[(String, Double)] =
      ts.collect {
        case (q, t) if pinned.get(q).exists(p => p > 0 && t > 2 * p) =>
          q -> BigDecimal(t / pinned(q))
            .setScale(1, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    // requiet pass (VERDICT r13 item 1): any query whose min-of-reps
    // still exceeds 2× its pin gets ONE more chance after an explicit
    // quiet-wait — a genuine regression stays over 2× (identical
    // plans don't speed up on a quiet host), while a host-pressure
    // storm's inflation melts away, so the OFFICIAL record no longer
    // needs the bench_evidence/ appeal. Bounded: one extra 2-rep run
    // per flagged query, ≤ 90 s of waiting once. The pre-requiet min
    // of every flagged query is kept in the artifact (ADVICE r14: the
    // extra reps are a sampling asymmetry that can only move flagged
    // queries TOWARD passing, so the adjudication must stay auditable
    // against what the symmetric pass measured).
    var requeried = Vector.empty[String]
    var preRequietMin = Map.empty[String, Double]
    val isSubprobe = sys.env.contains("SPARK_GRAFT_SUBPROBE")
    val flaggedFirstPass = flagOver2x(times).map(_._1).toSet
    if (flaggedFirstPass.nonEmpty && !isSubprobe) {
      preRequietMin = times.filter(t => flaggedFirstPass.contains(t._1)).toMap
      val (rateNow, stealNow, _) = awaitQuietHost(maxWaitMs = 90000L)
      System.err.println(
        s"[bench] requiet pass: ${flaggedFirstPass.size} queries over 2x pins " +
          f"(fresh-touch now $rateNow%.0f MB/s, steal $stealNow%.1f%%)")
      queryFns.filter(q => flaggedFirstPass.contains(q._1)).foreach {
        case (name, fn) =>
          try {
            val rs = runReps(fn, 2)
            requeried :+= name
            times = times.map { case (n, t) =>
              if (n == name) n -> math.min(t, rs.min) else (n, t) }
            repTimes = repTimes.map { case (n, ts) =>
              if (n == name) n -> (ts ++ rs) else (n, ts) }
          } catch { case _: Throwable => spark.catalog.clearCache() }
      }
    }
    // fresh-JVM re-probe (VERDICT r14 item 3b, hardened r20 per
    // VERDICT r19 item 2): any query STILL over 2× after the requiet
    // pass gets runs in a fresh forked JVM — the exact methodology
    // the pins were captured under — so the committed artifact
    // reaches the same verdict the quiet-evidence appeal would, by
    // itself. The r19 stamp shipped 3 false flags because its single
    // reprobe ran inside the SAME 18%-steal storm that inflated the
    // main pass; the reprobe is therefore now QUIET-GATED and LOOPED:
    // each attempt first waits (bounded) for the host to clear, runs
    // the child, and records the host state bracketing it in the
    // artifact's `quiet_reprobe` map — a reader sees in-file whether
    // each surviving flag was adjudicated on a quiet host. Inflation
    // that persists across a fresh heap on a QUIET host is a real
    // regression and stays flagged; a never-quiet host leaves flags
    // annotated with the pressured telemetry that explains them.
    var reprobed = Vector.empty[String]
    // name -> (best fresh-JVM sec, touch MB/s, steal % at that probe)
    var quietReprobe = Map.empty[String, (Double, Double, Double)]
    var reprobeAttempt = 0
    while (flagOver2x(times).nonEmpty && !isSubprobe && reprobeAttempt < 3) {
      reprobeAttempt += 1
      val stillFlagged = flagOver2x(times).map(_._1)
      val (rateAt, stealAt, _) = awaitQuietHost(maxWaitMs = 180000L)
      System.err.println(
        s"[bench] fresh-JVM reprobe #$reprobeAttempt: ${stillFlagged.size} " +
          f"queries still over 2x (fresh-touch $rateAt%.0f MB/s, steal $stealAt%.1f%%)")
      val probe = freshJvmProbe(stillFlagged, sfDir, cpus)
      // the storm may land mid-child: re-measure after, and attribute
      // the WORSE of the bracketing probes to this attempt's numbers
      val (rateAfter, stealAfter) = probeHost()
      val rate = math.min(rateAt, rateAfter)
      val steal = math.max(stealAt, stealAfter)
      probe.foreach { case (name, t) =>
        if (!reprobed.contains(name)) reprobed :+= name
        // keep the BEST child time (that is what adjudicates) but the
        // QUIET attempt's host telemetry whenever any attempt was
        // quiet — a pressured attempt that happened to record the
        // lowest time must not stamp its host state over a quiet
        // adjudication, or the artifact's documented reading ("quiet
        // telemetry ⇒ real regression") inverts (ADVICE r20)
        val attemptQuiet = rate >= QuietMbS && steal <= QuietStealPct
        quietReprobe += name -> (quietReprobe.get(name) match {
          case Some((t0, r0, s0)) =>
            val best = math.min(t0, t)
            val wasQuiet = r0 >= QuietMbS && s0 <= QuietStealPct
            if (attemptQuiet || !wasQuiet) (best, rate, steal)
            else (best, r0, s0)
          case _ => (t, rate, steal)
        })
        times = times.map { case (n, t0) =>
          if (n == name) n -> math.min(t0, t) else (n, t0) }
        repTimes = repTimes.map { case (n, ts) =>
          if (n == name) n -> (ts :+ t) else (n, ts) }
      }
      // only a QUIET attempt is adjudication-grade; a pressured one
      // (child failed to find a window too) earns another attempt
      if (probe.isEmpty || rate < QuietMbS || steal > QuietStealPct) ()
      else reprobeAttempt = 3
    }
    import Bench.jstr
    val qs = times.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val repsJson = repTimes.map { case (k, vs) =>
      s"${jstr(k)}:${vs.map(v => f"$v%.3f").mkString("[", ",", "]")}"
    }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v.take(200))}" }
      .mkString("{", ",", "}")
    val total = times.map(_._2).sum
    // host-interference telemetry: fault throughput before/after the
    // run plus steal share across it — a capture with touch_mb_s in
    // the hundreds or steal_pct >20 is contaminated by the host, not
    // by any plan change (see BASELINE_LOCAL.md for the evidence)
    val touchAfter = touchRateMbS()
    val (busy1, steal1) = cpuJiffies()
    // self-adjudication against the committed pins: list every query
    // whose min-of-reps (after the requiet pass) still exceeds 2× its
    // BASELINE_LOCAL.md pin, so a capture carries its own pass/fail
    // readout next to the host telemetry that explains it
    val over2x = flagOver2x(times)
    val stealPct = {
      val db = busy1 - busy0; val ds = steal1 - steal0
      if (db + ds <= 0) 0.0 else 100.0 * ds / (db + ds)
    }
    val host = f"""{"touch_mb_s_before":${touchBefore.round},"touch_mb_s_after":${touchAfter.round},"steal_pct":$stealPct%.1f,"steal_pct_start":$stealStart%.1f,"quiet_wait_ms":$waitedStartMs}"""
    val over = over2x.map { case (k, v) => s"${jstr(k)}:$v" }
      .mkString("{", ",", "}")
    val requeriedJson = requeried.map(jstr).mkString("[", ",", "]")
    val reprobedJson = reprobed.map(jstr).mkString("[", ",", "]")
    // per-flagged-query fresh-JVM adjudication evidence, in-file: the
    // best child-JVM time plus the host state bracketing that probe —
    // a surviving over_2x_pins entry whose quiet_reprobe row shows
    // quiet-host telemetry is a REAL regression; one showing
    // pressured telemetry is a host artifact the capture could not
    // out-wait (VERDICT r19 item 2's self-contained-stamp contract)
    val quietReprobeJson = quietReprobe.toSeq.sortBy(_._1).map {
      case (k, (t, r, s)) =>
        s"${jstr(k)}:" +
          f"""{"sec":$t,"touch_mb_s":${r.round},"steal_pct":$s%.1f}"""
    }.mkString("{", ",", "}")
    val preRequietJson = preRequietMin.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"reps":$repsJson,"over_2x_pins":$over,"requeried":$requeriedJson,"pre_requiet_min":$preRequietJson,"reprobed_fresh_jvm":$reprobedJson,"quiet_reprobe":$quietReprobeJson,"errors":$errs,"host":$host,"sf":"$sfDir"}"""
    // The OFFICIAL stdout line is the COMPACT form (r21 verdict item
    // 2): the driver's stdout-tail capture has a bounded window, and
    // r20's full line — ~8 KB of per-rep arrays — was truncated in it,
    // which cost r21 its whole per-query round-over-round comparison.
    // Minima + flags + errors + host only, seconds at 1 ms precision
    // (BenchLineSpec pins the 160-query line under 4 KB); every
    // adjudication field and the full-precision per-rep record lives
    // in the stable file below, same format as before.
    println(Bench.officialLine(total, times, over2x, errors, host, sfDir))
    // Also persist the FULL record to a stable file: the driver's
    // stdout-tail capture has a bounded window, and at 73+ queries the
    // leading entries (and the "metric":"total" line) fell out of it in
    // round 8 (VERDICT r8 item 2). The file survives regardless of how
    // much log preamble precedes it.
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json"))
      Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(out,
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable => System.err.println(s"[bench] file write failed: $e") }
    spark.stop()
  }

  private[graft] def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  } + "\""

  /** Seconds at 1 ms precision with trailing zeros stripped — the
    * official line's number format (full precision stays in the file). */
  private[graft] def num3(v: Double): String = {
    val s = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.stripTrailingZeros.toPlainString
    if (s == "-0") "0" else s
  }

  /** The compact OFFICIAL stdout line: same contract fields
    * (metric/value/unit/queries/sf) plus the self-adjudication flags,
    * errors and host telemetry — and nothing per-rep, so the line
    * stays well inside any stdout-tail capture window (spec-pinned
    * < 4096 bytes at 160 queries). */
  private[graft] def officialLine(total: Double, times: Seq[(String, Double)],
      over2x: Seq[(String, Double)], errors: Seq[(String, String)],
      hostJson: String, sfDir: String): String = {
    val qs = times.map { case (k, v) => s"${jstr(k)}:${num3(v)}" }
      .mkString("{", ",", "}")
    // both adjudication keys are ALWAYS present (a driver-side parser
    // may index them unconditionally); what the compact line drops is
    // only the bulky per-rep/requiet/reprobe record, which stays in
    // the stable file
    val over = over2x.map { case (k, v) => s"${jstr(k)}:$v" }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v.take(80))}" }
      .mkString("{", ",", "}")
    s"""{"metric":"total","value":${num3(total)},"unit":"sec","queries":$qs,"over_2x_pins":$over,"errors":$errs,"host":$hostJson,"sf":"$sfDir"}"""
  }
}
