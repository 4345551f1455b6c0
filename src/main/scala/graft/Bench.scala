package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver.
  * Queries run in sorted-name order after a session warm-up action so
  * the first measured query doesn't absorb JVM/codegen startup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    def newSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      // warm up: JVM, codegen, parquet footers of the largest table —
      // re-run after every recycle so the first measured query after a
      // fresh context doesn't absorb its startup
      s.range(1000000L).selectExpr("sum(id)").collect()
      s.read.parquet(s"$sfDir/lineitem.parquet").count()
      // the vector/document tables the ann/corpus rows read: footer
      // parse + a full pass over the embedding column, so the suite's
      // first row doesn't absorb their cold page-cache reads (the
      // lineitem count above warms nothing the ann rows touch)
      s.read.parquet(s"$sfDir/embeddings.parquet")
        .selectExpr("sum(size(embedding))").collect()
      s.read.parquet(s"$sfDir/documents.parquet")
        .selectExpr("sum(length(text))").collect()
      // ... and the vector-search codegen the suite's FIRST row
      // (alphabetically ann_recall_bq, the only BQ-in-query row)
      // exercises: three rounds of captures show its first rep 1.7-3.9×
      // its median — cold whole-stage codegen for the sign-bit/hamming
      // expressions plus the ivf train/assign path, which the generic
      // warm-up above never compiles. A 64-row in-memory replay of the
      // same pipeline compiles the same generated classes (the JVM-wide
      // codegen cache then serves every real row); after the first
      // session it re-runs in ~0.1 s off that cache, so the per-recycle
      // cost is one tiny job launch.
      // warm-up is best-effort by nature: an sfDir without the vector
      // tables (or a degenerate slice) must fail only the ann ROWS,
      // not abort the whole suite inside session construction
      scala.util.Try {
        // a small slice of the REAL table, not a synthetic frame:
        // whole-stage codegen caches by generated source, and the
        // parquet-scan plan shapes the real row compiles are not the
        // ones an in-memory range produces
        val warm = s.read.parquet(s"$sfDir/embeddings.parquet")
          .select("vec_id", "embedding").where("vec_id < 2048")
        val m = graft.pipeline.Ivf.train(warm, "embedding", "vec_id",
          nlist = 4, iters = 1)
        val codes = graft.pipeline.Ivf.assign(warm, "embedding", m)
          .withColumn("codes", graft.functions.VectorFunctions
            .signBits(org.apache.spark.sql.functions.col("embedding")))
          .drop("embedding")
        val wq = warm.where("vec_id < 2")
        val sr = graft.pipeline.Ivf.searchBqIndex(codes, warm, wq,
          "embedding", "vec_id", m, k = 5, nprobe = 4, oversample = 4)
        // ... and the brute-force/recall harness every ann row shares
        // (the profile read each stage 2-4x slower on its first
        // execution: train 0.51->0.14, brute 1.40->0.32, bqsearch
        // 1.88->0.87, recall 0.54->0.16 s)
        graft.pipeline.Similarity.recallAtK(
          graft.pipeline.Similarity.bruteForceTopK(warm, wq,
            "embedding", "vec_id", k = 2), sr, k = 2).count()
      }.failed.foreach(e => System.err.println(
        s"[bench] WARNING: ann warm-up failed (${e.getMessage}) - " +
          "ann rows will absorb their own cold codegen"))
      s
    }
    // machine-health witness: jiffy counters at suite start, so the
    // detail file can carry the run's CPU-STEAL share (r14 lesson: an
    // oversubscribed host inflated every row ~1.3× uniformly while
    // looking idle — st only shows under load, and a uniform tax
    // never trips the per-row contention detector, by design)
    val jiffies0 = readJiffies()
    // Optional comma-separated query filter for local iteration; the
    // driver never sets it, so per-round BENCH stays the full suite.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    // A stray filter must never masquerade as a full-suite run: warn
    // loudly and tag the JSON so round-over-round comparisons can't be
    // silently poisoned by a subset measurement.
    only.foreach { f =>
      System.err.println(s"[bench] WARNING: SPARK_GRAFT_ONLY is set - " +
        s"this is a FILTERED run (${f.size} queries), not the full suite")
    }
    // WINDOW GATE (r15): the r13/r14 captures showed the whole-run
    // steal witness above records pollution only AFTER the fact — two
    // consecutive rounds committed absolutes from oversubscribed
    // windows (rows inflated 5-54×) that a quiet-window re-measure
    // collapses, which breaks round-over-round comparison AND the
    // driver's 2× gate. So the window is now gated BEFORE anything is
    // measured: a saturating burn probe reads the UNDER-LOAD steal
    // share (the aggregate /proc/stat average dilutes it — a bench is
    // not continuously pegged; r14's committed 1.77-2.01% aggregate
    // coexisted with 8-20% burn-probe readings), and a hot reading
    // delays the run (bounded attempts with backoff) rather than
    // committing a lying capture. When every attempt stays hot the
    // run proceeds but the capture is stamped "window":"contended",
    // so the driver and judge can discount it mechanically instead of
    // forensically. Re-gated at every session recycle — a window can
    // go hot mid-suite (r14's outlier rows clustered late in the
    // alphabet). Filtered (SPARK_GRAFT_ONLY) iteration runs skip the
    // gate: they never feed the driver, and the probe's seconds
    // matter in a tight local loop.
    val stealGatePct = sys.env.get("SPARK_GRAFT_STEAL_GATE")
      .map(_.toDouble).getOrElse(3.0)
    // Gate patience at recycle/retry boundaries, env-tunable: the
    // r15 first capture showed this host's contention comes in
    // 5-15 min BURSTS between quiet stretches (burn_probes read
    // 0.05-2% and 7-35% interleaved), so a patient gate can WAIT OUT
    // a burst instead of measuring through it — at the cost of
    // wall-clock, which an unattended capture has and an iterating
    // human may not. Defaults stay modest; a deliberate
    // clean-capture run sets SPARK_GRAFT_GATE_ATTEMPTS=10 and
    // SPARK_GRAFT_GATE_BACKOFF=30 (up to 5 min paused per gate
    // point) with a shorter SPARK_GRAFT_RECYCLE stride so gate
    // points come often enough to catch bursts early.
    val gateAttempts = sys.env.get("SPARK_GRAFT_GATE_ATTEMPTS")
      .map(_.toInt).getOrElse(2)
    val gateBackoffMs = sys.env.get("SPARK_GRAFT_GATE_BACKOFF")
      .map(_.toLong * 1000).getOrElse(10000L)
    val probes = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    var windowContended = false
    var gateSeq = 0
    def gateWindow(label: String, attempts: Int, backoffMs: Long): Unit = {
      var attempt = 0
      var ok = false
      while (!ok && attempt < attempts) {
        attempt += 1
        val p = burnProbe()
        gateSeq += 1
        p.foreach(v => probes += ((s"$label$gateSeq", v)))
        // an absent reading (off-Linux /proc/stat) cannot gate:
        // proceed — the witness degrades to absent, never blocks
        ok = p.forall(_ <= stealGatePct)
        if (!ok) {
          System.err.println(f"[bench] $label burn probe " +
            f"${p.get}%.1f%% steal > $stealGatePct%.1f%% - " +
            (if (attempt < attempts) s"waiting ${backoffMs / 1000}s" +
              s" (attempt $attempt/$attempts)"
            else "out of attempts, stamping window contended"))
          if (attempt < attempts) Thread.sleep(backoffMs)
        }
      }
      if (!ok) windowContended = true
    }
    // the tunables govern EVERY gate point; the pre gate keeps its
    // historical patience as a floor so default runs are unchanged
    // and a deliberate clean-capture run (attempts=10, backoff=30)
    // gets at least that much patience at the very first gate too
    if (only.isEmpty) gateWindow("pre",
      attempts = math.max(gateAttempts, 5),
      backoffMs = math.max(gateBackoffMs, 20000L))
    var spark = newSession()
    // SESSION RECYCLING: a 200+ × 3-rep suite in ONE context
    // accumulates state no per-query cleanup reaches — shuffle files
    // in the context's local dirs (freed only when the GC-driven
    // ContextCleaner gets around to them; a 128 GiB heap rarely GCs),
    // SQL status-store executions, terminated streaming-query
    // tracking — and the r10 driver capture showed what that does to
    // late measurements: stream_curation read [6.0, 39.9, 43.6] s
    // back-to-back while a fresh session re-measures it flat at ~8 s.
    // Stopping the context every N queries deletes its local dirs and
    // drops every context-lifetime cache, bounding the accumulation
    // window; cost is ~2-4 s per recycle (warm-up included), ~0.1 s
    // amortized per query at the default stride.
    val recycleEvery = sys.env.get("SPARK_GRAFT_RECYCLE")
      .map(_.toInt).getOrElse(24)
    var sinceRecycle = 0

    // Each query runs `runs` times back to back; "value" stays the
    // FIRST-run total (round-over-round comparable with r1–r6) and
    // "value_median" is the sum of per-query medians — the
    // load-spike-robust number. r6's driver capture read 115.7 s on a
    // loaded machine for a suite that re-measures at ~59 s; the
    // median makes that distinguishable from a real plan regression.
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS")
      .map(_.toInt).getOrElse(3).max(1)
    // PER-ROW capture protection (r16): the window gate is
    // per-gate-point, so a steal burst that starts and ends INSIDE a
    // recycle stride still writes a lying row into a "clean" capture
    // (r15 evidence: ivf_topk_merged 4.86 s in the committed clean
    // capture vs 2.0-3.1 s in two independent windows, its reps
    // monotone alongside 12-28% probe readings at the next gate
    // point). The committed BENCH_FLOORS.json carries each row's
    // reference floor (min of recent clean-capture medians); a row
    // whose median exceeds RowOutlierFactor × floor triggers ONE
    // post-row burn probe — hot reading ⇒ the row measured the
    // neighbor: re-gate and re-measure that one row (bounded, once);
    // cool reading ⇒ likely a real regression: keep it, but flag it
    // in row_outliers so the capture self-documents either way.
    val floors = loadFloors()
    val rowOutlierFactor = sys.env.get("SPARK_GRAFT_ROW_OUTLIER")
      .map(_.toDouble).getOrElse(RowOutlierFactor)
    // (reps, probe reading, action) per flagged row — the original
    // measurement stays visible next to the kept one
    val rowOutliers = scala.collection.mutable.ArrayBuffer
      .empty[(String, Seq[Double], Option[Double], String)]
    val timed = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      if (recycleEvery > 0 && sinceRecycle >= recycleEvery) {
        spark.stop()
        // re-gate at the recycle boundary (patience env-tunable — see
        // gateAttempts above)
        if (only.isEmpty) gateWindow("recycle", gateAttempts,
          gateBackoffMs)
        spark = newSession()
        sinceRecycle = 0
      }
      sinceRecycle += 1
      def measure(): Seq[Double] = (0 until runs).map { _ =>
        // Leaked state from the previous query (cached frames, the
        // label-propagation/append-log localCheckpoint blocks) must not
        // tax THIS query's measurement: r02 measured dedup_exact at 21s
        // purely because it ran right after dedup_drop_neardups' ~20
        // checkpointed rounds. Cleanup runs outside the timed window.
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        // ... and neither must the previous rep's /tmp debris: a
        // build-heavy row leaves its whole index trees behind each
        // rep, and their dirty-page writeback taxes the NEXT rep's
        // writes (r13: multivec_topk_restored [2.80, 4.51, 6.95] s
        // monotone across identical back-to-back reps). The previous
        // rep's result is already counted, so its trees are dead.
        graft.core.Scratch.sweep()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0
        }
      }
      val firstPass = measure()
      // CONTENTION DEFENSE: two consecutive driver windows produced
      // >7x rep spreads on different rows (r10 stream_curation
      // [6.0, 39.9, 43.6]; r11 corpus_curation_v2 [11.3, 41.2, 84.9])
      // while same-code quiet runs read them flat — machine-level
      // contention the session-recycling fix cannot reach, and a 2x
      // gate can be spuriously failed by it. A rep spread the query
      // itself cannot produce (same code, same data, back to back)
      // is the contention signature: recycle the session and re-run
      // that ONE query once, keep the re-measured reps, and record
      // the discarded ones under "contended" in BENCH_DETAIL so both
      // captures stay visible. One retry only — a machine busy enough
      // to fail it twice should be visible in the numbers.
      val (afterContention, discarded) =
        if (contended(firstPass)) {
          System.err.println(s"[bench] $name reps " +
            firstPass.map(t => f"$t%.1f").mkString("[", ", ", "]") +
            " look contended - recycling session and re-measuring")
          spark.stop()
          // the detector just SAW contention — gate before re-measuring
          // or the retry re-measures the same hot window
          if (only.isEmpty) gateWindow("retry", gateAttempts,
            gateBackoffMs)
          spark = newSession()
          sinceRecycle = 1
          (measure(), Some(firstPass))
        } else (firstPass, None)
      def medOf(ts: Seq[Double]): Double = ts.sorted.apply((runs - 1) / 2)
      // the per-row floor check (doc above loadFloors' call): a
      // uniform within-row burst inflates all reps together, which
      // the SPREAD detector above cannot see — the floor can
      var times = afterContention
      if (only.isEmpty && times.forall(_ >= 0))
        floors.get(name).foreach { fl =>
          val m = medOf(times)
          if (m > rowOutlierFactor * fl && m - fl > RowOutlierFloorSec) {
            val p = burnProbe()
            gateSeq += 1
            p.foreach(v => probes += ((s"row$gateSeq", v)))
            if (p.exists(_ > stealGatePct)) {
              System.err.println(f"[bench] $name median $m%.2f s > " +
                f"$rowOutlierFactor%.1fx floor $fl%.2f s with a hot " +
                f"post-row probe (${p.get}%.1f%%) - re-gating and " +
                "re-measuring this row")
              spark.stop()
              gateWindow("rowretry", gateAttempts, gateBackoffMs)
              spark = newSession()
              sinceRecycle = 1
              val re = measure()
              if (re.forall(_ >= 0)) {
                rowOutliers += ((name, times, p, "remeasured"))
                times = re
              } else rowOutliers += ((name, times, p, "retry_failed"))
            } else
              // cool probe: the machine is NOT hot — this is the
              // code's number; keep it, visibly flagged
              rowOutliers += ((name, times, p, "kept"))
          }
        }
      // A crashed query must not contribute a plausible-looking
      // duration: any failed repeat poisons the whole entry (-1 +
      // errors listing) so the driver sees it.
      val ok = times.forall(_ >= 0)
      val med = if (ok) medOf(times) else -1.0
      (name, if (ok) times.head else -1.0, med, ok, times, discarded)
    }
    val steal = stealShare(jiffies0, readJiffies())
    // the gate's verdict: "clean" = every gate point eventually read
    // under-load steal <= threshold; "contended" = at least one gate
    // point exhausted its attempts hot (the capture's absolutes
    // measured the neighbor — discount them). Absent when the gate
    // never ran (filtered run, or /proc/stat unreadable).
    val window = if (probes.isEmpty) None
      else Some(if (windowContended) "contended" else "clean")
    val results = timed.map { case (n, cold, _, ok, _, _) => (n, cold, ok) }
    val medianTotal =
      if (timed.forall(_._4)) Some(timed.map(_._3).sum) else None
    // value_clean: the defensible headline — the median-sum with the
    // rows whose HOT-probe re-measure still reads past their floor
    // excluded (named in clean_excluded, never silently dropped).
    // Cool-probe flags stay IN: a quiet machine's number is the
    // code's number, however slow. Absent when no floors file exists.
    val hotFlagged = rowOutliers.collect {
      case (n, _, _, a) if a != "kept" => n }.toSet
    val cleanExcluded = timed.filter(t => hotFlagged.contains(t._1) &&
      floors.get(t._1).exists(fl => t._3 > rowOutlierFactor * fl &&
        t._3 - fl > RowOutlierFloorSec)).map(_._1)
    val valueClean =
      if (floors.isEmpty) None
      else medianTotal.map(_ - timed.filter(t =>
        cleanExcluded.contains(t._1)).map(_._3).sum)
    // the committed detail file records full suites only — a
    // SPARK_GRAFT_ONLY iteration run must not clobber the round's
    // per-query record (and its pointer fallback would then lie).
    // It carries runs_per_query and EVERY rep's time per query, so a
    // reader can tell a repeated measurement whose median happens to
    // equal its first run (the index-lifecycle queries rebuild from a
    // fresh temp dir each rep — they ARE repeated) from a run-once.
    val detail = jsonLine(results, 6, Some(sfDir), dropEmptyErrs = false,
      withQueries = true, filteredRun = false, medianTotal = medianTotal,
      queryMedians = Some(timed.map(t => (t._1, t._3))),
      queryRuns = Some((runs, timed.map(t => (t._1, t._5)))),
      contendedReps = Some(timed.collect {
        case (n, _, _, _, _, Some(d)) => (n, d) }),
      stealPct = steal, window = window,
      burnProbes = Some(probes.toSeq), valueClean = valueClean,
      cleanExcluded = Some(cleanExcluded),
      rowOutliers = Some(rowOutliers.toSeq)) + "\n"
    if (only.isEmpty) java.nio.file.Files.writeString(
      java.nio.file.Path.of("BENCH_DETAIL.json"), detail)
    // the stable CLEAN artifact: whenever a full gated suite ends
    // with every gate point satisfied, refresh BENCH_CLEAN.json so
    // the trustworthy capture lives in the working tree (BASELINE.md:
    // the 2x check should consume clean-window captures only) instead
    // of git archaeology. Contended runs leave the last clean one.
    if (only.isEmpty && window.contains("clean"))
      java.nio.file.Files.writeString(
        java.nio.file.Path.of("BENCH_CLEAN.json"), detail)
    println(fitLine(results, sfDir, filteredRun = only.isDefined,
      medianTotal = medianTotal, stealPct = steal, window = window,
      valueClean = valueClean))
    // iteration aid: a filtered run's stdout JSON carries first-run
    // times only, but the load-robust per-query signal is the median —
    // print it to stderr so local SPARK_GRAFT_ONLY loops can read it
    // without touching the driver-facing stdout contract
    if (only.isDefined) System.err.println(timed.map { case (n, _, m, _, _, _) =>
      f"$n=$m%.3f" }.mkString("[bench] medians: ", " ", ""))
    spark.stop()
  }

  /** The host's aggregate (steal, total) jiffy counters from
    * /proc/stat's first cpu line; None off-Linux or on any parse
    * hiccup — the witness degrades to absent, never crashes a bench.
    */
  private def readJiffies(): Option[(Long, Long)] =
    scala.util.Using(scala.io.Source.fromFile("/proc/stat")) { src =>
      val cpu = src.getLines().find(_.startsWith("cpu ")).get
      val f = cpu.trim.split("\\s+").drop(1).map(_.toLong)
      // field 8 = steal; total = user..steal ONLY (fields 9-10, guest
      // and guest_nice, are already accounted inside user/nice —
      // summing them double-counts guest time and understates steal
      // on VM hosts)
      (f(7), f.take(8).sum)
    }.toOption

  /** The UNDER-LOAD steal share, in percent: saturate every core for
    * `millis` and read the steal delta of exactly that window. This is
    * the number the pre-suite/recycle gates compare against the
    * threshold — hypervisor timeslice theft is only visible while the
    * guest is actually demanding the CPU, so an idle-window /proc/stat
    * read (or a whole-run average over a suite that is mostly NOT
    * pegged) reads near-zero on a host that will tax every measured
    * query. None off-Linux (nothing to gate on).
    */
  private[graft] def burnProbe(millis: Long = 1200): Option[Double] = {
    val before = readJiffies()
    if (before.isEmpty) return None
    val deadline = System.nanoTime() + millis * 1000000L
    val sink = new java.util.concurrent.atomic.AtomicLong
    val threads = (0 until Runtime.getRuntime.availableProcessors).map { _ =>
      val t = new Thread(() => {
        var x = 0L
        while (System.nanoTime() < deadline) x += 1
        sink.addAndGet(x) // observable side effect: the spin can't be JIT-eliminated
      })
      t.setDaemon(true)
      t.start()
      t
    }
    threads.foreach(_.join())
    stealShare(before, readJiffies())
  }

  /** Steal share of the whole run, in percent — the machine-health
    * number a reader needs to interpret this capture's absolutes
    * (>2-3% sustained: the capture measured the neighbor, not the
    * code; per-row RELATIVE ordering stays informative).
    */
  private[graft] def stealShare(before: Option[(Long, Long)],
                                after: Option[(Long, Long)]): Option[Double] =
    for {
      (s0, t0) <- before
      (s1, t1) <- after
      if t1 > t0
    } yield 100.0 * (s1 - s0) / (t1 - t0)

  /** Does a rep set carry the CONTENTION SIGNATURE — a spread the
    * query cannot produce on its own (same code, same data, back to
    * back in one session)? True when the slowest rep exceeds
    * [[ContentionSpread]]× the fastest AND the gap clears
    * [[ContentionFloorSec]] (sub-second queries jitter past 3×
    * from scheduling noise alone, and a recycle costs more than it
    * could recover there) — OR when the absolute gap alone clears
    * 4 × [[ContentionFloorSec]] at any spread past 1.5×: the r12
    * driver window put ~10 s of pure noise into the headline via
    * hybrid_topk_deleted [17.25, 7.20, 6.23] at spread 2.77×, just
    * under the ratio trigger — a multi-second gap between
    * back-to-back identical runs is machine noise whatever the
    * ratio says. The mild 1.5× floor on the absolute branch keeps a
    * legitimately heavy query's systematic warm-up gap (a 30 s row
    * whose first rep runs 1.3× — which a recycle would REPRODUCE,
    * paying the full suite re-run for nothing) from flagging on
    * every run; r12's quiet capture maxes at 2.9 s gap / 1.8×
    * outside the contended row, so both branches have wide margin.
    * Failed reps (-1) never flag: the entry is already poisoned and
    * a retry would mask a real crash.
    */
  private[graft] val ContentionSpread = 3.0
  private[graft] val ContentionFloorSec = 2.0

  /** Per-row floor trigger: median > factor × floor AND the gap
    * clears [[RowOutlierFloorSec]] (a 2× excursion on a 0.2 s row is
    * scheduling jitter a probe + re-measure costs more than it
    * recovers). Factor 2 matches the driver's own 2× gate — a row
    * past it is exactly a row that could spuriously fail the round.
    */
  private[graft] val RowOutlierFactor = 2.0
  private[graft] val RowOutlierFloorSec = 0.75

  /** The committed per-row reference floors — min of recent CLEAN
    * captures' per-query medians (tools/make_bench_floors.py), the
    * yardstick the per-row gate compares each median against. Flat
    * `{"name": seconds}` JSON; absent file = no per-row gating (the
    * feature degrades to the r15 behavior, never blocks a bench).
    */
  private[graft] def loadFloors(path: java.nio.file.Path =
      java.nio.file.Path.of("BENCH_FLOORS.json")): Map[String, Double] =
    if (!java.nio.file.Files.exists(path)) Map.empty
    else """"([^"]+)"\s*:\s*([0-9][0-9.eE+-]*)""".r
      .findAllMatchIn(java.nio.file.Files.readString(path))
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  private[graft] def contended(reps: Seq[Double]): Boolean =
    reps.size >= 2 && reps.forall(_ >= 0) && {
      val mn = reps.min
      val mx = reps.max
      (mx > ContentionSpread * mn && mx - mn > ContentionFloorSec) ||
        (mx - mn > 4 * ContentionFloorSec && mx > 1.5 * mn)
    }

  /** The driver keeps only a ~2000-char tail of the sbt stdout and
    * parses the JSON line out of it; sbt's own "[success] Total time"
    * trailer eats ~75 chars of that window from the end, so anything
    * past ~1900 chars gets its FRONT cut (87 queries × 3 decimals ≈
    * 2040). The stdout line auto-fits [[StdoutBudget]] by degrading
    * gracefully — fewer decimals, drop the empty errors array and the
    * sf path — and the microsecond-precision per-query JSON goes to
    * BENCH_DETAIL.json in the working tree (committed per round), so
    * stdout rounding never loses the record. The final fallback is a
    * pointer form with no per-query map at all, so the line fits at
    * ANY suite size (BenchLineSpec pins 110+ queries).
    */
  val StdoutBudget = 1860

  private[graft] def fitLine(results: Seq[(String, Double, Boolean)],
                             sfDir: String, filteredRun: Boolean,
                             budget: Int = StdoutBudget,
                             medianTotal: Option[Double] = None,
                             stealPct: Option[Double] = None,
                             window: Option[String] = None,
                             valueClean: Option[Double] = None): String = {
    val sfBase = new java.io.File(sfDir).getName
    val candidates = Seq(
      jsonLine(results, 3, Some(sfDir), dropEmptyErrs = false,
        withQueries = true, filteredRun, medianTotal, stealPct = stealPct,
        window = window, valueClean = valueClean),
      jsonLine(results, 2, Some(sfBase), dropEmptyErrs = true,
        withQueries = true, filteredRun, medianTotal, stealPct = stealPct,
        window = window, valueClean = valueClean),
      jsonLine(results, 1, Some(sfBase), dropEmptyErrs = true,
        withQueries = true, filteredRun, medianTotal, stealPct = stealPct,
        window = window, valueClean = valueClean)) ++
      // the pointer form only makes sense when the detail file
      // describes THIS run (full suites only)
      (if (!filteredRun)
        Seq(jsonLine(results, 2, Some(sfBase), dropEmptyErrs = true,
          withQueries = false, filteredRun, medianTotal,
          stealPct = stealPct, window = window, valueClean = valueClean))
      else Nil)
    candidates.find(_.length <= budget).getOrElse(candidates.last)
  }

  private def fmt(v: Double, prec: Int): String =
    s"%.${prec}f".formatLocal(java.util.Locale.ROOT, v)

  private[graft] def jsonLine(results: Seq[(String, Double, Boolean)],
                              prec: Int, sf: Option[String],
                              dropEmptyErrs: Boolean, withQueries: Boolean,
                              filteredRun: Boolean,
                              medianTotal: Option[Double] = None,
                              queryMedians: Option[Seq[(String, Double)]] = None,
                              queryRuns: Option[(Int, Seq[(String, Seq[Double])])] = None,
                              contendedReps: Option[Seq[(String, Seq[Double])]] = None,
                              stealPct: Option[Double] = None,
                              window: Option[String] = None,
                              burnProbes: Option[Seq[(String, Double)]] = None,
                              valueClean: Option[Double] = None,
                              cleanExcluded: Option[Seq[String]] = None,
                              rowOutliers: Option[Seq[(String, Seq[Double], Option[Double], String)]] = None): String = {
    val total = results.collect { case (_, v, true) => v }.sum
    val filtered = if (filteredRun) """"filtered":true,""" else ""
    val med = medianTotal
      .map(m => s""""value_median":${fmt(m, prec)},""").getOrElse("")
    // the defensible headline once the per-row floor gate ran: the
    // median-sum minus any still-hot flagged rows (clean_excluded)
    val clean = valueClean
      .map(v => s""""value_clean":${fmt(v, prec)},""").getOrElse("")
    val cleanEx = cleanExcluded.map(_.map("\"" + _ + "\"")
      .mkString(""""clean_excluded":[""", ",", "],")).getOrElse("")
    // every row the per-row floor gate flagged: the ORIGINAL reps,
    // the post-row probe reading, and what was done about it
    // ("remeasured" kept the re-run in queries_runs; "kept" means
    // the probe read cool — likely a real regression, not noise)
    val outliers = rowOutliers.map(_.map { case (k, ts, p, action) =>
      "\"" + k + "\":{\"reps\":[" + ts.map(fmt(_, prec)).mkString(",") +
        "]," + p.map(v => s""""probe_pct":${fmt(v, 2)},""").getOrElse("") +
        s""""action":"$action"}""" }
      .mkString(""""row_outliers":{""", ",", "},")).getOrElse("")
    val qs =
      if (withQueries)
        results.map { case (k, v, _) => "\"" + k + "\":" + fmt(v, prec) }
          .mkString(""""queries":{""", ",", "},")
      else """"queries_file":"BENCH_DETAIL.json","""
    val qMed = queryMedians.map(_.map { case (k, v) =>
      "\"" + k + "\":" + fmt(v, prec) }
      .mkString(""""queries_median":{""", ",", "},")).getOrElse("")
    val qRuns = queryRuns.map { case (n, per) =>
      s""""runs_per_query":$n,""" + per.map { case (k, ts) =>
        "\"" + k + "\":[" + ts.map(fmt(_, prec)).mkString(",") + "]" }
        .mkString(""""queries_runs":{""", ",", "},")
    }.getOrElse("")
    // queries whose first capture tripped the contention detector:
    // the DISCARDED reps, so a reader sees both measurements (the
    // kept ones are this query's queries_runs entry). Always present
    // when the caller measures contention — an empty object is the
    // "detector armed, nothing flagged" witness.
    val contendedPart = contendedReps.map(_.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.map(fmt(_, prec)).mkString(",") + "]" }
      .mkString(""""contended":{""", ",", "},")).getOrElse("")
    val steal = stealPct
      .map(v => s""""steal_pct":${fmt(v, 2)},""").getOrElse("")
    val win = window.map(w => s""""window":"$w",""").getOrElse("")
    // every burn-probe reading in gate order (pre<n>/recycle<n>/
    // retry<n>), so the detail file self-documents its window health
    // without PLANS.md archaeology
    val burns = burnProbes.map(_.map { case (k, v) =>
      "\"" + k + "\":" + fmt(v, 2) }
      .mkString(""""burn_probes":{""", ",", "},")).getOrElse("")
    val errList = results.collect { case (k, _, false) => "\"" + k + "\"" }
    val errs = if (errList.isEmpty && dropEmptyErrs) ""
      else errList.mkString(""""errors":[""", ",", "],")
    val sfPart = sf.map(s => s""","sf":"$s"""").getOrElse("")
    s"""{"metric":"total","value":${fmt(total, prec)},"unit":"sec",$med$clean$filtered$qs$qMed$qRuns$contendedPart$cleanEx$outliers$steal$win$burns$errs"n_queries":${results.size}$sfPart}"""
  }
}
