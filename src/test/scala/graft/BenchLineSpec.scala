package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench stdout line must fit the driver's capture window at any
  * suite size — r1–r4 lost their JSON to the ~2000-char tail cut, and
  * the suite keeps growing (92 queries in r5, 93 now). Pins the
  * auto-fit ladder at and past the next tier boundary.
  */
class BenchLineSpec extends AnyFunSuite {

  private def synth(n: Int, failed: Set[Int] = Set.empty) =
    (0 until n).map { i =>
      // realistic name lengths (current suite: 6..22 chars)
      val name = f"op_${"x" * (6 + i % 16)}_$i%03d"
      (name, 1.234567 + i * 0.01, !failed.contains(i))
    }

  private def realNames = SparkEntry.queries.keys.toSeq.sorted

  test("the CURRENT suite fits the budget") {
    val results = realNames.zipWithIndex.map { case (n, i) =>
      (n, 1.234567 + i * 0.01, true)
    }
    val line = Bench.fitLine(results, "/root/testdata/sf0.1", filteredRun = false)
    assert(line.length <= Bench.StdoutBudget,
      s"line is ${line.length} chars for ${results.size} real queries")
    // at 93 real queries even the 1-decimal map overflows, so the
    // pointer form is the expected tier (per-query detail lives in the
    // committed BENCH_DETAIL.json); either form is valid, overflow is not
    assert(line.contains("\"queries\":{") || line.contains("queries_file"))
    assert(line.contains(s""""n_queries":${results.size}"""))
  }

  test("the suite plus ten more queries still fits the budget") {
    val target = math.max(realNames.size + 10, 110)
    val grown = realNames ++ (realNames.size until target).map(i => f"new_op_$i%03d")
    val results = grown.zipWithIndex.map { case (n, i) =>
      (n, 1.234567 + i * 0.01, true)
    }
    val line = Bench.fitLine(results, "/root/testdata/sf0.1", filteredRun = false)
    assert(line.length <= Bench.StdoutBudget,
      s"line is ${line.length} chars at $target queries")
    assert(line.contains(s""""n_queries":$target"""))
    assert(line.startsWith("""{"metric":"total"""") && line.endsWith("}"))
  }

  test("absurd suite sizes degrade to the pointer form, never overflow") {
    Seq(150, 300, 1000).foreach { n =>
      val line = Bench.fitLine(synth(n), "/root/testdata/sf0.1", filteredRun = false)
      assert(line.length <= Bench.StdoutBudget, s"overflow at $n queries")
      assert(line.contains("\"queries_file\":\"BENCH_DETAIL.json\"") ||
        line.contains("\"queries\":{"))
    }
  }

  test("filtered runs are tagged and never use the stale pointer form") {
    val line = Bench.fitLine(synth(300), "/root/testdata/sf0.1", filteredRun = true)
    assert(line.contains("\"filtered\":true"))
    assert(!line.contains("queries_file"),
      "a filtered run must not point at a detail file describing another run")
  }

  test("value_median rides along at any tier and never overflows") {
    Seq(realNames.size, 110, 300).foreach { n =>
      val grown = realNames ++ (realNames.size until n).map(i => f"new_op_$i%03d")
      val results = grown.take(n).zipWithIndex.map { case (nm, i) =>
        (nm, 1.234567 + i * 0.01, true)
      }
      val line = Bench.fitLine(results, "/root/testdata/sf0.1",
        filteredRun = false, medianTotal = Some(42.123456))
      assert(line.length <= Bench.StdoutBudget, s"overflow at $n with median")
      assert(line.contains("\"value_median\":42.1"),
        s"median missing from stdout line at $n queries")
    }
  }

  test("failures surface in errors and never drop from degraded tiers") {
    val line = Bench.fitLine(synth(110, failed = Set(5)), "/root/testdata/sf0.1",
      filteredRun = false)
    assert(line.length <= Bench.StdoutBudget)
    assert(line.contains("\"errors\":["), s"errors list missing: $line")
  }

  test("detail form records runs_per_query and every rep's time") {
    val results = Seq(("q_a", 1.5, true), ("q_b", 2.5, true))
    val line = Bench.jsonLine(results, 6, Some("/sf"), dropEmptyErrs = false,
      withQueries = true, filteredRun = false, medianTotal = Some(3.9),
      queryMedians = Some(Seq(("q_a", 1.4), ("q_b", 2.4))),
      queryRuns = Some((3, Seq(("q_a", Seq(1.5, 1.3, 1.4)),
        ("q_b", Seq(2.5, 2.4, 2.3))))))
    assert(line.contains(""""runs_per_query":3"""), line)
    assert(line.contains(""""queries_runs":{"q_a":[1.500000,1.300000,1.400000]"""),
      line)
    // and it parses: balanced braces, one top-level object
    assert(line.count(_ == '{') == line.count(_ == '}'), line)
  }

  test("steal share: exact percentage from jiffy deltas, absent on " +
    "missing or non-advancing counters; detail form carries it") {
    assert(Bench.stealShare(Some((100L, 1000L)), Some((150L, 2000L)))
      .contains(5.0)) // 50 steal jiffies of 1000 total
    assert(Bench.stealShare(None, Some((1L, 2L))).isEmpty)
    assert(Bench.stealShare(Some((1L, 2L)), None).isEmpty)
    assert(Bench.stealShare(Some((1L, 100L)), Some((1L, 100L))).isEmpty)
    val line = Bench.jsonLine(Seq(("q1", 1.0, true)), 3, None,
      dropEmptyErrs = true, withQueries = true, filteredRun = false,
      stealPct = Some(12.345))
    assert(line.contains("\"steal_pct\":12.35"), line)
  }

  test("detail form records contended (discarded) reps per flagged query") {
    val results = Seq(("q_a", 1.5, true), ("q_b", 2.5, true))
    val line = Bench.jsonLine(results, 6, Some("/sf"), dropEmptyErrs = false,
      withQueries = true, filteredRun = false,
      queryRuns = Some((3, Seq(("q_a", Seq(1.5, 1.3, 1.4)),
        ("q_b", Seq(2.5, 2.4, 2.3))))),
      contendedReps = Some(Seq(("q_b", Seq(11.3, 41.2, 84.9)))))
    assert(line.contains(""""contended":{"q_b":[11.300000,41.200000,84.900000]}"""),
      line)
    assert(line.count(_ == '{') == line.count(_ == '}'), line)
    // detector armed but nothing flagged -> the empty-object witness
    val quiet = Bench.jsonLine(results, 6, Some("/sf"), dropEmptyErrs = false,
      withQueries = true, filteredRun = false,
      contendedReps = Some(Seq.empty))
    assert(quiet.contains(""""contended":{}"""), quiet)
  }

  test("contention detector: spread x floor semantics, failed reps never flag") {
    // the r11 driver-window signatures flag
    assert(Bench.contended(Seq(11.3, 41.2, 84.9)))
    assert(Bench.contended(Seq(122.5, 9.9, 9.4)))
    // flat reps do not
    assert(!Bench.contended(Seq(7.8, 6.2, 6.3)))
    // sub-second jitter past 3x stays below the absolute floor
    assert(!Bench.contended(Seq(0.2, 0.7, 0.3)))
    // a big ratio with a small absolute gap stays quiet
    assert(!Bench.contended(Seq(0.5, 1.8, 0.6)))
    // a crashed rep poisons the entry instead of triggering a retry
    assert(!Bench.contended(Seq(-1.0, 41.2, 84.9)))
    // single-rep runs have no spread to judge
    assert(!Bench.contended(Seq(42.0)))
    // the r12 sub-threshold escape: spread 2.77x but a ~10 s absolute
    // gap — the absolute-gap trigger (> 4 x floor) now flags it
    assert(Bench.contended(Seq(17.25, 7.20, 6.23)))
    // a multi-second row with a gap under 4 x floor stays quiet
    // (spread 1.6x, gap 6.0 s < 8 s)
    assert(!Bench.contended(Seq(15.0, 10.0, 9.0)))
    // a heavy row's systematic warm-up gap (big absolute gap, spread
    // ≤ 1.5x — a recycle would reproduce it) stays quiet
    assert(!Bench.contended(Seq(30.0, 21.5, 20.8)))
    // failed reps still never flag, whatever the gap
    assert(!Bench.contended(Seq(-1.0, 9.0, 20.0)))
  }

  test("window stamp and burn-probe readings ride the JSON forms") {
    val line = Bench.jsonLine(Seq(("q1", 1.0, true)), 3, None,
      dropEmptyErrs = true, withQueries = true, filteredRun = false,
      stealPct = Some(1.2), window = Some("contended"),
      burnProbes = Some(Seq(("pre1", 8.25), ("pre2", 7.0), ("recycle3", 0.4))))
    assert(line.contains("\"window\":\"contended\""), line)
    assert(line.contains(
      "\"burn_probes\":{\"pre1\":8.25,\"pre2\":7.00,\"recycle3\":0.40}"), line)
    assert(line.count(_ == '{') == line.count(_ == '}'), line)
    // absent gate (filtered run / off-Linux) -> neither field appears
    val bare = Bench.jsonLine(Seq(("q1", 1.0, true)), 3, None,
      dropEmptyErrs = true, withQueries = true, filteredRun = false)
    assert(!bare.contains("window") && !bare.contains("burn_probes"), bare)
    // the stdout ladder carries the window verdict at every tier
    val results = realNames.zipWithIndex.map { case (n, i) =>
      (n, 1.234567 + i * 0.01, true)
    }
    val fit = Bench.fitLine(results, "/root/testdata/sf0.1",
      filteredRun = false, window = Some("clean"))
    assert(fit.length <= Bench.StdoutBudget)
    assert(fit.contains("\"window\":\"clean\""), fit)
  }

  test("per-row floors: flat JSON loads, absent file degrades to " +
    "empty, outlier fields ride the detail form") {
    val dir = java.nio.file.Files.createTempDirectory("floors")
    val p = dir.resolve("BENCH_FLOORS.json")
    java.nio.file.Files.writeString(p,
      "{\n \"q_a\": 0.25,\n \"q_b\": 12.5,\n \"q_c\": 3.0e-1\n}\n")
    assert(Bench.loadFloors(p) ==
      Map("q_a" -> 0.25, "q_b" -> 12.5, "q_c" -> 0.3))
    assert(Bench.loadFloors(dir.resolve("missing.json")).isEmpty)
    // the repo's committed floors file parses and covers the suite
    val committed = Bench.loadFloors()
    assert(committed.nonEmpty && committed.valuesIterator.forall(_ > 0))
    val line = Bench.jsonLine(Seq(("q_a", 1.0, true)), 6, Some("/sf"),
      dropEmptyErrs = false, withQueries = true, filteredRun = false,
      valueClean = Some(41.5), cleanExcluded = Some(Seq("q_b")),
      rowOutliers = Some(Seq(
        ("q_b", Seq(4.9, 5.2, 5.4), Some(14.2), "remeasured"),
        ("q_d", Seq(3.1, 3.0, 3.2), None, "kept"))))
    assert(line.contains(""""value_clean":41.500000"""), line)
    assert(line.contains(""""clean_excluded":["q_b"]"""), line)
    assert(line.contains(""""row_outliers":{"q_b":{"reps":""" +
      """[4.900000,5.200000,5.400000],"probe_pct":14.20,""" +
      """"action":"remeasured"},"q_d":{"reps":""" +
      """[3.100000,3.000000,3.200000],"action":"kept"}}"""), line)
    assert(line.count(_ == '{') == line.count(_ == '}'), line)
    // none requested -> none of the three fields appear
    val bare = Bench.jsonLine(Seq(("q_a", 1.0, true)), 3, None,
      dropEmptyErrs = true, withQueries = true, filteredRun = false)
    assert(!bare.contains("value_clean") && !bare.contains("row_outliers"),
      bare)
  }

  test("burn probe reads an under-load steal share on Linux") {
    // quick probe: the VALUE is the host's business; the contract is
    // a present, finite, sane percentage (this host exposes
    // /proc/stat) produced without crashing or hanging
    val p = Bench.burnProbe(millis = 150)
    assert(p.isDefined)
    assert(p.get >= 0.0 && p.get <= 100.0, p)
  }
}
