package graft

import org.scalatest.funsuite.AnyFunSuite

/** The per-window contention marker: a synthetic co-tenant burst in
  * the middle of a sweep must flag exactly the windows it touches —
  * the r11 failure was a whole-run probe bracket that stamped a
  * mid-run burst `contended: false`.
  */
class BenchWindowSpec extends AnyFunSuite {

  private val names = (0 until 48).map(i => f"q$i%02d_x")
  private val ends = Seq(15, 31, 47)

  test("a clean probe series marks nothing") {
    assert(Bench.suspectQueries(names, ends,
      Seq(0.2, 0.2, 0.2, 0.2), thr = 0.625).isEmpty)
  }

  test("a mid-run burst flags only the windows it brackets, and the " +
    "rest of the sweep stays usable") {
    // burst elevates the probe closing window 1 (index 31)
    val got = Bench.suspectQueries(names, ends,
      Seq(0.2, 0.2, 3.0, 0.2), thr = 0.625)
    // probe 2 closes window 1 AND opens window 2 -> both suspect
    assert(got === names.slice(16, 48))
    assert(!got.contains(names(0)) && !got.contains(names(15)),
      "window 0 must stay clean")
  }

  test("an elevated start probe flags only the first window") {
    val got = Bench.suspectQueries(names, ends,
      Seq(3.0, 0.2, 0.2, 0.2), thr = 0.625)
    assert(got === names.slice(0, 16))
  }

  test("one probe per boundary plus the start is required") {
    intercept[IllegalArgumentException] {
      Bench.suspectQueries(names, ends, Seq(0.2, 0.2), thr = 0.625)
    }
  }

  test("epoch_suspect: a uniformly-degraded run (every probe mildly " +
    "above floor, no spike) flags, the r15 driver-run signature") {
    // the r15 driver run: start probe 0.300 vs floor 0.250, uniform
    // 1.2x — per-window suspects saw nothing
    assert(Bench.epochSuspect(Seq(0.300, 0.290, 0.310, 0.295), 0.25))
    // and the same series is below the 2.5x burst threshold, so the
    // burst logic indeed sees nothing — the gap this flag closes
    assert(Bench.suspectQueries(names, ends,
      Seq(0.300, 0.290, 0.310, 0.295), thr = 0.625).isEmpty)
  }

  test("epoch_suspect: an idle-floor run does not flag, and one " +
    "transient spike does not drag the median over") {
    assert(!Bench.epochSuspect(Seq(0.16, 0.25, 0.22, 0.24), 0.25))
    // median robust to a single burst: that's the per-window logic's
    // job, not the epoch flag's
    assert(!Bench.epochSuspect(Seq(0.20, 0.21, 3.0, 0.22), 0.25))
    assert(!Bench.epochSuspect(Seq.empty, 0.25))
    // boundary: exactly 10% over the floor is NOT suspect (strict >)
    assert(!Bench.epochSuspect(Seq(0.275, 0.275, 0.275), 0.25))
    assert(Bench.epochSuspect(Seq(0.276, 0.276, 0.276), 0.25))
  }

  test("rampSuspect flags a monotone late ramp that the epoch median " +
    "misses (the r16 0.182->0.378 profile)") {
    // early probes clean, late probes ~1.4x floor: whole-run median
    // stays under 1.1x (epoch clean) but the last-5 median is not
    val probes = Seq(0.182, 0.20, 0.21, 0.22, 0.23, 0.24, 0.25, 0.26,
      0.30, 0.33, 0.35, 0.36, 0.378)
    assert(!Bench.epochSuspect(probes, 0.25))
    assert(Bench.rampSuspect(probes, 0.25))
    // a clean run stays clean under both rules
    val clean = Seq(0.20, 0.22, 0.24, 0.23, 0.22, 0.25, 0.24, 0.23)
    assert(!Bench.rampSuspect(clean, 0.25))
    // a ramp that recovers before the end (a mid-run burst) is the
    // per-window detector's job, not the ramp rule's
    val burst = Seq(0.20, 0.22, 0.40, 0.41, 0.22, 0.21, 0.23, 0.22)
    assert(!Bench.rampSuspect(burst, 0.25))
    // short runs degenerate to the epoch rule
    assert(Bench.rampSuspect(Seq(0.30, 0.30), 0.25))
    assert(!Bench.rampSuspect(Seq.empty, 0.25))
  }
}
