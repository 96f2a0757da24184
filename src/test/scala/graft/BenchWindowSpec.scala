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
}
