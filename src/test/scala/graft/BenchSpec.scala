package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's estimator discipline: headline min/median come
  * from ONE fixed-size contiguous sample window, so the contention
  * re-run (which appends extra samples for adjudication) can never move
  * a query's reported numbers — the r14 defect where a flagged query's
  * median was computed over 6 mixed samples and reported 1.78 s against
  * a clean ~0.45 s.
  */
class BenchSpec extends AnyFunSuite {

  test("median: odd, even, singleton") {
    assert(Bench.median(Seq(3.0)) == 3.0)
    assert(Bench.median(Seq(1.0, 9.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(4.0, 1.0, 3.0, 2.0)) == 2.5)
  }

  test("bestWindow is the identity for an uncontended primary run") {
    val clean = Seq(0.45, 0.47, 0.44)
    assert(Bench.bestWindow(clean, 3) == clean)
  }

  test("a contended rerun sequence yields the clean window's numbers") {
    // r14's real q29 shape: primary passes fight external load, the
    // rerun lands clean — the window picks the cleanest contiguous 3
    val contended = Seq(0.61, 0.39, 2.08, 5.72, 6.19, 1.47)
    val w = Bench.bestWindow(contended, 3)
    assert(w == Seq(0.61, 0.39, 2.08))
    assert(Bench.median(w) == 0.61)
    assert(w.min == 0.39)
    // the estimator basis is the same SIZE as an uncontended query's —
    // no more-samples-lower-min bias
    assert(w.size == 3)
    // the inverse shape (contended rerun after a clean primary) keeps
    // the clean primary window
    val lateSpike = Seq(0.45, 0.47, 0.44, 3.2, 4.1, 0.46)
    assert(Bench.bestWindow(lateSpike, 3) == Seq(0.45, 0.47, 0.44))
  }
}
