package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's stage-window verdicts, pinned as pure functions
  * (VERDICT r12 task 4): the absolute `cont` floor catches hard bursts,
  * but r12's scale10 window ran at effmin 17.6 against the round's own
  * in-suite band of ~24 and still read `cont: 0` — a 25%-slow window
  * certified as clean, which cost the round its q43/q67 attribution.
  * The RELATIVE `slow` verdict closes that blind spot. */
class BenchVerdictSpec extends AnyFunSuite {

  test("synthetic r12 window trips the slow flag; in-band windows do not") {
    // the round's own band: median of the main suite's eff samples
    // (r12's published calib eff array shape)
    val band = Bench.calibBand(Seq(24.9, 23.8, 25.6, 24.1, 26.0), 32.0)
    assert(band == 24.9, s"median of the sample array, got $band")
    // the exact window the verdict names: scale10 at effmin 17.59
    assert(Bench.slowWindow(17.59, band),
      "the r12 blind-spot window must flag slow")
    // r11's scale10 window (effmin 23.8 in a ~24 band) stays clean
    assert(!Bench.slowWindow(23.8, band),
      "an in-band window must not flag")
    // boundary: strictly below frac × band
    assert(!Bench.slowWindow(Bench.SlowBandFrac * band, band))
    assert(Bench.slowWindow(Bench.SlowBandFrac * band - 1e-9, band))
  }

  test("band anchor: median of samples, fallback to expected cores when empty") {
    assert(Bench.calibBand(Nil, 32.0) == 32.0)
    assert(Bench.calibBand(Seq(20.0), 32.0) == 20.0)
    // even count: the upper median (a stable, documented choice)
    assert(Bench.calibBand(Seq(20.0, 24.0), 32.0) == 24.0)
  }
}
