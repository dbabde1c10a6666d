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

  test("per-query scale10 band: the r13 gap trips, clean walls do not") {
    // the exact r13 numbers the task names: q43 published 11.0 in a
    // CLEAN-verdict window against its proven-clean 7.90 — the window
    // effmin missed it, the per-query band must not
    // the r13 bands as literals: the live Scale10Bands map has since been
    // tightened to the r14 optimization round's clean walls (the verdict
    // FUNCTION under test is band-value-independent)
    val q43Band = 7.90
    assert(Bench.queryOverBand(11.0, q43Band),
      "r13's q43 wall must flag against its clean band")
    // q67's 9.84 sat at 1.15× its band — under the 1.25× re-run trigger
    // by design (the flag is for walls the clean band can't explain, not
    // for every window's noise); the Done thresholds stay unflagged
    assert(!Bench.queryOverBand(9.84, 8.53))
    assert(!Bench.queryOverBand(9.5, q43Band))
    assert(!Bench.queryOverBand(9.0, 8.53))
    // and every live band is positive and carried for a scale10 member
    assert(Bench.Scale10Bands.values.forall(_ > 0))
    // boundary at exactly ratio × band: strictly-over flags
    assert(!Bench.queryOverBand(Bench.Scale10BandRatio * q43Band, q43Band))
    assert(Bench.queryOverBand(Bench.Scale10BandRatio * q43Band + 1e-9, q43Band))
    // a query with no band never flags (new members before their first
    // clean measurement)
    assert(!Bench.queryOverBand(100.0, -1.0))
    // the absolute excess floor (r14): sub-second members over ratio on
    // jitter alone must not flag — 0.39 vs a 0.31 band is 80 ms of
    // excess; a genuinely regressed small member (band + >0.5 s) still
    // does, as does any r13-style multi-second gap
    assert(!Bench.queryOverBand(0.39, 0.31))
    assert(Bench.queryOverBand(0.95, 0.31))
    assert(Bench.queryOverBand(11.0, 7.90))
  }

  test("main-loop outlier: r13's phantom walls trip, normal drift does not") {
    // the four r13 phantoms, against their previous-artifact walls
    assert(Bench.mainOutlier(0.93, 0.10)) // q119, 13×
    assert(Bench.mainOutlier(1.64, 0.27)) // q120
    assert(Bench.mainOutlier(1.13, 0.21)) // q80
    assert(Bench.mainOutlier(1.65, 0.31)) // q82
    // ordinary round-to-round drift stays quiet
    assert(!Bench.mainOutlier(1.20, 1.00))
    assert(!Bench.mainOutlier(2.83, 2.65))
    // sub-floor jitter on cheap queries never buys a re-run
    assert(!Bench.mainOutlier(0.16, 0.05))
    // no previous wall (new query / first round at this sf) → quiet
    assert(!Bench.mainOutlier(5.0, -1.0))
    assert(!Bench.mainOutlier(5.0, 0.0))
  }

  test("previous-artifact parse: short-key walls, sf-guarded") {
    val art = """{"metric":"total","value":62.45,"unit":"sec","queries":{"q01":0.35,"q119":0.1,"q43":7.9},"stages":{"calib":{"effmin":24.0}},"sf":"/root/testdata/sf0.1"}"""
    val w = Bench.parsePrevWalls(art, "/root/testdata/sf0.1")
    assert(w == Map("q01" -> 0.35, "q119" -> 0.1, "q43" -> 7.9))
    // a different sf must not anchor anything
    assert(Bench.parsePrevWalls(art, "/root/testdata/sf0.01").isEmpty)
    // garbage never throws — no artifact, no bands
    assert(Bench.parsePrevWalls("not json", "/x").isEmpty)
  }
}
