package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Teos10

/** Validation of the TEOS-10 port (graft.functions.Teos10).
  *
  * Four independent lines of evidence:
  *  1. published check values (the GSW toolbox's standard 6-level
  *     profile, values quoted to the published precision);
  *  2. exact identities required by the TEOS-10 definitions
  *     (CT(SSO, pt=0) = 0; pt0(p=0) = t);
  *  3. internal consistency: the Newton derivative polynomial
  *     `gibbsPt0Pt0` must equal −d/dθ of the entropy polynomial — a
  *     transcription error in either block breaks the match;
  *  4. a differential oracle: potential temperature from a completely
  *     independent public algorithm (UNESCO/EOS-80 adiabatic-lapse-rate
  *     RK4 integration, Fofonoff & Millard 1983) must agree to ~0.01 °C.
  */
class Teos10Spec extends AnyFunSuite {

  // GSW documentation standard profile
  private val SA = Array(34.7118, 34.8915, 35.0256, 34.8472, 34.7366, 34.7324)
  private val CT = Array(28.8099, 28.4392, 22.7862, 10.2262, 6.8272, 4.3236)
  private val T = Array(28.7856, 28.4329, 22.8103, 10.2600, 6.8863, 4.4036)
  private val P = Array(10.0, 50.0, 125.0, 250.0, 600.0, 1000.0)

  test("rho matches published 75-term check values") {
    val want = Array(1021.840, 1022.263, 1024.428, 1027.790, 1029.838, 1032.002)
    for (i <- SA.indices) {
      val got = Teos10.rho(SA(i), CT(i), P(i))
      assert(math.abs(got - want(i)) < 2e-2, s"rho($i): $got vs ${want(i)}")
    }
  }

  test("rhoInP (precompiled pressure polynomial) is bit-identical to rho") {
    for (sa <- Seq(0.0, 30.0, 34.7118, 36.5); ct <- Seq(-2.0, 4.0, 15.0, 28.8);
         p <- Seq(0.0, 10.0, 600.0, 2000.0, 5500.0)) {
      val fast = Teos10.rhoInP(sa, ct)(p)
      assert(fast == Teos10.rho(sa, ct, p), s"rhoInP($sa,$ct)($p)")
    }
  }

  test("sound speed matches published check values and Medwin's independent formula") {
    val want = Array(1542.616, 1542.704, 1530.845, 1494.410, 1487.377)
    for (i <- want.indices) {
      val got = Teos10.soundSpeed(SA(i), CT(i), P(i))
      assert(math.abs(got - want(i)) < 0.5, s"c($i): $got vs ${want(i)}")
    }
    // differential vs Medwin's (public, independent) simplified formula,
    // quoted accuracy ~1 m/s in oceanic ranges; covers the full profile
    for (i <- SA.indices) {
      val got = Teos10.soundSpeed(SA(i), CT(i), P(i))
      val medwin = graft.functions.Seawater.soundSpeed(SA(i), T(i), P(i))
      assert(math.abs(got - medwin) < 2.5, s"c($i): teos10 $got vs medwin $medwin")
    }
  }

  test("CT_from_t matches published check values") {
    for (i <- SA.indices) {
      val got = Teos10.ctFromT(SA(i), T(i), P(i))
      assert(math.abs(got - CT(i)) < 5e-3, s"ct($i): $got vs ${CT(i)}")
    }
  }

  test("identity: CT(SSO, pt=0) = 0 (to published coefficient precision)") {
    assert(math.abs(Teos10.ctFromPt(Teos10.Sso, 0.0)) < 1e-6)
  }

  test("exact identity: potential temperature at p=0 is t itself") {
    for (sa <- Seq(2.0, 20.0, 35.0, 40.0); t <- Seq(-1.0, 5.0, 15.0, 29.0)) {
      val pt = Teos10.pt0FromT(sa, t, 0.0)
      assert(math.abs(pt - t) < 1e-6, s"pt0(sa=$sa, t=$t, 0) = $pt")
    }
  }

  test("entropy polynomial and its Newton derivative are consistent") {
    val h = 1e-4
    for (sa <- Seq(5.0, 20.0, 35.0, 40.0); pt <- Seq(-1.0, 4.0, 15.0, 28.0)) {
      val num = (Teos10.entropyPartZerop(sa, pt + h) -
        Teos10.entropyPartZerop(sa, pt - h)) / (2 * h)
      val ana = -Teos10.gibbsPt0Pt0(sa, pt)
      assert(math.abs(num - ana) < 1e-4 * math.abs(ana),
        s"d(entropy)/dpt at sa=$sa pt=$pt: $num vs $ana")
    }
  }

  // ---- independent differential oracle: UNESCO EOS-80 theta --------------
  /** Adiabatic lapse rate Γ(S, t, p), °C/dbar (Fofonoff & Millard 1983;
    * S practical salinity, t in-situ °C, p dbar). */
  private def adtg(s: Double, t: Double, p: Double): Double =
    3.5803e-5 + 8.5258e-6 * t - 6.836e-8 * t * t + 6.6228e-10 * t * t * t +
      (s - 35.0) * (1.8932e-6 - 4.2393e-8 * t) +
      p * (1.8741e-8 - 6.7795e-10 * t + 8.733e-12 * t * t - 5.4481e-14 * t * t * t) +
      (s - 35.0) * p * (-1.1351e-10 + 2.7759e-12 * t) +
      p * p * (-4.6206e-13 + 1.8676e-14 * t - 2.1687e-16 * t * t)

  /** UNESCO potential temperature to 0 dbar via Runge-Kutta-Gill. */
  private def thetaUnesco(s: Double, t: Double, p: Double): Double = {
    val delP = -p
    val sq2 = math.sqrt(2.0)
    var delTh = delP * adtg(s, t, p)
    var th = t + 0.5 * delTh
    var q = delTh
    delTh = delP * adtg(s, th, p + 0.5 * delP)
    th += (1 - 1 / sq2) * (delTh - q)
    q = (2 - sq2) * delTh + (-2 + 3 / sq2) * q
    delTh = delP * adtg(s, th, p + 0.5 * delP)
    th += (1 + 1 / sq2) * (delTh - q)
    q = (2 + sq2) * delTh - (2 + 3 / sq2) * q
    delTh = delP * adtg(s, th, p + delP)
    th + (delTh - 2 * q) / 6
  }

  test("pt0 agrees with the independent UNESCO lapse-rate integration") {
    val ups = Teos10.Sso / 35.0
    for (sp <- Seq(33.0, 35.0, 37.0); t <- Seq(1.0, 10.0, 25.0);
         p <- Seq(100.0, 1000.0, 4000.0)) {
      val gswPt = Teos10.pt0FromT(sp * ups, t, p)
      val unescoPt = thetaUnesco(sp, t, p)
      assert(math.abs(gswPt - unescoPt) < 0.02,
        s"pt0(sp=$sp t=$t p=$p): teos10=$gswPt unesco=$unescoPt")
      // and the correction is real: at 4000 dbar it must be clearly < t
      if (p >= 4000) assert(t - gswPt > 0.05, s"no adiabatic correction? $gswPt vs $t")
    }
  }

  test("physical derivatives: thermal expansion, haline contraction, compressibility") {
    val (sa, ct, p) = (35.16504, 10.0, 500.0)
    val v0 = Teos10.rho(sa, ct, p)
    val alpha = -(Teos10.rho(sa, ct + 0.5, p) - Teos10.rho(sa, ct - 0.5, p)) / v0
    val beta = (Teos10.rho(sa + 0.5, ct, p) - Teos10.rho(sa - 0.5, ct, p)) / v0
    val kappaDbar = (Teos10.rho(sa, ct, p + 50) - Teos10.rho(sa, ct, p - 50)) / 100 / v0
    assert(alpha > 1e-4 && alpha < 2.5e-4, s"alpha=$alpha")  // /K at 10 °C
    assert(beta > 7e-4 && beta < 8.2e-4, s"beta=$beta")      // /(g/kg)
    assert(kappaDbar > 3.5e-6 && kappaDbar < 4.7e-6, s"kappa=$kappaDbar") // /dbar
    // surface anchor: standard seawater at 0 °C
    val r0 = Teos10.rho(Teos10.Sso, 0.0, 0.0)
    assert(r0 > 1027.9 && r0 < 1028.3, s"rho(SSO,0,0)=$r0")
  }

  test("rho is monotone in pressure and consistent with sound speed") {
    // c² from finite-difference drho/dp should match the analytic c
    val (sa, ct) = (35.0, 5.0)
    for (p <- Seq(0.0, 1000.0, 3000.0)) {
      val c = Teos10.soundSpeed(sa, ct, p)
      assert(c > 1400 && c < 1600, s"c=$c at p=$p")
      val dp = 1.0 // dbar = 1e4 Pa
      val drho = Teos10.rho(sa, ct, p + dp) - Teos10.rho(sa, ct, p - dp)
      val cFd = math.sqrt(2 * dp * 1e4 / drho)
      assert(math.abs(cFd - c) / c < 1e-4, s"c analytic $c vs FD $cFd")
    }
  }
}
