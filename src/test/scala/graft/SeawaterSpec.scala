package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Seawater, Teos10}

class SeawaterSpec extends AnyFunSuite {
  import Seawater.Lorenz

  test("SR_from_SP applies the TEOS-10 ups constant") {
    assert(math.abs(Seawater.srFromSp(35.0) - 35.16504) < 1e-9)
    assert(Seawater.srFromSp(0.0) === 0.0)
  }

  test("Lorenz reference density is monotone increasing in depth") {
    val zs = (0 to 6000 by 50).map(_.toDouble)
    zs.sliding(2).foreach { case Seq(z1, z2) =>
      assert(Lorenz.rhoRef(z1) < Lorenz.rhoRef(z2), s"at z=$z1")
    }
    // plausible ocean densities
    assert(Lorenz.rhoRef(0) > 1015 && Lorenz.rhoRef(0) < 1025)
    assert(Lorenz.rhoRef(6000) > 1045 && Lorenz.rhoRef(6000) < 1060)
  }

  test("Lorenz hydrostatic pressure: pr(0)=0, increasing, ~1 dbar/m") {
    assert(math.abs(Lorenz.pr(0.0)) < 1e-9)
    assert(Lorenz.pr(1000.0) > 900 && Lorenz.pr(1000.0) < 1100)
    val zs = (0 to 6000 by 100).map(_.toDouble)
    zs.sliding(2).foreach { case Seq(z1, z2) =>
      assert(Lorenz.pr(z1) < Lorenz.pr(z2))
    }
  }

  test("gammat bisection converges: reference density matches parcel density at zref") {
    // After 30 branch-free bisection steps the bracket is 6000/2^30 m wide;
    // the residual in density units is bounded by drho/dz * bracket.
    for (sr <- Seq(34.0, 35.0, 36.0); ct <- Seq(2.0, 10.0, 18.0)) {
      val (_, zref, pref, _) = Seawater.gammatAnalytic(sr, ct)
      assert(zref >= 0 && zref <= 6000)
      val parcel = Teos10.rho(sr, ct, pref)
      if (zref > 1e-3 && zref < 5999) { // interior root ⇒ tight residual
        val resid = math.abs(Lorenz.rhoRef(zref) - parcel)
        assert(resid < 1e-3, s"sr=$sr ct=$ct zref=$zref resid=$resid")
      }
    }
  }

  test("gammat is monotone: denser parcels reference deeper") {
    // colder ⇒ denser ⇒ deeper zref and larger gammat (fixed salinity)
    val results = Seq(20.0, 15.0, 10.0, 5.0)
      .map(ct => Seawater.gammatAnalytic(35.0, ct))
    results.sliding(2).foreach { case Seq((g1, z1, _, _), (g2, z2, _, _)) =>
      assert(z2 >= z1, "zref should deepen as parcels densify")
      assert(g2 > g1, "gammat should grow as parcels densify")
    }
  }

  test("poly8 Horner matches direct evaluation") {
    val x = 0.37
    val direct = 6.431 + 6.677 * x - 0.08414 * x * x - 0.03696 * math.pow(x, 3) +
      0.06807 * math.pow(x, 4) - 0.06387 * math.pow(x, 5) + 0.03216 * math.pow(x, 6) -
      0.008056 * math.pow(x, 7) + 0.0007824 * math.pow(x, 8)
    assert(math.abs(Lorenz.poly8(x) - direct) < 1e-12)
  }
}
