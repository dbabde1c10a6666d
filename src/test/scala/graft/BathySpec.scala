package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.argo.Bathy

class BathySpec extends AnyFunSuite {

  test("packaged resource is bit-identical to the generator") {
    val res = Bathy.default
    val gen = Bathy.generate()
    assert(res.nLon === gen.nLon)
    assert(res.nLat === gen.nLat)
    assert(java.util.Arrays.equals(res.bits, gen.bits),
      "resource bathy_mask.bin drifted from Bathy.generate — rerun graft.tools.MakeBathy")
  }

  test("nearest-index semantics: cell centers, rounding, wrap and clamp") {
    val m = Bathy.default
    // deep interior of continent 1 / open ocean
    assert(m.isLand(15.0, -32.0))
    assert(!m.isLand(15.0, 10.0))
    assert(m.isLand(-65.0, 30.0)) // continent 2
    assert(!m.isLand(170.0, 0.0))
    // nearest-index rounding: <half a cell from a land center stays land
    assert(m.isLand(15.04, -32.0))
    // longitude wrap: ±180 map to the same cell
    assert(m.isLand(180.0, 0.0) === m.isLand(-180.0, 0.0))
    // latitude clamp at the poles does not throw
    assert(!m.isLand(0.0, 90.0))
    assert(!m.isLand(0.0, -90.0))
  }

  test("lookup agrees with the analytic coastline away from cell edges") {
    val m = Bathy.default
    val rng = new scala.util.Random(7)
    (0 until 2000).foreach { _ =>
      // sample at cell centers so rasterization and lookup see the same point
      val i = rng.nextInt(m.nLon)
      val j = rng.nextInt(m.nLat)
      val lon = -180.0 + i * m.resoLon
      val lat = -90.0 + j * m.resoLat
      assert(m.isLand(lon, lat) === Bathy.syntheticLand(lon, lat),
        s"mismatch at ($lon, $lat)")
    }
  }

  test("land fraction is plausible for the two synthetic continents") {
    val f = Bathy.default.landFraction
    assert(f > 0.01 && f < 0.15, s"land fraction $f")
  }
}
