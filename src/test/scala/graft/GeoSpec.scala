package graft

import org.apache.spark.sql.functions._

import graft.functions.Geo

class GeoSpec extends SparkSuite {
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.cast("double")).head().getDouble(0)

  test("haversineKm: one degree of longitude at the equator ≈ 111.19 km") {
    val d = eval1(Geo.haversineKm(lit(0.0), lit(0.0), lit(1.0), lit(0.0)))
    assert(math.abs(d - 111.19) < 0.1)
  }

  test("haversineKm: Paris→London ≈ 344 km") {
    val d = eval1(Geo.haversineKm(lit(2.3522), lit(48.8566), lit(-0.1276), lit(51.5072)))
    assert(math.abs(d - 344) < 5)
  }

  test("haversineArg is monotone in distance and bounded [0,1]") {
    val near = eval1(Geo.haversineArg(lit(0.0), lit(0.0), lit(1.0), lit(0.0)))
    val far = eval1(Geo.haversineArg(lit(0.0), lit(0.0), lit(90.0), lit(0.0)))
    val anti = eval1(Geo.haversineArg(lit(0.0), lit(0.0), lit(180.0), lit(0.0)))
    assert(near > 0 && near < far && far < anti && anti <= 1.0 + 1e-12)
  }

  test("gaussian weight decays from 1") {
    assert(eval1(Geo.gaussianWeight(lit(0.0), lit(3.0))) === 1.0)
    assert(eval1(Geo.gaussianWeight(lit(1.0), lit(3.0))) < 0.05)
  }

  test("binIndex floors into uniform cells") {
    assert(eval1(Geo.binIndex(lit(-179.9), -180.0, 10.0)) === 0.0)
    assert(eval1(Geo.binIndex(lit(179.9), -180.0, 10.0)) === 35.0)
  }
}
