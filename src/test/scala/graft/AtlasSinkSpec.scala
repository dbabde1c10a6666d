package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.argo.{Atlas, AtlasSink}

/** S9: the sink must carry the reference's NetCDF metadata
  * (atlas.py:576-636) — per-variable units that survive a parquet
  * round-trip, and the global attrs incl. "latest profile" = max(JULD). */
class AtlasSinkSpec extends SparkSuite {
  import spark.implicits._

  test("units + global attrs round-trip through the sink") {
    val out = graft.TempDirs.create("atlas_sink").toString
    val atlas = new Atlas(box = (10.0, 30.0, -50.0, -30.0), reso = 5.0)
    // a tiny long-format atlas frame (shape of climTS output)
    val df = Seq((12.5f, -45.0f, 0.0f, 18.0f, 35.1f))
      .toDF("lon", "lat", "pres", "CT", "SR")
    val profiles = Seq(
      (1, new Timestamp(1577836800000L)),
      (2, new Timestamp(1650000000000L)))
      .toDF("WMO", "JULD")

    AtlasSink.write(out, atlas, df, profiles)

    // units are restored from the parquet schema footer by a plain read
    val back = spark.read.parquet(out)
    assert(back.schema("CT").metadata.getString("units") === "°C")
    assert(back.schema("SR").metadata.getString("units") === "$g\\,kg^{-1}$")
    assert(!back.schema("lon").metadata.contains("units"))
    assert(back.count() === 1)

    // global attrs mirror the reference's nc atts
    val attrs = AtlasSink.readAttrs(spark, out)
    assert(attrs.contains("\"name\": \"Atlas of Argo statistics\""))
    assert(attrs.contains("\"domain\": [10.0, 30.0, -50.0, -30.0]"))
    assert(attrs.contains("\"domain_name\": \"agulhas\"")) // atlas.py DOMAINS
    assert(attrs.contains("\"resolution\": 5.0"))
    assert(attrs.contains("2022")) // latest profile is the max JULD
  }

  test("EAPE variables carry the reference units") {
    assert(AtlasSink.Units("EAPE_R14") === "$cm^2\\,s^{-2}$")
    assert(AtlasSink.Units("SIGSTAR") === "$kg\\,m^{-3}$")
    assert(AtlasSink.domainName((0.0, 1.0, 2.0, 3.0)) === "someregion")
  }
}
