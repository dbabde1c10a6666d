package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Nc3

/** The reference-API facade end-to-end: GDAC scan → summary → interpolate
  * → atlas → NetCDF, each step through [[Argostats]]' one-to-one mapping
  * of the reference's `__init__.py` surface. */
class ArgostatsApiSpec extends SparkSuite {
  import spark.implicits._

  private val nProf = 4
  private val nLev = 50
  private def tTrue(z: Double): Double = 2.0 + 16.0 * math.exp(-z / 500.0)

  private lazy val gdac: String = {
    val pres = Array.tabulate(nProf * nLev)(i => (i % nLev) * 40.0f)
    val temp = pres.map(p => tTrue(p).toFloat)
    val psal = pres.map(_ => 35.0f)
    val qc = Array.fill(nProf * nLev)('1'.toByte)
    val file = Nc3.write(
      dims = Seq(Nc3.Dim("N_PROF", nProf), Nc3.Dim("N_LEVELS", nLev)),
      gatts = Nil,
      vars = Seq(
        Nc3.VarSpec("JULD", Seq("N_PROF"), Nil, Nc3.NcDouble,
          Array.tabulate(nProf)(25567.0 + _)),
        Nc3.VarSpec("LONGITUDE", Seq("N_PROF"), Nil, Nc3.NcDouble,
          Array.tabulate(nProf)(5.0 + _ * 0.5)),
        Nc3.VarSpec("LATITUDE", Seq("N_PROF"), Nil, Nc3.NcDouble,
          Array.fill(nProf)(-40.0)),
        // delayed mode: the atlas stage aggregates only DATA_MODE == 'D'
        // profiles (reference crop semantics, atlas.py:243-246)
        Nc3.VarSpec("DATA_MODE", Seq("N_PROF"), Nil, Nc3.NcChar,
          ("D" * nProf).getBytes("UTF-8")),
        Nc3.VarSpec("POSITION_QC", Seq("N_PROF"), Nil, Nc3.NcChar,
          ("1" * nProf).getBytes("UTF-8")),
        Nc3.VarSpec("JULD_QC", Seq("N_PROF"), Nil, Nc3.NcChar,
          ("1" * nProf).getBytes("UTF-8")),
        Nc3.VarSpec("PRES", Seq("N_PROF", "N_LEVELS"), Nil, Nc3.NcFloat, pres),
        Nc3.VarSpec("TEMP", Seq("N_PROF", "N_LEVELS"), Nil, Nc3.NcFloat, temp),
        Nc3.VarSpec("PSAL", Seq("N_PROF", "N_LEVELS"), Nil, Nc3.NcFloat, psal),
        Nc3.VarSpec("PRES_QC", Seq("N_PROF", "N_LEVELS"), Nil, Nc3.NcChar, qc),
        Nc3.VarSpec("TEMP_QC", Seq("N_PROF", "N_LEVELS"), Nil, Nc3.NcChar, qc),
        Nc3.VarSpec("PSAL_QC", Seq("N_PROF", "N_LEVELS"), Nil, Nc3.NcChar, qc)))
    val root = graft.TempDirs.create("gdac-api")
    val dir = root.resolve("coriolis/6901000")
    Files.createDirectories(dir)
    Files.write(dir.resolve("6901000_prof.nc"), file)
    root.toString
  }

  test("the full reference pipeline runs through the facade, save/load included") {
    val tmp = graft.TempDirs.create("argostats-api").toString
    // build_summary + to_pickle / load_summary
    Argostats.saveSummary(Argostats.buildSummary(spark, gdac), s"$tmp/summary")
    val summary = Argostats.loadSummary(spark, s"$tmp/summary")
    assert(summary.count() === nProf)
    // ArgoInterp(df).proceed_all() + save / load_profiles
    Argostats.saveProfiles(
      Argostats.interpolateAll(spark, gdac, summary), s"$tmp/profiles")
    val profiles = Argostats.loadProfiles(spark, s"$tmp/profiles")
    assert(profiles.count() === nProf)
    // Atlas(domain, reso, aop).clim_TS() + to_netcdf()
    val at = Argostats.atlas(box = (0.0, 10.0, -44.0, -36.0), reso = 2.0)
    val ts = at.climTS(spark, profiles).filter($"CT" =!= 0.0f)
    assert(ts.count() > 0)
    Argostats.toNetcdf(s"$tmp/atlas.nc", at, ts, profiles)
    // the export is spec-conformant classic NetCDF with the field values
    val nc = new Nc3.NcFile(
      Files.readAllBytes(java.nio.file.Paths.get(s"$tmp/atlas.nc")))
    val ct = nc.readDoubles("CT")
    assert(ct.exists(v => math.abs(v - tTrue(0.0)) < 0.2),
      "surface CT missing from the exported atlas")
    assert(nc.gatt("resolution").isDefined)
    // map_atlas(atlas, field, kz) → the colormapped PPM figure
    Argostats.mapAtlas(s"$tmp/ct_map.ppm", at, ts, "CT", kz = 0)
    val ppm = Files.readAllBytes(java.nio.file.Paths.get(s"$tmp/ct_map.ppm"))
    val header = s"P6\n${at.nLon} ${at.nLat}\n255\n".getBytes("US-ASCII")
    assert(ppm.take(header.length).toSeq === header.toSeq)
    assert(ppm.length === header.length + at.nLon * at.nLat * 3)
    // data cells got colormapped: some pixel differs from the grey fill
    assert(ppm.drop(header.length).exists(_ != 204.toByte),
      "no colormapped pixels in the exported map")
  }

  test("the masked atlas prunes land cells through the packaged bathymetry") {
    val summary = Argostats.buildSummary(spark, gdac)
    val profiles = Argostats.interpolateAll(spark, gdac, summary)
    val open = Argostats.atlas((0.0, 10.0, -44.0, -36.0), 2.0)
    val masked = Argostats.atlas((0.0, 10.0, -44.0, -36.0), 2.0, maskLand = true)
    val nOpen = open.grid(spark).count()
    val nMasked = masked.grid(spark).count()
    assert(nMasked <= nOpen)
    // masked pipeline still aggregates over the ocean cells
    assert(masked.climTS(spark, profiles).filter($"CT" =!= 0.0f).count() > 0)
  }
}
