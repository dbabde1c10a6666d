package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.argo.{Atlas, AtlasSink, Bathy, Interpolator, SummaryBuilder}
import graft.functions.{SeawaterEos, Teos10}
import graft.sources.ArgoNetCDF

/** The reference's public API surface, one call per call — so a user of
  * argostats (`/root/reference/src/argostats/__init__.py:1-5`) can switch
  * by renaming functions, keeping the same pipeline mental model:
  *
  * | reference                           | here                            |
  * |-------------------------------------|---------------------------------|
  * | `build_summary()`                   | [[buildSummary]]                |
  * | `df.to_pickle / load_summary()`     | [[saveSummary]] / [[loadSummary]] (S4: pickle → parquet) |
  * | `ArgoInterp(df).proceed_all()`      | [[interpolateAll]]              |
  * | `aos.save / load_profiles()`        | [[saveProfiles]] / [[loadProfiles]] (S5/S8: BinaryFile → parquet) |
  * | `aop.crop(mask)`                    | `new Atlas(...).crop(profiles)` |
  * | `aop[["LONGITUDE","CT"]]`           | `profiles.select(...)`          |
  * | `Atlas(domain, reso, aop).clim_TS()`| [[atlas]] + `Atlas.climTS`      |
  * | `.clim_EAPE(algo)`                  | `Atlas.climEAPE`                |
  * | `at.to_netcdf()`                    | [[toNetcdf]]                    |
  *
  * Everything is a lazy DataFrame plan until a save/collect — the
  * reference's process pools, byte-offset files and tile loops have no
  * analog because partitioning, Parquet and the binned join do those jobs
  * (SURVEY.md §3).
  */
object Argostats {

  /** Stage 1 — `build_summary()` (toctools.py:86-145): scan the GDAC
    * layout `<dac>/<wmo>/<wmo>_prof.nc`, one summary row per profile. */
  def buildSummary(spark: SparkSession, gdacPath: String): DataFrame =
    SummaryBuilder.build(spark,
      ArgoNetCDF.rawHeader(ArgoNetCDF.read(spark, gdacPath)))

  /** `df.to_pickle(...)` (toctools.py:72-75) — parquet is the at-rest
    * format (S4). */
  def saveSummary(summary: DataFrame, path: String): Unit =
    summary.write.mode("overwrite").parquet(path)

  /** `load_summary()` (toctools.py:78-83). */
  def loadSummary(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Stage 2 — `ArgoInterp(df).proceed_all()` (interpolation.py:51-151):
    * re-scan the GDAC for sample arrays (the reference re-reads NetCDF
    * per float too), resolve adjusted variables, interpolate onto the 64
    * reference levels with the chosen [[Interpolator.Methods]] entry and
    * EOS.
    * @param algo 0 cubic (default, the reference's `interp1d`), 1 PCHIP,
    *             2 joint MR-PCHIP (`gsw.sa_ct_interp`) */
  def interpolateAll(spark: SparkSession, gdacPath: String,
                     summary: DataFrame, algo: Int = 0,
                     eos: SeawaterEos = Teos10): DataFrame =
    Interpolator.interpolate(
      ArgoNetCDF.samples(ArgoNetCDF.read(spark, gdacPath)),
      summary, algo, eos)

  /** `aos.save(...)` (S5) — one parquet part per task, no offsets. */
  def saveProfiles(profiles: DataFrame, path: String): Unit =
    profiles.write.mode("overwrite").parquet(path)

  /** `load_profiles()` (S8, aos.py:192-209). */
  def loadProfiles(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Stage 3 — `Atlas(domain, reso, aop)` (atlas.py:379-430). Pass
    * `maskLand = true` for the reference's bathymetry land skip (S10,
    * bathy.py:67-82) from the packaged 1/10° grid. */
  def atlas(box: (Double, Double, Double, Double), reso: Double,
            smoothingFactor: Double = 4.0, eos: SeawaterEos = Teos10,
            maskLand: Boolean = false): Atlas =
    new Atlas(box, reso, smoothingFactor, eos,
      landMask = if (maskLand) Bathy.default.isLand else (_, _) => false)

  /** `at.to_netcdf()` (atlas.py:576-636): single-file classic NetCDF with
    * coordinate variables, units and the reference's global attrs. `df` is
    * the long-format output of `climTS`/`climEAPE`. */
  def toNetcdf(path: String, atlas: Atlas, df: DataFrame,
               profiles: DataFrame): Unit =
    AtlasSink.writeNetcdf(path, atlas, df, profiles)

  /** `map_atlas(atlas, field, kz=43, plottopo=False)` (figures/maps.py:
    * 8-66): one vertical level of a `climTS`/`climEAPE` frame through the
    * precip16 colormap into a north-up PPM image; uncovered cells get the
    * reference's "#CCCCCC" land grey (maps.py:57); `plottopo` layers the
    * bathymetry contour cells (−4000/−2000/−100 m, maps.py:60-66) in
    * black on top. The matplotlib axes/colorbar decoration has no engine
    * analog — the pixels do. */
  def mapAtlas(path: String, atlas: Atlas, clim: DataFrame, field: String,
               kz: Int = 43, plottopo: Boolean = false): Unit = {
    graft.figures.Figures.writePpm(
      graft.figures.Figures.mapAtlas(clim, atlas, field, kz, plottopo),
      atlas.nLon, atlas.nLat, path)
  }
}
