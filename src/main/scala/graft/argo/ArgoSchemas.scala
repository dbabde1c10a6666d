package graft.argo

import org.apache.spark.sql.types._

/** Canonical schemas of the Argo pipeline (SURVEY.md §1.3), explicit and
  * fixed — the engine never infers schemas (the reference serializes its
  * `Struct` into file headers, /root/reference/src/argostats/aos.py:150-153;
  * Parquet's footer plays that role here).
  */
object ArgoSchemas {
  /** Number of fixed interpolation pressure levels. */
  val NLevels = 64

  /** The 64 reference pressure levels, 0..2000 dbar, non-uniform spacing
    * (/root/reference/src/argostats/interpolation.py:256-265). */
  val Pref: Array[Double] = Array(
    0, 5, 10, 20, 30, 40, 50, 60, 70, 80, 90,
    100, 110, 120, 130, 140, 150, 160, 170,
    180, 190, 200, 220, 240, 260, 280, 300,
    320, 340, 360, 380, 400, 450, 500, 550,
    600, 650, 700, 750, 800, 850, 900, 950,
    1000, 1050, 1100, 1150, 1200, 1250, 1300,
    1350, 1400, 1450, 1500, 1550, 1600, 1650,
    1700, 1750, 1800, 1850, 1900, 1950, 2000).map(_.toDouble)

  /** The 11 data centers, in the reference's exact order — the position
    * IS the dictionary code (toctools.py:22-23, 173). */
  val Dacs: Seq[String] = Seq("aoml", "bodc", "coriolis", "csio", "csiro",
    "incois", "jma", "kiost", "kma", "meds", "nmdis")

  /** DATA_MODE dictionary: R(ealtime)=0, D(elayed)=1, A(djusted)=2
    * (toctools.py:25, 176). */
  val DataModes: Seq[String] = Seq("R", "D", "A")

  /** PLATFORM_TYPE dictionary, trimmed of the GDAC's 32-char padding —
    * position is the code, blank = 0 (toctools.py:26-66, encode at
    * toctools.py:195 `PLATFORMS.index`). */
  val Platforms: Seq[String] = Seq(
    "", "ALTO", "APEX", "APEX-SBE", "APEX_D", "ARVOR", "ARVOR_C",
    "ARVOR_D", "HM2000", "HM4000", "NAVIS", "NAVIS_A", "NAVIS_EBR",
    "NEMO", "NINJA", "NINJA_D", "NOVA", "NOVA-SBE", "Nova-SBE", "PALACE",
    "POPS_PROVOR", "PROVOR", "PROVOR-SBE", "PROVOR_II", "PROVOR_III",
    "PROVOR_IV", "PROVOR_MT", "PROVOR_V", "PROVOR_V_JUMBO",
    "Primary sampling: averaged []", "S2A", "S2X", "SOLO", "SOLO-W",
    "SOLO_BGC", "SOLO_BGC_MRV", "SOLO_D", "SOLO_D_MRV", "SOLO_II",
    "SOLO_W", "XUANWU", "n/a")

  /** Summary row: one per profile (toctools.py:160-183). */
  val summary: StructType = StructType(Seq(
    StructField("LONGITUDE", FloatType, nullable = false),
    StructField("LATITUDE", FloatType, nullable = false),
    StructField("JULD", TimestampType, nullable = false),
    StructField("N_LEVELS", ShortType, nullable = false),
    StructField("N_PROF", ShortType, nullable = false),
    StructField("DAC", ByteType, nullable = false),
    StructField("WMO", IntegerType, nullable = false),
    StructField("IPROF", ShortType, nullable = false),
    StructField("DATA_MODE", ByteType, nullable = false),
    StructField("PLATFORM_TYPE", ByteType, nullable = false),
    StructField("FLAG", ByteType, nullable = false)))

  /** Interpolated profile row (ARGOSTRUCT, interpolation.py:25-36). The
    * AOS's fixed-length f4[64] fields become ArrayType(FloatType) with the
    * length-64 invariant enforced by the interpolation kernel. */
  val profile: StructType = StructType(Seq(
    StructField("WMO", IntegerType, nullable = false),
    StructField("DAC", ByteType, nullable = false),
    StructField("IPROF", ShortType, nullable = false),
    StructField("JULD", TimestampType, nullable = false),
    StructField("LATITUDE", FloatType, nullable = false),
    StructField("LONGITUDE", FloatType, nullable = false),
    StructField("DATA_MODE", ByteType, nullable = false),
    StructField("FLAG", ByteType, nullable = false),
    StructField("NVALUES", IntegerType, nullable = false),
    StructField("CT", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("SR", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("IDX", ArrayType(ByteType, containsNull = false), nullable = false)))

  /** Atlas output, long format: one row per (cell, level) — the Spark-native
    * shape of the reference's dense (nlat, nlon, nz) arrays
    * (atlas.py:576-607); pivot back only at export. */
  val atlas: StructType = StructType(Seq(
    StructField("lon", FloatType, nullable = false),
    StructField("lat", FloatType, nullable = false),
    StructField("pres", FloatType, nullable = false),
    StructField("CT", FloatType, nullable = true),
    StructField("SR", FloatType, nullable = true),
    StructField("SIGSTAR", FloatType, nullable = true),
    StructField("EAPE", FloatType, nullable = true)))
}
