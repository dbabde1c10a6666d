package graft.argo

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder

/** S9: the atlas sink with the reference's metadata
  * (write_atlas_to_netcdf, atlas.py:576-636).
  *
  * The reference writes a NetCDF4 file: three dimensions (lon, lat, pres),
  * up to six f4 variables each carrying a `units` attribute, and global
  * attributes (name, domain, resolution, "latest profile" = max JULD).
  * The Spark-native equivalent keeps the long-format (lon, lat, pres)
  * frame — the layout every Spark sink, partitioner and reader already
  * understands — and carries the SAME metadata:
  *
  *  - per-variable `units` go into the Spark column metadata, which
  *    parquet persists in its schema footer and `spark.read` restores;
  *  - the global attributes go into a `_atlas_attrs.json` sidecar next to
  *    the part files (written through the Hadoop FS API, so it lands on
  *    HDFS/S3 the same as locally), mirroring the nc global atts.
  *
  * A dense-array NetCDF export is then a LOCAL post-processing step over
  * one tiny file set (cells × levels rows), exactly like the reference's
  * single-node write after its compute.
  */
object AtlasSink {

  /** Per-variable units, verbatim from the reference (atlas.py:39-46). */
  val Units: Map[String, String] = Map(
    "CT" -> "°C",
    "SR" -> "$g\\,kg^{-1}$",
    "SIGSTAR" -> "$kg\\,m^{-3}$",
    "GAMMAT" -> "$kg\\,m^{-3}$",
    "EAPE" -> "$cm^2\\,s^{-2}$",
    "EAPE_R14" -> "$cm^2\\,s^{-2}$",
    "EAPE_T25" -> "$cm^2\\,s^{-2}$")

  /** Named regions, verbatim from the reference (atlas.py:19-35):
    * name → (lon1, lon2, lat1, lat2). */
  val Domains: Map[String, (Double, Double, Double, Double)] = Map(
    "biscaye" -> (-15, 0, 35, 60),
    "subpolar" -> (-70, 0, 50, 70),
    "korea" -> (130, 140, 36, 44),
    "natl" -> (-90, 10, -10, 70),
    "satl" -> (-80, 0, -70, 10),
    "acc_indian" -> (0, 100, -60, -20),
    "acc" -> (-180, 180, -70, -30),
    "zapiola" -> (-60, -40, -50, -30),
    "atl" -> (-80, 20, -60, 60),
    "senegal" -> (-30, -10, 10, 30),
    "agulhas" -> (10, 30, -50, -30),
    "newzealand" -> (140, 180, -60, -30),
    "gulfstream" -> (-80, -50, 20, 50),
    "drake" -> (-80, -50, -70, -40),
    "gulfmexico" -> (-100, -60, 10, 30))

  /** infer_domain_name (atlas.py:569-573). */
  def domainName(box: (Double, Double, Double, Double)): String =
    Domains.collectFirst { case (n, b) if b == box => n }
      .getOrElse("someregion")

  /** Write the long-format atlas frame with units metadata + the global
    * attrs sidecar. `profiles` supplies "latest profile" = max(JULD). */
  def write(out: String, atlas: Atlas, df: DataFrame,
            profiles: DataFrame): Unit = {
    val latest = profiles.agg(max(col("JULD"))).head().get(0)
    val annotated = df.select(df.columns.toIndexedSeq.map { c =>
      Units.get(c) match {
        case Some(u) =>
          val m = new MetadataBuilder().putString("units", u).build()
          col(c).as(c, m)
        case None => col(c)
      }
    }: _*)
    annotated.write.mode("overwrite").parquet(out)
    writeAttrs(df.sparkSession, out, attrsJson(atlas, String.valueOf(latest)))
  }

  private def attrsJson(atlas: Atlas, latest: String): String = {
    val (lon1, lon2, lat1, lat2) = atlas.box
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c => c.toString
    }
    s"""{"name": "Atlas of Argo statistics",
       | "domain": [$lon1, $lon2, $lat1, $lat2],
       | "domain_name": "${esc(domainName(atlas.box))}",
       | "resolution": ${atlas.reso},
       | "latest profile": "${esc(latest)}"}""".stripMargin
  }

  val AttrsFile = "_atlas_attrs.json"

  private def writeAttrs(s: SparkSession, out: String, json: String): Unit = {
    val p = new Path(out, AttrsFile)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    try os.write(json.getBytes(StandardCharsets.UTF_8)) finally os.close()
  }

  /** Read back the global attrs sidecar (raw JSON string). */
  def readAttrs(s: SparkSession, out: String): String = {
    val p = new Path(out, AttrsFile)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  /** True NetCDF export (write_atlas_to_netcdf, atlas.py:576-636): dims
    * lon/lat/pres with coordinate variables, each data variable as f4 on
    * (pres, lat, lon) with its units attribute, and the reference's global
    * atts. The atlas is O(cells × levels) — a single-file export is the
    * same single-node write the reference does after its compute — but the
    * driver must not hold EVERY variable's dense grid at once (a global
    * 1/4°×64 grid is ~0.25 GB per variable): the file streams out through
    * [[graft.sources.Nc3.writeStreaming]], collecting, scattering and
    * dropping ONE variable's column at a time. Variables are any of the
    * long-format columns beyond (lon, lat, pres); cells absent from `df`
    * (land, no data) are written as 0, matching the reference's
    * zero-initialized arrays. */
  def writeNetcdf(out: String, atlas: Atlas, df: DataFrame,
                  profiles: DataFrame): Unit = {
    import graft.sources.Nc3
    val (lon1, lon2, lat1, lat2) = atlas.box
    val reso = atlas.reso
    val nLon = atlas.nLon
    val nLat = atlas.nLat
    val pref = ArgoSchemas.Pref
    val nP = pref.length
    val latest = profiles.agg(max(col("JULD"))).head().get(0)

    val dataCols = df.columns.filterNot(Seq("lon", "lat", "pres").contains)
    val presIdx = pref.zipWithIndex.map { case (p, i) => p.toFloat -> i }.toMap

    val dims = Seq(Nc3.Dim("lon", nLon), Nc3.Dim("lat", nLat),
      Nc3.Dim("pres", nP))
    val gatts = Seq(
      Nc3.Att("name", Nc3.NcChar, "Atlas of Argo statistics"),
      Nc3.Att("domain", Nc3.NcDouble, Array(lon1, lon2, lat1, lat2)),
      Nc3.Att("resolution", Nc3.NcDouble, Array(reso)),
      Nc3.Att("latest profile", Nc3.NcChar, String.valueOf(latest)))
    val coordData: Map[String, Array[Float]] = Map(
      "lon" -> Array.tabulate(nLon)(i => (lon1 + i * reso).toFloat),
      "lat" -> Array.tabulate(nLat)(j => (lat1 + j * reso).toFloat),
      "pres" -> pref.map(_.toFloat))
    val decls =
      Seq("lon", "lat", "pres").map(n => Nc3.VarDecl(n, Seq(n), Nil, Nc3.NcFloat)) ++
        dataCols.toSeq.map { name =>
          val atts = Units.get(name).map(u => Nc3.Att("units", Nc3.NcChar, u)).toSeq
          Nc3.VarDecl(name, Seq("pres", "lat", "lon"), atts, Nc3.NcFloat)
        }

    // CDF-1 offsets are 32-bit; a fine global grid with several variables
    // crosses 2 GiB, where the classic large-file variant (CDF-2) is the
    // correct header — pick it automatically from the known dense size
    val dataBytes = 4L * nP * nLat * nLon * dataCols.length
    val version = if (dataBytes > Int.MaxValue / 2) 2 else 1

    // one pass per data variable (narrow: lon, lat, pres, value) — so pin
    // the long-format frame for the duration instead of recomputing the
    // whole atlas aggregation per variable. Each pass is ONE parallel job
    // that packs (flat grid offset, value) into primitive arrays per
    // partition and collects those: peak driver memory stays one
    // variable's dense grid plus its sparse pair list (≤ 2× the grid —
    // a collect of boxed Row objects would be ~10× more, and the
    // alternative, toLocalIterator, schedules one sequential job per
    // partition: measured ~1 s of pure job-launch overhead per export
    // at 32 shuffle partitions).
    // a caller may hand a frame it keeps memoized (q76 reuses the atlas
    // cells) — unpersisting THAT would evict the caller's cache entry
    // (CacheManager uncaches by sameResult), so only manage storage we
    // created ourselves
    val preCached = df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val cached = if (preCached) df else df.persist()
    val p = new Path(out)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    try {
      val os = fs.create(p, true)
      try {
        Nc3.writeStreaming(os, dims, gatts, decls, version) { d =>
          coordData.getOrElse(d.name, {
            val grid = new Array[Float](nP * nLat * nLon)
            val idx = presIdx
            val (lo1, la1, rs, nI, nJ) = (lon1, lat1, reso, nLon, nLat)
            cached.select(col("lon"), col("lat"), col("pres"), col(d.name))
              .rdd.mapPartitions { it =>
                val offs = new scala.collection.mutable.ArrayBuilder.ofInt
                val vals = new scala.collection.mutable.ArrayBuilder.ofFloat
                it.foreach { r =>
                  val gi = math.round((r.getFloat(0) - lo1) / rs).toInt
                  val gj = math.round((r.getFloat(1) - la1) / rs).toInt
                  val gk = idx(r.getFloat(2))
                  if (gi >= 0 && gi < nI && gj >= 0 && gj < nJ) {
                    offs += (gk * nJ + gj) * nI + gi
                    vals += r.getFloat(3)
                  }
                }
                Iterator.single((offs.result(), vals.result()))
              }.collect().foreach { case (offs, vals) =>
                var i = 0
                while (i < offs.length) { grid(offs(i)) = vals(i); i += 1 }
              }
            grid
          })
        }
      } finally os.close()
    } finally if (!preCached) cached.unpersist(false)
  }
}
