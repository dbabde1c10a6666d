package graft.figures

import java.io.{BufferedOutputStream, FileOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.argo.{ArgoSchemas, Atlas}

/** The reference's figures layer (`figures/maps.py`, `figures/
  * first_profiles.py`) re-expressed data-first: each "figure" is a
  * DataFrame of plot-ready values — raster pixels, scatter points,
  * histogram bars — produced by the same distributed plans as every other
  * query, plus one driver-side writer that serializes a raster to a
  * binary PPM (P6) image. The matplotlib/cartopy calls the reference
  * wraps around these numbers have no engine analog (and no libraries in
  * this environment); everything up to the final `imshow` does.
  *
  * Scale note: the only driver-resident state is the pixel grid itself
  * (nlon × nlat × 3 bytes — KBs for any plottable image), same bounded-
  * output argument as the NetCDF sink; all normalization, colormap
  * lookup and binning run distributed.
  */
object Figures {

  /** Min-max normalize `value` to a micro-position t_u ∈ [0, 1_000_000]
    * and attach precip16 channels — the data `pcolor(..., cmap=precip16)`
    * renders (`figures/maps.py:32-48`). `value` must be an integer column
    * (fixed-point, as the verified aggregates already produce) so the
    * normalization `(v - min) * 1e6 div (max - min)` is exact integer
    * arithmetic in every engine.
    *
    * The one-row min/max frame joins in as a broadcast nested loop of a
    * single row — the stat never forces the cell frame to one partition. */
  def colorize(cells: DataFrame, valueCol: String): DataFrame = {
    val value = col(valueCol)
    // collision-proof internal names: colorize is a public API over
    // arbitrary frames, so a caller-owned "vmin"/"vmax" column must
    // neither turn the expression ambiguous nor get drop()ed below
    val stats = cells.agg(min(value).as("__graft_vmin"), max(value).as("__graft_vmax"))
    // `div` (integer division) keeps both engines in exact Long arithmetic;
    // needs (vmax - vmin) * 1e6 < 2^63, i.e. a value span < ~9.2e12 units —
    // any fixed-point field this engine produces is orders below that.
    val tU = when(col("__graft_vmax") > col("__graft_vmin"),
      expr(s"(($valueCol - __graft_vmin) * 1000000L) div (__graft_vmax - __graft_vmin)"))
      .otherwise(lit(0L))
    val withT = cells.crossJoin(broadcast(stats)).withColumn("t_u", tU)
    val (r, g, b) = Colormaps.precip16(col("t_u"))
    withT.withColumn("r", r).withColumn("g", g).withColumn("b", b)
      .drop("__graft_vmin", "__graft_vmax")
  }

  /** `map_atlas(atlas, field, kz)` (`figures/maps.py:8-48`): one vertical
    * level of a long-format `climTS`/`climEAPE` frame as colormapped
    * pixels. Returns (gi, gj, t_u, r, g, b) — `writePpm` turns it into
    * the image. Fixed-point via micro-rounding the field first (the
    * float→long step is per-row, so distribution-safe). */
  def mapAtlas(clim: DataFrame, atlas: Atlas, field: String, kz: Int): DataFrame = {
    require(kz >= 0 && kz < ArgoSchemas.NLevels,
      s"kz=$kz outside [0, ${ArgoSchemas.NLevels})")
    val (lon1, _, lat1, _) = atlas.box
    val level = clim
      .filter(col("pres") === lit(ArgoSchemas.Pref(kz).toFloat))
      .select(
        round((col("lon") - lon1) / atlas.reso).cast("int").as("gi"),
        round((col("lat") - lat1) / atlas.reso).cast("int").as("gj"),
        graft.functions.FP.micro(col(field)).as("v_u"))
    colorize(level, "v_u")
  }

  /** The reference's `plottopo` contour levels (`figures/maps.py:62`). */
  val TopoLevels: Seq[Double] = Seq(-4000.0, -2000.0, -100.0)

  /** The contour layer of `plottopo` (`figures/maps.py:60-66`): the cells
    * of an elevation raster whose edge to the east or north neighbor
    * crosses one of `levels` — painted black, the discrete analog of
    * `ax.contour(TOPO.h, [-4000, -2000, -100], colors="k")`.
    *
    * Neighbors come from two window LEADS over the gridded frame (east:
    * rows of constant gj ordered by gi; north: columns of constant gi) —
    * never a self-join of the grid, and each window partition is a single
    * raster row or column, so the work spreads across the grid at any
    * resolution. The crossing test is half-open (min < L ≤ max) so a
    * plateau sitting exactly on a level marks its boundary, not its whole
    * interior.
    *
    * @param topo (gi, gj, h) — a DENSE elevation raster (consecutive
    *             indices; [[topoGrid]] builds one from the synthetic
    *             bathymetry, a real deployment reads its topo grid). */
  def topoContourOverlay(topo: DataFrame,
      levels: Seq[Double] = TopoLevels): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val east = Window.partitionBy(col("gj")).orderBy(col("gi"))
    val north = Window.partitionBy(col("gi")).orderBy(col("gj"))
    def crosses(a: Column, b: Column): Column =
      levels.map(l => least(a, b) < l && greatest(a, b) >= l)
        .reduce(_ || _)
    topo
      .withColumn("__hE", lead(col("h"), 1).over(east))
      .withColumn("__hN", lead(col("h"), 1).over(north))
      .filter((col("__hE").isNotNull && crosses(col("h"), col("__hE"))) ||
        (col("__hN").isNotNull && crosses(col("h"), col("__hN"))))
      .select(col("gi"), col("gj"),
        lit(0L).as("r"), lit(0L).as("g"), lit(0L).as("b"))
  }

  /** [[graft.argo.Bathy.syntheticElevation]] sampled at the atlas grid
    * cells — INCLUDING land cells (the reference's contour input is the
    * full topo grid, and coast-adjacent crossings need both sides; the
    * land-pruned [[Atlas.grid]] serves the CLIMATOLOGY, not the contours). */
  def topoGrid(s: org.apache.spark.sql.SparkSession, atlas: Atlas): DataFrame = {
    val (lon1, _, lat1, _) = atlas.box
    val reso = atlas.reso
    val hUdf = udf(graft.argo.Bathy.syntheticElevation _)
    s.range(atlas.nLon.toLong * atlas.nLat)
      .select((col("id") % atlas.nLon).cast("int").as("gi"),
        (col("id") / atlas.nLon).cast("int").as("gj"))
      .withColumn("h", hUdf(lit(lon1) + col("gi") * reso,
        lit(lat1) + col("gj") * reso))
  }

  /** `map_atlas(..., plottopo=True)` (`figures/maps.py:8,60-66`): the
    * colormapped raster with the bathymetry contour cells layered on top.
    * Contour pixels win DETERMINISTICALLY (the base raster is anti-joined
    * first — relying on write order would leave overlap pixels
    * partition-order dependent); the overlay is image-bounded, so its
    * anti-join side broadcasts. */
  def mapAtlas(clim: DataFrame, atlas: Atlas, field: String, kz: Int,
               plottopo: Boolean): DataFrame = {
    val base = mapAtlas(clim, atlas, field, kz)
    if (!plottopo) base
    else {
      val overlay = topoContourOverlay(topoGrid(clim.sparkSession, atlas))
        .withColumn("v_u", lit(null).cast(LongType))
        .withColumn("t_u", lit(null).cast(LongType))
      base.join(broadcast(overlay.select("gi", "gj")), Seq("gi", "gj"),
          "left_anti")
        .unionByName(overlay)
    }
  }

  /** `plot_first_profiles` (`figures/first_profiles.py:11-26`): the
    * scatter layer — each float's first reported position. */
  def firstProfilesData(summary: DataFrame): DataFrame =
    summary.groupBy(col("WMO"))
      .agg(min_by(col("LONGITUDE"), col("IPROF")).as("LONGITUDE"),
        min_by(col("LATITUDE"), col("IPROF")).as("LATITUDE"))

  /** `fig_wmo_n_prof` (`figures/first_profiles.py:93-101`): histogram of
    * profiles-per-float, binsize 10 — the bar data. */
  def nProfHistData(summary: DataFrame): DataFrame =
    summary.groupBy(col("WMO")).agg(first(col("N_PROF")).as("N_PROF"))
      .select((floor(col("N_PROF") / 10) * 10).cast(LongType).as("bin_lo"))
      .groupBy(col("bin_lo")).agg(count(lit(1)).as("n_wmos"))
      .orderBy("bin_lo")

  /** Serialize a colorized raster to a binary PPM (P6). Pixels the frame
    * doesn't cover (land / no-data cells — the reference paints them
    * "#CCCCCC", `figures/maps.py:57`) get that same grey. Row 0 of the
    * image is the TOP scanline = the maximum `gj` (north-up, like the
    * reference's maps).
    *
    * Drains the pixels in ONE parallel job of packed (offset, rgb) pairs
    * per partition (toLocalIterator would schedule a sequential job per
    * partition — the overhead AtlasSink.writeNetcdf measured at ~1 s per
    * export); driver memory is the pixel grid plus its sparse pair list,
    * bounded by the image, not the data. */
  def writePpm(raster: DataFrame, nlon: Int, nlat: Int, path: String,
               gi: String = "gi", gj: String = "gj"): Unit = {
    val px = new Array[Byte](nlon * nlat * 3)
    java.util.Arrays.fill(px, 204.toByte) // #CCCCCC background
    val (nI, nJ) = (nlon, nlat)
    raster
      .select(col(gi).cast("int"), col(gj).cast("int"),
        col("r").cast("int"), col("g").cast("int"), col("b").cast("int"))
      .rdd.mapPartitions { it =>
        val offs = new scala.collection.mutable.ArrayBuilder.ofInt
        val rgbs = new scala.collection.mutable.ArrayBuilder.ofInt
        it.foreach { row =>
          val i = row.getInt(0); val j = row.getInt(1)
          if (i >= 0 && i < nI && j >= 0 && j < nJ) {
            offs += (nJ - 1 - j) * nI + i
            rgbs += ((row.getInt(2) << 16) | (row.getInt(3) << 8) | row.getInt(4))
          }
        }
        Iterator.single((offs.result(), rgbs.result()))
      }.collect().foreach { case (offs, rgbs) =>
        var k = 0
        while (k < offs.length) {
          val off = offs(k) * 3; val rgb = rgbs(k)
          px(off) = (rgb >> 16).toByte
          px(off + 1) = ((rgb >> 8) & 0xff).toByte
          px(off + 2) = (rgb & 0xff).toByte
          k += 1
        }
      }
    val out = new BufferedOutputStream(new FileOutputStream(path))
    try {
      out.write(s"P6\n$nlon $nlat\n255\n".getBytes("US-ASCII"))
      out.write(px)
    } finally out.close()
  }
}
