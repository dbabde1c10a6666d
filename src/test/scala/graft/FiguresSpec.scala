package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.argo.{ArgoSchemas, Atlas}
import graft.figures.{Colormaps, Figures}

/** The figures layer (reference `figures/maps.py`, `tools/colormaps.py`):
  * precip16 anchor fidelity, the piecewise-linear lerp, raster
  * normalization, the atlas-level selector, and the PPM byte format. */
class FiguresSpec extends SparkSuite {
  import spark.implicits._

  private def rgbAt(tU: Long*): Seq[(Long, Long, Long)] = {
    val df = tU.toDF("t_u")
    val (r, g, b) = Colormaps.precip16(col("t_u"))
    df.select(r.as("r"), g.as("g"), b.as("b"))
      .collect().toSeq.map(w => (w.getLong(0), w.getLong(1), w.getLong(2)))
  }

  test("precip16 reproduces all 17 MeteoSwiss anchors exactly") {
    // anchor i sits at t = i/16 (tools/colormaps.py:46-53)
    val anchors = (0 to 16).map(i => i * Colormaps.SegWidthU)
    val got = rgbAt(anchors: _*)
    (0 to 16).foreach { i =>
      assert(got(i) ===
        ((Colormaps.Precip16R(i), Colormaps.Precip16G(i), Colormaps.Precip16B(i))),
        s"anchor $i")
    }
    assert(got.head === ((255L, 255L, 255L))) // dry = white
    assert(got.last === ((255L, 25L, 0L)))    // max = red
  }

  test("between anchors the channels lerp, ties rounding half-up") {
    // midpoint of segment 0: (255,255,255) -> (214,226,255)
    // r = 234.5 -> 235, g = 240.5 -> 241, b = 255
    assert(rgbAt(Colormaps.SegWidthU / 2) === Seq((235L, 241L, 255L)))
    // quarter point: r = 255 - 41/4 = 244.75 -> 245
    assert(rgbAt(Colormaps.SegWidthU / 4) === Seq((245L, 248L, 255L)))
  }

  test("colorize min-max normalizes; a constant field maps to anchor 0") {
    val cells = Seq((0, 0, 100L), (1, 0, 300L), (2, 0, 200L)).toDF("gi", "gj", "v")
    val out = Figures.colorize(cells, "v")
      .select("gi", "t_u", "r", "g", "b").orderBy("gi")
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(out(0) === ((0, 0L, 255L, 255L, 255L)))       // min -> white
    assert(out(1)._2 === 1000000L)                       // max -> t=1
    assert((out(1)._3, out(1)._4, out(1)._5) === ((255L, 25L, 0L)))
    assert(out(2)._2 === 500000L)                        // exact midpoint
    val const = Figures.colorize(Seq((0, 0, 7L), (1, 0, 7L)).toDF("gi", "gj", "v"), "v")
      .select("t_u").distinct().as[Long].collect()
    assert(const === Array(0L))
  }

  test("mapAtlas selects one pressure level and grids by the atlas box") {
    val atlas = new Atlas(box = (10.0, 30.0, -50.0, -30.0), reso = 10.0)
    val p0 = ArgoSchemas.Pref(0).toFloat
    val p1 = ArgoSchemas.Pref(1).toFloat
    val clim = Seq(
      (10.0f, -50.0f, p0, 5.0f),   // gi=0, gj=0 (min -> white)
      (20.0f, -40.0f, p0, 25.0f),  // gi=1, gj=1 (max -> red)
      (10.0f, -50.0f, p1, 99.0f))  // other level: must be filtered out
      .toDF("lon", "lat", "pres", "CT")
    val out = Figures.mapAtlas(clim, atlas, "CT", kz = 0)
      .select("gi", "gj", "r", "g", "b").orderBy("gi")
      .as[(Int, Int, Long, Long, Long)].collect()
    assert(out.length === 2)
    assert(out(0) === ((0, 0, 255L, 255L, 255L)))
    assert(out(1) === ((1, 1, 255L, 25L, 0L)))
    intercept[IllegalArgumentException] {
      Figures.mapAtlas(clim, atlas, "CT", kz = ArgoSchemas.NLevels)
    }
  }

  test("writePpm emits P6 bytes, north-up, grey background") {
    val raster = Seq(
      (0, 1, 10L, 20L, 30L),  // top-left pixel (gj=1 is the top row)
      (1, 0, 250L, 25L, 0L))  // bottom-right pixel
      .toDF("gi", "gj", "r", "g", "b")
    val path = graft.TempDirs.create("fig").resolve("map.ppm").toString
    Figures.writePpm(raster, nlon = 2, nlat = 2, path = path)
    val bytes = Files.readAllBytes(Paths.get(path))
    val header = s"P6\n2 2\n255\n".getBytes("US-ASCII")
    assert(bytes.take(header.length).toSeq === header.toSeq)
    val px = bytes.drop(header.length).map(_ & 0xff)
    assert(px.length === 12)
    assert(px.take(3).toSeq === Seq(10, 20, 30))          // (0, gj=1) -> row 0
    assert(px.slice(3, 6).toSeq === Seq(204, 204, 204))   // background
    assert(px.slice(6, 9).toSeq === Seq(204, 204, 204))
    assert(px.slice(9, 12).toSeq === Seq(250, 25, 0))     // (1, gj=0) -> row 1
  }

  test("topoContourOverlay marks exactly the level-crossing cells") {
    // hand-computed oracle on a 4×3 grid against the reference's levels
    // (-4000, -2000, -100): a cell is contour iff its east or north edge
    // crosses a level under the half-open min < L <= max rule
    val h = Seq(
      (0, 0, -5000.0), (1, 0, -3000.0), (2, 0, -1500.0), (3, 0, -50.0),
      (0, 1, -5000.0), (1, 1, -4500.0), (2, 1, -2500.0), (3, 1, -150.0),
      (0, 2, -120.0), (1, 2, -90.0), (2, 2, -2000.0), (3, 2, -6000.0))
      .toDF("gi", "gj", "h")
    val got = Figures.topoContourOverlay(h)
      .select($"gi", $"gj", $"r", $"g", $"b")
      .as[(Int, Int, Long, Long, Long)].collect().toSet
    assert(got.forall { case (_, _, r, g, b) => r == 0 && g == 0 && b == 0 })
    val want = Set((0, 0), (1, 0), (2, 0), (3, 0),
      (0, 1), (1, 1), (2, 1), (3, 1),
      (0, 2), (1, 2), (2, 2)) // (3,2) has no east/north neighbor
    assert(got.map(c => (c._1, c._2)) === want)
  }

  test("mapAtlas plottopo layers black contour cells over the raster, deterministically") {
    // same fixture as the level-selector test: base raster has (0,0) white
    // and (1,1) red. The synthetic elevation in this 2×2 box is +100 m on
    // the gj=1 row (inside continent 1) and -6000 m on gj=0, so both
    // columns cross every level on their north edge: overlay = {(0,0),
    // (1,0)} — (0,0) must be OVERRIDDEN to black (contours win over data
    // pixels, the reference draws them last), (1,0) appears black where
    // the base had nothing, (1,1) keeps its data color.
    val atlas = new Atlas(box = (10.0, 30.0, -50.0, -30.0), reso = 10.0)
    val p0 = ArgoSchemas.Pref(0).toFloat
    val clim = Seq(
      (10.0f, -50.0f, p0, 5.0f),
      (20.0f, -40.0f, p0, 25.0f))
      .toDF("lon", "lat", "pres", "CT")
    val out = Figures.mapAtlas(clim, atlas, "CT", kz = 0, plottopo = true)
      .select($"gi", $"gj", $"r", $"g", $"b")
      .as[(Int, Int, Long, Long, Long)].collect().toSet
    assert(out === Set(
      (0, 0, 0L, 0L, 0L),
      (1, 0, 0L, 0L, 0L),
      (1, 1, 255L, 25L, 0L)))
    // plottopo=false keeps the old raster exactly
    val base = Figures.mapAtlas(clim, atlas, "CT", kz = 0)
      .select($"gi", $"gj").as[(Int, Int)].collect().toSet
    assert(base === Set((0, 0), (1, 1)))
  }

  test("synthetic elevation is sign-consistent with the land mask") {
    val rnd = new scala.util.Random(7)
    (0 until 2000).foreach { _ =>
      val lon = rnd.nextDouble() * 360 - 180
      val lat = rnd.nextDouble() * 180 - 90
      assert(graft.argo.Bathy.syntheticLand(lon, lat) ==
        (graft.argo.Bathy.syntheticElevation(lon, lat) >= 0.0),
        s"sign mismatch at ($lon, $lat)")
    }
  }

  test("first-profile scatter + N_PROF histogram data are deterministic") {
    val summary = Seq(
      (100, 1.toShort, 5.0f, -5.0f, 30.toShort),
      (100, 0.toShort, 1.0f, -1.0f, 30.toShort),
      (200, 0.toShort, 2.0f, -2.0f, 7.toShort))
      .toDF("WMO", "IPROF", "LONGITUDE", "LATITUDE", "N_PROF")
    val firsts = Figures.firstProfilesData(summary)
      .orderBy("WMO").as[(Int, Float, Float)].collect()
    assert(firsts.toSeq === Seq((100, 1.0f, -1.0f), (200, 2.0f, -2.0f)))
    val hist = Figures.nProfHistData(summary)
      .as[(Long, Long)].collect()
    assert(hist.toSeq === Seq((0L, 1L), (30L, 1L)))
  }
}
