package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.figures.{Colormaps, Figures}

/** The figures layer under the driver's oracle gate (SURVEY.md: the
  * reference's `figures/` package — `maps.py` renders atlas fields
  * through the precip16 colormap, `first_profiles.py` draws scatter and
  * histogram layers whose data shapes q04/q08 already verify).
  *
  * q77 verifies the genuinely new numeric content — min-max
  * normalization plus the 17-anchor piecewise-linear colormap
  * ([[graft.figures.Colormaps]]) — end-to-end against DuckDB: every pixel
  * channel byte of the `map_atlas` raster, computed in exact integer
  * arithmetic in both engines. The image-file serialization on top
  * (PPM writer, [[graft.figures.Figures.writePpm]]) is byte-golden-tested
  * in FiguresSpec.
  */
object FigureQueries extends QueryModule {

  // ---- q77: colormapped atlas raster (figures/maps.py:8-48) --------------
  private def q77(s: SparkSession, d: String): DataFrame =
    Figures.colorize(
      GeoQueries.cellMeans(s, d).select(col("ci"), col("cj"), col("wmean_c")),
      "wmean_c")
      .select(col("ci"), col("cj"), col("t_u"), col("r"), col("g"), col("b"))
      .orderBy("ci", "cj")

  private val q77Sql = {
    val tU = "CASE WHEN vmax > vmin THEN ((wmean_c - vmin) * 1000000) // (vmax - vmin) ELSE 0 END"
    val (r, g, b) = Colormaps.sqlPrecip16("t_u")
    s"""WITH ${GeoQueries.cellMeansSql},
       |st AS (SELECT min(wmean_c) AS vmin, max(wmean_c) AS vmax FROM cmeans),
       |pos AS (SELECT ci, cj, $tU AS t_u FROM cmeans, st)
       |SELECT ci, cj, t_u, $r AS r, $g AS g, $b AS b
       |FROM pos ORDER BY 1, 2""".stripMargin
  }

  def defs: Map[String, QueryDef] = Map(
    "q77_atlas_colormap" -> QueryDef(q77, Some(q77Sql)))
}
