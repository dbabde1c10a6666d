package graft.figures

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The reference's figure colormap, re-expressed as a codegen'd Column
  * transform instead of a matplotlib object.
  *
  * `precip16` is a 17-anchor linear-segmented colormap built from the
  * public MeteoSwiss NCL color table embedded in the reference
  * (`tools/colormaps.py:10-31`, anchors; `colormaps.py:46-66`, the
  * LinearSegmentedColormap construction with anchor `i` at `x = i/16` and
  * straight-line interpolation between neighbors). The reference's atlas
  * maps feed EAPE fields through it (`figures/maps.py:32-37`).
  *
  * Everything here is INTEGER arithmetic on a micro-scaled position
  * `t_u ∈ [0, 1_000_000]`: segment index, within-segment remainder, and
  * the lerp are exact in Long, so Spark and the DuckDB oracle (and any
  * partitioning of either) produce bit-identical channel bytes — the same
  * fixed-point discipline as [[graft.functions.FP]].
  */
object Colormaps {
  /** Anchor channels, top-to-bottom of the MeteoSwiss table
    * (tools/colormaps.py:15-31): index 0 = white (dry) … 16 = red (max). */
  val Precip16R: Array[Long] = Array(255, 214, 181, 142, 127, 99, 0, 0, 0, 99, 150, 198, 255, 255, 255, 255, 255)
  val Precip16G: Array[Long] = Array(255, 226, 201, 178, 150, 112, 99, 150, 198, 255, 255, 255, 255, 198, 160, 124, 25)
  val Precip16B: Array[Long] = Array(255, 255, 255, 255, 255, 247, 255, 150, 51, 0, 0, 51, 0, 0, 0, 0, 0)

  /** Number of segments between anchors (16) and the width of one segment
    * in micro-units of t. 16 × 62_500 = 1_000_000 exactly, so segment
    * arithmetic never truncates unevenly. */
  val Segments = 16
  val SegWidthU = 62500L

  /** Piecewise-linear channel lookup at micro-position `tU` (a Long column
    * clamped by the caller to [0, 1_000_000]).
    *
    * channel(t) = a[i] + (a[i+1] - a[i]) · frac, with i = ⌊t·16⌋ and
    * frac = t·16 − i — in micro-units: cU = a[i]·1e6 + (a[i+1]−a[i])·rem·16
    * with rem = tU − i·62_500 ∈ [0, 62_500]. |cU| ≤ 255e6, exact in Long.
    * The final byte is round-half-up(cU / 1e6); cU ≥ 0 so truncating
    * integer division after +5e5 matches in both engines. */
  private def channel(anchors: Array[Long], tU: Column): Column = {
    val idx = least(floor(tU / lit(SegWidthU)).cast(LongType), lit(Segments - 1L))
    val rem = tU - idx * lit(SegWidthU)
    val arr = lit(anchors)
    val a0 = element_at(arr, (idx + 1).cast("int"))
    val a1 = element_at(arr, (idx + 2).cast("int"))
    val cU = a0 * lit(1000000L) + (a1 - a0) * rem * lit(16L)
    ((cU + lit(500000L)) / lit(1000000L)).cast(LongType)
  }

  /** (r, g, b) byte columns (as Longs 0..255) for micro-position `tU`. */
  def precip16(tU: Column): (Column, Column, Column) =
    (channel(Precip16R, tU), channel(Precip16G, tU), channel(Precip16B, tU))

  // ---- DuckDB oracle mirror ------------------------------------------------
  private def sqlChannel(anchors: Array[Long], tU: String): String = {
    val lst = anchors.mkString("[", ", ", "]")
    val idx = s"least(($tU) // $SegWidthU, ${Segments - 1})"
    val rem = s"(($tU) - ($idx) * $SegWidthU)"
    val a0 = s"($lst)[($idx)::INT + 1]"
    val a1 = s"($lst)[($idx)::INT + 2]"
    s"((($a0) * 1000000 + (($a1) - ($a0)) * $rem * 16 + 500000) // 1000000)"
  }

  /** SQL fragments computing the identical three channels in DuckDB. */
  def sqlPrecip16(tU: String): (String, String, String) =
    (sqlChannel(Precip16R, tU), sqlChannel(Precip16G, tU), sqlChannel(Precip16B, tU))
}
