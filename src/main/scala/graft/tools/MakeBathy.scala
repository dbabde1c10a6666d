package graft.tools

import graft.argo.Bathy

/** One-shot generator for the packaged 1/10° land mask
  * (src/main/resources/graft/bathy_mask.bin). BathySpec pins the resource
  * to [[Bathy.generate]]'s output, so regenerating is only needed if the
  * analytic coastline changes. */
object MakeBathy {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("src/main/resources/graft/bathy_mask.bin")
    new java.io.File(out).getParentFile.mkdirs()
    val mask = Bathy.generate()
    Bathy.write(mask, out)
    println(s"wrote $out: ${mask.nLon}x${mask.nLat}, land fraction ${mask.landFraction}")
  }
}
