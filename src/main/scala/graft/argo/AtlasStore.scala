package graft.argo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder

/** Spatially bucketed profile storage — the at-rest layout for the atlas
  * pair join at 100 TB.
  *
  * [[Atlas.pairs]] joins profiles to exploded grid cells on a (lonBin,
  * latBin) key. Reading profiles from a plain store, the shuffle-fallback
  * branch (grid past the broadcast cap) must exchange BOTH sides on that
  * key — and the profile side is the ~100 TB one. Landing the interpolated
  * store bucketed by the SAME bin columns turns that into a co-located
  * scan: the bucketed side's output partitioning already satisfies the
  * join's distribution, so only the (small) exploded-grid side shuffles.
  * The reference's analog is its chunked interpolated file sorted per-WMO
  * (README.md:146-158); spatial bucketing is the Spark-native answer to
  * the same "lay data out for the next pass" idea.
  *
  * The bin key depends on the atlas parameterization (binW = radius/4 via
  * smoothing_factor·reso/nSub — see [[Atlas.binW]]), so the bucketed
  * columns are stamped with their binW in column METADATA; `pairs` reuses
  * the stored bins only when the stamp matches its own binW, and silently
  * recomputes otherwise — a mismatched store can cost performance, never
  * correctness.
  */
object AtlasStore {
  /** Column-metadata key recording the bin width the bi/bj columns were
    * computed with. */
  val BinWKey = "graft.binw"

  /** Profiles + (bi, bj) bin columns for `atlas`, exactly the expressions
    * [[Atlas.pairs]] computes, stamped with binW metadata. */
  def bucketize(profiles: DataFrame, atlas: Atlas): DataFrame = {
    val md = new MetadataBuilder().putDouble(BinWKey, atlas.binW).build()
    // drop bins from a previous parameterization first — re-bucketizing a
    // loaded store for a new atlas must recompute, not duplicate columns
    val base = profiles.drop("bi", "bj")
    base.select(
      base.columns.toIndexedSeq.map(col) ++ Seq(
        pmod(floor((col("LONGITUDE").cast("double") + 180.0) / atlas.binW)
          .cast("int"), lit(atlas.nBi)).as("bi", md),
        floor((col("LATITUDE").cast("double") + 90.0) / atlas.binW)
          .cast("int").as("bj", md)): _*)
  }

  /** Land `profiles` as a parquet table bucketed (and sorted) on the bin
    * key. `buckets` sizes the parallelism of every later pair join reading
    * this store — pick ~2-4× the cluster's cores at the target scale. */
  def saveBucketed(profiles: DataFrame, atlas: Atlas, table: String,
                   buckets: Int, path: Option[String] = None): Unit =
    graft.sources.Stores.landBucketed(
      bucketize(profiles, atlas), table, buckets, Seq("bi", "bj"), path)

  /** Loads through [[graft.sources.Stores.guardedTable]]: fails fast
    * inside a compaction window instead of scanning a half-swapped
    * store. */
  def loadBucketed(s: SparkSession, table: String): DataFrame =
    graft.sources.Stores.guardedTable(s, table)
}
