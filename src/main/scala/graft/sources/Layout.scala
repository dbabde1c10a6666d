package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Multi-dimensional data layout: rewrite a table clustered along a
  * space-filling curve so that every landed file covers a tight
  * rectangle of the clustered dimensions — the `OPTIMIZE ZORDER BY`
  * operation of the lakehouse engines, as a plain Spark write.
  *
  * Mechanics: range-partition by the Morton code
  * ([[graft.functions.ZOrderExpr]]) so the code's global order is split
  * into contiguous chunks (one per output partition — a chunk of Z space
  * IS a small rectangle), sort within partitions so row groups inside a
  * file are tight too, then drop the code: pruning works off the parquet
  * min/max statistics of the ORIGINAL columns, which the clustering has
  * made locally narrow. Readers need no knowledge of the curve at all —
  * any engine's stock row-group pruning benefits.
  *
  * At 100 TB this is the difference between a second-dimension predicate
  * reading every file (a linear layout prunes only its leading sort
  * column) and reading ~√ of them (ZOrderSpec measures the ratio on a
  * real write). Like the at-rest stores, the rewrite is a once-per-ingest
  * cost amortized over every later scan.
  */
object Layout {
  /** Land `df` z-clustered by `zCode` (build it with
    * [[graft.functions.ZOrderExpr.zorder2]] over normalized bucket
    * indexes) as parquet under `path`. `partitions` sets the file count
    * floor; `maxRecordsPerFile` caps rows per file so row-group pruning
    * has granularity even on small inputs. */
  def writeZOrdered(df: DataFrame, zCode: Column, path: String,
                    partitions: Int, maxRecordsPerFile: Long = 0L): Unit =
    zWrite(df, zCode, path, partitions, maxRecordsPerFile, "overwrite")

  /** Incremental sync into an existing z-clustered layout: the BATCH is
    * z-coded (by the caller's FROZEN curve parameters — the VecStore
    * frozen-quantizer rule), range-clustered among ITSELF and appended
    * as new files. Answers never depend on the code (it is dropped), so
    * append ≡ re-land exactly; only pruning granularity pays — each
    * sync's files are tight rectangles of their OWN batch, so a scan
    * prunes per batch instead of globally. Compact by re-running the
    * full rewrite when sync counts warrant (the once-per-ingest cost
    * the append path defers, not avoids). */
  def appendZOrdered(batch: DataFrame, zCode: Column, path: String,
                     partitions: Int, maxRecordsPerFile: Long = 0L): Unit =
    zWrite(batch, zCode, path, partitions, maxRecordsPerFile, "append")

  private def zWrite(df: DataFrame, zCode: Column, path: String,
                     partitions: Int, maxRecordsPerFile: Long,
                     mode: String): Unit =
    df.withColumn("_z", zCode)
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
}
