package graft.sources

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The one bucketed-landing writer chain shared by the at-rest stores
  * ([[graft.argo.AtlasStore]], [[DocStore]]) so they cannot drift on
  * mode, format, sort order or external-path handling. */
object Stores {
  def landBucketed(df: DataFrame, table: String, buckets: Int,
                   cols: Seq[String], path: Option[String]): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, cols.head, cols.tail: _*)
      .sortBy(cols.head, cols.tail: _*)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Append an ingest batch into an existing bucketed store — the
    * incremental-maintenance path the layout family needs at 100 TB: a
    * sync writes O(batch), never re-lands the corpus (the q115/q116
    * merge-not-rescan discipline applied to the stores themselves).
    * Spark hash-routes the appended rows into the SAME bucket scheme
    * (the spec must match the table's), so consumers stay exchange-free
    * after any number of appends; each append adds one file set per
    * bucket, which drops only the per-bucket SORT property (Spark plans
    * a sort when it needs one) — clustering, the property the joins and
    * aggregations rely on, is preserved (StoreAppendSpec pins parity
    * AND the no-exchange plan on an appended store). Compact with
    * [[compactBuckets]] when file counts warrant. */
  def appendBucketed(df: DataFrame, table: String, buckets: Int,
                     cols: Seq[String]): Unit =
    df.write.mode("append").format("parquet")
      .bucketBy(buckets, cols.head, cols.tail: _*)
      .sortBy(cols.head, cols.tail: _*)
      .saveAsTable(table)

  /** Spark's bucket-file naming (`BucketingUtils`): the LAST `_<digits>`
    * group before the extension is the bucket id. */
  private val BucketFile = """.*_(\d+)(?:\..*)?$""".r

  private def bucketIdOf(name: String): Int = name match {
    case BucketFile(b) => b.toInt
    case _             => -1
  }

  /** Settle any interrupted compaction under `dir` before trusting its
    * listing: a leftover `_compact_tmp_*` that still holds its merged
    * part file never committed — roll the replaced files back; one
    * without it committed — deleting the tmp completes the cleanup.
    * Either way the directory is consistent afterwards. Returns whether
    * anything was settled. */
  private def recoverCompaction(fs: FileSystem, dir: Path): Boolean = {
    val leftovers = fs.listStatus(dir).filter(st => st.isDirectory &&
      st.getPath.getName.startsWith("_compact_tmp_"))
    leftovers.foreach { st =>
      val part = fs.listStatus(st.getPath)
        .find(f => f.isFile && f.getPath.getName.startsWith("part-"))
      if (part.isDefined) { // commit never ran: roll back the replaced files
        val replaced = new Path(st.getPath, "replaced")
        if (fs.exists(replaced)) fs.listStatus(replaced)
          .foreach(f => fs.rename(f.getPath, new Path(dir, f.getPath.getName)))
      } // else commit ran: the old files in replaced/ are superseded
      fs.delete(st.getPath, true)
    }
    leftovers.nonEmpty
  }

  /** The crash-safe swap both compactors share: (1) write `merged` into
    * a hidden `_compact_tmp_<tag>` under `dir` (invisible to scans),
    * (2) rename the old files into `replaced/` under it (atomic per-file
    * renames — out of the directory's view), (3) rename the new file
    * into `dir` under `newName`, (4) drop the tmp. [[recoverCompaction]]
    * settles any window a crash leaves. */
  private def swapCompacted(fs: FileSystem, dir: Path, tag: String,
                            files: Seq[FileStatus], merged: DataFrame,
                            newName: String): Unit = {
    val tmp = new Path(dir, s"_compact_tmp_$tag")
    merged.write.mode("overwrite").option("compression", "snappy")
      .parquet(tmp.toString)
    val part = fs.listStatus(tmp)
      .find(f => f.isFile && f.getPath.getName.startsWith("part-"))
      .getOrElse(sys.error(s"compaction wrote no data file for $tag"))
      .getPath
    val replaced = new Path(tmp, "replaced")
    fs.mkdirs(replaced)
    files.foreach(f =>
      fs.rename(f.getPath, new Path(replaced, f.getPath.getName)))
    fs.rename(part, new Path(dir, newName))
    fs.delete(tmp, true)
  }

  /** Compact the oversized buckets of an appended store back to one
    * sorted file each — the maintenance half of [[appendBucketed]].
    * Appends accumulate one file set per bucket per sync, and Spark only
    * TRUSTS a bucket's sort order when the bucket is a single file, so an
    * appended store's consumers re-sort scan-side; at 100 TB a full
    * re-land to fix that is exactly what the append path exists to avoid.
    * Buckets are per-bucket-addressable by file naming, so this rewrites
    * ONLY buckets whose file count exceeds `maxFilesPerBucket` — each in
    * one small job reading just that bucket's files (rows are already
    * hash-routed; no shuffle, no re-hash — coalesce, not repartition:
    * an exchange would write and re-read the whole bucket for nothing) —
    * and leaves the rest untouched.
    *
    * Each merge is ONE task — the price of the single-file sort property
    * Spark trusts — so compaction assumes the bucket count was sized for
    * task-fit buckets, which the landing guidance already requires
    * (buckets ~2-4× the cluster's cores at the target scale); a bucket
    * too big to merge in one task is a store that needs MORE buckets,
    * not a smarter compactor.
    *
    * Crash safety (single concurrent maintainer, like every lakehouse
    * compactor): the [[swapCompacted]] protocol, settled on re-entry by
    * [[recoverCompaction]]. Returns the number of buckets rewritten. */
  def compactBuckets(s: SparkSession, table: String, cols: Seq[String],
                     maxFilesPerBucket: Int = 4): Int = {
    val loc = s.sql(s"DESC FORMATTED $table").collect()
      .find(_.getString(0) == "Location").map(_.getString(1))
      .getOrElse(sys.error(s"no location in catalog for table $table"))
    val dir = new Path(loc)
    val fs = dir.getFileSystem(s.sparkContext.hadoopConfiguration)

    if (recoverCompaction(fs, dir)) s.catalog.refreshTable(table)

    val oversized = fs.listStatus(dir).toSeq
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
      .groupBy(f => bucketIdOf(f.getPath.getName))
      .filter { case (b, fls) => b >= 0 && fls.size > maxFilesPerBucket }

    oversized.foreach { case (bucket, files) =>
      // one merged file, re-sorted on the bucket cols (restoring the
      // property the appends dropped), named with the bucket-id suffix
      // the bucketed scan recognizes
      swapCompacted(fs, dir, bucket.toString, files,
        s.read.parquet(files.map(_.getPath.toString): _*)
          .coalesce(1).sortWithinPartitions(cols.map(col): _*),
        f"part-00000-${java.util.UUID.randomUUID}%s_$bucket%05d.c000.snappy.parquet")
    }
    if (oversized.nonEmpty) s.catalog.refreshTable(table)
    oversized.size
  }

  /** Compact the oversized PARTITION DIRECTORIES of a directory-
    * partitioned store — the maintenance half of the partitioned appends
    * ([[VecStore.appendPartitioned]] cells, the `_pqcodes` sidecar):
    * each sync adds a file set to every touched partition, and at 100 TB
    * the cost of a long-lived store is its FILE COUNT (opens, listings,
    * footer reads) — a full re-land to fix it is what the append path
    * exists to avoid. Rewrites ONLY single-level `k=v` directories whose
    * data-file count exceeds `maxFilesPerDir`, one task each reading
    * just that directory's files (rows are already routed; the partition
    * value lives in the DIRECTORY NAME, so the merged file needs no
    * re-derivation and partition pruning is untouched). No sort property
    * is involved — partitioned stores prune by directory, not order.
    * Same [[swapCompacted]]/[[recoverCompaction]] crash protocol as
    * [[compactBuckets]]. Returns the number of directories rewritten. */
  def compactPartitions(s: SparkSession, root: String,
                        maxFilesPerDir: Int = 4): Int = {
    val rootP = new Path(root)
    val fs = rootP.getFileSystem(s.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(rootP).filter(st => st.isDirectory &&
      st.getPath.getName.contains("=") &&
      !st.getPath.getName.startsWith("_") &&
      !st.getPath.getName.startsWith("."))
    var touched = false
    var n = 0
    parts.foreach { p =>
      touched |= recoverCompaction(fs, p.getPath)
      val files = fs.listStatus(p.getPath).toSeq
        .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
      if (files.size > maxFilesPerDir) {
        swapCompacted(fs, p.getPath, "0", files,
          s.read.parquet(files.map(_.getPath.toString): _*).coalesce(1),
          s"part-00000-${java.util.UUID.randomUUID}.c000.snappy.parquet")
        n += 1
        touched = true
      }
    }
    if (touched) s.catalog.refreshByPath(root)
    n
  }
}
