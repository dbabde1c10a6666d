package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
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
    * AND the no-exchange plan on an appended store). Compact by
    * re-landing when file counts warrant, as lakehouse engines do. */
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

  /** Compact the oversized buckets of an appended store back to one
    * sorted file each — the maintenance half of [[appendBucketed]].
    * Appends accumulate one file set per bucket per sync, and Spark only
    * TRUSTS a bucket's sort order when the bucket is a single file, so an
    * appended store's consumers re-sort scan-side; at 100 TB a full
    * re-land to fix that is exactly what the append path exists to avoid.
    * Buckets are per-bucket-addressable by file naming, so this rewrites
    * ONLY buckets whose file count exceeds `maxFilesPerBucket` — each in
    * one small job reading just that bucket's files (rows are already
    * hash-routed; no shuffle, no re-hash) — and leaves the rest untouched.
    *
    * Each merge is ONE task (repartition(1)) — the price of the
    * single-file sort property Spark trusts — so compaction assumes the
    * bucket count was sized for task-fit buckets, which the landing
    * guidance already requires (buckets ~2-4× the cluster's cores at
    * the target scale); a bucket too big to merge in one task is a
    * store that needs MORE buckets, not a smarter compactor.
    *
    * Crash safety (single concurrent maintainer, like every lakehouse
    * compactor): per bucket, (1) write the merged sorted file into a
    * hidden `_compact_tmp_<b>` dir (invisible to scans), (2) rename the
    * old files into `_compact_tmp_<b>/replaced/`, (3) rename the new file
    * into the table dir, (4) delete the tmp dir. A re-run first recovers
    * any leftover tmp: if it still holds the compacted part file, step 3
    * never ran — roll the replaced files back; if not, step 3 committed —
    * deleting the tmp is completing step 4. Either way the table is
    * consistent and the re-run proceeds.
    *
    * Returns the number of buckets rewritten. */
  def compactBuckets(s: SparkSession, table: String, cols: Seq[String],
                     maxFilesPerBucket: Int = 4): Int = {
    val loc = s.sql(s"DESC FORMATTED $table").collect()
      .find(_.getString(0) == "Location").map(_.getString(1))
      .getOrElse(sys.error(s"no location in catalog for table $table"))
    val dir = new Path(loc)
    val fs = dir.getFileSystem(s.sparkContext.hadoopConfiguration)

    // recover any interrupted prior run before trusting the listing
    val leftovers = fs.listStatus(dir).filter(st => st.isDirectory &&
      st.getPath.getName.startsWith("_compact_tmp_"))
    leftovers.foreach { st =>
      val part = fs.listStatus(st.getPath)
        .find(f => f.isFile && f.getPath.getName.startsWith("part-"))
      if (part.isDefined) { // step 3 never ran: roll back the replaced files
        val replaced = new Path(st.getPath, "replaced")
        if (fs.exists(replaced)) fs.listStatus(replaced)
          .foreach(f => fs.rename(f.getPath, new Path(dir, f.getPath.getName)))
      } // else step 3 committed: the old files in replaced/ are superseded
      fs.delete(st.getPath, true)
    }
    if (leftovers.nonEmpty) s.catalog.refreshTable(table)

    def dataFiles(): Seq[FileStatus] = fs.listStatus(dir).toSeq
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
    val oversized = dataFiles().groupBy(f => bucketIdOf(f.getPath.getName))
      .filter { case (b, fls) => b >= 0 && fls.size > maxFilesPerBucket }

    oversized.foreach { case (bucket, files) =>
      val tmp = new Path(dir, s"_compact_tmp_$bucket")
      // (1) one merged file, re-sorted on the bucket cols — restoring the
      // sort property the appends dropped. coalesce, not repartition:
      // the rows are already the right set (one bucket's files), so the
      // merge is one task reading them directly — an exchange would
      // write and re-read the whole bucket for nothing
      s.read.parquet(files.map(_.getPath.toString): _*)
        .coalesce(1).sortWithinPartitions(cols.map(col): _*)
        .write.mode("overwrite").option("compression", "snappy")
        .parquet(tmp.toString)
      val part = fs.listStatus(tmp)
        .find(f => f.isFile && f.getPath.getName.startsWith("part-"))
        .getOrElse(sys.error(s"compaction wrote no data file for bucket $bucket"))
        .getPath
      // (2) old files out of the table's view (atomic per-file renames)
      val replaced = new Path(tmp, "replaced")
      fs.mkdirs(replaced)
      files.foreach(f =>
        fs.rename(f.getPath, new Path(replaced, f.getPath.getName)))
      // (3) commit: the new file adopts the bucket-id naming the scan
      // recognizes, (4) drop the tmp (and the superseded files with it)
      fs.rename(part, new Path(dir,
        f"part-00000-${java.util.UUID.randomUUID}%s_$bucket%05d.c000.snappy.parquet"))
      fs.delete(tmp, true)
    }
    if (oversized.nonEmpty) s.catalog.refreshTable(table)
    oversized.size
  }
}
