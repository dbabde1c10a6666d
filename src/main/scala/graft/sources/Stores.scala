package graft.sources

import org.apache.spark.sql.DataFrame

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
}
