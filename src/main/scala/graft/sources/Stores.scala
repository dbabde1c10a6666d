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
}
