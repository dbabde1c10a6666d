package graft.argo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage 1 of the pipeline: per-profile summary table (SURVEY.md §3.1).
  *
  * The reference scans ~20k NetCDF files with a process pool and
  * `pd.concat`s the per-float frames (toctools.py:86-145). Here the raw
  * per-profile metadata is ONE lazy DataFrame (from any source — in
  * production a partitioned Parquet ingest of the GDAC, `dac=&#42;/wmo=&#42;`
  * layout, so catalog discovery S1 is just file listing and Catalyst prunes
  * partitions); the pool boundary becomes task scheduling and the concat
  * disappears into a single scan.
  *
  * Expected input columns: `dac` (string), `WMO` int, `JULD` timestamp,
  * `LONGITUDE`/`LATITUDE` double/float, `N_LEVELS` int, `data_mode` string
  * ("R"/"D"/"A"), `platform_type` string, `position_qc` int, `juld_qc` int.
  */
object SummaryBuilder {
  /** Tiny dictionary tables, broadcast-joined for encode (P4/J3): the
    * dictionary side is O(10) rows — a broadcast hash join, zero shuffle
    * of the data side. */
  private def dict(s: SparkSession, values: Seq[String], name: String,
                   code: String): DataFrame = {
    import s.implicits._
    values.zipWithIndex.map { case (v, i) => (v, i.toByte) }.toDF(name, code)
  }

  def build(s: SparkSession, raw: DataFrame): DataFrame = {
    // code columns carry a _code suffix until the final select: Spark's
    // default case-insensitive resolution would otherwise see `dac`/`DAC`
    // as duplicates
    val dacs = dict(s, ArgoSchemas.Dacs, "dac", "dac_code")
    val modes = dict(s, ArgoSchemas.DataModes, "data_mode", "mode_code")
    val platforms = dict(s, ArgoSchemas.Platforms, "platform_type", "plat_code")

    // W1: profile ordinal within float, by time (the reference relies on
    // NetCDF row order, toctools.py:172-175; source order = JULD order)
    val w = Window.partitionBy(col("WMO")).orderBy(col("JULD"))
    val nprof = Window.partitionBy(col("WMO"))

    raw
      .join(broadcast(dacs), Seq("dac"))
      .join(broadcast(modes), Seq("data_mode"))
      // P4: platform dict-encode (toctools.py:195 `PLATFORMS.index`).
      // Left join + fallbacks rather than the reference's raising .index():
      // an already-encoded numeric code passes through (synthetic inputs),
      // anything unknown maps to 0 (the blank entry) instead of failing a
      // 20k-file ingest on one new float model. A bare cast would also
      // THROW under ANSI (Spark 4 default) on any real platform name.
      .join(broadcast(platforms), Seq("platform_type"), "left")
      .withColumn("IPROF", (row_number().over(w) - 1).cast("short"))
      .withColumn("N_PROF", count(lit(1)).over(nprof).cast("short"))
      // A6: QC product-combine — FLAG==1 ⟺ every QC is 1 (toctools.py:186-187)
      .withColumn("FLAG", (col("position_qc") * col("juld_qc")).cast("byte"))
      .withColumn("PLATFORM_TYPE",
        coalesce(col("plat_code"),
          when(col("platform_type").rlike("^[0-9]{1,2}$"),
            col("platform_type")).cast("byte"),
          lit(0.toByte)))
      .select(
        col("LONGITUDE").cast("float"), col("LATITUDE").cast("float"),
        col("JULD"), col("N_LEVELS").cast("short"), col("N_PROF"),
        col("dac_code").as("DAC"), col("WMO").cast("int"), col("IPROF"),
        col("mode_code").as("DATA_MODE"), col("PLATFORM_TYPE"), col("FLAG"))
  }
}
