package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's verified capability registry: one entry per
  * implemented operator from SURVEY.md §2 (plus the large-scale pipeline
  * operators), each with a DuckDB oracle in `oracleSql` when the semantics
  * are SQL-expressible.
  */
object SparkEntry {
  private val modules: Seq[QueryModule] = Seq(
    RelationalQueries,
    TextQueries,
    EmbeddingQueries,
    GeoQueries,
    FigureQueries,
    KernelQueries,
    ArgoQueries,
    NetcdfQueries,
    SketchQueries,
    StreamMultimodalQueries)

  private lazy val all: Map[String, QueryDef] =
    modules.flatMap(_.defs).toMap

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q01_pricing_summary").fn(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, v) => k -> v.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
