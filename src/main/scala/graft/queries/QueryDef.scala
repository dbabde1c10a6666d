package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verified engine capability: a Spark query over the test tables and,
  * when SQL-expressible, an equivalent DuckDB oracle query. Column names and
  * row ordering must match between the two (the harness hash-compares). */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def defs: Map[String, QueryDef]
}
