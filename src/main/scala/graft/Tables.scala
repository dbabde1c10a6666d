package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Loaders for the benchmark tables (see TESTDATA.md).
  *
  * Parquet is this engine's canonical storage: it is self-describing
  * (schema in the footer), columnar, and supports predicate pushdown and
  * row-group pruning — the role the reference's custom `BinaryFile` format
  * plays (/root/reference/src/argostats/binaryfiles.py:10-33) without any
  * byte-offset bookkeeping.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    GraftSession.tune(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Normalize a time column to a session-timezone TIMESTAMP at µs
    * precision, whatever the generator wrote: INT64 TIMESTAMP(NANOS)
    * (read as epoch-nano longs under `nanosAsLong`), TIMESTAMP_NTZ
    * (pandas naive µs), DATE, or a plain UTC timestamp. The `ts` physical
    * type has ALREADY changed once across driver testdata regens and broke
    * every event query for a round — so every time column the queries
    * touch goes through this, and downstream code reads time solely via
    * `unix_micros`, keeping exact µs semantics (the precision DuckDB's
    * oracle reader also lands on). */
  private def normTs(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case LongType      => df.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      case TimestampType => df
      // DATE stays DATE: the DuckDB oracle reads the same parquet and
      // would keep it a date — casting to timestamp here would make Spark
      // outputs diverge from the oracle, the opposite of this helper's
      // job. Date comparisons/extractions downstream work on either type.
      case org.apache.spark.sql.types.DateType => df
      case _             => df.withColumn(c, col(c).cast(TimestampType))
    }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame =
    normTs(load(s, d, "orders"), "o_orderdate")
  def lineitem(s: SparkSession, d: String): DataFrame =
    normTs(load(s, d, "lineitem"), "l_shipdate")
  def events(s: SparkSession, d: String): DataFrame =
    normTs(load(s, d, "events"), "ts")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  /** `embeddings` with the vector column normalized to array&lt;float&gt; —
    * the type every kernel/UDF downstream assumes. Same defensive shape
    * as [[events]]: a regenerated testdata set that lands array&lt;double&gt;
    * (pandas default) must degrade to a cast, not break every ANN query. */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "embeddings")
    df.schema("embedding").dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _) => df
      case _ => df.withColumn("embedding", col("embedding").cast("array<float>"))
    }
  }
}
